"""Sharded rendering + distributed optimization on a virtual 8-device
CPU mesh (SURVEY.md section 4: multi-chip tests runnable without
hardware via xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ensem3a_openclraytracer_tpu.models.optimize import (
    TrainableParams,
    make_train_step,
)
from ensem3a_openclraytracer_tpu.models.pathtracer import render_radiance
from ensem3a_openclraytracer_tpu.parallel.mesh import make_mesh
from ensem3a_openclraytracer_tpu.parallel.render import (
    make_sharded_renderer,
    render_radiance_sharded,
    shard_target_image,
)
from ensem3a_openclraytracer_tpu.testing import (
    cornell_camera,
    cornell_env,
    cornell_geometry,
    cornell_materials,
)

RES = 32
SPP = 4
MB = 2


@pytest.fixture(scope="module")
def scene():
    return (
        cornell_geometry(use_bvh=True),
        cornell_materials(),
        cornell_env(),
        cornell_camera(),
    )


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual CPU devices"


@pytest.mark.parametrize("dp,sp", [(8, 1), (4, 2), (2, 4)])
def test_sharded_render_finite_and_deterministic(scene, dp, sp):
    geom, m, e, c = scene
    mesh = make_mesh(jax.devices(), sp=sp)
    key = jax.random.PRNGKey(0)
    kw = dict(height=RES, width=RES, spp=SPP, max_bounce=MB, sun_enabled=False)
    img1 = render_radiance_sharded(mesh, geom, m, e, c, key, **kw)
    img2 = render_radiance_sharded(mesh, geom, m, e, c, key, **kw)
    arr1 = np.asarray(img1)
    assert arr1.shape == (RES, RES, 3)
    assert np.isfinite(arr1).all()
    np.testing.assert_array_equal(arr1, np.asarray(img2))


def test_sharded_close_to_unsharded(scene):
    """Different RNG streams, same estimator: means agree within MC noise
    at moderate spp."""
    geom, m, e, c = scene
    mesh = make_mesh(jax.devices(), sp=2)
    kw = dict(height=RES, width=RES, spp=32, max_bounce=MB, sun_enabled=False)
    img_sh = np.asarray(
        render_radiance_sharded(mesh, geom, m, e, c, jax.random.PRNGKey(0), **kw)
    )
    img_un = np.asarray(
        render_radiance(geom, m, e, c, jax.random.PRNGKey(1), **kw)
    )
    assert abs(img_sh.mean() - img_un.mean()) < 0.02
    # pixel-level: noisy but correlated
    assert np.corrcoef(img_sh.ravel(), img_un.ravel())[0, 1] > 0.95


def test_sharded_renderer_output_sharding(scene):
    geom, m, e, c = scene
    mesh = make_mesh(jax.devices(), sp=1)
    fn = make_sharded_renderer(mesh, height=RES, width=RES, spp=2, max_bounce=1)
    img = fn(geom, m, e, c, jax.random.PRNGKey(0))
    assert img.shape == (RES, RES, 3)
    # output stays sharded over dp rows - 8 shards of 4 rows each
    assert len(img.sharding.device_set) == 8


def test_train_step_decreases_loss(scene):
    geom, m, e, c = scene
    mesh = make_mesh(jax.devices(), sp=2)
    init, step = make_train_step(
        geom, m, e, c, optax.adam(5e-2),
        height=RES, width=RES, spp=8, max_bounce=MB, mesh=mesh, sun_enabled=False,
    )
    params, opt_state = init()
    # target: the same scene with a darker red wall
    m_target = m._replace(color=m.color.at[2].set(jnp.asarray([0.2, 0.05, 0.05])))
    target = render_radiance(
        geom, m_target, e, c, jax.random.PRNGKey(42),
        height=RES, width=RES, spp=32, max_bounce=MB, sun_enabled=False,
    )
    target = shard_target_image(mesh, target)
    losses = []
    for i in range(8):
        params, opt_state, loss = step(
            params, opt_state, target, jax.random.PRNGKey(100 + i)
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    # the optimized wall color moved toward the target
    d0 = float(jnp.abs(m.color[2] - m_target.color[2]).sum())
    d1 = float(jnp.abs(params.color[2] - m_target.color[2]).sum())
    assert d1 < d0


def test_gradients_replicated_across_devices(scene):
    """Parameter gradients from the sharded loss are identical on every
    device (the psum collectives produce replicated values)."""
    geom, m, e, c = scene
    mesh = make_mesh(jax.devices(), sp=2)

    def loss_fn(color, key):
        m2 = m._replace(color=color)
        img = render_radiance_sharded(
            mesh, geom, m2, e, c, key,
            height=RES, width=RES, spp=4, max_bounce=MB, sun_enabled=False,
        )
        return jnp.mean(img**2)

    g = jax.jit(jax.grad(loss_fn))(m.color, jax.random.PRNGKey(0))
    arr = np.asarray(g)
    assert np.isfinite(arr).all()
    assert np.abs(arr).max() > 0.0


def test_trainable_params_round_trip(scene):
    _, m, e, _ = scene
    p = TrainableParams.from_scene_params(m, e)
    m2, e2 = p.apply(m, e)
    np.testing.assert_array_equal(np.asarray(m2.color), np.asarray(m.color))
    np.testing.assert_array_equal(np.asarray(e2.ibl), np.asarray(e.ibl))
    assert m2.mtype is m.mtype  # static leaves untouched


def test_sharded_nee_matches_estimator_family(scene):
    """NEE through the (dp, sp) mesh: finite, deterministic, and close to
    the single-device NEE render at matched sample counts (different
    fold_in streams, so allclose is statistical, not bitwise)."""
    from ensem3a_openclraytracer_tpu.scene.scene import build_light_pack

    geom, m, e, c = scene
    lights = build_light_pack(geom, m)
    assert lights is not None
    mesh = make_mesh(jax.devices(), sp=2)
    key = jax.random.PRNGKey(3)
    kw = dict(height=RES, width=RES, spp=8, max_bounce=MB, sun_enabled=False)
    img = render_radiance_sharded(
        mesh, geom, m, e, c, key, lights=lights, nee=True, **kw
    )
    arr = np.asarray(img)
    assert np.isfinite(arr).all() and arr.max() > 0
    ref = render_radiance(
        geom, m, e, c, key, lights=lights, nee=True, **kw
    )
    # same estimator, independent streams: images agree to MC noise
    assert float(jnp.mean(jnp.abs(img - ref))) < 0.15


def test_sharded_glass_refract_plumbs_through(scene):
    """glass_mode='refract' reaches the shard bodies (the round-2 advisor
    flagged the CLI silently dropping it on mesh renders)."""
    geom, m, e, c = scene
    mesh = make_mesh(jax.devices(), sp=1)
    key = jax.random.PRNGKey(4)
    kw = dict(height=RES, width=RES, spp=2, max_bounce=MB, sun_enabled=False)
    tint = render_radiance_sharded(mesh, geom, m, e, c, key, **kw)
    refr = render_radiance_sharded(
        mesh, geom, m, e, c, key, glass_mode="refract", **kw
    )
    assert np.isfinite(np.asarray(refr)).all()
    # the Cornell scene has a glass sphere: the two glass models differ
    assert float(jnp.max(jnp.abs(tint - refr))) > 1e-3
