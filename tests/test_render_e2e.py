"""End-to-end renders: the BASELINE.json config ladder on CPU.

Each test renders a real scene (reference assets or procedural) through
the public API and checks physical invariants - finiteness, energy
bounds, determinism, estimator semantics (primary-hit caching, max-bounce
nullification, furnace-style energy conservation).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ensem3a_openclraytracer_tpu.models.pathtracer import (
    render_image,
    render_radiance,
    render_scene,
)
from ensem3a_openclraytracer_tpu.scene.materials import EnvParams
from ensem3a_openclraytracer_tpu.scene.scene import Scene
from ensem3a_openclraytracer_tpu.testing import (
    cornell_camera,
    cornell_env,
    cornell_geometry,
    cornell_materials,
)


def _load(scenes_dir, name):
    path = os.path.join(str(scenes_dir), name)
    if not os.path.exists(path):
        pytest.skip(f"reference asset {name} not present")
    return Scene.load(path)


def test_config1_single_triangle(scenes_dir):
    """BASELINE config 1: singleTriangle.obj, 64^2, 1 bounce, no BVH."""
    sc = _load(scenes_dir, "singleTriangle.obj")
    img = render_scene(sc, overrides={"resolution": 64, "spp": 2, "max_bounce": 1})
    arr = np.asarray(img)
    assert arr.shape == (64, 64, 3)
    assert np.isfinite(arr).all()
    assert 0.0 <= arr.min() and arr.max() <= 1.0


def test_config2_cornell_render(scenes_dir):
    """BASELINE config 2: Cornell box.obj (sun-lit per its ini)."""
    sc = _load(scenes_dir, "Cornell box.obj")
    img = render_scene(sc, overrides={"resolution": 64, "spp": 8, "max_bounce": 4})
    arr = np.asarray(img)
    assert np.isfinite(arr).all()
    assert arr.mean() > 0.01  # the sun lights the box through its opening


def test_config3_monkey_glossy_glass(scenes_dir):
    """BASELINE config 3: Cornell box_Monkey.obj, 8 bounces, 15.7k tris."""
    sc = _load(scenes_dir, "Cornell box_Monkey.obj")
    img = render_scene(sc, overrides={"resolution": 32, "spp": 2, "max_bounce": 8})
    arr = np.asarray(img)
    assert np.isfinite(arr).all()
    assert arr.mean() > 0.0


def test_render_is_deterministic():
    geom = cornell_geometry()
    m, e, c = cornell_materials(), cornell_env(), cornell_camera()
    kw = dict(height=32, width=32, spp=4, max_bounce=3, sun_enabled=False)
    img1 = render_radiance(geom, m, e, c, jax.random.PRNGKey(7), **kw)
    img2 = render_radiance(geom, m, e, c, jax.random.PRNGKey(7), **kw)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    img3 = render_radiance(geom, m, e, c, jax.random.PRNGKey(8), **kw)
    assert np.abs(np.asarray(img3) - np.asarray(img1)).max() > 0.0


def test_furnace_diffuse():
    """Furnace test (the FurnaceHD capability): a unit-albedo diffuse
    closed box under zero lighting stays black; under a uniform
    emissive-free IBL the open-scene radiance never exceeds the
    environment (energy conservation of the Lambert lobe with
    cosine-weighted sampling, MathLib.cl:313-339 semantics)."""
    from ensem3a_openclraytracer_tpu.testing import make_outdoor_scene

    geom, m, _, cam = make_outdoor_scene(n_cubes=4, use_bvh=False)
    # all-diffuse, albedo 1, uniform env of radiance 1, no sun
    m = m._replace(
        mtype=jnp.where(m.mtype != 0, 1, 1),
        color=jnp.ones_like(m.color),
    )
    env = EnvParams.create(
        sun_power=0.0, ibl_power=1.0, ibl=np.ones((8, 16, 3), np.float32)
    )
    img = render_radiance(
        geom, m, env, cam, jax.random.PRNGKey(0),
        height=48, width=48, spp=32, max_bounce=6, sun_enabled=False,
    )
    arr = np.asarray(img)
    assert np.isfinite(arr).all()
    # no pixel may exceed the environment radiance by more than MC noise
    assert arr.max() <= 1.05
    # most paths escape within 6 bounces -> mean close to 1
    assert arr.mean() > 0.75


def test_max_bounce_nullification():
    """Paths still alive after max_bounce contribute 0 (Raytracing.cl:99-103):
    a closed box with zero-power light and no env renders black."""
    geom = cornell_geometry()
    m = cornell_materials()
    m = m._replace(roughness=m.roughness.at[0].set(0.0))  # light power 0
    env = cornell_env()  # ibl_power 0, sun off
    img = render_radiance(
        geom, m, env, cornell_camera(), jax.random.PRNGKey(0),
        height=16, width=16, spp=2, max_bounce=3, sun_enabled=False,
    )
    np.testing.assert_allclose(np.asarray(img), 0.0, atol=1e-6)


def test_emissive_power_scales_linearly():
    """Radiance is linear in emissive power (power lives in the roughness
    slot for type-0 materials, Raytracing.cl:107)."""
    geom = cornell_geometry()
    m = cornell_materials()
    env, cam = cornell_env(), cornell_camera()
    kw = dict(height=24, width=24, spp=8, max_bounce=3, sun_enabled=False)
    key = jax.random.PRNGKey(3)
    img1 = np.asarray(render_radiance(geom, m, env, cam, key, **kw))
    m2 = m._replace(roughness=m.roughness.at[0].set(24.0))  # 2x power
    img2 = np.asarray(render_radiance(geom, m2, env, cam, key, **kw))
    np.testing.assert_allclose(img2, img1 * 2.0, rtol=1e-4, atol=1e-5)


def test_display_image_is_clamped():
    geom = cornell_geometry()
    m = cornell_materials()
    m = m._replace(roughness=m.roughness.at[0].set(500.0))
    img = render_image(
        geom, m, cornell_env(), cornell_camera(), jax.random.PRNGKey(0),
        height=16, width=16, spp=2, max_bounce=2, sun_enabled=False,
    )
    arr = np.asarray(img)
    assert arr.max() <= 1.0 and arr.min() >= 0.0
