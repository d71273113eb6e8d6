"""Estimator + gradient parity: JAX renderer vs the torch CPU oracle.

Both implementations consume the same explicit uniform stream, so images
must agree to float32 tolerance and the autodiff pixel gradients w.r.t.
material color / roughness / sun / IBL must match (the BASELINE.json
"pixel-gradient max-abs-error vs a CPU autodiff reference" metric).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ensem3a_openclraytracer_tpu.models.pathtracer import render_radiance
from ensem3a_openclraytracer_tpu.oracle.torch_oracle import render_scene_arrays
from ensem3a_openclraytracer_tpu.testing import (
    cornell_camera,
    cornell_env,
    cornell_geometry,
    cornell_materials,
    make_outdoor_scene,
)

RES = 24
SPP = 2
MB = 3


def _uniforms(rng, spp, mb, n):
    return rng.random(size=(spp, mb + 1, n, 2), dtype=np.float64).astype(np.float32)


def _render_jax(geom, m, e, c, uniforms, sun):
    return np.asarray(
        render_radiance(
            geom, m, e, c, jax.random.PRNGKey(0),
            height=RES, width=RES, spp=uniforms.shape[0], max_bounce=MB,
            sun_enabled=sun, uniforms=jnp.asarray(uniforms),
        )
    )


def _mismatch_stats(a, b):
    d = np.abs(a - b)
    return d.max(), (d.max(axis=-1) > 1e-3).mean()


def test_image_parity_cornell(rng):
    geom = cornell_geometry()
    m, e, c = cornell_materials(), cornell_env(), cornell_camera()
    u = _uniforms(rng, SPP, MB, RES * RES)
    img_jax = _render_jax(geom, m, e, c, u, sun=False)
    img_t, _ = render_scene_arrays(
        geom, m, e, c, u, height=RES, width=RES, max_bounce=MB, sun_enabled=False
    )
    maxerr, frac_bad = _mismatch_stats(img_jax, img_t.detach().numpy())
    # a handful of pixels may pick a different triangle on edges; the body
    # of the image must agree to float32 accuracy
    assert frac_bad < 0.02, f"max={maxerr} frac_bad={frac_bad}"


def test_image_parity_outdoor_sun(rng):
    geom, m, e, c = make_outdoor_scene(n_cubes=6, use_bvh=False)
    u = _uniforms(rng, SPP, MB, RES * RES)
    img_jax = _render_jax(geom, m, e, c, u, sun=True)
    img_t, _ = render_scene_arrays(
        geom, m, e, c, u, height=RES, width=RES, max_bounce=MB, sun_enabled=True
    )
    maxerr, frac_bad = _mismatch_stats(img_jax, img_t.detach().numpy())
    assert frac_bad < 0.02, f"max={maxerr} frac_bad={frac_bad}"


def test_pixel_gradient_parity(rng):
    """Gradients of a pixel-sum loss w.r.t. every differentiable parameter
    family agree between JAX and torch autograd."""
    geom = cornell_geometry()
    m, e, c = cornell_materials(), cornell_env(), cornell_camera()
    u = _uniforms(rng, SPP, MB, RES * RES)

    def loss_jax(color, roughness, sun_power, ibl_power, ibl):
        m2 = m._replace(color=color, roughness=roughness)
        e2 = e._replace(sun_power=sun_power, ibl_power=ibl_power, ibl=ibl)
        img = render_radiance(
            geom, m2, e2, c, jax.random.PRNGKey(0),
            height=RES, width=RES, spp=SPP, max_bounce=MB,
            sun_enabled=True, uniforms=jnp.asarray(u),
        )
        return jnp.sum(img)

    # enable both light paths: give the env some power
    e = e._replace(ibl_power=jnp.asarray(0.5, jnp.float32),
                   sun_power=jnp.asarray(0.7, jnp.float32))
    grads = jax.grad(loss_jax, argnums=(0, 1, 2, 3, 4))(
        m.color, m.roughness, e.sun_power, e.ibl_power, e.ibl
    )

    img_t, params = render_scene_arrays(
        geom, m, e, c, u, height=RES, width=RES, max_bounce=MB,
        sun_enabled=True, requires_grad=True,
    )
    img_t.sum().backward()

    names = ["color", "roughness", "sun_power", "ibl_power", "ibl"]
    for g_jax, name in zip(grads, names):
        g_ref = params[name].grad
        assert g_ref is not None, name
        g_jax = np.asarray(g_jax)
        g_ref = g_ref.numpy()
        scale = max(np.abs(g_ref).max(), 1e-3)
        rel = np.abs(g_jax - g_ref) / scale
        # a handful of edge pixels pick a different triangle between the
        # two MT implementations at f32; their paths diverge and their
        # gradient contributions land on different parameters.  Scalars
        # (sun/ibl power) aggregate all of them -> modest tolerance; for
        # per-texel ibl grads a single divergent path owns a whole texel
        # -> bound the FRACTION of divergent elements instead
        if name in ("sun_power", "ibl_power"):
            assert rel.max() < 2.5e-2, f"{name}: rel err {rel.max()}"
        elif name == "ibl":
            frac_bad = (rel > 5e-3).mean()
            assert frac_bad < 0.03, f"ibl: frac_bad={frac_bad} max={rel.max()}"
        else:
            assert rel.max() < 5e-3, f"{name}: rel max err {rel.max()} (scale {scale})"
        # gradients are non-trivial for the families the scene exercises
        if name in ("color", "roughness", "ibl_power"):
            assert np.abs(g_ref).max() > 0.0, f"{name} grad unexpectedly zero"


def test_pixel_gradient_image_sun_power(rng):
    """The BASELINE metric proper: the per-pixel gradient IMAGE
    d(image)/d(sun_power) via forward-mode in both frameworks; all but
    edge-divergent pixels must agree to f32 accuracy."""
    geom = cornell_geometry()
    m, c = cornell_materials(), cornell_camera()
    e = cornell_env()._replace(
        sun_power=jnp.asarray(0.7, jnp.float32), ibl_power=jnp.asarray(0.5, jnp.float32)
    )
    u = _uniforms(rng, SPP, MB, RES * RES)

    def img_of_sun_jax(sp):
        e2 = e._replace(sun_power=sp)
        return render_radiance(
            geom, m, e2, c, jax.random.PRNGKey(0),
            height=RES, width=RES, spp=SPP, max_bounce=MB,
            sun_enabled=True, uniforms=jnp.asarray(u),
        )

    _, gimg_jax = jax.jvp(
        img_of_sun_jax, (jnp.asarray(0.7, jnp.float32),), (jnp.asarray(1.0, jnp.float32),)
    )

    # torch path: render twice, exploit linearity in sun_power (exact for
    # fixed uniforms) to get the pixel-gradient image
    img0, _ = render_scene_arrays(
        geom, m, e._replace(sun_power=jnp.asarray(0.0)), c, u,
        height=RES, width=RES, max_bounce=MB, sun_enabled=True,
    )
    img1, _ = render_scene_arrays(
        geom, m, e._replace(sun_power=jnp.asarray(1.0)), c, u,
        height=RES, width=RES, max_bounce=MB, sun_enabled=True,
    )
    gimg_ref = (img1 - img0).detach().numpy()

    d = np.abs(np.asarray(gimg_jax) - gimg_ref)
    frac_bad = (d.max(axis=-1) > 1e-3).mean()
    assert frac_bad < 0.02, f"pixel-grad image: max={d.max()} frac_bad={frac_bad}"


def test_gradient_finite_differences(rng):
    """Independent FD check on emissive power (exact for fixed uniforms:
    radiance is linear in the power, so FD is machine-accurate)."""
    geom = cornell_geometry()
    m, e, c = cornell_materials(), cornell_env(), cornell_camera()
    u = _uniforms(rng, SPP, MB, RES * RES)

    def loss(power):
        m2 = m._replace(roughness=m.roughness.at[0].set(power))
        img = render_radiance(
            geom, m2, e, c, jax.random.PRNGKey(0),
            height=RES, width=RES, spp=SPP, max_bounce=MB,
            sun_enabled=False, uniforms=jnp.asarray(u),
        )
        return jnp.sum(img)

    g = jax.grad(loss)(jnp.asarray(12.0, jnp.float32))
    f1 = loss(jnp.asarray(13.0, jnp.float32))
    f0 = loss(jnp.asarray(11.0, jnp.float32))
    fd = (f1 - f0) / 2.0
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-3)


@pytest.mark.parametrize("mis", [False, True])
def test_image_parity_nee_mis(rng, mis):
    """NEE / MIS estimator parity vs the torch oracle on the same
    uniform + light-uniform streams (VERDICT round-5 item 8: the two
    newest estimators had no independent check)."""
    from ensem3a_openclraytracer_tpu.scene.scene import build_light_pack

    geom = cornell_geometry()
    m, e, c = cornell_materials(), cornell_env(), cornell_camera()
    lights = build_light_pack(geom, m)
    assert lights is not None
    u = _uniforms(rng, SPP, MB, RES * RES)
    ul = rng.random(size=(SPP, MB + 1, RES * RES, 3), dtype=np.float64).astype(
        np.float32
    )
    img_jax = np.asarray(
        render_radiance(
            geom, m, e, c, jax.random.PRNGKey(0),
            height=RES, width=RES, spp=SPP, max_bounce=MB,
            sun_enabled=False, uniforms=jnp.asarray(u),
            nee=True, mis=mis, lights=lights,
            light_uniforms=jnp.asarray(ul), fused=False,
        )
    )
    img_t, _ = render_scene_arrays(
        geom, m, e, c, u, height=RES, width=RES, max_bounce=MB,
        sun_enabled=False, nee=True, mis=mis, lights=lights,
        light_uniforms=ul,
    )
    maxerr, frac_bad = _mismatch_stats(img_jax, img_t.detach().numpy())
    assert frac_bad < 0.02, f"max={maxerr} frac_bad={frac_bad}"


def test_nee_gradient_parity(rng):
    """Autograd parity through the NEE estimator: color / roughness
    (emissive power flows through the NEE light term)."""
    from ensem3a_openclraytracer_tpu.scene.scene import build_light_pack

    geom = cornell_geometry()
    m, e, c = cornell_materials(), cornell_env(), cornell_camera()
    lights = build_light_pack(geom, m)
    u = _uniforms(rng, SPP, MB, RES * RES)
    ul = rng.random(size=(SPP, MB + 1, RES * RES, 3), dtype=np.float64).astype(
        np.float32
    )

    def loss_jax(color, roughness):
        m2 = m._replace(color=color, roughness=roughness)
        img = render_radiance(
            geom, m2, e, c, jax.random.PRNGKey(0),
            height=RES, width=RES, spp=SPP, max_bounce=MB,
            sun_enabled=False, uniforms=jnp.asarray(u),
            nee=True, lights=lights, light_uniforms=jnp.asarray(ul),
            fused=False,
        )
        return jnp.sum(img)

    g_color, g_rough = jax.grad(loss_jax, argnums=(0, 1))(m.color, m.roughness)

    img_t, params = render_scene_arrays(
        geom, m, e, c, u, height=RES, width=RES, max_bounce=MB,
        sun_enabled=False, requires_grad=True,
        nee=True, lights=lights, light_uniforms=ul,
    )
    img_t.sum().backward()
    for g_jax, name in ((g_color, "color"), (g_rough, "roughness")):
        g_ref = params[name].grad.numpy()
        scale = max(np.abs(g_ref).max(), 1e-3)
        rel = np.abs(np.asarray(g_jax) - g_ref) / scale
        assert rel.max() < 5e-3, f"{name}: rel max err {rel.max()}"
        assert np.abs(g_ref).max() > 0.0, name
