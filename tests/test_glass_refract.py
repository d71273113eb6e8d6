"""Refractive glass (``glass_mode="refract"``): the capability the
reference stubbed - its glass is a straight-through tint and the ``ior``
ABI slot is dead weight (MathLib.cl:391-395).  Checks Snell's law
analytically, ior=1 degeneracy, oracle parity, and the flag default."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from ensem3a_openclraytracer_tpu.models.pathtracer import render_radiance
from ensem3a_openclraytracer_tpu.ops.bsdf import sample_glass_refract
from ensem3a_openclraytracer_tpu.oracle.torch_oracle import render_scene_arrays
from ensem3a_openclraytracer_tpu.testing import (
    make_glass_light_scene,
)

RES, SPP, MB = 20, 2, 3


def test_snell_analytic():
    """45-degree incidence into ior=1.5: sin(theta_t) = sin(45)/1.5."""
    s = math.sqrt(0.5)
    in_dir = jnp.asarray([[s, 0.0, -s]], jnp.float32)  # heading -z into the surface
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    ior = jnp.asarray([1.5], jnp.float32)
    u_no_reflect = jnp.asarray([0.999], jnp.float32)  # Fresnel coin: transmit
    d = np.asarray(sample_glass_refract(in_dir, n, ior, u_no_reflect))[0]
    sin_t = math.sqrt(0.5) / 1.5
    np.testing.assert_allclose(d[0], sin_t, rtol=1e-5)
    np.testing.assert_allclose(d[2], -math.sqrt(1 - sin_t**2), rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(d), 1.0, rtol=1e-6)


def test_total_internal_reflection():
    """Grazing exit from the dense side reflects (k < 0)."""
    a = math.radians(80.0)
    in_dir = jnp.asarray([[math.sin(a), 0.0, math.cos(a)]], jnp.float32)  # leaving (+z)
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    ior = jnp.asarray([1.5], jnp.float32)
    d = np.asarray(sample_glass_refract(in_dir, n, ior, jnp.asarray([0.999], jnp.float32)))[0]
    # sin(80)*1.5 > 1 -> TIR: z component flips
    np.testing.assert_allclose(d[0], math.sin(a), rtol=1e-5)
    np.testing.assert_allclose(d[2], -math.cos(a), rtol=1e-5)


def test_ior_one_is_straight_through():
    """ior=1 refraction is exactly the reference's tint glass, so the
    two modes must render the same image on the same stream."""
    geom, m, e, c = make_glass_light_scene()
    m = m._replace(ior=jnp.ones_like(m.ior))
    u = np.random.default_rng(5).random(
        size=(SPP, MB + 1, RES * RES, 2), dtype=np.float64).astype(np.float32)
    kw = dict(height=RES, width=RES, spp=SPP, max_bounce=MB,
              sun_enabled=False, uniforms=jnp.asarray(u))
    img_tint = render_radiance(geom, m, e, c, jax.random.PRNGKey(0),
                               glass_mode="tint", **kw)
    img_refr = render_radiance(geom, m, e, c, jax.random.PRNGKey(0),
                               glass_mode="refract", **kw)
    np.testing.assert_allclose(
        np.asarray(img_refr), np.asarray(img_tint), atol=2e-5
    )


def test_refract_oracle_parity():
    """JAX and torch implementations agree pixel-for-pixel on the same
    uniform stream with refraction enabled (ior=1.5 pane)."""
    geom, m, e, c = make_glass_light_scene()
    u = np.random.default_rng(6).random(
        size=(SPP, MB + 1, RES * RES, 2), dtype=np.float64).astype(np.float32)
    img_jax = np.asarray(render_radiance(
        geom, m, e, c, jax.random.PRNGKey(0),
        height=RES, width=RES, spp=SPP, max_bounce=MB,
        sun_enabled=False, uniforms=jnp.asarray(u), glass_mode="refract",
    ))
    img_t, _ = render_scene_arrays(
        geom, m, e, c, u, height=RES, width=RES, max_bounce=MB,
        sun_enabled=False, glass_mode="refract",
    )
    d = np.abs(img_jax - img_t.detach().numpy())
    frac_bad = (d.max(axis=-1) > 1e-3).mean()
    assert frac_bad < 0.02, f"max={d.max()} frac_bad={frac_bad}"


def test_refract_changes_the_image():
    """With ior=1.5 the refractive render must differ from the tint
    render (otherwise the flag is a no-op)."""
    geom, m, e, c = make_glass_light_scene()
    kw = dict(height=RES, width=RES, spp=16, max_bounce=MB, sun_enabled=False)
    a = render_radiance(geom, m, e, c, jax.random.PRNGKey(0), glass_mode="tint", **kw)
    b = render_radiance(geom, m, e, c, jax.random.PRNGKey(0), glass_mode="refract", **kw)
    assert float(jnp.abs(a - b).max()) > 1e-3
