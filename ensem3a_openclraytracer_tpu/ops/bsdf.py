"""BSDF evaluation and vectorized lobe-select bounce sampling.

The reference's material model (MathLib.cl:461-512, Raytracing.cl:58-78):
type 0 = emissive (power stored in the roughness slot), 1 = diffuse Lambert
with cosine-weighted sampling, 2 = glossy (uniform hemisphere sampling +
full GGX/Fresnel/Smith evaluation), 3 = glass (straight-through ray with
color tint, attenuation forced to 1).

TPU-first design: instead of the megakernel's divergent ``switch``, every
lane evaluates all lobes on regular vector math and selects by material
type with ``jnp.where`` - branch-free and fully fusible by XLA.  Sampled
directions never depend on differentiable material parameters (cosine /
uniform / straight-through), so pixel gradients w.r.t. color / roughness /
emissive power are unbiased without reparameterization; directions are
additionally wrapped in ``stop_gradient`` for hygiene.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ensem3a_openclraytracer_tpu.ops.geometry import dot, normalize
from ensem3a_openclraytracer_tpu.ops.sampling import (
    PI,
    orthonormal_basis,
    sample_glass,
)

# Material type codes (UI.py:215, SURVEY.md section 2.3).
EMISSIVE = 0
DIFFUSE = 1
GLOSSY = 2
GLASS = 3


def eval_lambert(color):
    """Lambert BRDF (MathLib.cl:503-506)."""
    return color / PI


def eval_ggx(color, roughness, v, l, n):
    """GGX + Schlick-Fresnel + Smith-ish BRDF (MathLib.cl:461-500).

    ``v`` points from the surface toward the viewer, ``l`` toward the
    light, ``n`` is the unit normal.  Reproduces the reference's exact
    formulation (scalar F0 = 0.04, k = roughness * sqrt(2/pi),
    kd = (1 - F) * 0.5) with float32 pi.
    """
    h = normalize(l + v)
    alpha_sqr = jnp.square(roughness)
    ndoth = jnp.maximum(dot(n, h), 0.0)
    d_den = jnp.maximum(
        PI * jnp.square(jnp.square(ndoth) * (alpha_sqr - 1.0) + 1.0), 1e-12
    )
    k = roughness * jnp.sqrt(2.0 / PI)
    ndotv = jnp.maximum(dot(n, v), 0.0)
    ndotl = jnp.maximum(dot(n, l), 0.0)
    g1_den = jnp.maximum(ndotv * (1.0 - k) + k, 1e-12)
    g2_den = jnp.maximum(ndotl * (1.0 - k) + k, 1e-12)
    f0 = 0.04
    one_m_hv = 1.0 - jnp.maximum(dot(h, v), 0.0)
    p2 = one_m_hv * one_m_hv
    f = f0 + (1.0 - f0) * (p2 * p2 * one_m_hv)
    # algebraically (f * g1 * g2 * d) / max(4 nv nl, 1e-3) with g_i's
    # numerators moved up - one division instead of four.  The product
    # denominator is clamped: on degenerate lanes (grazing view + alpha
    # ~0) every factor bottoms out and the product underflows f32, giving
    # 0/0 = NaN - harmless when masked in the primal, but NaN * 0 = NaN
    # poisons gradients through the masking `where` (NEE evaluates this
    # at every path vertex, so such lanes always exist)
    specular = (f * alpha_sqr * ndotv * ndotl) / jnp.maximum(
        d_den * g1_den * g2_den * jnp.maximum(4.0 * ndotv * ndotl, 1e-3),
        1e-12,
    )
    kd = (1.0 - f) * 0.5
    diffuse = kd[..., None] * color / PI
    return diffuse + specular[..., None]


def eval_glass(color):
    """Glass 'BRDF' - pure tint (MathLib.cl:509-512)."""
    return color


def sample_glass_refract(in_dir, n, ior, u1):
    """Physically-based glass: Snell refraction + Schlick-Fresnel
    reflect/refract choice + total internal reflection.

    The reference carries ``ior`` in its material ABI but never uses it -
    its glass is a straight-through tint (MathLib.cl:391-395, :509-512).
    This is the capability upgrade behind ``glass_mode="refract"``.

    ``in_dir`` points INTO the surface; ``n`` is the outward normal.
    ``u1`` is the Fresnel coin (the lobe pdf cancels the Fresnel weight,
    so throughput stays the plain color tint)."""
    cos_raw = dot(in_dir, n)
    entering = cos_raw < 0.0
    n_eff = jnp.where(entering[..., None], n, -n)
    ci = jnp.clip(-dot(in_dir, n_eff), 0.0, 1.0)
    eta = jnp.where(entering, 1.0 / ior, ior)
    k = 1.0 - eta * eta * (1.0 - ci * ci)
    tir = k < 0.0
    ct = jnp.sqrt(jnp.maximum(k, 0.0))
    refr = in_dir * eta[..., None] + n_eff * (eta * ci - ct)[..., None]
    refl = in_dir + n_eff * (2.0 * ci)[..., None]
    # exact unpolarized dielectric Fresnel (Schlick misbehaves at
    # ior -> 1: its (1-ci)^5 tail never vanishes, so ior=1 glass would
    # still reflect; the exact form degenerates to F = 0 there)
    rs = (eta * ci - ct) / jnp.maximum(eta * ci + ct, 1e-12)
    rp = (eta * ct - ci) / jnp.maximum(eta * ct + ci, 1e-12)
    fres = 0.5 * (rs * rs + rp * rp)
    reflect = tir | (u1 < fres)
    return jnp.where(reflect[..., None], refl, normalize(refr))


def sample_bounce(mat_type, color, roughness, in_dir, n, u1, u2,
                  ior=None, glass_mode: str = "tint"):
    """Sample the bounce direction and per-bounce throughput factor.

    Vectorized over lanes.  ``in_dir`` is the (unit) direction of the
    incoming ray (pointing *into* the surface), ``n`` the unit shading
    normal; ``u1, u2`` are uniforms in [0, 1).

    Returns ``(bounce_dir, factor)`` where ``factor [..., 3]`` is the
    reference's ``BRDF * inv_pdf * |dot(bounce_dir, n)|`` attenuation
    (Raytracing.cl:86-87), i.e. the multiplicative throughput update.
    Emissive lanes are terminated by the caller before sampling; they
    receive the diffuse lobe here, which is ignored.

    ``glass_mode`` (static): "tint" reproduces the reference's
    straight-through glass; "refract" uses :func:`sample_glass_refract`
    with per-lane ``ior`` (required).  Both keep ``factor = color``.
    """
    # Fused hemisphere lobes: one tangent frame + one sin/cos pair feeds
    # both the cosine (diffuse) and uniform (glossy) samples - the same
    # distributions as sample_hemisphere_{cosine,uniform}, dedup'd
    # because this runs for every lane at every bounce.
    t, bt = orthonormal_basis(n)
    phi = 2.0 * PI * u2
    cphi = jnp.cos(phi)
    sphi = jnp.sin(phi)
    r = jnp.sqrt(u1)
    z_cos = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    d_diff = (
        t * (r * cphi)[..., None]
        + bt * (r * sphi)[..., None]
        + n * z_cos[..., None]
    )
    invpdf_diff = PI / jnp.maximum(z_cos, 1e-6)
    cos_u = 1.0 - u1
    sin_u = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_u * cos_u))
    d_unif = (
        t * (sin_u * cphi)[..., None]
        + bt * (sin_u * sphi)[..., None]
        + n * cos_u[..., None]
    )
    invpdf_unif = 2.0 * PI
    if glass_mode == "refract":
        if ior is None:
            raise ValueError("glass_mode='refract' requires per-lane ior")
        d_glass = sample_glass_refract(in_dir, n, ior, u1)
    else:
        d_glass, _ = sample_glass(in_dir)

    is_glossy = mat_type == GLOSSY
    is_glass = mat_type == GLASS
    # diffuse (and the never-sampled emissive lobe) -> cosine; glossy -> uniform
    bounce_dir = jnp.where(
        is_glass[..., None],
        d_glass,
        jnp.where(is_glossy[..., None], d_unif, d_diff),
    )
    # Discrete direction choice carries no useful parameter gradient.
    bounce_dir = jax.lax.stop_gradient(bounce_dir)

    cos_abs = jnp.abs(dot(bounce_dir, n))
    brdf_diff = eval_lambert(color)
    brdf_glossy = eval_ggx(color, roughness, -in_dir, bounce_dir, n)
    brdf_glass = eval_glass(color)

    factor_diff = brdf_diff * (invpdf_diff * cos_abs)[..., None]
    factor_glossy = brdf_glossy * (invpdf_unif * cos_abs)[..., None]
    # Glass: inv_pdf is forced to 1/|cos| so the attenuation is exactly 1
    # (Raytracing.cl:76) and only the tint survives.
    factor_glass = brdf_glass

    factor = jnp.where(
        is_glass[..., None],
        factor_glass,
        jnp.where(is_glossy[..., None], factor_glossy, factor_diff),
    )
    return bounce_dir, factor
