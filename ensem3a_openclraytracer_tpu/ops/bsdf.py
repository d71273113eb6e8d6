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
    sample_glass,
    sample_hemisphere_cosine,
    sample_hemisphere_uniform,
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
    d = alpha_sqr / jnp.maximum(
        PI * jnp.square(jnp.square(ndoth) * (alpha_sqr - 1.0) + 1.0), 1e-12
    )
    k = roughness * jnp.sqrt(2.0 / PI)
    ndotv = jnp.maximum(dot(n, v), 0.0)
    g1 = ndotv / jnp.maximum(ndotv * (1.0 - k) + k, 1e-12)
    ndotl = jnp.maximum(dot(n, l), 0.0)
    g2 = ndotl / jnp.maximum(ndotl * (1.0 - k) + k, 1e-12)
    f0 = 0.04
    f = f0 + (1.0 - f0) * jnp.power(1.0 - jnp.maximum(dot(h, v), 0.0), 5)
    specular = (f * g1 * g2 * d) / jnp.maximum(4.0 * ndotv * ndotl, 1e-3)
    kd = (1.0 - f) * 0.5
    diffuse = kd[..., None] * color / PI
    return diffuse + specular[..., None]


def eval_glass(color):
    """Glass 'BRDF' - pure tint (MathLib.cl:509-512)."""
    return color


def sample_bounce(mat_type, color, roughness, in_dir, n, u1, u2):
    """Sample the bounce direction and per-bounce throughput factor.

    Vectorized over lanes.  ``in_dir`` is the (unit) direction of the
    incoming ray (pointing *into* the surface), ``n`` the unit shading
    normal; ``u1, u2`` are uniforms in [0, 1).

    Returns ``(bounce_dir, factor)`` where ``factor [..., 3]`` is the
    reference's ``BRDF * inv_pdf * |dot(bounce_dir, n)|`` attenuation
    (Raytracing.cl:86-87), i.e. the multiplicative throughput update.
    Emissive lanes are terminated by the caller before sampling; they
    receive the diffuse lobe here, which is ignored.
    """
    d_diff, invpdf_diff = sample_hemisphere_cosine(n, u1, u2)
    d_unif, invpdf_unif = sample_hemisphere_uniform(n, u1, u2)
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
