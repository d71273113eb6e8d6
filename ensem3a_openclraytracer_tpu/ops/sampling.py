"""Direction sampling on the hemisphere, batched and counter-based.

Replaces the reference's per-thread MWC RNG + trig samplers
(MathLib.cl:294-395) with pure functions of explicit uniforms, so the
same code is driven by ``jax.random`` (threefry) on device and by
precomputed uniform tensors in the CPU/torch oracles - keeping the TPU
estimator and the test oracles on identical random streams.

All samplers return ``(direction, inv_pdf)`` with direction in world
space around the (unit) surface normal ``n``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ensem3a_openclraytracer_tpu.ops.geometry import dot, normalize

PI = np.float32(np.pi)  # host constant (device scalars cost a D2H fetch per lowering)


def orthonormal_basis(n: jnp.ndarray):
    """Branchless Frisvad/Duff orthonormal basis around unit ``n [...,3]``.

    Replaces the reference's acos/cross rotation-to-normal
    (MathLib.cl:95-110), which is singular when n is colinear with +z and
    relies on a float-equality test.  Any rotationally-symmetric sampler is
    invariant to the tangent frame choice, so this changes no distributions.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t = jnp.stack([1.0 + sign * nx * nx * a, sign * b, -sign * nx], axis=-1)
    bt = jnp.stack([b, sign + ny * ny * a, -ny], axis=-1)
    return t, bt


def local_to_world(local_v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Map a local (+z = normal) direction into world space."""
    t, bt = orthonormal_basis(n)
    return (
        t * local_v[..., 0:1] + bt * local_v[..., 1:2] + n * local_v[..., 2:3]
    )


def sample_hemisphere_cosine(n, u1, u2):
    """Cosine-weighted hemisphere sample (MathLib.cl:313-339).

    inv_pdf = pi / max(cos_theta, eps); together with the estimator's
    ``inv_pdf * |cos|`` attenuation this reproduces the reference's
    Lambert importance sampling exactly (with float32 pi instead of 3.14f).

    The local sample is unit by construction (r^2 + z^2 = 1) and the
    tangent frame is orthonormal, so no re-normalization is needed, and
    cos_theta == the sampled local z = sqrt(1 - u1).
    """
    r = jnp.sqrt(u1)
    phi = 2.0 * PI * u2
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    d = local_to_world(local, n)
    inv_pdf = PI / jnp.maximum(z, 1e-6)
    return d, inv_pdf


def sample_hemisphere_uniform(n, u1, u2):
    """Uniform hemisphere sample (MathLib.cl:342-366); inv_pdf = 2*pi.

    Uses u2 for azimuth and u1 for the polar angle (the same roles as
    the cosine sampler) so a fused caller can share one sin/cos pair;
    u1 and u2 are iid uniforms, so the distribution is unchanged.
    """
    phi = 2.0 * PI * u2
    cos_theta = 1.0 - u1
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    local = jnp.stack(
        [jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta], axis=-1
    )
    d = local_to_world(local, n)
    inv_pdf = jnp.full_like(d[..., 0], 2.0 * PI)
    return d, inv_pdf


def sample_ggx_half_vector(roughness, n, u1, u2):
    """GGX NDF half-vector sample (MathLib.cl:369-387 - dead code in the
    reference estimator, provided for parity/extension).

    Returns ``(h_world, d_ndf)`` - the sampled half vector and its NDF
    value; callers reflect the view vector about ``h`` to get the light
    direction.
    """
    alpha_sqr = jnp.square(roughness)
    phi = 2.0 * PI * u2
    cos_theta = jnp.sqrt(jnp.maximum(0.0, (1.0 - u1) / ((alpha_sqr - 1.0) * u1 + 1.0)))
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    local = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
    h = local_to_world(local, n)
    ndoth = jnp.maximum(dot(n, h), 0.0)
    d_ndf = alpha_sqr / jnp.maximum(
        PI * jnp.square(jnp.square(ndoth) * (alpha_sqr - 1.0) + 1.0), 1e-12
    )
    return h, d_ndf


def sample_glass(incoming_dir):
    """Glass 'sampling': the ray continues straight through
    (MathLib.cl:391-395); the estimator then forces attenuation to 1
    via inv_pdf = 1/|cos| (Raytracing.cl:74-77)."""
    ones = jnp.ones_like(incoming_dir[..., 0])
    return incoming_dir, ones
