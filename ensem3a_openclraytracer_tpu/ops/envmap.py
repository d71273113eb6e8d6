"""Lat-long (equirectangular) environment lighting + directional sun.

Reproduces the reference's environment model (MathLib.cl:72-90 IBL lookup,
Raytracing.cl:115-136 sun): escaped rays sample an equirectangular image
scaled by ``ibl_power``; a directional sun of direction
``rotate_euler_xyz(sun_angles) @ (1,1,1)`` and intensity ``sun_power``
contributes when the sun shadow ray is unoccluded (or tinted when occluded
only by glass).

The lookup is differentiable w.r.t. the IBL texel array (bilinear weights),
so pixel gradients flow into environment maps for inverse rendering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ensem3a_openclraytracer_tpu.ops.geometry import (
    normalize,
    rotate_euler_xyz_deg,
)
from ensem3a_openclraytracer_tpu.ops.sampling import PI


def spherical_uv(direction: jnp.ndarray) -> jnp.ndarray:
    """Map unit directions ``[..., 3]`` to lat-long uv in [0, 1]^2.

    Matches the reference's orientation convention (MathLib.cl:72-80):
    the direction is pre-rotated 90 deg about X then 90 deg about Y before
    the atan2/asin projection, so IBL images used with the reference render
    identically here.
    """
    d = normalize(direction)
    # 90 deg about X: (x, y, z) -> (x, -z, y); then 90 deg about Y:
    # (x, y, z) -> (z, y, -x).  Composed: (x, -z, y) -> (y, -z, -x).
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    rx, ry, rz = dy, -dz, -dx
    u = jnp.arctan2(rz, rx) * (0.5 / PI) + 0.5
    v = jnp.arcsin(jnp.clip(ry, -1.0, 1.0)) * (1.0 / PI) + 0.5
    return jnp.stack([u, v], axis=-1)


# Below this texel count the bilinear lookup runs as a separable one-hot
# matmul (MXU) instead of 4 per-lane gathers - XLA's gather lowering on
# TPU is serial-ish and dominated the whole bounce loop in profiles.
MATMUL_LOOKUP_MAX_TEXELS = 32768


def _bilinear_coords(x, y, w, h):
    x = x - 0.5
    y = y - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    return x0i, x1i, fx, y0i, y1i, fy


def _bilinear_gather(ibl, x0i, x1i, fx, y0i, y1i, fy):
    fx = fx[..., None]
    fy = fy[..., None]
    c00 = ibl[y0i, x0i]
    c01 = ibl[y0i, x1i]
    c10 = ibl[y1i, x0i]
    c11 = ibl[y1i, x1i]
    top = c00 * (1.0 - fx) + c01 * fx
    bot = c10 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def _bilinear_matmul(ibl, x0i, x1i, fx, y0i, y1i, fy):
    """Gather-free bilinear: the 2-tap x filter is a sparse ``[N, W]``
    row-matrix contracted on the MXU, the 2-tap y filter a ``[N, H]``
    weighted sum.  Bit-equivalent weights to the gather path, still
    differentiable w.r.t. the texels (they sit inside the dot)."""
    h, w = ibl.shape[0], ibl.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    wx = jnp.where(cols == x0i[:, None], 1.0 - fx[:, None], 0.0) + jnp.where(
        cols == x1i[:, None], fx[:, None], 0.0
    )  # [N, W]
    p = jax.lax.dot(
        wx,
        ibl.transpose(1, 0, 2).reshape(w, h * 3),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(-1, h, 3)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, h), 1)
    wy = jnp.where(rows == y0i[:, None], 1.0 - fy[:, None], 0.0) + jnp.where(
        rows == y1i[:, None], fy[:, None], 0.0
    )  # [N, H]
    return jnp.einsum(
        "nh,nhc->nc", wy, p, precision=jax.lax.Precision.HIGHEST
    )


def sample_ibl(ibl: jnp.ndarray, direction: jnp.ndarray, bilinear: bool = True):
    """Sample an ``[H, W, 3]`` float32 environment image by direction.

    ``bilinear=True`` (default) filters between texels with clamp-to-edge
    addressing; ``bilinear=False`` reproduces the reference's effective
    nearest-texel lookup (integer coordinates into the CL image,
    MathLib.cl:87).  Small maps take the MXU matmul-lookup path; large
    maps fall back to XLA gathers.
    """
    h, w = ibl.shape[0], ibl.shape[1]
    uv = spherical_uv(direction)
    x = uv[..., 0] * w
    y = uv[..., 1] * h
    if not bilinear:
        xi = jnp.clip(x.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(y.astype(jnp.int32), 0, h - 1)
        return ibl[yi, xi]
    batch_shape = x.shape
    coords = _bilinear_coords(x.reshape(-1), y.reshape(-1), w, h)
    if h * w <= MATMUL_LOOKUP_MAX_TEXELS:
        out = _bilinear_matmul(ibl, *coords)
    else:
        out = _bilinear_gather(ibl, *coords)
    return out.reshape(*batch_shape, 3)


def sun_direction(sun_angles_deg: jnp.ndarray) -> jnp.ndarray:
    """Unit sun direction: Euler-rotated (1, 1, 1) (Raytracing.cl:115-118).

    The reference leaves it unnormalized; shadow-ray occlusion and the sun
    radiance are invariant to that scale, so we normalize for numerical
    hygiene.
    """
    v = np.ones((3,), np.float32)  # host constant
    return normalize(rotate_euler_xyz_deg(v, sun_angles_deg))
