"""Pinhole camera ray generation, fully vectorized.

Reference model (Raytracing.cl:18-37): the image plane is a unit square
centered on the camera position in the local x-z plane; the focal point
sits behind it at distance ``1 / (2 tan(fov/2))`` along -y; rays go from
the plane point away from the focal point and are then Euler-rotated
(X, then Y, then Z, degrees).  Rows map to -z, columns to +x, so the
row-major output image matches the reference's framebuffer orientation.

Deliberate fixes vs the reference (SURVEY.md section 2.6): pixel centers at
half-texel offsets instead of the ``(i+1) % res`` off-by-one, and float32
pi instead of 3.14f.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ensem3a_openclraytracer_tpu.ops.geometry import (
    euler_xyz_matrix,
    normalize,
)


def focal_distance(fov_rad) -> jnp.ndarray:
    """Distance from image plane to focal point for a unit-width plane."""
    return 1.0 / (2.0 * jnp.tan(jnp.asarray(fov_rad, jnp.float32) / 2.0))


def camera_rays(position, rot_deg, fov_deg, height: int, width: int):
    """Generate one primary ray per pixel.

    Returns ``(origins [H*W, 3], directions [H*W, 3])`` in row-major pixel
    order; directions are unit length.  ``position`` / ``rot_deg`` are
    length-3 arrays; ``fov_deg`` is the full horizontal field of view in
    degrees (the reference's misnamed ``cam_DOF`` ini key).
    """
    position = jnp.asarray(position, jnp.float32)
    fov_rad = jnp.asarray(fov_deg, jnp.float32) * (jnp.pi / 180.0)
    f = focal_distance(fov_rad)

    # static pixel-grid constants stay in numpy: eager jnp here would
    # round-trip through the device at trace time (slow over tunneled
    # backends) and bloat lowering with device-resident constants
    rows = (np.arange(height, dtype=np.float32) + 0.5) / height
    cols = (np.arange(width, dtype=np.float32) + 0.5) / width
    # plane extends [-0.5, 0.5] in x (columns) and z (rows, top row = +z);
    # pixel aspect is square: plane height scales with H/W.
    px = cols - 0.5
    pz = (0.5 - rows) * (height / width)
    gx, gz = np.meshgrid(px, pz, indexing="xy")  # [H, W] each
    local = jnp.stack(
        [jnp.asarray(gx), jnp.full_like(jnp.asarray(gx), f), jnp.asarray(gz)], axis=-1
    )  # direction from focal point through plane point, camera space (+y fwd)
    m = euler_xyz_matrix(jnp.asarray(rot_deg, jnp.float32))
    d = jnp.einsum("ij,hwj->hwi", m, local)
    d = normalize(d).reshape(-1, 3)
    o = jnp.broadcast_to(position, d.shape)
    return o, d
