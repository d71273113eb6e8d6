"""Core ray/triangle/AABB geometry as vmap-able pure JAX functions.

TPU-native re-expression of the reference's OpenCL geometry library
(/root/reference/Kernels/MathLib.cl:117-199 Moller-Trumbore + slab test,
:51-65 quaternion rotation).  Everything here operates on batched SoA
``[..., 3]`` float32 arrays and broadcasts, so the same code runs per-ray,
per-(ray, triangle-tile) or inside a Pallas kernel body.
"""

from __future__ import annotations

import jax.numpy as jnp

# Hit-distance conventions shared with the reference estimator
# (MathLib.cl:120 maxDist, :263 min-k threshold, :119 MT epsilon).
MAX_DIST = 1000.0
MIN_HIT_DIST = 1e-4
MT_EPSILON = 1e-7


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3-vector dot product over the trailing axis."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def norm(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(v * v, axis=-1))


def normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Safe normalize over the trailing axis."""
    return v * (1.0 / jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps)))


def rotate_axis_angle(v: jnp.ndarray, axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation of ``v`` about unit ``axis`` by ``angle`` (radians).

    Equivalent to the reference's quaternion ``rotateVec``
    (MathLib.cl:56-65) but cheaper on the VPU (no quaternion mults).
    """
    axis = normalize(axis)
    c = jnp.cos(angle)[..., None]
    s = jnp.sin(angle)[..., None]
    kv = cross(axis, v)
    kkv = axis * dot(axis, v)[..., None]
    return v * c + kv * s + kkv * (1.0 - c)


def _rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [jnp.stack([o, z, z], -1), jnp.stack([z, c, -s], -1), jnp.stack([z, s, c], -1)], -2
    )


def _rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [jnp.stack([c, z, s], -1), jnp.stack([z, o, z], -1), jnp.stack([-s, z, c], -1)], -2
    )


def _rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [jnp.stack([c, -s, z], -1), jnp.stack([s, c, z], -1), jnp.stack([z, z, o], -1)], -2
    )


def euler_xyz_matrix(angles_deg: jnp.ndarray) -> jnp.ndarray:
    """3x3 matrix applying X, then Y, then Z rotations (angles in degrees).

    Matches the reference's rotation order for camera and sun directions
    (Raytracing.cl:33-35, :116-118): ``v' = Rz @ Ry @ Rx @ v``.
    Uses float32 pi (the reference hardcodes 3.14f - fixed deliberately,
    see SURVEY.md section 2.6).
    """
    a = jnp.asarray(angles_deg, jnp.float32) * (jnp.pi / 180.0)
    return _rot_z(a[..., 2]) @ _rot_y(a[..., 1]) @ _rot_x(a[..., 0])


def rotate_euler_xyz_deg(v: jnp.ndarray, angles_deg) -> jnp.ndarray:
    """Rotate vectors ``v [..., 3]`` by Euler X->Y->Z angles in degrees."""
    m = euler_xyz_matrix(angles_deg)
    return jnp.einsum("ij,...j->...i", m, v)


def moller_trumbore(ray_o, ray_d, v0, v1, v2, eps: float = MT_EPSILON):
    """Batched Moller-Trumbore ray/triangle intersection.

    All inputs broadcast over leading dims; trailing dim is 3.
    Returns ``(t, u, v, hit)`` where ``hit`` is a bool mask; ``t`` is
    ``MAX_DIST`` on miss.  Semantics mirror MathLib.cl:117-160: front and
    back faces both hit, parallel rays (|det| < eps) miss, and only
    ``t > eps`` counts as a ray (not line) intersection.
    """
    e1 = v1 - v0
    e2 = v2 - v0
    h = cross(ray_d, e2)
    det = dot(e1, h)
    parallel = jnp.abs(det) < eps
    inv_det = 1.0 / jnp.where(parallel, 1.0, det)
    s = ray_o - v0
    u = inv_det * dot(s, h)
    q = cross(s, e1)
    v = inv_det * dot(ray_d, q)
    t = inv_det * dot(e2, q)
    hit = (
        (~parallel)
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > eps)
    )
    t = jnp.where(hit, t, MAX_DIST)
    return t, u, v, hit


def ray_aabb(ray_o, ray_d, box_min, box_max):
    """Batched slab test (MathLib.cl:167-190), returning ``(tmin, tmax)``.

    A hit is ``(tmax >= tmin) & (tmax >= 0)``; callers may additionally
    require ``tmin <= t_best`` for ordered-traversal culling.  Zero
    direction components are nudged so the divisions stay finite (the
    reference divides by zero and relies on IEEE inf semantics, which
    produces NaNs when an origin component lies exactly on a slab).
    """
    tiny = 1e-12
    d = jnp.where(jnp.abs(ray_d) < tiny, jnp.where(ray_d < 0, -tiny, tiny), ray_d)
    inv = 1.0 / d
    t1 = (box_min - ray_o) * inv
    t2 = (box_max - ray_o) * inv
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    return tmin, tmax


def aabb_hit(ray_o, ray_d, box_min, box_max, t_cap=None):
    """Boolean slab test with optional early-out cap on entry distance."""
    tmin, tmax = ray_aabb(ray_o, ray_d, box_min, box_max)
    hit = (tmax >= tmin) & (tmax >= 0.0)
    if t_cap is not None:
        hit = hit & (tmin <= t_cap)
    return hit


def triangle_area(v0, v1, v2):
    """Area of triangles (MathLib.cl:398-402)."""
    return 0.5 * norm(cross(v0 - v1, v0 - v2))


def sample_point_in_triangle(v0, v1, v2, u1, u2):
    """Uniform point sampling in a triangle (MathLib.cl:404-416)."""
    s = jnp.sqrt(u1)
    x = 1.0 - s
    y = u2 * s
    return v0 + (v1 - v0) * x[..., None] + (v2 - v0) * y[..., None]
