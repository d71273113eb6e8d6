"""MXU-native ray-triangle intersection: intersection as matmul.

The TPU's FLOPs live in the 128x128 systolic array, so the fastest way
to intersect a batch of rays with a triangle soup is to phrase the test
as dense matrix products instead of the reference's per-ray scalar
Moller-Trumbore (MathLib.cl:117-160):

  * Plucker side tests. For ray (o, d) and edge A->B the signed volume
      w_AB = ((A - o) x (B - o)) . d = (A x B) . d + (A - B) . (d x o)
    is a dot product between a 6-vector ray feature r = [d, d x o] and a
    6-vector edge feature e_AB = [A x B, A - B].  A ray pierces the
    triangle iff w_AB, w_BC, w_CA share a sign.  Three [N, 6] @ [6, T]
    matmuls give every ray-edge volume.
  * Plane distance. t = (n.A - n.o) / (n.d) with n the geometric
    normal: two more matmuls ([N, 3] @ [3, T]).

The closest hit is then a masked argmin over the triangle axis, tiled
so intermediates stay small.  Everything is branch-free, gather-free,
and MXU-resident - the speed-of-light design for scenes up to a few
hundred-k triangles (the reference's largest scene is 15,756).

Precision note: side tests use f32 accumulation (bf16 signs flip near
edges); w == 0 counts as inside on both signs, so shared edges never
leak a miss (the watertightness the reference's float-equality tests
lack, SURVEY.md section 2.6).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ensem3a_openclraytracer_tpu.ops.geometry import MAX_DIST, MIN_HIT_DIST
from ensem3a_openclraytracer_tpu.ops.intersect import Hit


class TriFeatures(NamedTuple):
    """Per-triangle intersection features, precomputed once per scene.

    ``edges`` is ``[3, 6, Tp]`` (edge AB / BC / CA Plucker features,
    transposed for the matmul), ``plane`` is ``[4, Tp]`` as
    ``[-n, n.A]`` so ``t * (n.d) = [o, 1] @ plane``; ``num_tris`` is the
    real (unpadded) count."""

    edges: jnp.ndarray  # [3, 6, Tp] float32
    plane: jnp.ndarray  # [4, Tp] float32
    normal_d: jnp.ndarray  # [3, Tp] float32 (n, for the denominator matmul)
    block_bounds: jnp.ndarray  # [B, 8] AABB per TRI_TILE block (+2 pad cols)
    num_tris: int


def build_tri_features(v0, v1, v2, pad_to: int | None = None) -> TriFeatures:
    """Precompute Plucker edge features + plane rows; pad T to a lane
    multiple with never-hit triangles.  Also computes per-TRI_TILE-block
    AABBs so the Pallas kernel can skip whole blocks a ray tile cannot
    hit (the dense two-level culling that replaces tree traversal).

    Padding: scenes above one TRI_TILE pad to a TRI_TILE multiple (the
    kernel's block-culling granularity); smaller scenes pad only to the
    f32 sublane multiple (8) - the [T, R] intermediates live on the
    sublane axis, so every padded row is pure wasted VPU work (measured
    1.7x on the 36-tri Cornell at pad 128 vs pad 8)."""
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    t = v0.shape[0]
    if pad_to is None:
        pad_to = TRI_TILE if t > TRI_TILE else 8
    tp = -(-t // pad_to) * pad_to

    def edge_feat(a, b):
        return np.concatenate([np.cross(a, b), a - b], axis=-1)  # [T, 6]

    e = np.stack([edge_feat(v0, v1), edge_feat(v1, v2), edge_feat(v2, v0)])  # [3, T, 6]
    n = np.cross(v1 - v0, v2 - v0)  # [T, 3]
    na = np.einsum("td,td->t", n, v0)  # [T]

    edges = np.zeros((3, 6, tp), np.float32)
    edges[:, :, :t] = np.transpose(e, (0, 2, 1))
    plane = np.zeros((4, tp), np.float32)
    plane[:3, :t] = -n.T
    plane[3, :t] = na
    normal_d = np.zeros((3, tp), np.float32)
    normal_d[:, :t] = n.T

    # per-block AABBs at TRI_TILE granularity (blocks made only of
    # padding get an inverted box -> never hit -> always skipped)
    nb = -(-tp // TRI_TILE)
    bounds = np.zeros((nb, 8), np.float32)
    bounds[:, :3] = np.inf
    bounds[:, 3:6] = -np.inf
    allv = np.stack([v0, v1, v2])  # [3, T, 3]
    for b in range(nb):
        lo_t, hi_t = b * TRI_TILE, min((b + 1) * TRI_TILE, t)
        if lo_t < hi_t:
            blk = allv[:, lo_t:hi_t].reshape(-1, 3)
            bounds[b, :3] = blk.min(axis=0)
            bounds[b, 3:6] = blk.max(axis=0)
    # padding: n == 0 -> den == 0 -> rejected as parallel
    return TriFeatures(
        edges=jnp.asarray(edges),
        plane=jnp.asarray(plane),
        normal_d=jnp.asarray(normal_d),
        block_bounds=jnp.asarray(bounds),
        num_tris=t,
    )


def _ray_features(ray_o, ray_d):
    """r6 = [d, d x o] (for side tests), q4 = [o, 1] (for t numerator)."""
    dxo = jnp.cross(ray_d, ray_o)
    r6 = jnp.concatenate([ray_d, dxo], axis=-1)  # [N, 6]
    q4 = jnp.concatenate([ray_o, jnp.ones_like(ray_o[:, :1])], axis=-1)  # [N, 4]
    return r6, q4


def trace_mxu(
    feats: TriFeatures, ray_o, ray_d, tri_tile: int | None = None
) -> Hit:
    """Closest hit of ``[N]`` rays via tiled MXU matmuls.

    Tiles the triangle axis under ``lax.scan`` with a running
    ``(best_t, best_i)`` so the ``[N, tile]`` intermediates never touch
    HBM at full ``[N, T]`` size.  The tile adapts to the ray count so
    the live ``[N, tile]`` working set stays ~64 MB."""
    r6, q4 = _ray_features(ray_o, ray_d)
    tp = feats.edges.shape[-1]
    if tri_tile is None:
        tri_tile = max(128, min(2048, (1 << 24) // max(ray_o.shape[0], 1)))
    tile = min(tri_tile, tp)
    num_tiles = tp // tile if tp % tile == 0 else -(-tp // tile)
    # pad triangle axis to a tile multiple (zero features -> den 0 -> miss)
    pad = num_tiles * tile - tp
    edges = jnp.pad(feats.edges, ((0, 0), (0, 0), (0, pad)))
    plane = jnp.pad(feats.plane, ((0, 0), (0, pad)))
    normal_d = jnp.pad(feats.normal_d, ((0, 0), (0, pad)))

    edges_t = edges.reshape(3, 6, num_tiles, tile).transpose(2, 0, 1, 3)
    plane_t = plane.reshape(4, num_tiles, tile).transpose(1, 0, 2)
    nd_t = normal_d.reshape(3, num_tiles, tile).transpose(1, 0, 2)
    bases = np.arange(num_tiles, dtype=np.int32) * tile

    zero_f = (ray_o[:, 0] + ray_d[:, 0]) * 0.0  # vma-safe carry seed

    def body(carry, xs):
        best_t, best_i = carry
        e, pl, nd, base = xs
        w1 = jax.lax.dot(r6, e[0], precision=jax.lax.Precision.HIGHEST)
        w2 = jax.lax.dot(r6, e[1], precision=jax.lax.Precision.HIGHEST)
        w3 = jax.lax.dot(r6, e[2], precision=jax.lax.Precision.HIGHEST)
        inside = ((w1 >= 0) & (w2 >= 0) & (w3 >= 0)) | (
            (w1 <= 0) & (w2 <= 0) & (w3 <= 0)
        )
        den = jax.lax.dot(ray_d, nd, precision=jax.lax.Precision.HIGHEST)
        num = jax.lax.dot(q4, pl, precision=jax.lax.Precision.HIGHEST)
        t = num / jnp.where(den == 0.0, 1.0, den)
        valid = inside & (den != 0.0) & (t > MIN_HIT_DIST)
        t = jnp.where(valid, t, MAX_DIST)
        arg = jnp.argmin(t, axis=1).astype(jnp.int32)
        tmin = jnp.min(t, axis=1)
        better = tmin < best_t
        best_t = jnp.where(better, tmin, best_t)
        best_i = jnp.where(better, base + arg, best_i)
        return (best_t, best_i), None

    init = (zero_f + MAX_DIST, zero_f.astype(jnp.int32))
    (best_t, best_i), _ = jax.lax.scan(
        body, init, (edges_t, plane_t, nd_t, bases)
    )
    return Hit(t=best_t, tri=best_i, hit=best_t < MAX_DIST)


# ---------------------------------------------------------------------------
# Pallas fused kernel: the production path on TPU.
#
# The scan version above leaves 5 [N, tile] products in HBM between the
# matmuls and the reduction - at 1M rays that is GBs of traffic per
# bounce and it dominates the whole render.  The fused kernel keeps the
# entire triangle feature set resident in VMEM (1.2 MB at 16k tris),
# streams ray tiles through, and reduces to the running closest hit in
# registers, so HBM sees only the ray batch once and two [N] outputs.
# ---------------------------------------------------------------------------

RAY_TILE = 1024
TRI_TILE = 256


def _mxu_kernel(edges_ref, plane_ref, nd_ref, blocks_ref, r6_ref, q4_ref, d_ref,
                best_t_ref, best_i_ref):
    """One ray tile vs all triangle tiles; everything VMEM-resident.

    Layouts are transposed so the lane (last, 128-wide) axis is rays:
    ``edges [3, 6, Tp]``, ``plane [4, Tp]``, ``nd [3, Tp]``,
    ``blocks [B, 8]``, ``r6 [6, R]``, ``q4 [4, R]``, ``d [3, R]``;
    outputs ``[1, R]``.

    Two-level culling: before paying the matmuls for triangle block j,
    the tile slab-tests its rays against block j's AABB and skips the
    whole block when no live ray can find a closer hit inside it - the
    dense, branch-light TPU equivalent of tree traversal.  Coherent
    tiles (camera / shadow rays) skip most of the scene.
    """
    import jax.lax as lax

    r6 = r6_ref[:]  # [6, R]
    q4 = q4_ref[:]  # [4, R]
    d = d_ref[:]  # [3, R]
    r = r6.shape[-1]
    tp = edges_ref.shape[-1]
    tri_tile = min(TRI_TILE, tp)
    num_tiles = tp // tri_tile

    def dot_fast(a, b):
        """Single-pass bf16 MXU dot - used ONLY for the Plucker sign
        tests.  Edge watertightness survives bf16: shared-edge features
        are exact negations, so the two triangles' w's are exact
        negatives and one side always accepts.  Silhouette-edge sign
        flips are sub-pixel MC noise."""
        return lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    def outer_sum(rows, cols, sl, k):
        """Exact f32 [TT, R] contraction on the VPU via outer-product
        accumulation - full precision for the hit distance without the
        6-pass f32 MXU cost."""
        acc = rows[0, sl][:, None] * cols[0][None, :]
        for i in range(1, k):
            acc = acc + rows[i, sl][:, None] * cols[i][None, :]
        return acc

    o3 = q4[:3]  # [3, R] origins
    tiny = 1e-12
    d_safe = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    inv_d = 1.0 / d_safe  # [3, R]

    best_t = jnp.full((1, r), MAX_DIST, jnp.float32)
    best_i = jnp.zeros((1, r), jnp.int32)

    def intersect_block(j, best_t, best_i):
        sl = pl.ds(j * tri_tile, tri_tile)
        e1 = edges_ref[0, :, sl]  # [6, TT]
        e2 = edges_ref[1, :, sl]
        e3 = edges_ref[2, :, sl]
        w1 = dot_fast(e1.T, r6)  # [TT, R]
        w2 = dot_fast(e2.T, r6)
        w3 = dot_fast(e3.T, r6)
        inside = ((w1 >= 0) & (w2 >= 0) & (w3 >= 0)) | (
            (w1 <= 0) & (w2 <= 0) & (w3 <= 0)
        )
        den = outer_sum(nd_ref, d, sl, 3)  # [TT, R] exact f32
        num = outer_sum(plane_ref, q4, sl, 4)  # [TT, R] exact f32
        t = num / jnp.where(den == 0.0, 1.0, den)
        valid = inside & (den != 0.0) & (t > MIN_HIT_DIST)
        t = jnp.where(valid, t, MAX_DIST)
        tile_min = jnp.min(t, axis=0, keepdims=True)  # [1, R]
        tile_arg = jnp.argmin(t, axis=0).astype(jnp.int32)[None, :]  # [1, R]
        better = tile_min < best_t
        best_t = jnp.where(better, tile_min, best_t)
        best_i = jnp.where(better, j * tri_tile + tile_arg, best_i)
        return best_t, best_i

    def body(j, carry):
        best_t, best_i = carry
        if num_tiles == 1:
            return intersect_block(j, best_t, best_i)
        # slab test: tile rays vs block j's AABB (scalar bounds broadcast)
        lo = [blocks_ref[j, k] for k in range(3)]
        hi = [blocks_ref[j, 3 + k] for k in range(3)]
        tmin = jnp.full((1, r), -jnp.inf, jnp.float32)
        tmax = jnp.full((1, r), jnp.inf, jnp.float32)
        for k in range(3):
            t1 = (lo[k] - o3[k : k + 1]) * inv_d[k : k + 1]
            t2 = (hi[k] - o3[k : k + 1]) * inv_d[k : k + 1]
            tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
            tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
        live = (tmax >= tmin) & (tmax >= 0.0) & (tmin <= best_t)
        return lax.cond(
            jnp.any(live),
            lambda bt, bi: intersect_block(j, bt, bi),
            lambda bt, bi: (bt, bi),
            best_t,
            best_i,
        )

    best_t, best_i = jax.lax.fori_loop(0, num_tiles, body, (best_t, best_i))
    best_t_ref[:] = best_t
    best_i_ref[:] = best_i


def trace_mxu_pallas(feats: TriFeatures, ray_o, ray_d, *, interpret: bool = False) -> Hit:
    """Fused-kernel closest hit (TPU).  Equivalent to :func:`trace_mxu`.
    ``interpret=True`` runs the kernel in the Pallas interpreter so tests
    validate it off-TPU."""
    n = ray_o.shape[0]
    r6, q4 = _ray_features(ray_o, ray_d)

    np_pad = (-n) % RAY_TILE
    r6 = jnp.pad(r6, ((0, np_pad), (0, 0))).T  # [6, Np]
    q4 = jnp.pad(q4, ((0, np_pad), (0, 0))).T  # [4, Np]
    d = jnp.pad(ray_d, ((0, np_pad), (0, 0))).T  # [3, Np]
    n_pad = n + np_pad

    tp = feats.edges.shape[-1]
    t_pad = (-tp) % min(TRI_TILE, tp) if tp >= TRI_TILE else 0
    edges = jnp.pad(feats.edges, ((0, 0), (0, 0), (0, t_pad)))
    plane = jnp.pad(feats.plane, ((0, 0), (0, t_pad)))
    nd = jnp.pad(feats.normal_d, ((0, 0), (0, t_pad)))
    blocks = feats.block_bounds

    grid = (n_pad // RAY_TILE,)
    full = lambda *shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    ray_spec = lambda k: pl.BlockSpec((k, RAY_TILE), lambda i: (0, i),
                                      memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, RAY_TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    best_t, best_i = pl.pallas_call(
        _mxu_kernel,
        grid=grid,
        in_specs=[
            full(3, 6, edges.shape[-1]),
            full(4, edges.shape[-1]),
            full(3, edges.shape[-1]),
            full(*blocks.shape),
            ray_spec(6),
            ray_spec(4),
            ray_spec(3),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ),
        interpret=interpret,
    )(edges, plane, nd, blocks, r6, q4, d)

    best_t = best_t[0, :n]
    best_i = best_i[0, :n]
    return Hit(t=best_t, tri=best_i, hit=best_t < MAX_DIST)
