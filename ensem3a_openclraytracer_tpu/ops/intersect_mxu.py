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

Precision design (the part that makes bf16 MXU passes usable at all):
the Plucker/plane features scale like R^2 with R the distance from the
coordinate origin, while the *signal* (w crossing zero at an edge, the
numerator vanishing at the ray origin's own surface) scales with the
triangle size h.  A raw bf16 pass loses the signal entirely once
h < R/16 - measured 38% wrong-triangle picks on the 15.7k-triangle
Monkey scene's bounce rays in round 2.  Two fixes, both free on the
MXU (the contraction dim pads to 128 regardless):

  * **Per-block local frames.**  Features are precomputed about each
    TRI_TILE block's AABB centroid (blocks are Morton-ordered, so the
    centroid is tight); the kernels rebuild the ray-side operand about
    the same centroid per visited block (a handful of VPU rows).
    Operand magnitudes drop from scene scale to block scale.
  * **Split-bf16 side tests.**  w = e_hi.r_hi + e_lo.r_hi + e_hi.r_lo
    (three-term split product, same scheme build_pnd already used for
    the hit distance) - 18 contraction rows instead of 6, one MXU pass
    either way.

w == 0 still counts as inside on both signs, so shared edges inside a
block never leak a miss (exact-negation watertightness); edges shared
ACROSS blocks are evaluated in two different local frames, where the
residual-error band (~2^-16 of block scale) replaces exact negation -
far tighter than the reference's float-equality tests (SURVEY.md
section 2.6).
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
    real (unpadded) count.

    ``edges``/``plane`` are in the global frame (consumed by the exact
    f32 :func:`trace_mxu` scan path).  ``edges_c``/``plane_c`` hold the
    same features recentered about each TRI_TILE block's AABB centroid
    (identical shapes; only ``A x B`` and ``n.A`` change - ``A - B``
    and ``n`` are translation invariant).  The bf16 Pallas kernels use
    the recentered copies with a matching per-block ray-side rebuild;
    see the module docstring's precision design."""

    edges: jnp.ndarray  # [3, 6, Tp] float32, global frame
    plane: jnp.ndarray  # [4, Tp] float32, global frame
    edges_c: jnp.ndarray  # [3, 6, Tp] float32, block-recentered
    plane_c: jnp.ndarray  # [4, Tp] float32, block-recentered
    normal_d: jnp.ndarray  # [3, Tp] float32 (n, for the denominator matmul)
    block_bounds: jnp.ndarray  # [B, 8] AABB per TRI_TILE block (+2 pad cols)
    num_tris: int
    # [B, 40, 5*TT] merged per-block operand for the pair-queue engine
    # (ops/pairs.py): rows 0-17 the split-bf16 edge lhs, rows 18-38 the
    # split num/den table, row 39 zero pad; bf16 when B <= COMB_BF16_MAX_BLOCKS (whole
    # array VMEM-resident in the kernel), f32 otherwise (HBM-streamed
    # per block).  Precomputed HOST-SIDE on purpose: building this
    # transpose/concat chain inside the same jit as the pallas call is
    # miscompiled by XLA on TPU v5e (the operand arrives corrupted;
    # passing it as a jit argument is correct), and per-scene
    # precomputation is cheaper anyway.
    comb: jnp.ndarray = None


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
    # column 6: scale-aware self-hit epsilon for the split-bf16 kernels.
    # Their t carries an ABSOLUTE error band of ~2^-16 x the operand
    # magnitude (block radius + ray-origin distance from the block
    # centroid, both bounded by the scene diagonal), so a fixed
    # MIN_HIT_DIST lets surface-origin rays spuriously re-hit their own
    # surface once the scene is large (shadow acne measured on the
    # 80-unit outdoor scene).  4x margin over the band; the exact f32
    # engines keep plain MIN_HIT_DIST.
    if t > 0:
        scene_diag = float(
            np.linalg.norm(
                allv.reshape(-1, 3).max(axis=0) - allv.reshape(-1, 3).min(axis=0)
            )
        )
    else:
        scene_diag = 0.0
    bounds[:, 6] = max(MIN_HIT_DIST, 2.0 ** -14 * scene_diag)

    # block-recentered copies for the bf16 kernels.  The centroid MUST
    # be computed exactly like the kernels recompute it from the slab
    # bounds: 0.5f * (lo + hi), all in f32.
    edges_c = edges.copy()
    plane_c = plane.copy()
    for b in range(nb):
        lo_t, hi_t = b * TRI_TILE, min((b + 1) * TRI_TILE, t)
        if lo_t >= hi_t:
            continue
        c = np.float32(0.5) * (bounds[b, :3] + bounds[b, 3:6])  # [3] f32
        sl = slice(lo_t, hi_t)
        a_, b_, c_ = v0[sl] - c, v1[sl] - c, v2[sl] - c
        for e_i, (x, y) in enumerate(((a_, b_), (b_, c_), (c_, a_))):
            edges_c[e_i, :3, sl] = np.cross(x, y).T  # A' x B'
            # rows 3:6 (A - B) are translation invariant: keep
        plane_c[3, sl] = np.einsum("td,td->t", n[sl], a_)  # n . A'
    comb = _build_comb_np(edges_c, plane_c, normal_d)
    return TriFeatures(
        edges=jnp.asarray(edges),
        plane=jnp.asarray(plane),
        edges_c=jnp.asarray(edges_c),
        plane_c=jnp.asarray(plane_c),
        normal_d=jnp.asarray(normal_d),
        block_bounds=jnp.asarray(bounds),
        num_tris=t,
        comb=jnp.asarray(comb),
    )


# above this block count the pair-queue engine streams f32 comb blocks
# from HBM instead of keeping a bf16 copy VMEM-resident (~100 KB/block)
COMB_BF16_MAX_BLOCKS = 64


def _build_comb_np(edges_c: np.ndarray, plane_c: np.ndarray,
                   normal_d: np.ndarray) -> np.ndarray:
    """Host-side (numpy) build of :attr:`TriFeatures.comb` - the
    host-side comb build (+ bf16 downcast
    for resident-scale scenes.  The bf16 copy reproduces the f32 MXU
    result exactly: hi rows are bf16-representable by construction and
    lo rows only lose sub-2^-16-relative residue the MXU drops anyway."""
    import ml_dtypes

    tp = edges_c.shape[-1]
    tt = min(TRI_TILE, tp)
    nb = tp // tt
    f32 = np.float32
    ecat = (
        edges_c.reshape(3, 6, nb, tt).transpose(1, 2, 0, 3)
        .reshape(6, nb * 3 * tt).astype(f32)
    )
    e_hi = ecat.astype(ml_dtypes.bfloat16).astype(f32)
    e18 = np.concatenate([e_hi, ecat - e_hi, e_hi], axis=0)
    p_hi = plane_c.astype(ml_dtypes.bfloat16).astype(f32)
    n_hi = normal_d.astype(ml_dtypes.bfloat16).astype(f32)
    a_num = np.concatenate(
        [p_hi, p_hi, plane_c - p_hi, np.zeros((9, tp), f32)], axis=0
    )
    a_den = np.concatenate(
        [np.zeros((12, tp), f32), n_hi, n_hi, normal_d - n_hi], axis=0
    )
    pnd = np.concatenate(
        [a_num.reshape(21, nb, tt), a_den.reshape(21, nb, tt)], axis=2
    ).reshape(21, 2 * tp)
    e = e18.reshape(18, nb, 3 * tt).transpose(1, 0, 2)
    p9 = pnd.reshape(21, nb, 2 * tt).transpose(1, 0, 2)
    top = np.concatenate([e, np.zeros((nb, 18, 2 * tt), f32)], axis=2)
    bot = np.concatenate([np.zeros((nb, 21, 3 * tt), f32), p9], axis=2)
    comb = np.concatenate(
        [top, bot, np.zeros((nb, 1, 5 * tt), f32)], axis=1
    )  # [nb, 40, 5tt]: row 39 is zero padding - the streamed engine
    #    DMAs whole blocks, and Mosaic requires the sliced sublane dim
    #    to be 8-aligned (40 = 5 x 8)
    if nb <= COMB_BF16_MAX_BLOCKS:
        comb = comb.astype(ml_dtypes.bfloat16)
    return comb


def build_ecat(edges: jnp.ndarray, num_tiles: int, tri_tile: int) -> jnp.ndarray:
    """Block-interleaved edge operand ``[6, B * 3 * TT]``: block j's columns
    are ``[e_AB | e_BC | e_CA]`` so ONE matmul per block covers all three
    side tests."""
    return (
        edges.reshape(3, 6, num_tiles, tri_tile)
        .transpose(1, 2, 0, 3)
        .reshape(6, num_tiles * 3 * tri_tile)
    )


def build_pnd(plane: jnp.ndarray, normal_d: jnp.ndarray, num_tiles: int,
              tri_tile: int) -> jnp.ndarray:
    """Fused numerator/denominator operand ``[21, 2 * Tp]``: block j's
    columns are ``[A_num (TT) | A_den (TT)]``.  A_num rows pair with the
    kernel's rhs rows ``[q_hi, q_lo, q_hi]`` as (plane_hi, plane_hi,
    plane_lo); A_den rows pair with ``[d_hi, d_lo, d_hi]`` as (n_hi,
    n_hi, n_lo).  The 3-term split-bf16 product recovers ~2^-16 relative
    accuracy for the hit distance on the bf16 MXU path."""
    tp = plane.shape[-1]

    def _split(x):
        hi = x.astype(jnp.bfloat16).astype(jnp.float32)
        return hi, x - hi

    p_hi, p_lo = _split(plane)  # [4, Tp]
    n_hi, n_lo = _split(normal_d)  # [3, Tp]
    a_num = jnp.concatenate(
        [p_hi, p_hi, p_lo, jnp.zeros((9, tp), jnp.float32)], axis=0
    )  # [21, Tp]
    a_den = jnp.concatenate(
        [jnp.zeros((12, tp), jnp.float32), n_hi, n_hi, n_lo], axis=0
    )  # [21, Tp]
    return jnp.concatenate(
        [
            a_num.reshape(21, num_tiles, tri_tile),
            a_den.reshape(21, num_tiles, tri_tile),
        ],
        axis=2,
    ).reshape(21, 2 * tp)


def build_nd_rhs(q4: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Ray-side rhs ``[21, R]`` for the :func:`build_pnd` operand:
    ``[q_hi, q_lo, q_hi, d_hi, d_lo, d_hi]`` (split-bf16 residuals)."""
    q_hi = q4.astype(jnp.bfloat16).astype(jnp.float32)
    q_lo = q4 - q_hi
    d_hi = d.astype(jnp.bfloat16).astype(jnp.float32)
    d_lo = d - d_hi
    return jnp.concatenate([q_hi, q_lo, q_hi, d_hi, d_lo, d_hi], axis=0)


def _split_hi_lo(x: jnp.ndarray):
    """bf16 split: hi carries the top 8 mantissa bits, lo the residual
    (itself bf16-truncated by the MXU - total ~2^-16 representation)."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def refined_recip(den):
    """1/den via the VPU's approximate reciprocal + one Newton step
    (~2^-16 relative - beyond the packed key's 15 retained mantissa
    bits); measurably cheaper than the lowered f32 divide in the
    per-block epilogues, the Pallas engines' hot loop.  den == 0 gives
    inf/nan, which the callers' (t > eps) guard rejects (and +inf keys
    above the no-hit sentinel).  Pallas-kernel use only."""
    r0 = pl.reciprocal(den, approx=True)
    return r0 * (2.0 - den * r0)


def block_centroid(blocks_ref, j):
    """The per-block local-frame origin: 0.5f * (lo + hi) of the block's
    slab AABB - must match build_tri_features' recentering exactly."""
    return [0.5 * (blocks_ref[j, k] + blocks_ref[j, 3 + k]) for k in range(3)]


def build_edge_rhs(d, oc) -> jnp.ndarray:
    """Ray-side rhs ``[18, R]`` for the recentered edge operand: the
    three-term split product pairs lhs rows ``[e_hi, e_lo, e_hi]`` with
    ``[r_hi, r_hi, r_lo]`` where ``r = [d, d x (o - c)]``."""
    dxoc = jnp.concatenate(
        [
            d[1:2] * oc[2:3] - d[2:3] * oc[1:2],
            d[2:3] * oc[0:1] - d[0:1] * oc[2:3],
            d[0:1] * oc[1:2] - d[1:2] * oc[0:1],
        ],
        axis=0,
    )
    r6c = jnp.concatenate([d, dxoc], axis=0)  # [6, R]
    r_hi, r_lo = _split_hi_lo(r6c)
    return jnp.concatenate([r_hi, r_hi, r_lo], axis=0)


def build_edge_lhs(e: jnp.ndarray) -> jnp.ndarray:
    """Triangle-side ``[18, 3TT]`` stack ``[e_hi, e_lo, e_hi]`` matching
    :func:`build_edge_rhs`'s row pairing."""
    e_hi, e_lo = _split_hi_lo(e)
    return jnp.concatenate([e_hi, e_lo, e_hi], axis=0)


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
# multi-block scenes measured fastest at the same 1024-lane tiles:
# smaller tiles cull finer but the per-(tile, block) fixed costs (slab
# test, cond, SMEM reads) dominate - 256 lanes was 1.7x SLOWER on the
# 15.7k-tri Monkey despite skipping more blocks
RAY_TILE_MULTI = 1024
TRI_TILE = 256

# int32 view of MAX_DIST with the low byte cleared - the "no hit yet"
# value of the packed (t | row) closest-hit key
_MAXKEY = np.int32(
    np.asarray(np.float32(MAX_DIST)).view(np.int32) & ~np.int32(0xFF)
)


def _mxu_kernel(*refs):
    """One ray tile vs all triangle tiles; everything VMEM-resident.

    Layouts are transposed so the lane (last, 128-wide) axis is rays:
    ``ecat [6, 3Tp]``, ``pnd [21, 2Tp]``, ``blocks [B, 8]``,
    ``q4 [4, R]``, ``d [3, R]``; outputs ``[1, R]``.  The ray-side
    matmul operands are rebuilt per visited block about its AABB
    centroid (precision design, module docstring).

    Two-level culling: before paying the matmuls for triangle block j,
    the tile slab-tests its rays against block j's AABB and skips the
    whole block when no live ray can find a closer hit inside it - the
    dense, branch-light TPU equivalent of tree traversal.  Coherent
    tiles (camera / shadow rays) skip most of the scene.  Multi-block
    grids additionally visit blocks front-to-back per tile (scalar
    prefetch ``perm``) and STOP once every lane's best hit is closer
    than a conservative lower bound on any remaining block's entry
    distance - per-tile early termination, which is what makes the
    visit order pay (callers sort rays by (direction octant, origin
    Morton) so tiles are coherent; see pathtracer.trace)."""
    import jax.lax as lax

    refs = list(refs)
    perm_ref = lodist_ref = None
    if len(refs) > 7:  # multi-block: two scalar-prefetch operands first
        perm_ref = refs.pop(0)   # [G, B] int32 per-tile visit order
        lodist_ref = refs.pop(0)  # [G, B] f32 dist lower bound, perm order
    (ecat_ref, pnd_ref, blocks_ref,
     q4_ref, d_ref, best_t_ref, best_i_ref) = refs
    pid = pl.program_id(0)

    q4 = q4_ref[:]  # [4, R]
    d = d_ref[:]  # [3, R]
    r = q4.shape[-1]
    tp = ecat_ref.shape[-1] // 3
    tri_tile = min(TRI_TILE, tp)
    num_tiles = tp // tri_tile
    row_idx = lax.broadcasted_iota(jnp.int32, (tri_tile, r), 0)

    def dot_bf16(a, b):
        # single-pass bf16 MXU dot; both operand stacks carry split-bf16
        # rows (build_edge_lhs/rhs, build_pnd/nd_rhs) so the products
        # recover ~2^-16 relative accuracy at one pass
        return lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    o3 = q4[:3]  # [3, R] origins
    tiny = 1e-12
    d_safe = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    inv_d = 1.0 / d_safe  # [3, R]

    # packed (t | row) int32 key: the low 8 mantissa bits carry the
    # in-block row, so ONE min reduction yields both the closest t and
    # its triangle (relative t error 3e-5 - far below MIN_HIT_DIST)
    best_key = jnp.full((1, r), _MAXKEY, jnp.int32)
    best_blk = jnp.zeros((1, r), jnp.int32)

    def intersect_block(j, best_key, best_blk):
        # per-block local frame: rebuild the ray-side operands about the
        # block's AABB centroid so bf16 truncation error scales with the
        # block extent, not the scene extent (module docstring)
        c = block_centroid(blocks_ref, j)
        oc = jnp.concatenate(
            [o3[k : k + 1] - c[k] for k in range(3)], axis=0
        )  # [3, R]
        sl3 = pl.ds(pl.multiple_of(j * 3 * tri_tile, 128), 3 * tri_tile)
        w = dot_bf16(
            build_edge_lhs(ecat_ref[:, sl3]).T, build_edge_rhs(d, oc)
        )  # [3TT, R]
        w1 = w[0:tri_tile]
        w2 = w[tri_tile : 2 * tri_tile]
        w3 = w[2 * tri_tile : 3 * tri_tile]
        wmin = jnp.minimum(jnp.minimum(w1, w2), w3)
        wmax = jnp.maximum(jnp.maximum(w1, w2), w3)
        inside = (wmin >= 0) | (wmax <= 0)
        q4c = jnp.concatenate([oc, jnp.ones_like(oc[0:1])], axis=0)  # [4, R]
        slnd = pl.ds(pl.multiple_of(j * 2 * tri_tile, 128), 2 * tri_tile)
        nd_out = dot_bf16(pnd_ref[:, slnd].T, build_nd_rhs(q4c, d))  # [2TT, R]
        num = nd_out[:tri_tile]
        den = nd_out[tri_tile:]
        t = num * refined_recip(den)
        # scale-aware self-hit epsilon (block_bounds col 6; see
        # build_tri_features) - the split-bf16 t band grows with scene
        # scale, so a fixed cutoff would leak self-hits on big scenes.
        # den == 0 rides the reciprocal's inf/nan semantics.
        eps = jnp.maximum(blocks_ref[j, 6], MIN_HIT_DIST)
        valid = inside & (t > eps)
        t = jnp.where(valid, t, MAX_DIST)
        key = (pltpu.bitcast(t, jnp.int32) & jnp.int32(~0xFF)) | row_idx
        kmin = jnp.min(key, axis=0, keepdims=True)  # [1, R]
        better = kmin < best_key
        best_key = jnp.where(better, kmin, best_key)
        best_blk = jnp.where(better, j, best_blk)
        return best_key, best_blk

    def finish(best_key, best_blk):
        best_t = pltpu.bitcast(best_key & jnp.int32(~0xFF), jnp.float32)
        best_i = best_blk * tri_tile + (best_key & jnp.int32(0xFF))
        hit = best_t < MAX_DIST * 0.999
        best_t_ref[:] = jnp.where(hit, best_t, MAX_DIST)
        best_i_ref[:] = jnp.where(hit, best_i, 0)

    if num_tiles == 1:
        best_key, best_blk = intersect_block(0, best_key, best_blk)
        finish(best_key, best_blk)
        return

    def body(state):
        jj, best_key, best_blk = state
        j = perm_ref[pid, jj]
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
        best_t = pltpu.bitcast(best_key & jnp.int32(~0xFF), jnp.float32)
        live = (tmax >= tmin) & (tmax >= 0.0) & (tmin <= best_t)
        best_key, best_blk = lax.cond(
            jnp.any(live),
            lambda bk, bb: intersect_block(j, bk, bb),
            lambda bk, bb: (bk, bb),
            best_key,
            best_blk,
        )
        return jj + 1, best_key, best_blk

    def cond(state):
        jj, best_key, _ = state
        # visit order is ascending centroid distance; lodist[jj] is a
        # lower bound on every REMAINING block's slab entry distance, so
        # once all lanes hold a closer hit nothing ahead can matter.
        # `&` does not short-circuit: clamp jj so the exhausted-tile case
        # (jj == num_tiles) never reads one past the [G, B] SMEM table.
        best_t = pltpu.bitcast(best_key & jnp.int32(~0xFF), jnp.float32)
        lo = lodist_ref[pid, jnp.minimum(jj, num_tiles - 1)]
        return (jj < num_tiles) & (jnp.max(best_t) >= lo)

    _, best_key, best_blk = lax.while_loop(cond, body, (0, best_key, best_blk))
    finish(best_key, best_blk)


# multi-block kernels carry [grid_tiles, B] visit-order tables in SMEM
# (~1 MB total); cap the grid per pallas_call and chunk bigger batches
_MAX_GRID_TILES = 128


def trace_mxu_pallas(feats: TriFeatures, ray_o, ray_d, *, interpret: bool = False) -> Hit:
    """Fused-kernel closest hit (TPU).  Equivalent to :func:`trace_mxu`.
    ``interpret=True`` runs the kernel in the Pallas interpreter so tests
    validate it off-TPU."""
    n = ray_o.shape[0]

    tp0 = feats.edges.shape[-1]
    if tp0 > TRI_TILE and n > _MAX_GRID_TILES * RAY_TILE_MULTI:
        # chunk huge multi-block batches (e.g. 1024^2 primaries): the
        # per-tile SMEM visit tables scale with the grid and overflow
        # past ~1 MB otherwise
        step = _MAX_GRID_TILES * RAY_TILE_MULTI
        parts = [
            trace_mxu_pallas(
                feats, ray_o[i : i + step], ray_d[i : i + step],
                interpret=interpret,
            )
            for i in range(0, n, step)
        ]
        return Hit(
            t=jnp.concatenate([h.t for h in parts]),
            tri=jnp.concatenate([h.tri for h in parts]),
            hit=jnp.concatenate([h.hit for h in parts]),
        )

    tp = feats.edges.shape[-1]
    multi = tp > TRI_TILE
    ray_tile = RAY_TILE_MULTI if multi else RAY_TILE

    np_pad = (-n) % ray_tile
    q4 = jnp.concatenate(
        [ray_o, jnp.ones_like(ray_o[:, :1])], axis=-1
    )  # [N, 4]
    q4 = jnp.pad(q4, ((0, np_pad), (0, 0))).T  # [4, Np]
    d = jnp.pad(ray_d, ((0, np_pad), (0, 0))).T  # [3, Np]
    n_pad = n + np_pad

    t_pad = (-tp) % min(TRI_TILE, tp) if tp >= TRI_TILE else 0
    edges = jnp.pad(feats.edges_c, ((0, 0), (0, 0), (0, t_pad)))
    plane = jnp.pad(feats.plane_c, ((0, 0), (0, t_pad)))
    nd = jnp.pad(feats.normal_d, ((0, 0), (0, t_pad)))
    blocks = feats.block_bounds
    tpp = tp + t_pad
    tri_tile = min(TRI_TILE, tpp)
    num_tiles = tpp // tri_tile
    ecat = build_ecat(edges, num_tiles, tri_tile)
    pnd = build_pnd(plane, nd, num_tiles, tri_tile)

    grid = (n_pad // ray_tile,)
    # index maps take *_ because the multi-block path adds scalar-prefetch
    # operands, which PrefetchScalarGridSpec passes to every index_map
    full = lambda *shape: pl.BlockSpec(shape, lambda i, *_: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    ray_spec = lambda k: pl.BlockSpec((k, ray_tile), lambda i, *_: (0, i),
                                      memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ray_tile), lambda i, *_: (0, i),
                            memory_space=pltpu.VMEM)

    in_specs = [
        full(6, 3 * tpp),
        full(21, 2 * tpp),
        full(*blocks.shape),
        ray_spec(4),
        ray_spec(3),
    ]
    out_shape = (
        jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
    )
    operands = [ecat, pnd, blocks, q4, d]

    if multi:
        # per-tile front-to-back visit order + a conservative lower
        # bound on the slab entry distance of each visited-or-later
        # block.  With unit ray directions, a block's entry distance is
        # at least ||tile centroid - block centroid|| - r_block - r_tile;
        # the suffix-min over the visit order makes lodist[jj] a bound
        # for EVERYTHING not yet visited, enabling early exit the moment
        # every lane's best hit is closer.
        g_tiles = n_pad // ray_tile
        o_t = q4[:3].T.reshape(g_tiles, ray_tile, 3)
        c_tile = o_t.mean(axis=1)  # [G, 3]
        r_tile = jnp.sqrt(
            jnp.max(jnp.sum((o_t - c_tile[:, None]) ** 2, axis=-1), axis=1)
        )  # [G]
        c_box = 0.5 * (blocks[:, :3] + blocks[:, 3:6])  # [B, 3]
        r_box = 0.5 * jnp.sqrt(
            jnp.sum((blocks[:, 3:6] - blocks[:, :3]) ** 2, axis=-1)
        )  # [B]
        dc = jnp.sqrt(
            jnp.sum((c_tile[:, None, :] - c_box[None, :, :]) ** 2, axis=-1)
        )  # [G, B]
        perm = jnp.argsort(dc, axis=1).astype(jnp.int32)
        bound = (
            jnp.take_along_axis(dc - r_box[None, :], perm, axis=1)
            - r_tile[:, None]
        )
        # suffix min: bound for every block at or after visit position jj
        lodist = jnp.flip(
            jax.lax.cummin(jnp.flip(bound, axis=1), axis=1), axis=1
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=(out_spec, out_spec),
        )
        best_t, best_i = pl.pallas_call(
            _mxu_kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(perm, lodist, *operands)
    else:
        best_t, best_i = pl.pallas_call(
            _mxu_kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=(out_spec, out_spec),
            out_shape=out_shape,
            interpret=interpret,
        )(*operands)

    best_t = best_t[0, :n]
    best_i = best_i[0, :n]
    return Hit(t=best_t, tri=best_i, hit=best_t < MAX_DIST)
