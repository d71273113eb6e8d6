"""Pair-compaction closest-hit engine: per-ray block culling at any
scene size.

``trace_mxu_pallas`` (ops/intersect_mxu.py) keeps the whole scene's
intersection features VMEM-resident, which caps it at ~65k triangles -
and its per-(ray-tile, block) culling visits the UNION of every block
any of the tile's 1024 rays needs.  This engine removes both limits:

  * **HBM-streamed blocks.**  The kernel's grid runs over (ray-tile,
    block) PAIRS; each step DMAs exactly one block's merged operand
    ``[39, 5*TT]`` from HBM by a scalar-prefetched index.  VMEM holds
    one block at a time - scene size is unbounded (SURVEY.md section 7
    stage 4's "Pallas kernel for the hot path", replacing the
    reference's stack traversal MathLib.cl:234-288 + stack.cl).
  * **Per-ray compaction.**  An XLA ``while_loop`` runs front-to-back
    rounds: each round takes the next K unvisited slab-passing blocks
    per still-live ray, groups the (ray, block) pairs by block (one
    262k-element sort + scatter into RT-padded per-block queues), runs
    the flat pair kernel, and scatter-mins packed ``(t | row)`` keys
    back per ray.  A ray retires once its best t beats the entry
    distance of its next unvisited block - entries are visited in
    ascending order, so everything later is farther.  Correct by
    construction: no caps, no dropped pairs.

Precision: the same block-recentered split-bf16 scheme as the resident
kernels (ops/intersect_mxu.py precision notes) - the kernel rebuilds
the ray-side operand about each block's AABB centroid in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ensem3a_openclraytracer_tpu.ops.geometry import MAX_DIST, MIN_HIT_DIST
from ensem3a_openclraytracer_tpu.ops.intersect import Hit
from ensem3a_openclraytracer_tpu.ops.intersect_mxu import (
    _MAXKEY,
    TRI_TILE,
    TriFeatures,
    block_centroid,
    build_ecat,
    build_edge_lhs,
    build_edge_rhs,
    build_nd_rhs,
    build_pnd,
)

RAY_TILE = 1024  # pair-queue lanes per kernel step
K_PER_ROUND = 8  # blocks visited per live ray per round
# [N, B] slab/visit-order intermediates cap: chunk bigger ray batches
MAX_RAYS_PER_CALL = 131072


def build_comb_blocks(feats: TriFeatures) -> jnp.ndarray:
    """``[B, 39, 5*TT]`` per-block merged operand: rows 0-17 the
    split-bf16 edge lhs (pairs :func:`build_edge_rhs`), rows 18-38 the
    split num/den table (pairs :func:`build_nd_rhs`)."""
    tp = feats.edges_c.shape[-1]
    tt = min(TRI_TILE, tp)
    nb = tp // tt
    ecat = build_ecat(feats.edges_c, nb, tt)
    pnd = build_pnd(feats.plane_c, feats.normal_d, nb, tt)
    e = build_edge_lhs(ecat).reshape(18, nb, 3 * tt).transpose(1, 0, 2)
    p = pnd.reshape(21, nb, 2 * tt).transpose(1, 0, 2)
    top = jnp.concatenate(
        [e, jnp.zeros((nb, 18, 2 * tt), jnp.float32)], axis=2
    )
    bot = jnp.concatenate(
        [jnp.zeros((nb, 21, 3 * tt), jnp.float32), p], axis=2
    )
    return jnp.concatenate([top, bot], axis=1)


def _pair_kernel(live_r, blk_r, comb_ref, blocks_ref, o_ref, d_ref, key_ref,
                 *, tri_tile):
    """One (ray-tile, block) pair: rebuild the recentered ray-side rhs,
    one merged matmul, reduce to packed (t | row) keys."""
    s = pl.program_id(0)
    r = o_ref.shape[-1]
    key_ref[:] = jnp.full((1, r), _MAXKEY, jnp.int32)

    @pl.when(live_r[s] == 1)
    def _():
        j = blk_r[s]
        c = block_centroid(blocks_ref, j)
        o = o_ref[:]
        d = d_ref[:]
        oc = jnp.concatenate(
            [o[k : k + 1] - c[k] for k in range(3)], axis=0
        )
        q4c = jnp.concatenate([oc, jnp.ones_like(oc[0:1])], axis=0)
        rhs = jnp.concatenate(
            [build_edge_rhs(d, oc), build_nd_rhs(q4c, d)], axis=0
        )  # [39, R]
        comb_j = comb_ref[0]
        out = lax.dot_general(
            comb_j, rhs.astype(comb_j.dtype), (((0,), (0,)), ((), ())),
            precision=lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )  # [5TT, R]
        w1 = out[0:tri_tile]
        w2 = out[tri_tile : 2 * tri_tile]
        w3 = out[2 * tri_tile : 3 * tri_tile]
        num = out[3 * tri_tile : 4 * tri_tile]
        den = out[4 * tri_tile : 5 * tri_tile]
        wmin = jnp.minimum(jnp.minimum(w1, w2), w3)
        wmax = jnp.maximum(jnp.maximum(w1, w2), w3)
        inside = (wmin >= 0) | (wmax <= 0)
        t = num / jnp.where(den == 0.0, 1.0, den)
        # scale-aware self-hit epsilon (block_bounds col 6)
        eps = jnp.maximum(blocks_ref[j, 6], MIN_HIT_DIST)
        valid = inside & (den != 0.0) & (t > eps)
        t = jnp.where(valid, t, MAX_DIST)
        row_idx = lax.broadcasted_iota(jnp.int32, (tri_tile, r), 0)
        key = (pltpu.bitcast(t, jnp.int32) & jnp.int32(~0xFF)) | row_idx
        key_ref[:] = jnp.min(key, axis=0, keepdims=True)


def _trace_compact_chunk(comb, block_bounds, ray_o, ray_d, interpret):
    n = ray_o.shape[0]
    nb = comb.shape[0]
    tri_tile = comb.shape[-1] // 5
    K = K_PER_ROUND
    RT = RAY_TILE
    # capacity for the worst-case RT-padded per-block queues (sum of
    # counts <= n*K plus < RT padding per block), rounded to full tiles
    q_slots = -(-(n * K + nb * RT) // RT) * RT
    n_tiles = q_slots // RT

    # dump slot N: zero direction -> den 0 -> miss
    o_pad = jnp.pad(ray_o, ((0, 1), (0, 0))).T  # [3, N+1]
    d_pad = jnp.pad(ray_d, ((0, 1), (0, 0))).T

    # slab tests, rays-on-lanes ([B, N] intermediates: a [N, B, 3]
    # layout would pad the 3-axis to 128 lanes and 43x the traffic)
    oT = ray_o.T
    dT = ray_d.T
    tiny = 1e-12
    ds = jnp.where(jnp.abs(dT) < tiny, jnp.where(dT < 0, -tiny, tiny), dT)
    inv = 1.0 / ds
    tmin = jnp.full((nb, n), -jnp.inf, jnp.float32)
    tmax = jnp.full((nb, n), jnp.inf, jnp.float32)
    for k in range(3):
        t1 = (block_bounds[:, k][:, None] - oT[k][None]) * inv[k][None]
        t2 = (block_bounds[:, 3 + k][:, None] - oT[k][None]) * inv[k][None]
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
    hit = (tmax >= tmin) & (tmax >= 0.0)  # [B, N]
    entry = jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)

    # per-ray front-to-back visit order + ascending entries
    entryT = entry.T  # [N, B]
    entry_sorted, perm = lax.sort(
        (entryT, lax.broadcasted_iota(jnp.int32, entryT.shape, 1)),
        num_keys=1,
    )
    counts = jnp.sum(hit, axis=0).astype(jnp.int32)  # [N]

    kernel = functools.partial(_pair_kernel, tri_tile=tri_tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 39, 5 * tri_tile),
                         lambda s, live_r, blk_r: (blk_r[s], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(block_bounds.shape,
                         lambda s, live_r, blk_r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RT), lambda s, live_r, blk_r: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, RT), lambda s, live_r, blk_r: (0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RT), lambda s, live_r, blk_r: (0, s),
                               memory_space=pltpu.VMEM),
    )
    pallas_fn = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, q_slots), jnp.int32),
        interpret=interpret,
    )

    ridx = jnp.arange(n, dtype=jnp.int32)

    def round_body(state):
        best_key, best_blk, ptr, _ = state
        best_t = lax.bitcast_convert_type(
            best_key & jnp.int32(~0xFF), jnp.float32
        )
        # this round's pairs: (ray i, perm[i, ptr+k]) for k < K, pruned
        # front-to-back by entry distance
        jj = jnp.minimum(
            ptr[:, None] + jnp.arange(K, dtype=jnp.int32)[None], nb - 1
        )  # [N, K]
        pb = jnp.take_along_axis(perm, jj, axis=1)
        pe = jnp.take_along_axis(entry_sorted, jj, axis=1)
        in_range = (ptr[:, None] + jnp.arange(K)[None]) < counts[:, None]
        valid = in_range & (pe < best_t[:, None])

        # group by block: stable sort of block ids (invalid -> nb), then
        # scatter into RT-padded per-block queues
        pb_flat = jnp.where(valid, pb, nb).reshape(-1)
        rid_flat = jnp.broadcast_to(ridx[:, None], (n, K)).reshape(-1)
        pb_sorted, rid_sorted = lax.sort((pb_flat, rid_flat), num_keys=1)
        cnt = jnp.zeros(nb + 1, jnp.int32).at[pb_flat].add(1)[:nb]
        padded = ((cnt + (RT - 1)) // RT) * RT
        pad_start = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(padded)]
        )
        raw_start = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(cnt)]
        )
        pos = jnp.arange(n * K, dtype=jnp.int32)
        within = pos - raw_start[jnp.minimum(pb_sorted, nb - 1)]
        qpos = jnp.where(
            pb_sorted < nb,
            pad_start[jnp.minimum(pb_sorted, nb - 1)] + within,
            q_slots,
        )
        queue_rid = jnp.full(q_slots + 1, n, jnp.int32).at[qpos].set(
            rid_sorted
        )[:q_slots]

        tile_start = jnp.arange(n_tiles, dtype=jnp.int32) * RT
        tile_blk = jnp.clip(
            jnp.searchsorted(pad_start, tile_start, side="right") - 1,
            0, nb - 1,
        ).astype(jnp.int32)
        tile_live = (
            tile_start < pad_start[tile_blk] + cnt[tile_blk]
        ).astype(jnp.int32)

        keys = pallas_fn(
            tile_live, tile_blk, comb, block_bounds,
            o_pad[:, queue_rid], d_pad[:, queue_rid],
        )[0]

        # per-ray min + winning-block resolution (ties share t & row, so
        # an arbitrary pick among equal keys is consistent)
        cand = jnp.full(n + 1, _MAXKEY, jnp.int32).at[queue_rid].min(keys)
        cand = cand[:n]
        is_win = (
            (keys == cand[jnp.minimum(queue_rid, n - 1)])
            & (queue_rid < n)
            & (keys < _MAXKEY)
        )
        cand_blk = jnp.zeros(n + 1, jnp.int32).at[
            jnp.where(is_win, queue_rid, n)
        ].max(jnp.repeat(tile_blk, RT))[:n]
        better = cand < best_key
        best_blk = jnp.where(better, cand_blk, best_blk)
        best_key = jnp.minimum(cand, best_key)

        ptr = jnp.minimum(ptr + K, counts)
        best_t = lax.bitcast_convert_type(
            best_key & jnp.int32(~0xFF), jnp.float32
        )
        nxt = jnp.take_along_axis(
            entry_sorted, jnp.minimum(ptr, nb - 1)[:, None], axis=1
        )[:, 0]
        live = (ptr < counts) & (nxt < best_t)
        return best_key, best_blk, ptr, live

    init = (
        jnp.full(n, _MAXKEY, jnp.int32),
        jnp.zeros(n, jnp.int32),
        jnp.zeros(n, jnp.int32),
        counts > 0,
    )
    best_key, best_blk, _, _ = lax.while_loop(
        lambda s: jnp.any(s[3]), round_body, init
    )

    t = lax.bitcast_convert_type(best_key & jnp.int32(~0xFF), jnp.float32)
    tri = best_blk * tri_tile + (best_key & jnp.int32(0xFF))
    hitm = t < MAX_DIST * 0.999
    return Hit(
        t=jnp.where(hitm, t, MAX_DIST),
        tri=jnp.where(hitm, tri, 0),
        hit=hitm,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def trace_compact(
    feats: TriFeatures, ray_o, ray_d, *, interpret: bool = False
) -> Hit:
    """Closest hit of ``[N]`` rays via the pair-compaction engine.
    Equivalent to :func:`ops.intersect_mxu.trace_mxu` up to the packed
    key's low-byte truncation and split-bf16 residuals.  Ray batches
    above :data:`MAX_RAYS_PER_CALL` are chunked host-side (the [N, B]
    visit-order intermediates scale with the batch).

    Consumes the HOST-precomputed ``feats.comb`` operand: building the
    comb transpose/concat chain inside the same jit as the pallas call
    is miscompiled by XLA on TPU v5e (the kernel reads a corrupted
    operand - round 4's 17.9% hardware hit mismatch; see
    ops/pairs.py's module docstring for the bisect)."""
    comb = feats.comb
    if comb is None:
        comb = build_comb_blocks(feats)
    n = ray_o.shape[0]
    if n > MAX_RAYS_PER_CALL:
        parts = [
            _trace_compact_chunk(
                comb, feats.block_bounds,
                ray_o[i : i + MAX_RAYS_PER_CALL],
                ray_d[i : i + MAX_RAYS_PER_CALL],
                interpret,
            )
            for i in range(0, n, MAX_RAYS_PER_CALL)
        ]
        return Hit(
            t=jnp.concatenate([h.t for h in parts]),
            tri=jnp.concatenate([h.tri for h in parts]),
            hit=jnp.concatenate([h.hit for h in parts]),
        )
    return _trace_compact_chunk(
        comb, feats.block_bounds, ray_o, ray_d, interpret
    )
