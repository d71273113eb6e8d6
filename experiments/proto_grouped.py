"""Prototype: grouped-pair trace kernel micro-benchmark on real TPU.

Compares, on the Monkey scene with synthetic bounce-like rays:
  1. trace_mxu_pallas (current multi-block while/cond kernel)
  2. grouped-pair kernel (flat grid over (ray-tile, block) pairs,
     scalar-prefetch indirection, output revisiting, early exit)

Run: python experiments/proto_grouped.py [--cpu]
"""
import functools
import sys
import time

import numpy as np

import jax
import jax.lax as lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ensem3a_openclraytracer_tpu.ops.geometry import MAX_DIST, MIN_HIT_DIST
from ensem3a_openclraytracer_tpu.ops.intersect_mxu import (
    _MAXKEY, TRI_TILE, build_ecat, build_pnd, build_nd_rhs,
    build_tri_features, trace_mxu_pallas, trace_mxu,
)
from ensem3a_openclraytracer_tpu.ops.fused import coherent_order
from ensem3a_openclraytracer_tpu.scene.objloader import load_obj
from ensem3a_openclraytracer_tpu.scene.scene import morton_order

INTERPRET = "--cpu" in sys.argv
RT = 1024  # ray tile


def build_comb_blocks(feats):
    """[B, 27, 5TT] per-block merged operand."""
    tp = feats.edges.shape[-1]
    tt = min(TRI_TILE, tp)
    nb = tp // tt
    ecat = build_ecat(feats.edges, nb, tt)      # [6, nb*3TT]
    pnd = build_pnd(feats.plane, feats.normal_d, nb, tt)  # [21, nb*2TT]
    e = ecat.reshape(6, nb, 3 * tt).transpose(1, 0, 2)    # [nb, 6, 3TT]
    p = pnd.reshape(21, nb, 2 * tt).transpose(1, 0, 2)    # [nb, 21, 2TT]
    top = jnp.concatenate([e, jnp.zeros((nb, 6, 2 * tt), jnp.float32)], axis=2)
    bot = jnp.concatenate([jnp.zeros((nb, 21, 3 * tt), jnp.float32), p], axis=2)
    return jnp.concatenate([top, bot], axis=1)  # [nb, 27, 5TT]


def _grouped_kernel(tile_r, blk_r, first_r, lod_r, comb_ref, rf_ref,
                    key_ref, blk_out_ref, *, tri_tile):
    s = pl.program_id(0)
    r = rf_ref.shape[-1]

    @pl.when(first_r[s] == 1)
    def _():
        key_ref[:] = jnp.full((1, r), _MAXKEY, jnp.int32)
        blk_out_ref[:] = jnp.zeros((1, r), jnp.int32)

    best_t = pltpu.bitcast(key_ref[:] & jnp.int32(~0xFF), jnp.float32)
    run = jnp.max(best_t) >= lod_r[s]

    @pl.when(run)
    def _():
        out = lax.dot_general(
            comb_ref[0], rf_ref[:], (((0,), (0,)), ((), ())),
            precision=lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )  # [5TT, R]
        w1 = out[0:tri_tile]
        w2 = out[tri_tile:2 * tri_tile]
        w3 = out[2 * tri_tile:3 * tri_tile]
        num = out[3 * tri_tile:4 * tri_tile]
        den = out[4 * tri_tile:5 * tri_tile]
        wmin = jnp.minimum(jnp.minimum(w1, w2), w3)
        wmax = jnp.maximum(jnp.maximum(w1, w2), w3)
        inside = (wmin >= 0) | (wmax <= 0)
        t = num / jnp.where(den == 0.0, 1.0, den)
        valid = inside & (den != 0.0) & (t > MIN_HIT_DIST)
        t = jnp.where(valid, t, MAX_DIST)
        row_idx = lax.broadcasted_iota(jnp.int32, (tri_tile, r), 0)
        key = (pltpu.bitcast(t, jnp.int32) & jnp.int32(~0xFF)) | row_idx
        kmin = jnp.min(key, axis=0, keepdims=True)
        better = kmin < key_ref[:]
        blk_out_ref[:] = jnp.where(better, blk_r[s], blk_out_ref[:])
        key_ref[:] = jnp.where(better, kmin, key_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def trace_grouped(comb, block_bounds, ray_o, ray_d, interpret=False):
    n = ray_o.shape[0]
    nb = comb.shape[0]
    tri_tile = comb.shape[-1] // 5

    order = coherent_order(ray_o, ray_d)
    o = ray_o[order]
    d = ray_d[order]

    pad = (-n) % RT
    np_ = n + pad
    g = np_ // RT
    o_p = jnp.pad(o, ((0, pad), (0, 0)))
    d_p = jnp.pad(d, ((0, pad), (0, 0)), constant_values=0.0)

    # ray features [27, Np]
    dxo = jnp.cross(d_p, o_p)
    r6 = jnp.concatenate([d_p, dxo], axis=-1).T
    q4 = jnp.concatenate([o_p, jnp.ones_like(o_p[:, :1])], axis=-1).T
    rf = jnp.concatenate([r6, build_nd_rhs(q4, d_p.T)], axis=0)  # [27, Np]

    # per-ray slab tests -> per-tile (mask, tmin) [G, B]
    tiny = 1e-12
    d_safe = jnp.where(jnp.abs(d_p) < tiny, jnp.where(d_p < 0, -tiny, tiny), d_p)
    inv = 1.0 / d_safe
    lo = block_bounds[:, :3]
    hi = block_bounds[:, 3:6]
    t1 = (lo[None] - o_p[:, None]) * inv[:, None]  # [Np, B, 3]
    t2 = (hi[None] - o_p[:, None]) * inv[:, None]
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    ray_live = jnp.arange(np_) < n
    hit = (tmax >= tmin) & (tmax >= 0.0) & ray_live[:, None]  # [Np, B]
    entry = jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)
    entry_t = jnp.min(entry.reshape(g, RT, nb), axis=1)  # [G, B]
    hit_t = jnp.any(hit.reshape(g, RT, nb), axis=1)  # [G, B]

    # front-to-back visit order per tile + compaction to pair lists
    perm = jnp.argsort(jnp.where(hit_t, entry_t, jnp.inf), axis=1)  # [G, B]
    counts = jnp.maximum(jnp.sum(hit_t, axis=1), 1)  # >=1 so out init happens
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(counts).astype(jnp.int32)])
    s_total = g * nb
    sidx = jnp.arange(s_total, dtype=jnp.int32)
    gid = jnp.searchsorted(offsets, sidx, side="right").astype(jnp.int32) - 1
    gid = jnp.clip(gid, 0, g - 1)
    j = sidx - offsets[gid]
    live_pair = sidx < offsets[g]
    blk = perm[gid, j].astype(jnp.int32)
    lod = entry_t[gid, blk]
    # tiles forced to >=1 pair: if the tile had 0 hits, lod=inf -> no run
    lod = jnp.where(live_pair, lod, jnp.inf)
    first = (jnp.concatenate([jnp.ones((1,), jnp.int32),
                              (gid[1:] != gid[:-1]).astype(jnp.int32)])
             * live_pair.astype(jnp.int32))
    # dead pairs: park on the last tile (no DMA churn, no output writes)
    tile_ids = jnp.where(live_pair, gid, g - 1)
    blk = jnp.where(live_pair, blk, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(s_total,),
        in_specs=[
            pl.BlockSpec((1, 27, 5 * tri_tile),
                         lambda s, tile_r, blk_r, first_r, lod_r: (blk_r[s], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27, RT),
                         lambda s, tile_r, blk_r, first_r, lod_r: (0, tile_r[s]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, RT),
                         lambda s, tile_r, blk_r, first_r, lod_r: (0, tile_r[s]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RT),
                         lambda s, tile_r, blk_r, first_r, lod_r: (0, tile_r[s]),
                         memory_space=pltpu.VMEM),
        ),
    )
    keys, blks = pl.pallas_call(
        functools.partial(_grouped_kernel, tri_tile=tri_tile),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((1, np_), jnp.int32),
            jax.ShapeDtypeStruct((1, np_), jnp.int32),
        ),
        interpret=interpret,
    )(tile_ids, blk, first, lod, comb, rf)

    keys = keys[0, :n]
    blks = blks[0, :n]
    t = lax.bitcast_convert_type(keys & jnp.int32(~0xFF), jnp.float32)
    tri = blks * tri_tile + (keys & jnp.int32(0xFF))
    hitm = t < MAX_DIST * 0.999
    # unsort
    inv_order = jnp.zeros_like(order).at[order].set(jnp.arange(n))
    return (jnp.where(hitm, t, MAX_DIST)[inv_order],
            jnp.where(hitm, tri, 0)[inv_order], hitm[inv_order],
            jnp.sum(counts))


def main():
    mesh = load_obj("/root/reference/ObjFiles/Cornell box_Monkey.obj")
    fd = mesh.face_data
    v0, v1, v2 = mesh.v_p[fd[:, 7]], mesh.v_p[fd[:, 8]], mesh.v_p[fd[:, 9]]
    order = morton_order(v0, v1, v2)
    v0, v1, v2 = v0[order], v1[order], v2[order]
    feats = build_tri_features(v0, v1, v2)
    comb = build_comb_blocks(feats)
    print("tris", len(v0), "blocks", comb.shape[0])

    rng = np.random.default_rng(0)
    n = 65536 if not INTERPRET else 2048
    ti = rng.integers(0, len(v0), n)
    r1, r2 = rng.random(n), rng.random(n)
    s = np.sqrt(r1)
    p = v0[ti] * (1 - s)[:, None] + v1[ti] * (s * (1 - r2))[:, None] + v2[ti] * (s * r2)[:, None]
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # offset origins slightly along direction to mimic bounce rays
    o = jnp.asarray(p + 1e-4 * d, jnp.float32)
    d = jnp.asarray(d, jnp.float32)

    t_g, tri_g, hit_g, pairs = trace_grouped(comb, feats.block_bounds, o, d,
                                             interpret=INTERPRET)
    jax.block_until_ready(t_g)
    print("pairs:", int(pairs), "of", (n // RT) * comb.shape[0])

    # correctness vs trace_mxu (scan reference)
    ref = trace_mxu(feats, o, d) if INTERPRET else trace_mxu_pallas(feats, o, d)
    ok_hit = np.array_equal(np.asarray(hit_g), np.asarray(ref.hit))
    tg, tr = np.asarray(t_g), np.asarray(ref.t)
    # packed keys stomp 8 mantissa bits -> compare loosely
    close = np.allclose(tg[np.asarray(hit_g)], tr[np.asarray(hit_g)], rtol=1e-4)
    print("hit match:", ok_hit, "t close:", close,
          "mismatch:", int((np.asarray(hit_g) != np.asarray(ref.hit)).sum()))

    if INTERPRET:
        return

    def timeit(f, *a, runs=5):
        f(*a)
        out = f(*a)
        jax.block_until_ready(out)
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            out = f(*a)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    f_g = jax.jit(lambda o, d: trace_grouped(comb, feats.block_bounds, o, d)[0])
    f_c = jax.jit(lambda o, d: trace_mxu_pallas(feats, o, d).t)
    tg = timeit(f_g, o, d)
    tc = timeit(f_c, o, d)
    print(f"grouped: {tg*1e3:.3f} ms  current: {tc*1e3:.3f} ms  speedup {tc/tg:.2f}x")
    print(f"grouped Mrays/s: {n/tg/1e6:.1f}  current: {n/tc/1e6:.1f}")


if __name__ == "__main__":
    main()
