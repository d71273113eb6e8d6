"""Correct per-piece profile: all operands passed as jit ARGS (closures
over device arrays re-upload as embedded constants over the axon
tunnel), and the slab test laid out rays-on-lanes."""
import functools
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.lax as lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from ensem3a_openclraytracer_tpu.ops.geometry import MAX_DIST, MIN_HIT_DIST
from ensem3a_openclraytracer_tpu.ops.intersect_mxu import (
    _MAXKEY, build_tri_features,
)
from ensem3a_openclraytracer_tpu.scene.objloader import load_obj
from ensem3a_openclraytracer_tpu.scene.scene import morton_order
from experiments.proto_compact import build_comb_blocks, _pair_kernel

RT, K = 1024, 4


def _drain(out):
    """Force real completion: plain block_until_ready can return early
    over the tunneled backend (see bench.py _time)."""
    leaves = jax.tree.leaves(out)
    for x in leaves:
        float(jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.float32 else x))
    return out


def timeit(f, *a, runs=5):
    _drain(f(*a))
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        _drain(f(*a))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


mesh = load_obj("/root/reference/ObjFiles/Cornell box_Monkey.obj")
fd = mesh.face_data
v0, v1, v2 = mesh.v_p[fd[:, 7]], mesh.v_p[fd[:, 8]], mesh.v_p[fd[:, 9]]
order = morton_order(v0, v1, v2)
v0, v1, v2 = v0[order], v1[order], v2[order]
feats = build_tri_features(v0, v1, v2)
comb = build_comb_blocks(feats)
bb = feats.block_bounds
nb = comb.shape[0]
tri_tile = comb.shape[-1] // 5

rng = np.random.default_rng(0)
n = 65536
ti = rng.integers(0, len(v0), n)
r1, r2 = rng.random(n), rng.random(n)
s = np.sqrt(r1)
p = (v0[ti] * (1 - s)[:, None] + v1[ti] * (s * (1 - r2))[:, None]
     + v2[ti] * (s * r2)[:, None])
d = rng.normal(size=(n, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
o = jnp.asarray(p + 1e-4 * d, jnp.float32)
d = jnp.asarray(d, jnp.float32)

q_slots = n * K + nb * RT
n_tiles = q_slots // RT


@jax.jit
def pre(o, d, bb):
    """Rays-on-lanes slab: [B, N] intermediates, no 3-on-lanes padding."""
    oT = o.T  # [3, N]
    dT = d.T
    tiny = 1e-12
    ds = jnp.where(jnp.abs(dT) < tiny, jnp.where(dT < 0, -tiny, tiny), dT)
    inv = 1.0 / ds  # [3, N]
    tmin = jnp.full((nb, n), -jnp.inf, jnp.float32)
    tmax = jnp.full((nb, n), jnp.inf, jnp.float32)
    for k in range(3):
        t1 = (bb[:, k][:, None] - oT[k][None]) * inv[k][None]  # [B, N]
        t2 = (bb[:, 3 + k][:, None] - oT[k][None]) * inv[k][None]
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
    hit = (tmax >= tmin) & (tmax >= 0.0)  # [B, N]
    entry = jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)
    # per-ray front-to-back order: sort along the SUBLANE axis of [B, N]?
    # lax.sort sorts the minor-most axis, so transpose to [N, B] first.
    entryT = entry.T
    es, perm = lax.sort(
        (entryT, lax.broadcasted_iota(jnp.int32, entryT.shape, 1)),
        num_keys=1,
    )
    counts = jnp.sum(hit, axis=0).astype(jnp.int32)  # [N]
    return es, perm, counts


print("pre(slab+sort):", timeit(pre, o, d, bb) * 1e3, "ms")
es, perm, counts = jax.block_until_ready(pre(o, d, bb))

ptr0 = jnp.zeros(n, jnp.int32)
bk0 = jnp.full(n, _MAXKEY, jnp.int32)
o_pad = jnp.pad(o, ((0, 1), (0, 0))).T
d_pad = jnp.pad(d, ((0, 1), (0, 0))).T
ridx = jnp.arange(n, dtype=jnp.int32)


@jax.jit
def take_pairs(perm, es, counts, ptr, best_key):
    best_t = lax.bitcast_convert_type(best_key & jnp.int32(~0xFF), jnp.float32)
    jj = jnp.minimum(ptr[:, None] + jnp.arange(K, dtype=jnp.int32)[None], nb - 1)
    pb = jnp.take_along_axis(perm, jj, axis=1)
    pe = jnp.take_along_axis(es, jj, axis=1)
    in_range = (ptr[:, None] + jnp.arange(K)[None]) < counts[:, None]
    valid = in_range & (pe < best_t[:, None])
    return pb, valid


print("take_pairs:", timeit(take_pairs, perm, es, counts, ptr0, bk0) * 1e3, "ms")
pb, valid = jax.block_until_ready(take_pairs(perm, es, counts, ptr0, bk0))


@jax.jit
def sort_pairs(pb, valid):
    pb_flat = jnp.where(valid, pb, nb).reshape(-1)
    rid_flat = jnp.broadcast_to(ridx[:, None], (n, K)).reshape(-1)
    return lax.sort((pb_flat, rid_flat), num_keys=1)


print("sort_pairs:", timeit(sort_pairs, pb, valid) * 1e3, "ms")
pb_sorted, rid_sorted = jax.block_until_ready(sort_pairs(pb, valid))


@jax.jit
def scatter_queue(pb, valid, pb_sorted, rid_sorted):
    pb_flat = jnp.where(valid, pb, nb).reshape(-1)
    cnt = jnp.zeros(nb + 1, jnp.int32).at[pb_flat].add(1)[:nb]
    padded = ((cnt + (RT - 1)) // RT) * RT
    pad_start = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(padded)])
    raw_start = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(cnt)])
    pos = jnp.arange(n * K, dtype=jnp.int32)
    within = pos - raw_start[jnp.minimum(pb_sorted, nb - 1)]
    qpos = jnp.where(pb_sorted < nb,
                     pad_start[jnp.minimum(pb_sorted, nb - 1)] + within,
                     q_slots)
    queue_rid = jnp.full(q_slots + 1, n, jnp.int32).at[qpos].set(rid_sorted)[:q_slots]
    tile_start = jnp.arange(n_tiles, dtype=jnp.int32) * RT
    tile_blk = jnp.clip(jnp.searchsorted(pad_start, tile_start, side="right") - 1,
                        0, nb - 1).astype(jnp.int32)
    tile_live = (tile_start < pad_start[tile_blk] + cnt[tile_blk]).astype(jnp.int32)
    return queue_rid, tile_blk, tile_live


print("scatter_queue:", timeit(scatter_queue, pb, valid, pb_sorted, rid_sorted) * 1e3, "ms")
queue_rid, tile_blk, tile_live = jax.block_until_ready(
    scatter_queue(pb, valid, pb_sorted, rid_sorted))
print("live tiles:", int(tile_live.sum()), "of", n_tiles)


@jax.jit
def gather_rays(o_pad, d_pad, queue_rid):
    return o_pad[:, queue_rid], d_pad[:, queue_rid]


print("gather_rays:", timeit(gather_rays, o_pad, d_pad, queue_rid) * 1e3, "ms")
o_q, d_q = jax.block_until_ready(gather_rays(o_pad, d_pad, queue_rid))

kernel = functools.partial(_pair_kernel, tri_tile=tri_tile)
grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=2, grid=(n_tiles,),
    in_specs=[
        pl.BlockSpec((1, 39, 5 * tri_tile), lambda s, lr, br: (br[s], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(bb.shape, lambda s, lr, br: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, RT), lambda s, lr, br: (0, s),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, RT), lambda s, lr, br: (0, s),
                     memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((1, RT), lambda s, lr, br: (0, s),
                           memory_space=pltpu.VMEM),
)
pallas_fn = jax.jit(pl.pallas_call(
    kernel, grid_spec=grid_spec,
    out_shape=jax.ShapeDtypeStruct((1, q_slots), jnp.int32),
))
print("pair kernel:", timeit(
    pallas_fn, tile_live, tile_blk, comb, bb, o_q, d_q) * 1e3, "ms")
keys = jax.block_until_ready(pallas_fn(tile_live, tile_blk, comb, bb, o_q, d_q))[0]


@jax.jit
def combine(keys, queue_rid, tile_blk, best_key):
    cand = jnp.full(n + 1, _MAXKEY, jnp.int32).at[queue_rid].min(keys)
    cand = cand[:n]
    is_win = (keys == cand[jnp.minimum(queue_rid, n - 1)]) & (
        queue_rid < n) & (keys < _MAXKEY)
    cand_blk = jnp.zeros(n + 1, jnp.int32).at[
        jnp.where(is_win, queue_rid, n)].max(
        jnp.repeat(tile_blk, RT))[:n]
    better = cand < best_key
    return jnp.minimum(cand, best_key), cand_blk, better


print("combine:", timeit(combine, keys, queue_rid, tile_blk, bk0) * 1e3, "ms")
