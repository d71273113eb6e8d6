"""Dump round-1 internals of trace_compact on the TPU and cross-check
each against a numpy emulation."""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import jax.lax as lax

import experiments.proto_compact as pc
from ensem3a_openclraytracer_tpu.ops.intersect_mxu import (
    build_tri_features, build_nd_rhs, _MAXKEY,
)
from ensem3a_openclraytracer_tpu.ops.geometry import MAX_DIST, MIN_HIT_DIST
from ensem3a_openclraytracer_tpu.scene.objloader import load_obj
from ensem3a_openclraytracer_tpu.scene.scene import morton_order

mesh = load_obj("/root/reference/ObjFiles/Cornell box_Monkey.obj")
fd = mesh.face_data
v0, v1, v2 = mesh.v_p[fd[:, 7]], mesh.v_p[fd[:, 8]], mesh.v_p[fd[:, 9]]
order = morton_order(v0, v1, v2)
v0, v1, v2 = v0[order], v1[order], v2[order]
feats = build_tri_features(v0, v1, v2)
comb = pc.build_comb_blocks(feats)
bb = feats.block_bounds
nb = bb.shape[0]
K = 4
RT = 1024
tri_tile = 256

rng = np.random.default_rng(0)
n = 2048
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
def round1(ray_o, ray_d, block_bounds):
    tiny = 1e-12
    d_safe = jnp.where(jnp.abs(ray_d) < tiny,
                       jnp.where(ray_d < 0, -tiny, tiny), ray_d)
    inv = 1.0 / d_safe
    lo = block_bounds[:, :3]
    hi = block_bounds[:, 3:6]
    t1 = (lo[None] - ray_o[:, None]) * inv[:, None]
    t2 = (hi[None] - ray_o[:, None]) * inv[:, None]
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= tmin) & (tmax >= 0.0)
    entry = jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)
    entry_sorted, perm = lax.sort(
        (entry, lax.broadcasted_iota(jnp.int32, entry.shape, 1)), num_keys=1)
    counts = jnp.sum(hit, axis=1).astype(jnp.int32)

    ridx = jnp.arange(n, dtype=jnp.int32)
    ptr = jnp.zeros(n, jnp.int32)
    best_key = jnp.full(n, _MAXKEY, jnp.int32)
    best_t = lax.bitcast_convert_type(best_key & jnp.int32(~0xFF), jnp.float32)

    jj = jnp.minimum(ptr[:, None] + jnp.arange(K, dtype=jnp.int32)[None],
                     nb - 1)
    pb = jnp.take_along_axis(perm, jj, axis=1)
    pe = jnp.take_along_axis(entry_sorted, jj, axis=1)
    in_range = (ptr[:, None] + jnp.arange(K)[None]) < counts[:, None]
    valid = in_range & (pe < best_t[:, None])

    pb_flat = jnp.where(valid, pb, nb).reshape(-1)
    rid_flat = jnp.broadcast_to(ridx[:, None], (n, K)).reshape(-1)
    pb_sorted, rid_sorted = lax.sort((pb_flat, rid_flat), num_keys=1)
    cnt = jnp.zeros(nb + 1, jnp.int32).at[pb_flat].add(1)[:nb]
    padded = ((cnt + (RT - 1)) // RT) * RT
    pad_start = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(padded)])
    raw_start = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(cnt)])
    pos_in_sorted = jnp.arange(n * K, dtype=jnp.int32)
    within = pos_in_sorted - raw_start[jnp.minimum(pb_sorted, nb - 1)]
    qpos = jnp.where(pb_sorted < nb,
                     pad_start[jnp.minimum(pb_sorted, nb - 1)] + within,
                     q_slots)
    queue_rid = jnp.full(q_slots + 1, n, jnp.int32).at[qpos].set(
        rid_sorted)[:q_slots]
    tile_start = jnp.arange(n_tiles, dtype=jnp.int32) * RT
    tile_blk = jnp.clip(
        jnp.searchsorted(pad_start, tile_start, side="right") - 1,
        0, nb - 1).astype(jnp.int32)
    tile_live = (tile_start < pad_start[tile_blk] + cnt[tile_blk]).astype(
        jnp.int32)
    return (hit, entry, entry_sorted, perm, counts, valid, pb, pb_sorted,
            rid_sorted, cnt, pad_start, raw_start, qpos, queue_rid,
            tile_blk, tile_live)


outs = [np.asarray(x) for x in round1(o, d, bb)]
(hit, entry, es, perm, counts, valid, pb, pb_sorted, rid_sorted, cnt,
 pad_start, raw_start, qpos, queue_rid, tile_blk, tile_live) = outs

# ---- numpy emulation of the same round ----
hitn = hit  # stage1 verified equal already
validn = valid  # check below independently
pbn = np.take_along_axis(perm, np.minimum(np.arange(K)[None, :], nb - 1)
                         + 0 * perm[:, :K], axis=1)
pe = np.take_along_axis(es, np.minimum(np.arange(K)[None, :] + 0 * es[:, :K].astype(int), nb - 1).astype(int), axis=1)
in_rangen = np.arange(K)[None, :] < counts[:, None]
validn2 = in_rangen & (pe < np.inf)
print("valid equal:", np.array_equal(valid, validn2 & (pe < 3.4e38)))

pb_flatn = np.where(valid, pb, nb).reshape(-1)
orderp = np.argsort(pb_flatn, kind="stable")
pb_sortedn = pb_flatn[orderp]
rid_sortedn = (np.broadcast_to(np.arange(n)[:, None], (n, K)).reshape(-1))[orderp]
print("pb_sorted equal:", np.array_equal(pb_sorted, pb_sortedn))
# rid within equal blocks may permute if sort unstable; check set per block
stable_ok = True
for b in range(nb + 1):
    m = pb_sortedn == b
    if not np.array_equal(np.sort(rid_sorted[m]), np.sort(rid_sortedn[m])):
        stable_ok = False
        print("  block", b, "rid set differs")
        break
print("rid sets per block equal:", stable_ok)
print("rid_sorted exactly equal (stability):",
      np.array_equal(rid_sorted, rid_sortedn))

cntn = np.bincount(pb_flatn, minlength=nb + 1)[:nb]
print("cnt equal:", np.array_equal(cnt, cntn))
paddedn = ((cntn + RT - 1) // RT) * RT
pad_startn = np.concatenate([[0], np.cumsum(paddedn)])
print("pad_start equal:", np.array_equal(pad_start, pad_startn))
raw_startn = np.concatenate([[0], np.cumsum(cntn)])
withinn = np.arange(n * K) - raw_startn[np.minimum(pb_sortedn, nb - 1)]
qposn = np.where(pb_sortedn < nb,
                 pad_startn[np.minimum(pb_sortedn, nb - 1)] + withinn, q_slots)
print("qpos equal:", np.array_equal(qpos, qposn))
queue_ridn = np.full(q_slots + 1, n, np.int64)
queue_ridn[qposn] = rid_sortedn
queue_ridn = queue_ridn[:q_slots]
print("queue_rid equal:", np.array_equal(queue_rid, queue_ridn))
tile_startn = np.arange(n_tiles) * RT
tile_blkn = np.clip(np.searchsorted(pad_startn, tile_startn, side="right") - 1,
                    0, nb - 1)
print("tile_blk equal:", np.array_equal(tile_blk, tile_blkn))
tile_liven = (tile_startn < pad_startn[tile_blkn] + cntn[tile_blkn])
print("tile_live equal:", np.array_equal(tile_live.astype(bool), tile_liven))
print("live tiles:", tile_live.sum(), "of", n_tiles)
