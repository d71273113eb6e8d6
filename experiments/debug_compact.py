"""Numpy emulation of trace_compact's round loop to isolate the bug."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import experiments.proto_compact as pc
from ensem3a_openclraytracer_tpu.ops.intersect_mxu import (
    build_tri_features, trace_mxu, build_nd_rhs, _MAXKEY,
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
comb = np.asarray(pc.build_comb_blocks(feats))
bb = np.asarray(feats.block_bounds)
nb = comb.shape[0]
tt = 256
K = 4

rng = np.random.default_rng(0)
n = 256
ti = rng.integers(0, len(v0), n)
r1, r2 = rng.random(n), rng.random(n)
s = np.sqrt(r1)
p = (v0[ti] * (1 - s)[:, None] + v1[ti] * (s * (1 - r2))[:, None]
     + v2[ti] * (s * r2)[:, None])
d = rng.normal(size=(n, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
o = np.asarray(p + 1e-4 * d, np.float32)
d = np.asarray(d, np.float32)

dxo = np.cross(d, o)
r6 = np.concatenate([d, dxo], axis=-1).T
q4 = np.concatenate([o, np.ones((n, 1), np.float32)], axis=-1).T
ndr = np.asarray(build_nd_rhs(jnp.asarray(q4), jnp.asarray(d.T)))
rf = np.concatenate([r6, ndr]).astype(np.float32)

tiny = 1e-12
dsafe = np.where(np.abs(d) < tiny, np.where(d < 0, -tiny, tiny), d)
inv = 1.0 / dsafe
t1 = (bb[None, :, :3] - o[:, None]) * inv[:, None]
t2 = (bb[None, :, 3:6] - o[:, None]) * inv[:, None]
tmin = np.minimum(t1, t2).max(-1)
tmax = np.maximum(t1, t2).min(-1)
hitb = (tmax >= tmin) & (tmax >= 0)
entry = np.where(hitb, np.maximum(tmin, 0.0), np.inf)
perm = np.argsort(entry, axis=1, kind="stable")
esort = np.take_along_axis(entry, perm, axis=1)
counts = hitb.sum(1)


def kern(blk, rids):
    cb = comb[blk]
    out = cb.T @ rf[:, rids]
    w1, w2, w3 = out[:tt], out[tt:2 * tt], out[2 * tt:3 * tt]
    num, den = out[3 * tt:4 * tt], out[4 * tt:5 * tt]
    inside = ((np.minimum(np.minimum(w1, w2), w3) >= 0)
              | (np.maximum(np.maximum(w1, w2), w3) <= 0))
    t = num / np.where(den == 0, 1, den)
    valid = inside & (den != 0) & (t > MIN_HIT_DIST)
    t = np.where(valid, t, MAX_DIST).astype(np.float32)
    key = ((t.view(np.int32) & ~np.int32(0xFF))
           | np.arange(tt, dtype=np.int32)[:, None])
    return key.min(0)


best_key = np.full(n, _MAXKEY, np.int32)
best_blk = np.zeros(n, np.int32)
ptr = np.zeros(n, np.int32)
for r in range(200):
    best_t = (best_key & ~np.int32(0xFF)).view(np.float32)
    live = (ptr < counts) & (
        np.take_along_axis(esort, np.minimum(ptr, nb - 1)[:, None], 1)[:, 0]
        < best_t)
    if not live.any():
        break
    for krnd in range(K):
        j = np.minimum(ptr + krnd, nb - 1)
        pb = np.take_along_axis(perm, j[:, None], 1)[:, 0]
        pe = np.take_along_axis(esort, j[:, None], 1)[:, 0]
        valid = ((ptr + krnd) < counts) & (pe < best_t)
        for b in range(nb):
            m = valid & (pb == b)
            if not m.any():
                continue
            rids = np.where(m)[0]
            keys = kern(b, rids)
            better = keys < best_key[rids]
            best_key[rids] = np.where(better, keys, best_key[rids])
            best_blk[rids] = np.where(better, b, best_blk[rids])
        best_t = (best_key & ~np.int32(0xFF)).view(np.float32)
    ptr = np.minimum(ptr + K, counts)

t_out = (best_key & ~np.int32(0xFF)).view(np.float32)
tri_out = best_blk * tt + (best_key & 0xFF)
hit_out = t_out < MAX_DIST * 0.999
ref = trace_mxu(feats, jnp.asarray(o), jnp.asarray(d))
hr = np.asarray(ref.hit)
tr = np.asarray(ref.t)
print("rounds:", r)
print("hit mismatch:", (hit_out != hr).sum())
both = hit_out & hr
print("t bad:", (np.abs(t_out - tr) > 1e-3 * np.abs(tr))[both].sum())
print("tri same:", (tri_out[both] == np.asarray(ref.tri)[both]).mean())
bad = both & (np.abs(t_out - tr) > 1e-3 * np.abs(tr))
for k in np.where(bad)[0][:5]:
    print(f"ray {k}: mine t={t_out[k]:.5f} tri={tri_out[k]} "
          f"ref t={tr[k]:.5f} tri={np.asarray(ref.tri)[k]}")
