"""Which ray ordering minimizes per-tile block-union size on Monkey
bounce rays?  Candidates: (octant, morton-origin) [current], needed-mask
lexicographic, first-needed-block, hit-block, hit-point morton."""
import sys
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from ensem3a_openclraytracer_tpu.ops.intersect_mxu import build_tri_features, trace_mxu
from ensem3a_openclraytracer_tpu.ops import fused as fused_ops
from ensem3a_openclraytracer_tpu.scene.objloader import load_obj
from ensem3a_openclraytracer_tpu.scene.scene import morton_order

obj = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/ObjFiles/Cornell box_Monkey.obj"
mesh = load_obj(obj)
fd = mesh.face_data
v0, v1, v2 = mesh.v_p[fd[:, 7]], mesh.v_p[fd[:, 8]], mesh.v_p[fd[:, 9]]
order = morton_order(v0, v1, v2)
v0, v1, v2 = v0[order], v1[order], v2[order]
feats = build_tri_features(v0, v1, v2)
bb = np.asarray(feats.block_bounds)
nb = bb.shape[0]

rng = np.random.default_rng(0)
n = 65536
ti = rng.integers(0, len(v0), n)
r1, r2 = rng.random(n), rng.random(n)
s = np.sqrt(r1)
p = (v0[ti] * (1 - s)[:, None] + v1[ti] * (s * (1 - r2))[:, None]
     + v2[ti] * (s * r2)[:, None]).astype(np.float32)
nrm = np.cross(v1[ti] - v0[ti], v2[ti] - v0[ti])
nrm /= np.linalg.norm(nrm, axis=1, keepdims=True) + 1e-12
u1, u2 = rng.random(n), rng.random(n)
rad = np.sqrt(u1); th = 2 * np.pi * u2
loc = np.stack([rad*np.cos(th), rad*np.sin(th), np.sqrt(1-u1)], 1)
up = np.where(np.abs(nrm[:, 2:3]) < 0.9, [[0,0,1]], [[1,0,0]])
tx = np.cross(up, nrm); tx /= np.linalg.norm(tx, axis=1, keepdims=True)
ty = np.cross(nrm, tx)
d = (loc[:, :1]*tx + loc[:, 1:2]*ty + loc[:, 2:3]*nrm).astype(np.float32)
p = p + nrm.astype(np.float32) * 1e-4

hit = jax.jit(trace_mxu)(feats, jnp.asarray(p), jnp.asarray(d))
t_hit = np.asarray(hit.t)
tri_hit = np.asarray(hit.tri)

tiny = 1e-12
ds = np.where(np.abs(d) < tiny, np.where(d < 0, -tiny, tiny), d)
inv = (1.0 / ds)
t1 = (bb[None, :, :3] - p[:, None]) * inv[:, None]
t2 = (bb[None, :, 3:6] - p[:, None]) * inv[:, None]
tmin = np.minimum(t1, t2).max(2)
tmax = np.maximum(t1, t2).min(2)
pa = (tmax >= tmin) & (tmax >= 0)
entry = np.where(pa, np.maximum(tmin, 0), np.inf)
needed = entry <= t_hit[:, None] * (1 + 1e-6) + 1e-6


def report(name, so):
    ns = needed[so]
    out = [name]
    for R in (256, 512, 1024):
        g = n // R
        uni = ns[: g * R].reshape(g, R, nb).any(1).sum(1)
        out.append(f"R{R}: {uni.mean():.1f}")
    print("  ".join(out))


print(f"per-ray ideal mean visits: {needed.sum(1).mean():.2f}")
report("octant+morton (now)",
       np.asarray(fused_ops.coherent_order(jnp.asarray(p), jnp.asarray(d))))

# needed-mask lexicographic: pack 62 bits into a python-int key per ray
masks = (needed.astype(np.uint64) << np.arange(nb, dtype=np.uint64)[None, :62] % 64)
hi = needed[:, :31].astype(np.int64) @ (1 << np.arange(31, dtype=np.int64))
lo = needed[:, 31:62].astype(np.int64) @ (1 << np.arange(nb - 31, dtype=np.int64))
report("mask-lex", np.lexsort((lo, hi)))

first_blk = np.where(needed.any(1), needed.argmax(1), nb)
report("first-needed-block", np.argsort(first_blk, kind="stable"))

hit_blk = np.where(t_hit < 1e9, tri_hit // 256, nb)
report("hit-block", np.argsort(hit_blk, kind="stable"))

# hit-point morton (hit point, else far along ray)
hp = p + d * np.minimum(t_hit, 100.0)[:, None]
report("hitpoint-morton",
       np.asarray(fused_ops.morton_order_points(jnp.asarray(hp))))

# hit-block then entry-to-hit ordering grouped
report("hit-block+firstneed", np.lexsort((first_blk, hit_blk)))

# (octant of d, hitpoint morton)
oct_ = (d[:, 0] > 0) * 4 + (d[:, 1] > 0) * 2 + (d[:, 2] > 0)
hp_m = np.asarray(fused_ops.morton_order_points(jnp.asarray(hp)))
rank = np.empty(n, np.int64); rank[hp_m] = np.arange(n)
report("octant+hitpoint-morton", np.lexsort((rank, oct_)))

# segment morton: morton of (origin midpoint+hitpoint)/2? try origin+hit avg
mid = (p + hp) / 2
report("midpoint-morton", np.asarray(fused_ops.morton_order_points(jnp.asarray(mid))))
