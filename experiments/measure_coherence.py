"""Measure ray/block culling statistics on Monkey-like bounce rays.

For diffuse bounce rays (surface origins + cosine directions):
  A. per-ray slab-pass count (no early exit)
  B. per-ray front-to-back visited count until entry > t_hit  (the ideal
     per-RAY engine's work)
  C. per-tile union of (B) after (octant, Morton) sort at tile sizes
     {256, 512, 1024, 2048}  (the ideal per-TILE kernel's work, per lane)
"""
import sys, time
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
print(f"tris={len(v0)} blocks={nb}")

rng = np.random.default_rng(0)
n = 65536
ti = rng.integers(0, len(v0), n)
r1, r2 = rng.random(n), rng.random(n)
s = np.sqrt(r1)
p = (v0[ti] * (1 - s)[:, None] + v1[ti] * (s * (1 - r2))[:, None]
     + v2[ti] * (s * r2)[:, None]).astype(np.float32)
nrm = np.cross(v1[ti] - v0[ti], v2[ti] - v0[ti])
nrm /= np.linalg.norm(nrm, axis=1, keepdims=True) + 1e-12
# cosine-weighted hemisphere about the normal (random facing sign)
u1, u2 = rng.random(n), rng.random(n)
rad = np.sqrt(u1); th = 2 * np.pi * u2
loc = np.stack([rad*np.cos(th), rad*np.sin(th), np.sqrt(1-u1)], 1)
up = np.where(np.abs(nrm[:, 2:3]) < 0.9, [[0,0,1]], [[1,0,0]])
tx = np.cross(up, nrm); tx /= np.linalg.norm(tx, axis=1, keepdims=True)
ty = np.cross(nrm, tx)
d = (loc[:, :1]*tx + loc[:, 1:2]*ty + loc[:, 2:3]*nrm).astype(np.float32)
p = p + nrm.astype(np.float32) * 1e-4

# true closest hit t via the exact f32 engine
hit = jax.jit(trace_mxu)(feats, jnp.asarray(p), jnp.asarray(d))
t_hit = np.asarray(hit.t)
print(f"hit rate={np.mean(np.asarray(hit.hit)):.3f}")

# slab tests [N, B]
tiny = 1e-12
ds = np.where(np.abs(d) < tiny, np.where(d < 0, -tiny, tiny), d)
inv = (1.0 / ds)
t1 = (bb[None, :, :3] - p[:, None]) * inv[:, None]
t2 = (bb[None, :, 3:6] - p[:, None]) * inv[:, None]
tmin = np.minimum(t1, t2).max(2)
tmax = np.maximum(t1, t2).min(2)
pa = (tmax >= tmin) & (tmax >= 0)
entry = np.where(pa, np.maximum(tmin, 0), np.inf)
print(f"A. slab-pass/ray: mean={pa.sum(1).mean():.1f} p50={np.median(pa.sum(1)):.0f} p95={np.percentile(pa.sum(1),95):.0f}")

# B: front-to-back until entry > t_hit: count blocks with entry <= t_hit
needed = entry <= t_hit[:, None] * (1 + 1e-6) + 1e-6
print(f"B. ideal per-ray visits: mean={needed.sum(1).mean():.2f} p50={np.median(needed.sum(1)):.0f} p95={np.percentile(needed.sum(1),95):.0f} max={needed.sum(1).max()}")

# C: tile unions after (octant, Morton) sort
so = np.asarray(fused_ops.coherent_order(jnp.asarray(p), jnp.asarray(d)))
needed_s = needed[so]
pa_s = pa[so]
for R in (256, 512, 1024, 2048):
    g = n // R
    uni = needed_s[: g * R].reshape(g, R, nb).any(1).sum(1)
    unip = pa_s[: g * R].reshape(g, R, nb).any(1).sum(1)
    print(f"C. tile={R}: ideal-union mean={uni.mean():.1f} p95={np.percentile(uni,95):.0f}"
          f" | slab-union mean={unip.mean():.1f}")
