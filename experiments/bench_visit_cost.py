"""Isolate the per-(ray-tile, block) visit cost of the production
multi-block kernel.

Variant A: real bounds (culling + early exit active) - the baseline.
Variant B: bounds inflated to the whole scene - every tile visits every
block, so T / (G * B) = cost per visit with zero skip benefit.

Timing: many iterations inside one jit (scan) to drown the tunnel's
dispatch/fetch noise.
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.lax as lax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from ensem3a_openclraytracer_tpu.ops.intersect_mxu import (
    build_tri_features, trace_mxu_pallas,
)
from ensem3a_openclraytracer_tpu.scene.objloader import load_obj
from ensem3a_openclraytracer_tpu.scene.scene import morton_order

REPS = 10

mesh = load_obj("/root/reference/ObjFiles/Cornell box_Monkey.obj")
fd = mesh.face_data
v0, v1, v2 = mesh.v_p[fd[:, 7]], mesh.v_p[fd[:, 8]], mesh.v_p[fd[:, 9]]
order = morton_order(v0, v1, v2)
v0, v1, v2 = v0[order], v1[order], v2[order]
feats = build_tri_features(v0, v1, v2)
nb = feats.block_bounds.shape[0]

# variant B: every block's AABB = the whole scene -> slab always passes,
# front-to-back order irrelevant, early exit never fires.  Recentering
# uses these bounds' centroids, so results are numerically different -
# fine, this measures cost only.
allv = np.concatenate([np.asarray(v0), np.asarray(v1), np.asarray(v2)])
lo, hi = allv.min(0), allv.max(0)
bb_huge = np.zeros_like(np.asarray(feats.block_bounds))
bb_huge[:, :3] = lo - 1.0
bb_huge[:, 3:6] = hi + 1.0
feats_huge = feats._replace(block_bounds=jnp.asarray(bb_huge))

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


def many(feats_):
    @jax.jit
    def f(o, d):
        def body(c, _):
            h = trace_mxu_pallas(feats_, o + c * 1e-7, d)
            return c + h.t[0] * 0.0 + 1.0, None
        c, _ = lax.scan(body, jnp.float32(0.0), None, length=REPS)
        return c
    return f


def timeit(f, *a, runs=3):
    out = f(*a)
    float(out)  # scalar fetch = real drain
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        float(f(*a))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


g = n // 1024
t_real = timeit(many(feats), o, d) / REPS
print(f"real bounds: {t_real*1e3:.2f} ms/trace")
t_huge = timeit(many(feats_huge), o, d) / REPS
print(f"huge bounds: {t_huge*1e3:.2f} ms/trace  "
      f"({t_huge/ (g*nb) *1e6:.2f} us/visit over {g}x{nb} visits)")
