"""Amortized (REPS-in-one-program) costs of the compact trace's round
pieces.  Launch+fetch is ~26 ms fixed on this tunnel; per-piece cost =
(T - launch) / REPS with REPS=20."""
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
import functools

sys.path.insert(0, "/root/repo")
from ensem3a_openclraytracer_tpu.ops.intersect_mxu import _MAXKEY, build_tri_features
from ensem3a_openclraytracer_tpu.scene.objloader import load_obj
from ensem3a_openclraytracer_tpu.scene.scene import morton_order
from experiments.proto_compact import build_comb_blocks, _pair_kernel

REPS = 20
N, B, K, RT = 65536, 62, 4, 1024
LAUNCH = None  # measured below


def timeit(f, *a, runs=3):
    float(f(*a))
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        float(f(*a))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def rep_ms(name, body, *args):
    @jax.jit
    def f(*a):
        def step(c, _):
            out = body(c, *a)
            return out, None
        c, _ = lax.scan(step, jnp.int32(0), None, length=REPS)
        return c
    t = timeit(f, *args)
    per = (t - LAUNCH) / REPS * 1e3
    print(f"{name}: {per:.3f} ms")
    return per


rng = np.random.default_rng(0)
perm = jnp.asarray(rng.permuted(np.broadcast_to(np.arange(B, dtype=np.int32), (N, B)), axis=1).copy())
es = jnp.sort(jnp.asarray(rng.random((N, B)).astype(np.float32)), axis=1)
counts = jnp.asarray(rng.integers(1, B, N).astype(np.int32))
ptr = jnp.zeros(N, jnp.int32)

# measure launch floor first
@jax.jit
def empty(x):
    return x + 1
LAUNCH = timeit(empty, jnp.int32(0))
print(f"launch+fetch floor: {LAUNCH*1e3:.1f} ms")

rep_ms("take_along_axis [N,B] K cols", lambda c, p, e: (
    jnp.take_along_axis(p, jnp.minimum(jnp.arange(K)[None] + c % 2, B - 1)
                        + 0 * p[:, :K], axis=1)[0, 0]), perm, es)

rep_ms("gather rows via onehot-dot", lambda c, p, e: (
    # alternative: one-hot [K, B] matmul per ray? shape games; just probe
    # a plain 2D gather of K columns via integer indexing
    p[jnp.arange(N), (c % B)][0]), perm, es)

pb = jnp.asarray(rng.integers(0, B + 1, N * K).astype(np.int32))
rid = jnp.asarray(rng.integers(0, N, N * K).astype(np.int32))
rep_ms("sort 262k 2op", lambda c, a, b: lax.sort((a ^ c, b), num_keys=1)[1][0], pb, rid)

q_slots = N * K + B * RT
qpos = jnp.asarray(rng.permutation(q_slots)[:N * K].astype(np.int32))
rep_ms("scatter 262k->Q", lambda c, a, b: jnp.full(q_slots + 1, N, jnp.int32).at[a].set(b ^ c)[0], qpos, rid)

o_pad = jnp.asarray(rng.random((3, N + 1)).astype(np.float32))
queue_rid = jnp.asarray(rng.integers(0, N, q_slots).astype(np.int32))
rep_ms("gather [3,Q]", lambda c, o, q: (o[:, q + (c % 1)][0, 0]).astype(jnp.int32), o_pad, queue_rid)

keys = jnp.asarray(rng.integers(0, 1 << 30, q_slots).astype(np.int32))
rep_ms("scatter-min Q->N + win resolve", lambda c, k, q: (
    jnp.full(N + 1, _MAXKEY, jnp.int32).at[q].min(k ^ c)[0]), keys, queue_rid)

# pallas pair kernel, launched REPS times inside one program
mesh = load_obj("/root/reference/ObjFiles/Cornell box_Monkey.obj")
fd = mesh.face_data
v0, v1, v2 = mesh.v_p[fd[:, 7]], mesh.v_p[fd[:, 8]], mesh.v_p[fd[:, 9]]
order = morton_order(v0, v1, v2)
feats = build_tri_features(v0[order], v1[order], v2[order])
comb = build_comb_blocks(feats)
bb = feats.block_bounds
tri_tile = comb.shape[-1] // 5
n_tiles = q_slots // RT
tile_blk = jnp.asarray(rng.integers(0, B, n_tiles).astype(np.int32))
tile_live = jnp.ones(n_tiles, jnp.int32)
d_q = jnp.asarray(rng.random((3, q_slots)).astype(np.float32))
kernel = functools.partial(_pair_kernel, tri_tile=tri_tile)
grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=2, grid=(n_tiles,),
    in_specs=[
        pl.BlockSpec((1, 39, 5 * tri_tile), lambda s, lr, br: (br[s], 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(bb.shape, lambda s, lr, br: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, RT), lambda s, lr, br: (0, s), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, RT), lambda s, lr, br: (0, s), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((1, RT), lambda s, lr, br: (0, s), memory_space=pltpu.VMEM),
)
pc = pl.pallas_call(kernel, grid_spec=grid_spec,
                    out_shape=jax.ShapeDtypeStruct((1, q_slots), jnp.int32))
rep_ms("pair kernel (318 tiles all-live)", lambda c, oq, dq: (
    pc(tile_live, tile_blk, comb, bb, oq + c.astype(jnp.float32) * 0, dq)[0, 0]), d_q, d_q)
tile_live0 = jnp.zeros(n_tiles, jnp.int32)
rep_ms("pair kernel (all-dead tiles)", lambda c, oq, dq: (
    pc(tile_live0, tile_blk, comb, bb, oq + c.astype(jnp.float32) * 0, dq)[0, 0]), d_q, d_q)
