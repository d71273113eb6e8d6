"""Microbenchmark the scheduling primitives a per-ray pair engine needs:
sort, scatter, cumsum, row-gather at Monkey-call sizes (N=65536, B=62)."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
import jax.lax as lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

def timeit(name, fn, *args):
    fn_j = jax.jit(fn)
    r = fn_j(*args)
    jax.block_until_ready(r)
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn_j(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.3f} ms")

rng = np.random.default_rng(0)
N, B = 65536, 62

# 1. sort sizes
for M in (524288, 1048576):
    k = jnp.asarray(rng.integers(0, 64, M).astype(np.int32))
    v = jnp.asarray(rng.integers(0, N, M).astype(np.int32))
    timeit(f"sort kv {M}", lambda k, v: lax.sort((k, v), num_keys=1), k, v)

# 2. scatter 4M -> 700k (unique idx)
qpos = jnp.asarray(rng.permutation(4 * 1024 * 1024).astype(np.int32))
vals = jnp.asarray(rng.integers(0, N, 4 * 1024 * 1024).astype(np.int32))
timeit("scatter-set 4M", lambda q, v: jnp.zeros(4*1024*1024+1, jnp.int32).at[q].set(v), qpos, vals)
q2 = qpos[:524288]
v2 = vals[:524288]
timeit("scatter-set 512k", lambda q, v: jnp.zeros(700000, jnp.int32).at[q % 700000].set(v), q2, v2)
g8 = jnp.asarray(rng.permutation(508 * 1024).astype(np.int32))
timeit("scatter-set 508k->96k", lambda q, v: jnp.zeros(96*1024, jnp.int32).at[q % (96*1024)].set(v), g8, vals[:508*1024])

# 3. cumsum along axis0
pb = jnp.asarray(rng.random((N, B)) < 0.15)
timeit("cumsum [65536,62] i32 ax0", lambda p: jnp.cumsum(p.astype(jnp.int32), axis=0), pb)
pb8 = jnp.asarray(rng.random((8192, B)) < 0.6)
timeit("cumsum [8192,62] i32 ax0", lambda p: jnp.cumsum(p.astype(jnp.int32), axis=0), pb8)

# 4. row gathers
tab = jnp.asarray(rng.random((N + 1, 8)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, N, 655360).astype(np.int32))
timeit("take 655k rows of [65537,8]", lambda t, i: jnp.take(t, i, axis=0), tab, idx)
tab64 = jnp.asarray(rng.random((8193, 64)).astype(np.float32))
idx64 = jnp.asarray(rng.integers(0, 8192, 86016).astype(np.int32))
timeit("take 86k rows of [8193,64]", lambda t, i: jnp.take(t, i, axis=0), tab64, idx64)
# column-gather variant [7, N] -> [7, 655k]
tabc = jnp.asarray(rng.random((8, N + 1)).astype(np.float32))
timeit("take 655k cols of [8,65537]", lambda t, i: jnp.take(t, i, axis=1), tabc, idx)

# 5. argsort [N, B] along axis1 (entry order) for reference
ent = jnp.asarray(rng.random((N, B)).astype(np.float32))
timeit("argsort [65536,62] ax1", lambda e: jnp.argsort(e, axis=1), ent)
# 6. sort N rays by 2-int key
hi = jnp.asarray(rng.integers(0, 1 << 31, N).astype(np.int32))
timeit("sort kv 65536", lambda k, v: lax.sort((k, v), num_keys=1), hi, v[:N] if (v:=vals) is not None else vals[:N])
