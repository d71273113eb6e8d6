"""Micro-bench XLA plumbing primitives on the axon TPU.

Grounds the pair-compaction trace design: every candidate decomposition
needs some mix of argsort / cumsum / scatter / gather between kernel
calls, and their real costs decide which design is feasible.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)


def timeit(f, *a, runs=5):
    out = jax.block_until_ready(f(*a))
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def report(name, f, *a):
    try:
        dt = timeit(f, *a)
        print(f"{name:48s} {dt*1e6:10.1f} us")
    except Exception as e:  # noqa
        print(f"{name:48s} FAILED {type(e).__name__}: {e}")


N, B = 65536, 62
P = 731000  # ~ expected live pairs for Monkey bounce batch

i65 = jnp.asarray(rng.integers(0, B, N).astype(np.int32))
i256 = jnp.asarray(rng.integers(0, B, 4 * N).astype(np.int32))
i1m = jnp.asarray(rng.integers(0, B, 16 * N).astype(np.int32))
f65xB = jnp.asarray(rng.random((N, B)).astype(np.float32))
mask = f65xB < 0.18
rid_p = jnp.asarray(rng.integers(0, N, P).astype(np.int32))
keys_p = jnp.asarray(rng.integers(0, 1 << 30, P).astype(np.int32))
rf = jnp.asarray(rng.random((27, N)).astype(np.float32))
pos65 = jnp.asarray(rng.permutation(N).astype(np.int32))
pos4m = jnp.asarray(rng.permutation(N * B).astype(np.int32))

report("argsort 65k int32", jax.jit(jnp.argsort), i65)
report("argsort 256k int32", jax.jit(jnp.argsort), i256)
report("argsort 1M int32", jax.jit(jnp.argsort), i1m)
report("sort+iota (stable) 65k", jax.jit(lambda x: jax.lax.sort(
    (x, jnp.arange(x.shape[0], dtype=jnp.int32)), num_keys=1)[1]), i65)
report("cumsum [65k,62] axis0", jax.jit(lambda m: jnp.cumsum(
    m.astype(jnp.int32), axis=0)), mask)
report("cumsum flat 4M", jax.jit(lambda m: jnp.cumsum(
    m.astype(jnp.int32).ravel())), mask)
report("argsort [65k,62] axis1", jax.jit(lambda m: jnp.argsort(m, axis=1)),
       f65xB)
report("scatter-set 65k -> 65k", jax.jit(
    lambda p, v: jnp.zeros(N, jnp.int32).at[p].set(v)), pos65, i65)
report("scatter-set 4M -> 4M", jax.jit(
    lambda p: jnp.zeros(N * B, jnp.int32).at[p].set(1)), pos4m)
report("scatter-min 731k -> 65k", jax.jit(
    lambda r, k: jnp.full(N, 2**30, jnp.int32).at[r].min(k)), rid_p, keys_p)
report("gather rows 731k of [27,65k]", jax.jit(
    lambda t, r: t[:, r]), rf, rid_p)
report("gather rows 731k of [65k,27]", jax.jit(
    lambda t, r: t[r]), rf.T, rid_p)
report("searchsorted 731k into 63", jax.jit(
    lambda o, q: jnp.searchsorted(o, q, side="right")),
    jnp.arange(63, dtype=jnp.int32) * (P // 62), rid_p)
report("bincount 65k into 62", jax.jit(
    lambda x: jnp.bincount(x, length=B)), i65)
report("take [N,B] gather perm-col", jax.jit(
    lambda m, p: jnp.take_along_axis(m, p[:, None], axis=1)[:, 0]),
    f65xB, i65)
