"""Amortized in-jit cost of the XLA ops the compact trace needs:
two-operand sort, cumsum-rank queue build, scatter, gather - measured
by repeating each REPS times inside one jit (carry-chained so nothing
is DCE'd), drowning the tunnel's dispatch/fetch noise."""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.lax as lax
import jax.numpy as jnp

REPS = 20
B = 62


def timeit(f, *a, runs=3):
    out = f(*a)
    float(jnp.sum(out))
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        float(jnp.sum(f(*a)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / REPS


def rep(body):
    @jax.jit
    def f(x, y):
        def step(c, _):
            out = body(x ^ c, y)
            return c + 1 + out * 0, None
        c, _ = lax.scan(step, jnp.int32(0), None, length=REPS)
        return c
    return f


rng = np.random.default_rng(0)
for n in (262144, 524288, 1048576):
    keys = jnp.asarray(rng.integers(0, B + 1, n).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 65536, n).astype(np.int32))

    t = timeit(rep(lambda k, v: lax.sort((k, v), num_keys=1)[1][0]), keys, vals)
    print(f"sort2op {n}: {t*1e3:.3f} ms")

    t = timeit(rep(lambda k, v: jnp.cumsum(
        (k[None, :] == jnp.arange(B)[:, None]).astype(jnp.int32), axis=1
    )[0, -1]), keys, vals)
    print(f"onehot-cumsum [B,{n}]: {t*1e3:.3f} ms")

    t = timeit(rep(lambda k, v: jnp.zeros(n + 1, jnp.int32).at[
        jnp.abs(k) % n].set(v)[0]), keys, vals)
    print(f"scatter {n}: {t*1e3:.3f} ms")

    t = timeit(rep(lambda k, v: v[jnp.abs(k) % n][0]), keys, vals)
    print(f"gather1d {n}: {t*1e3:.3f} ms")

# row-gather of [3, n] features by 1D ids
o = jnp.asarray(rng.random((3, 1048577)).astype(np.float32))
ids = jnp.asarray(rng.integers(0, 1048576, 524288).astype(np.int32))


@jax.jit
def rowgather(o, ids):
    def step(c, _):
        g = o[:, ids + c]
        return c + 1 + g[0, 0].astype(jnp.int32) * 0, None
    c, _ = lax.scan(step, jnp.int32(0), None, length=REPS)
    return c


t = timeit(rowgather, o, ids)
print(f"rowgather [3,1M] by 524k: {t*1e3:.3f} ms")
