"""Monte-Carlo uniforms from the TPU core PRNG (Pallas).

The estimator consumes ~10^8 uniforms per render; `jax.random.uniform`
(threefry2x32) spends a measurable slice of the whole render computing
them (counter-based crypto-ish hashing on the VPU).  For Monte-Carlo
integration the statistical bar is much lower: we only need white,
deterministic-per-seed noise.  The TPU core's hardware PRNG
(`pltpu.prng_seed` / `pltpu.prng_random_bits`) produces that at near
memory speed.

`uniforms(key, shape)` keeps the threefry path off-TPU (CPU tests,
oracles) and uses the Pallas kernel on TPU.  Streams are deterministic
per (key, shape) on a given topology but are NOT the threefry streams -
callers that need cross-backend bit-identical streams (oracle parity
tests) pass explicit uniform tensors instead, exactly as before.

Replaces the reference's per-thread MWC64 RNG (MathLib.cl:294-310),
whose seeds collapse to (pixel index, 0) anyway (SURVEY.md 2.6).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_BLOCK_ROWS = 4096  # 4096 x 128 x 4B = 2 MB per grid step


def _rng_kernel(seed_ref, out_ref):
    """Fill one [rows, 128] block with uniforms in [0, 1).

    Seeded per grid step from the caller's key words + the block index,
    so blocks are independent streams and the whole array is
    deterministic for a given key."""
    # mix the block index into the first seed word (Knuth multiplicative
    # hash) so grid steps draw independent streams
    block_salt = pl.program_id(0) * jnp.int32(-1640531527)
    pltpu.prng_seed(seed_ref[0] + block_salt, seed_ref[1])
    bits = pltpu.bitcast(pltpu.prng_random_bits(out_ref.shape), jnp.uint32)
    # top 24 bits -> exact f32 in [0, 1); the shifted value fits in 24
    # bits so the int32 reinterpretation is non-negative (Mosaic has no
    # uint32 -> f32 cast)
    top = pltpu.bitcast(bits >> 8, jnp.int32)
    out_ref[:] = top.astype(jnp.float32) * (1.0 / (1 << 24))


@functools.partial(jax.jit, static_argnums=(1,))
def _uniforms_pallas(seed2: jnp.ndarray, n: int) -> jnp.ndarray:
    """n uniforms in [0,1) as a flat vector, from two int32 seed words."""
    rows = -(-n // _LANES)
    rows = -(-rows // 8) * 8  # sublane multiple
    block = min(_BLOCK_ROWS, rows)
    grid_rows = -(-rows // block) * block
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_rows // block,),
        in_specs=[],
        out_specs=pl.BlockSpec(
            (block, _LANES), lambda i, seed_ref: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _rng_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((grid_rows, _LANES), jnp.float32),
    )(seed2)
    return out.reshape(-1)[:n]


def _key_words(key: jax.Array) -> jnp.ndarray:
    data = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    if data.shape[0] < 2:
        data = jnp.concatenate([data, data])
    return jax.lax.bitcast_convert_type(data[:2], jnp.int32)


def uniforms_tpu(key: jax.Array, shape: tuple) -> jnp.ndarray:
    """Uniforms in [0, 1) of ``shape``, seeded from a JAX PRNG key, via
    the TPU hardware PRNG.  Deterministic per (key, shape)."""
    n = 1
    for s in shape:
        n *= int(s)
    return _uniforms_pallas(_key_words(key), n).reshape(shape)
