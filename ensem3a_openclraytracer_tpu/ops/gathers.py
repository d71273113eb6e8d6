"""Gather-free row lookup for small tables: one-hot matmuls on the MXU.

XLA's dynamic gather lowers poorly on TPU (per-lane scalar-ish loops);
for the renderer's hot lookups - material records, per-face normals on
small scenes, IBL texels - the table is tiny, so a ``[N, T]`` one-hot
contraction on the systolic array is far faster and keeps the whole
bounce loop dense.  Falls back to a native gather above the threshold.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Above this row count the one-hot operand gets too large; use gather.
ONE_HOT_MAX_ROWS = 2048


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` for ``table [T, ...]`` and ``idx [N]`` int32.

    Uses a one-hot matmul when ``T <= ONE_HOT_MAX_ROWS`` (exact: weights
    are 0/1 f32), a plain gather otherwise.  Differentiable w.r.t.
    ``table`` on both paths.
    """
    t = table.shape[0]
    if t > ONE_HOT_MAX_ROWS:
        return table[idx]
    cols = table.reshape(t, -1)
    if not jnp.issubdtype(cols.dtype, jnp.floating):
        # integer tables: exact through f32 (values < 2^24)
        onehot = _one_hot(idx, t)
        out = jax.lax.dot(onehot, cols.astype(jnp.float32))
        out = jnp.round(out).astype(cols.dtype)
    else:
        onehot = _one_hot(idx, t)
        out = jax.lax.dot(onehot, cols, precision=jax.lax.Precision.HIGHEST)
    return out.reshape(idx.shape[0], *table.shape[1:])


def _one_hot(idx: jnp.ndarray, t: int) -> jnp.ndarray:
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    return (cols == idx[:, None]).astype(jnp.float32)
