"""On-device LBVH build: Morton + sort + Karras tree, all in XLA.

The jnp twin of :mod:`accel.lbvh` (SURVEY.md section 7 stage 4 names the
on-device build as the design target; the reference's admitted bottleneck
is exactly its host-side Python builder, /root/reference/README.md:29 +
BVH.py:122).  The whole build is jit-able and runs on TPU: quantized
centroid Morton codes, one ``lax.sort``, the Karras-2012 radix tree with
static loop bounds (every search loop is a ``log2(T)``-round doubling /
bisection, so nothing is data-dependently shaped), and padded sparse
tables for the internal-node AABBs.

Produces a tree IDENTICAL to the host builder's (same stable
tie-breaking, same prefix oracle semantics) - tests assert exact
equality - without materializing anything on the host: scene uploads
can go straight from vertex buffers to a traversal-ready BVH in device
memory.

64-bit note: JAX runs with x64 disabled, so the host builder's
``(code << 32) | rank`` uint64 keys are represented as the pair
``(code uint32, rank int32)`` and the shared-prefix length is computed
piecewise with ``lax.clz`` - exactly equal to ``64 - bitlen(xor)`` of
the packed key (codes are 30-bit, so code bits occupy [32, 62) and rank
bits [0, 32)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ensem3a_openclraytracer_tpu.ops.traversal import BVHNodes


def _expand_bits_10(v: jnp.ndarray) -> jnp.ndarray:
    v = v & jnp.uint32(0x3FF)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def morton_codes_device(centroids, bmin, bmax) -> jnp.ndarray:
    """30-bit Morton codes (uint32) on a 1024^3 grid - device mirror of
    accel.lbvh.morton_codes."""
    extent = jnp.maximum(bmax - bmin, 1e-12)
    q = jnp.clip((centroids - bmin) / extent, 0.0, 0.9999999)
    g = (q * 1024.0).astype(jnp.uint32)
    return (
        (_expand_bits_10(g[:, 0]) << 2)
        | (_expand_bits_10(g[:, 1]) << 1)
        | _expand_bits_10(g[:, 2])
    )


def _make_delta(codes_sorted: jnp.ndarray, t: int):
    """Prefix-length oracle over the implicit sorted keys
    ``(code << 32) | rank``.  ``delta(i, j) = -1`` for out-of-range j."""
    ranks = jnp.arange(t, dtype=jnp.int32)

    def delta(i, j):
        valid = (j >= 0) & (j < t)
        js = jnp.clip(j, 0, t - 1)
        cx = codes_sorted[i] ^ codes_sorted[js]
        rx = (ranks[i] ^ ranks[js]).astype(jnp.uint32)
        # packed-key xor bit length: code bits sit above bit 32
        code_differs = cx != 0
        d = jnp.where(
            code_differs,
            jax.lax.clz(cx).astype(jnp.int32),          # 32 + (clz32 - 32-bit shift): see module docstring
            32 + jax.lax.clz(jnp.maximum(rx, 1)).astype(jnp.int32),
        )
        # rank xor is never 0 for i != j; for i == j (never queried with
        # valid semantics in Karras) the value is irrelevant
        return jnp.where(valid, d, -1)

    return delta


def _karras_tree_device(codes_sorted: jnp.ndarray, t: int):
    """(left, right) children per internal node - device Karras-2012 with
    static log2-bounded loops."""
    delta = _make_delta(codes_sorted, t)
    i = jnp.arange(t - 1, dtype=jnp.int32)

    d = jnp.sign(delta(i, i + 1) - delta(i, i - 1)).astype(jnp.int32)
    d = jnp.where(d == 0, 1, d)
    dmin = delta(i, i - d)

    max_rounds = int(np.ceil(np.log2(max(t, 2)))) + 2
    lmax = jnp.full(t - 1, 2, jnp.int32)
    for _ in range(max_rounds):
        lmax = jnp.where(delta(i, i + lmax * d) > dmin, lmax * 2, lmax)

    l = jnp.zeros(t - 1, jnp.int32)
    step = lmax // 2
    for _ in range(max_rounds + 1):
        cand = l + step
        ok = (step > 0) & (delta(i, i + cand * d) > dmin)
        l = jnp.where(ok, cand, l)
        step = step // 2
    j = i + l * d
    first = jnp.minimum(i, j)
    last = jnp.maximum(i, j)

    dnode = delta(i, j)
    s = jnp.zeros(t - 1, jnp.int32)
    div = jnp.full(t - 1, 2, jnp.int32)
    for _ in range(max_rounds + 1):
        tstep = -(-l // div)  # ceil(l / div)
        cand = s + tstep
        ok = (tstep > 0) & (delta(i, i + cand * d) > dnode)
        s = jnp.where(ok, cand, s)
        div = div * 2
    gamma = i + s * d + jnp.minimum(d, 0)

    leaf_base = t - 1
    left = jnp.where(first == gamma, leaf_base + gamma, gamma)
    right = jnp.where(last == gamma + 1, leaf_base + gamma + 1, gamma + 1)
    return left.astype(jnp.int32), right.astype(jnp.int32), first, last


def _range_minmax_device(first, last, lo, hi, t: int):
    """Sparse-table range min/max with level tables padded to a common
    length and stacked, so the per-query level pick is one gather."""
    levels = max(1, int(np.floor(np.log2(t))) + 1)
    pad_min = jnp.full((t, 3), jnp.inf, lo.dtype)
    pad_max = jnp.full((t, 3), -jnp.inf, hi.dtype)
    min_tabs = [lo]
    max_tabs = [hi]
    for k in range(1, levels):
        half = 1 << (k - 1)
        prev_min, prev_max = min_tabs[-1], max_tabs[-1]
        m = t - half
        nmin = jnp.minimum(prev_min[:m], prev_min[half : half + m])
        nmax = jnp.maximum(prev_max[:m], prev_max[half : half + m])
        min_tabs.append(jnp.concatenate([nmin, pad_min[m:]], axis=0))
        max_tabs.append(jnp.concatenate([nmax, pad_max[m:]], axis=0))
    min_tab = jnp.stack(min_tabs)  # [L, T, 3]
    max_tab = jnp.stack(max_tabs)

    length = (last - first + 1).astype(jnp.float32)
    k = jnp.floor(jnp.log2(jnp.maximum(length, 1.0))).astype(jnp.int32)
    k = jnp.clip(k, 0, levels - 1)
    span = (1 << k).astype(jnp.int32)
    second = last - span + 1

    flat_min = min_tab.reshape(levels * t, 3)
    flat_max = max_tab.reshape(levels * t, 3)
    out_min = jnp.minimum(flat_min[k * t + first], flat_min[k * t + second])
    out_max = jnp.maximum(flat_max[k * t + first], flat_max[k * t + second])
    return out_min, out_max


@functools.partial(jax.jit, static_argnames=("num_tris",))
def _build(v0, v1, v2, num_tris: int) -> BVHNodes:
    t = num_tris
    tri_min = jnp.minimum(jnp.minimum(v0, v1), v2)
    tri_max = jnp.maximum(jnp.maximum(v0, v1), v2)
    centroids = (tri_min + tri_max) * 0.5
    codes = morton_codes_device(centroids, centroids.min(0), centroids.max(0))
    # one stable sort carries the permutation alongside the codes
    codes_sorted, order = jax.lax.sort(
        (codes, jnp.arange(t, dtype=jnp.int32)), num_keys=1, is_stable=True
    )

    left, right, first, last = _karras_tree_device(codes_sorted, t)

    smin = tri_min[order]
    smax = tri_max[order]
    int_min, int_max = _range_minmax_device(first, last, smin, smax, t)

    m = 2 * t - 1
    neg = jnp.full(m, -1, jnp.int32)
    return BVHNodes(
        left=neg.at[: t - 1].set(left),
        right=neg.at[: t - 1].set(right),
        bmin=jnp.concatenate([int_min, smin], axis=0),
        bmax=jnp.concatenate([int_max, smax], axis=0),
        tri=neg.at[t - 1 :].set(order),
    )


def build_lbvh_device(v0, v1, v2) -> BVHNodes:
    """Build the LBVH entirely on the default device; returns device
    :class:`BVHNodes` identical to the host builder's output (cites:
    replaces /root/reference/BVH.py:122-196's recursive CPU build)."""
    v0 = jnp.asarray(v0, jnp.float32)
    v1 = jnp.asarray(v1, jnp.float32)
    v2 = jnp.asarray(v2, jnp.float32)
    t = v0.shape[0]
    if t == 1:
        tri_min = jnp.minimum(jnp.minimum(v0, v1), v2)
        tri_max = jnp.maximum(jnp.maximum(v0, v1), v2)
        return BVHNodes(
            left=jnp.asarray([-1], jnp.int32),
            right=jnp.asarray([-1], jnp.int32),
            bmin=tri_min,
            bmax=tri_max,
            tri=jnp.asarray([0], jnp.int32),
        )
    return _build(v0, v1, v2, t)
