"""BVH closest-hit traversal - vectorized masked-stack engine.

TPU-native re-design of the reference's per-thread stack walk
(MathLib.cl:234-288 + stack.cl): the whole ray batch advances in lock-step
through a ``lax.while_loop``; each lane keeps its own stack in a
``[N, MAX_STACK]`` array, lanes whose stacks empty simply mask out.  Node
and triangle fetches become batched row gathers - regular enough for XLA -
and the loop exits when every lane's stack is empty.

Improvements over the reference, with identical hit results:
  * ordered culling: nodes are skipped when the slab entry distance
    exceeds the current best hit or the box lies fully behind the ray
    (the reference visits boxes behind the origin, MathLib.cl:167-190);
  * stack depth 64 instead of 20-with-silent-drop (stack.cl:21-26); LBVH
    trees are ~2*log2(T) deep, and overflow is impossible by construction
    for the supported scene sizes.

Node arrays are SoA (``left/right/tri`` int32, ``bmin/bmax [M, 3]``) -
the flat 9-float ABI of the reference (SURVEY.md section 2.3) converts
losslessly via :mod:`ensem3a_openclraytracer_tpu.accel.lbvh`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ensem3a_openclraytracer_tpu.ops.geometry import (
    MAX_DIST,
    MIN_HIT_DIST,
    moller_trumbore,
    ray_aabb,
)
from ensem3a_openclraytracer_tpu.ops.intersect import Hit

MAX_STACK = 64


class BVHNodes(NamedTuple):
    """SoA flattened BVH. Internal nodes: ``tri == -1``, children valid.
    Leaves: ``tri >= 0`` (original triangle index), children == -1."""

    left: jnp.ndarray  # [M] int32
    right: jnp.ndarray  # [M] int32
    bmin: jnp.ndarray  # [M, 3] float32
    bmax: jnp.ndarray  # [M, 3] float32
    tri: jnp.ndarray  # [M] int32


def trace_bvh(nodes: BVHNodes, v0, v1, v2, ray_o, ray_d, max_stack: int = MAX_STACK) -> Hit:
    """Closest hit of ``[N]`` rays against triangles through the BVH."""
    n = ray_o.shape[0]
    lanes = np.arange(n)  # host constant: no device round-trip at trace time

    # carries derived from both ray arrays so their varying-axes type
    # matches the loop body under shard_map (jax >= 0.9 vma typing)
    zero_f = (ray_o[:, 0] + ray_d[:, 0]) * 0.0
    zeros_i = zero_f.astype(jnp.int32)
    stack0 = jnp.repeat(zeros_i[:, None], max_stack, axis=1)  # root (node 0) in slot 0
    sp0 = zeros_i + 1
    best_t0 = zero_f + MAX_DIST
    best_i0 = zeros_i

    def cond(state):
        _, sp, _, _ = state
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, best_t, best_i = state
        active = sp > 0
        top = jnp.where(active, sp - 1, 0)
        idx = stack[lanes, top]
        idx = jnp.where(active, idx, 0)
        sp = jnp.where(active, sp - 1, sp)

        bmin = nodes.bmin[idx]
        bmax = nodes.bmax[idx]
        tmin, tmax = ray_aabb(ray_o, ray_d, bmin, bmax)
        box_hit = active & (tmax >= tmin) & (tmax >= 0.0) & (tmin <= best_t)

        tri = nodes.tri[idx]
        is_leaf = tri >= 0

        # Leaf lanes: Moller-Trumbore against the leaf triangle.
        tsafe = jnp.maximum(tri, 0)
        t, _, _, mt_hit = moller_trumbore(ray_o, ray_d, v0[tsafe], v1[tsafe], v2[tsafe])
        good = box_hit & is_leaf & mt_hit & (t > MIN_HIT_DIST) & (t < best_t)
        best_t = jnp.where(good, t, best_t)
        best_i = jnp.where(good, tri, best_i)

        # Internal lanes: push both children (masked scatter via OOB-drop).
        push = box_hit & ~is_leaf
        oob = jnp.int32(max_stack)
        dest = jnp.where(push, sp, oob)
        stack = stack.at[lanes, dest].set(nodes.right[idx], mode="drop")
        sp = sp + push.astype(jnp.int32)
        dest = jnp.where(push, sp, oob)
        stack = stack.at[lanes, dest].set(nodes.left[idx], mode="drop")
        sp = sp + push.astype(jnp.int32)
        return stack, sp, best_t, best_i

    _, _, best_t, best_i = jax.lax.while_loop(
        cond, body, (stack0, sp0, best_t0, best_i0)
    )
    return Hit(t=best_t, tri=best_i, hit=best_t < MAX_DIST)
