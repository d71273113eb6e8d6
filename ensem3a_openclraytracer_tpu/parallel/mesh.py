"""Device-mesh construction for data-parallel rendering.

The reference is single-device (SURVEY.md section 2.4: the only
parallelism is one OpenCL work-item per pixel, KernelLauncher.py:76-77).
The TPU-native scale-out story is a 2-D ``jax.sharding.Mesh``:

  * ``dp`` — pixel/tile data parallelism: each chip owns a contiguous
    block of image rows; the scene (triangles, BVH, materials, IBL) is
    replicated in every chip's HBM, so the forward pass needs **zero**
    inter-chip communication.
  * ``sp`` — sample (spp) parallelism: chips along this axis estimate
    disjoint Monte-Carlo sample sets of the *same* pixels and average
    with one ``pmean`` over ICI at the end.

Gradients of replicated parameters (materials / sun / IBL) are
all-reduced with ``psum`` over both axes — inserted automatically by XLA
when differentiating through ``shard_map``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DP_AXIS = "dp"
SP_AXIS = "sp"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    sp: int = 1,
    axis_names: Tuple[str, str] = (DP_AXIS, SP_AXIS),
) -> Mesh:
    """Build a ``(dp, sp)`` mesh over ``devices`` (default: all local).

    ``sp`` chips cooperate on the same pixels (sample parallelism); the
    remaining factor is pixel data parallelism.  ``sp`` must divide the
    device count."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    n = devices.size
    if n % sp != 0:
        raise ValueError(f"sp={sp} must divide device count {n}")
    return Mesh(devices.reshape(n // sp, sp), axis_names)


def single_device_mesh() -> Mesh:
    """A 1x1 mesh on the default device — lets the sharded code paths run
    unchanged on one chip."""
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), (DP_AXIS, SP_AXIS))
