"""Multi-host (pod-slice) initialization and mesh construction.

The reference has no communication layer at all (SURVEY.md section 2.4);
this module is the multi-host entry point for the sharded renderer:
``initialize()`` wires up ``jax.distributed`` (one process per host,
chips per process discovered automatically), ``global_mesh()`` builds the
``(dp, sp)`` mesh over every chip in the slice, and the render/train
paths in :mod:`ensem3a_openclraytracer_tpu.parallel.render` /
:mod:`ensem3a_openclraytracer_tpu.models.optimize` work unchanged on it:
scene replicated per chip, pixel rows sharded over ``dp`` (rides ICI
within a host, DCN across hosts only for the final framebuffer pull),
sample sets over ``sp``, parameter-gradient ``psum`` inserted by XLA.

Single-process usage is unaffected - ``global_mesh()`` on one host is
exactly ``make_mesh(jax.devices())``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from ensem3a_openclraytracer_tpu.parallel.mesh import make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize ``jax.distributed`` for a multi-host run.

    With no arguments, relies on the TPU environment's auto-discovery
    (GKE/Borg metadata), which is the normal production path; explicit
    coordinator/process arguments support bare-metal launches
    (``JAX_COORDINATOR_ADDRESS`` etc. also respected).  Safe to call on a
    single host - it becomes a no-op when there is nothing to join.
    """
    if num_processes is None and coordinator_address is None and (
        "JAX_COORDINATOR_ADDRESS" not in os.environ
    ):
        # single-host / auto-discovered environments: initialize() with no
        # args either joins the slice or is unnecessary
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            return
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(sp: int = 1):
    """A ``(dp, sp)`` mesh over every chip in the (possibly multi-host)
    slice.  ``jax.devices()`` is globally consistent across processes, so
    every host builds the identical mesh."""
    return make_mesh(jax.devices(), sp=sp)


def process_info() -> dict:
    """Host-level observability record (rank, host count, local chips)."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": [str(d) for d in jax.local_devices()],
        "global_device_count": len(jax.devices()),
    }
