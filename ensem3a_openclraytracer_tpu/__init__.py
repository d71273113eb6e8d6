"""TPU-native differentiable path tracer.

A brand-new JAX/XLA/Pallas framework with the capabilities of
QuentinHuan/ENSEM3A_OpenCLRaytracer (see SURVEY.md): OBJ scene import with
per-face materials, BVH-accelerated ray traversal (Moller-Trumbore),
diffuse / glossy-GGX / glass BSDFs, directional sun + lat-long image-based
environment lighting, ini-compatible per-scene configuration - rebuilt
TPU-first: wavefront SoA ray batches under ``lax.scan`` instead of a
per-pixel megakernel, an LBVH (Morton codes / Karras radix tree) instead of
the reference's naive CPU-Python builder, end-to-end differentiability of
pixels w.r.t. material / environment parameters, and multi-chip scaling via
``shard_map`` over a device mesh.
"""

from ensem3a_openclraytracer_tpu.version import __version__

__all__ = ["__version__"]
