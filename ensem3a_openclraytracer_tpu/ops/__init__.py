"""Compute primitives: geometry, sampling, BSDFs, camera, environment,
intersection/traversal kernels, tonemapping."""
