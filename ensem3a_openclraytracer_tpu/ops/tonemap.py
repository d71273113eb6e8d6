"""Output-stage post-processing.

The reference clamps to [0, 1] in the kernel (Raytracing.cl:216-219) and
ships a disabled 'gamma' kernel that raises to the power 2.2 - darkening,
not encoding (ImgProcessing.cl:1-9, bypassed at main.py:97).  We provide
the correct sRGB-ish encode, the reference-parity curve, and plain clamp.
"""

from __future__ import annotations

import jax.numpy as jnp


def clamp01(img):
    return jnp.clip(img, 0.0, 1.0)


def gamma_encode(img, gamma: float = 2.2):
    """Standard display encode: clamp + pow(1/gamma)."""
    return jnp.power(clamp01(img), 1.0 / gamma)


def reference_imgprocess(img, gamma: float = 2.2):
    """Parity with the reference's (bypassed) ImgProcessing kernel:
    clamp + pow(gamma) - darkens; kept for behavioral completeness."""
    return jnp.power(clamp01(img), gamma)


def postprocess(img, mode: str = "clamp"):
    """Dispatch by mode: 'clamp' (reference default output path),
    'gamma' (correct encode), 'reference_gamma' (the pow-2.2 curio)."""
    if mode == "clamp":
        return clamp01(img)
    if mode == "gamma":
        return gamma_encode(img)
    if mode == "reference_gamma":
        return reference_imgprocess(img)
    raise ValueError(f"unknown postprocess mode: {mode!r}")
