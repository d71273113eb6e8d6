"""Material and environment parameter pytrees.

The differentiable parameter surface of the renderer: material color /
roughness-or-emissive-power / ior, sun and IBL powers, sun angles, and the
IBL texel array.  Pixel gradients flow into all of these (the reference's
material ABI is float32x6 ``[type, R, G, B, roughness, ior]``,
SURVEY.md section 2.3; type codes in ops/bsdf.py).  ``ior`` is carried for
ABI parity - the reference's glass ignores it (straight-through rays,
MathLib.cl:391-395).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class MaterialParams(NamedTuple):
    """SoA material table. ``mtype`` is integer-coded (0 emissive,
    1 diffuse, 2 glossy, 3 glass) and non-differentiable; the rest are
    differentiable leaves."""

    mtype: jnp.ndarray  # [M] int32
    color: jnp.ndarray  # [M, 3] float32
    roughness: jnp.ndarray  # [M] float32 (emissive power for type 0)
    ior: jnp.ndarray  # [M] float32 (unused by the estimator; ABI parity)

    @staticmethod
    def from_table(table: np.ndarray) -> "MaterialParams":
        """From the reference's ``[M, 6]`` float ABI."""
        table = np.asarray(table, np.float32).reshape(-1, 6)
        return MaterialParams(
            mtype=jnp.asarray(table[:, 0].astype(np.int32)),
            color=jnp.asarray(table[:, 1:4]),
            roughness=jnp.asarray(table[:, 4]),
            ior=jnp.asarray(table[:, 5]),
        )

    def to_table(self) -> np.ndarray:
        """Back to the ``[M, 6]`` ABI (for config write-back)."""
        m = self.mtype.shape[0]
        out = np.zeros((m, 6), np.float32)
        out[:, 0] = np.asarray(self.mtype, np.float32)
        out[:, 1:4] = np.asarray(self.color)
        out[:, 4] = np.asarray(self.roughness)
        out[:, 5] = np.asarray(self.ior)
        return out


class EnvParams(NamedTuple):
    """Environment lighting parameters (reference envData ABI
    ``[sun_rx, sun_ry, sun_rz, sun_Power, IBL_Power]`` + the IBL image)."""

    sun_angles_deg: jnp.ndarray  # [3] float32
    sun_power: jnp.ndarray  # [] float32
    ibl_power: jnp.ndarray  # [] float32
    ibl: jnp.ndarray  # [H, W, 3] float32

    @staticmethod
    def create(sun_angles_deg=(0.0, 0.0, 0.0), sun_power=1.0, ibl_power=1.0, ibl=None):
        if ibl is None:
            ibl = default_sky(8, 16)
        return EnvParams(
            sun_angles_deg=jnp.asarray(sun_angles_deg, jnp.float32),
            sun_power=jnp.asarray(sun_power, jnp.float32),
            ibl_power=jnp.asarray(ibl_power, jnp.float32),
            ibl=jnp.asarray(ibl, jnp.float32),
        )


class CameraParams(NamedTuple):
    """Pinhole camera (reference cam ABI fields 0-5, 9; SURVEY.md 2.3)."""

    position: jnp.ndarray  # [3] float32
    rotation_deg: jnp.ndarray  # [3] float32
    fov_deg: jnp.ndarray  # [] float32 (the ini's misnamed cam_DOF)

    @staticmethod
    def create(position=(0.0, 0.0, 0.0), rotation_deg=(0.0, 0.0, 0.0), fov_deg=45.0):
        return CameraParams(
            position=jnp.asarray(position, jnp.float32),
            rotation_deg=jnp.asarray(rotation_deg, jnp.float32),
            fov_deg=jnp.asarray(fov_deg, jnp.float32),
        )


def default_sky(height: int = 64, width: int = 128) -> np.ndarray:
    """Procedural gradient sky used when the configured IBL image is
    missing (the reference hard-required its 8k jpg, main.py:68; that
    asset is stripped from the checkout)."""
    v = np.linspace(0.0, 1.0, height, dtype=np.float32)[:, None, None]
    horizon = np.array([0.8, 0.85, 0.95], np.float32)
    zenith = np.array([0.2, 0.35, 0.7], np.float32)
    img = horizon * (1.0 - v) + zenith * v
    return np.broadcast_to(img, (height, width, 3)).copy()
