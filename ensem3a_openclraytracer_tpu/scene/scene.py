"""Scene assembly: OBJ + ini -> device-ready SoA geometry + parameters.

Replaces the reference's ``Scene`` class (FileManager.py:209-331).  The key
TPU-first change is *pre-gathering*: instead of shipping indexed
``V_p/V_n/V_uv + faceData`` buffers and gathering per intersection
(MathLib.cl:203-228 ``makeTri``), triangles are flattened once at load time
into ``v0/v1/v2/n/uv/mat`` SoA arrays - intersection then touches only
contiguous data.  The indexed ABI arrays are still produced and kept for
parity tests and config write-back.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ensem3a_openclraytracer_tpu.accel.lbvh import build_lbvh, morton_codes
from ensem3a_openclraytracer_tpu.ops.intersect_mxu import TriFeatures, build_tri_features
from ensem3a_openclraytracer_tpu.ops.traversal import BVHNodes
from ensem3a_openclraytracer_tpu.scene.config import ConfigReader
from ensem3a_openclraytracer_tpu.scene.materials import (
    CameraParams,
    EnvParams,
    MaterialParams,
    default_sky,
)
from ensem3a_openclraytracer_tpu.scene.objloader import ObjMesh, load_obj

# Scenes at or under this triangle count intersect fastest through the
# MXU matmul engine (ops/intersect_mxu.py): dense systolic-array sweeps
# beat gather-heavy tree walks by orders of magnitude on TPU.  Above it
# the LBVH wins on asymptotics.  Tuned on v5e - see bench history.
MXU_TRACE_MAX_TRIS = 65536


class LightPack(NamedTuple):
    """Emissive-triangle table for next-event estimation (the working
    version of the reference's dead ``sampleLight``, MathLib.cl:419-454).
    Static shapes: one row per emissive face."""

    v0: jnp.ndarray  # [L, 3]
    v1: jnp.ndarray  # [L, 3]
    v2: jnp.ndarray  # [L, 3]
    n: jnp.ndarray  # [L, 3] unit geometric normal
    power: jnp.ndarray  # [L] emissive power snapshot (the material
    #                   roughness slot) - the fused kernel's constant copy
    area: jnp.ndarray  # [L]
    mat: jnp.ndarray  # [L] int32 material index: differentiable paths
    #                   re-derive power as materials.roughness[mat] so
    #                   d(NEE radiance)/d(emissive power) flows


def build_light_pack(
    geom: Optional["GeometryPack"],
    materials,
    host_arrays: Optional[tuple] = None,
) -> Optional[LightPack]:
    """Collect emissive faces (material type 0) from a packed geometry.
    Returns None when the scene has no lights.

    ``host_arrays = (v0, v1, v2, mat)`` (numpy, Morton order) avoids the
    device->host fetches of ``np.asarray(geom.*)`` - prefer
    :meth:`Scene.light_pack`, which supplies them from the mesh (a D2H
    fetch over a tunneled backend costs seconds)."""
    if host_arrays is not None:
        h_v0, h_v1, h_v2, mat_ids = host_arrays
        mat_ids = np.asarray(mat_ids, np.int32)
    else:
        mat_ids = np.asarray(geom.mat)
    mtype = np.asarray(materials.mtype)
    power = np.asarray(materials.roughness)
    emissive = mtype[np.clip(mat_ids, 0, mtype.shape[0] - 1)] == 0
    idx = np.nonzero(emissive)[0]
    if idx.size == 0:
        return None
    if host_arrays is not None:
        v0, v1, v2 = h_v0[idx], h_v1[idx], h_v2[idx]
    else:
        v0 = np.asarray(geom.v0)[idx]
        v1 = np.asarray(geom.v1)[idx]
        v2 = np.asarray(geom.v2)[idx]
    nrm = np.cross(v1 - v0, v2 - v0)
    area = 0.5 * np.linalg.norm(nrm, axis=-1)
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    return LightPack(
        v0=jnp.asarray(v0),
        v1=jnp.asarray(v1),
        v2=jnp.asarray(v2),
        n=jnp.asarray(nrm),
        power=jnp.asarray(power[mat_ids[idx]]),
        area=jnp.asarray(area.astype(np.float32)),
        mat=jnp.asarray(mat_ids[idx], jnp.int32),
    )


class GeometryPack(NamedTuple):
    """Device-resident SoA triangle soup (+ optional BVH)."""

    v0: jnp.ndarray  # [T, 3] float32
    v1: jnp.ndarray  # [T, 3]
    v2: jnp.ndarray  # [T, 3]
    n: jnp.ndarray  # [T, 3] per-face shading normal (vertex a's normal -
    #               the reference does no interpolation, MathLib.cl:151)
    uv: jnp.ndarray  # [T, 2] (vertex a's uv, MathLib.cl:152)
    mat: jnp.ndarray  # [T] int32 material index
    bvh: Optional[BVHNodes]  # None => no tree
    feats: Optional[TriFeatures]  # None => no MXU engine; preferred when set


def morton_order(v0, v1, v2) -> np.ndarray:
    """Spatial (Morton) triangle ordering - consecutive triangles land in
    the same region, which tightens the MXU engine's per-block AABBs and
    the LBVH's leaf runs."""
    c = (np.asarray(v0) + np.asarray(v1) + np.asarray(v2)) / 3.0
    codes = morton_codes(c, c.min(0), c.max(0))
    return np.argsort(codes, kind="stable").astype(np.int64)


def pack_geometry(mesh: ObjMesh, use_bvh: Optional[bool] = None) -> GeometryPack:
    """Pre-gather indexed mesh data into SoA triangles on device.

    Triangles are Morton-reordered; all per-face arrays (and therefore
    hit indices) use the reordered space consistently."""
    fd = mesh.face_data
    v0 = mesh.v_p[fd[:, 7]]
    v1 = mesh.v_p[fd[:, 8]]
    v2 = mesh.v_p[fd[:, 9]]
    n = mesh.v_n[np.clip(fd[:, 4], 0, len(mesh.v_n) - 1)]
    n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    uv = mesh.v_uv[np.clip(fd[:, 1], 0, len(mesh.v_uv) - 1)]
    mat = fd[:, 0].astype(np.int32)
    order = morton_order(v0, v1, v2)
    v0, v1, v2, n, uv, mat = v0[order], v1[order], v2[order], n[order], uv[order], mat[order]

    auto_big = use_bvh is None and fd.shape[0] > MXU_TRACE_MAX_TRIS
    if use_bvh is None:
        use_bvh = auto_big
    bvh = None
    feats = None
    if use_bvh:
        nodes = build_lbvh(v0, v1, v2)
        bvh = BVHNodes(*(jnp.asarray(a) for a in nodes))
    if not use_bvh or auto_big:
        # MXU features at any size: the VMEM-resident engine under
        # MXU_TRACE_MAX_TRIS, the HBM-streamed tile-pair engine
        # (ops/pairs.py, trace_pairs_streamed) above it.  Auto-detected
        # big scenes carry BOTH structures: TPU streams blocks, CPU
        # through the LBVH (pathtracer.trace dispatch).
        feats = build_tri_features(v0, v1, v2)

    return GeometryPack(
        v0=jnp.asarray(v0),
        v1=jnp.asarray(v1),
        v2=jnp.asarray(v2),
        n=jnp.asarray(n),
        uv=jnp.asarray(uv),
        mat=jnp.asarray(mat),
        bvh=bvh,
        feats=feats,
    )


def load_ibl_image(path: str, fallback_dirs: tuple = ()) -> np.ndarray:
    """Load a lat-long environment image as float32 [H, W, 3] in [0, 1].

    Falls back to the procedural sky when the file is missing (the
    reference's 8k IBL asset is stripped from its checkout)."""
    candidates = [path] + [os.path.join(d, os.path.basename(path)) for d in fallback_dirs]
    for cand in candidates:
        if cand and os.path.exists(cand):
            from PIL import Image

            img = Image.open(cand).convert("RGB")
            return np.asarray(img, np.float32) / 255.0
    return default_sky()


@dataclass
class Scene:
    """Host-side scene: import ABI arrays + config + device geometry.

    Mirrors the reference Scene's capabilities (FileManager.py:209-250):
    geometry import, per-scene ini config (auto-created with defaults),
    material table, emissive-face light list, and acceleration-structure
    build that can be skipped/reused across re-renders
    (``rebuild_accel=False`` + ``geometry`` carry-over, the UI.py:98 path).
    """

    obj_path: str
    mesh: ObjMesh
    config: ConfigReader
    material_table: np.ndarray  # [M, 6] reference ABI
    light_faces: np.ndarray  # int32 indices of emissive faces
    geometry: GeometryPack

    @staticmethod
    def load(
        obj_path: str,
        rebuild_accel: bool = True,
        geometry: Optional[GeometryPack] = None,
        use_bvh: Optional[bool] = None,
    ) -> "Scene":
        mesh = load_obj(obj_path)
        config = ConfigReader(
            obj_path[: -len(".obj")] + ".ini" if obj_path.endswith(".obj") else obj_path + ".ini",
            material_count=mesh.num_materials - 1,
        )
        table = config.material_table(mesh.num_materials)

        if rebuild_accel or geometry is None:
            geom = pack_geometry(mesh, use_bvh=use_bvh)
        else:
            geom = geometry
        # light list in the packed (Morton-ordered) face space - derived
        # host-side from the mesh (np.asarray(geom.mat) would D2H-fetch
        # the just-uploaded device array; over a tunneled backend that
        # single fetch dominated scene load by tens of seconds)
        fd = mesh.face_data
        order = morton_order(
            mesh.v_p[fd[:, 7]], mesh.v_p[fd[:, 8]], mesh.v_p[fd[:, 9]]
        )
        mat_ids = fd[:, 0].astype(np.int32)[order]
        emissive = table[np.clip(mat_ids, 0, table.shape[0] - 1), 0] == 0
        light_faces = np.nonzero(emissive)[0].astype(np.int32)
        return Scene(
            obj_path=obj_path,
            mesh=mesh,
            config=config,
            material_table=table,
            light_faces=light_faces,
            geometry=geom,
        )

    # -- parameter pytrees ---------------------------------------------------

    def material_params(self) -> MaterialParams:
        return MaterialParams.from_table(self.material_table)

    def env_params(self, ibl: Optional[np.ndarray] = None) -> EnvParams:
        env = self.config.environment_settings()
        if ibl is None:
            ibl = load_ibl_image(
                env.ibl_file,
                fallback_dirs=(os.path.dirname(self.obj_path), "IBL", "/root/reference/IBL"),
            )
        return EnvParams.create(
            sun_angles_deg=env.sun_angles_deg,
            sun_power=env.sun_power,
            ibl_power=env.ibl_power,
            ibl=ibl,
        )

    def camera_params(self) -> CameraParams:
        cam = self.config.camera_settings()
        return CameraParams.create(cam.position, cam.rotation_deg, cam.fov_deg)

    def light_pack(self, materials: Optional[MaterialParams] = None) -> Optional[LightPack]:
        """Emissive-face table for NEE, built from the host mesh (no
        device->host fetches)."""
        if materials is None:
            materials = self.material_params()
        fd = self.mesh.face_data
        v0 = self.mesh.v_p[fd[:, 7]]
        v1 = self.mesh.v_p[fd[:, 8]]
        v2 = self.mesh.v_p[fd[:, 9]]
        order = morton_order(v0, v1, v2)
        host = (v0[order], v1[order], v2[order], fd[:, 0].astype(np.int32)[order])
        return build_light_pack(None, materials, host_arrays=host)

    def reload_materials(self) -> None:
        """Re-read the material table from the config file (material-edit
        round trip without geometry/BVH rebuild)."""
        self.material_table = self.config.material_table(self.mesh.num_materials)

    @property
    def num_tris(self) -> int:
        return self.mesh.num_faces
