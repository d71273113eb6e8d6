"""Procedural test scenes built in code - no file IO, no assets.

Used by ``__graft_entry__.py``, ``bench.py``, and the test suite wherever
a self-contained scene is needed.  The Cornell-style box mirrors the
capability load of the reference's canonical "Cornell box" workload
(36 tris, emissive ceiling light, colored diffuse walls, a glossy and a
glass blocker - materials per SURVEY.md section 2.3's type codes) but is
authored from scratch here.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ensem3a_openclraytracer_tpu.accel.lbvh import build_lbvh
from ensem3a_openclraytracer_tpu.ops.intersect_mxu import build_tri_features
from ensem3a_openclraytracer_tpu.ops.traversal import BVHNodes
from ensem3a_openclraytracer_tpu.scene.materials import (
    CameraParams,
    EnvParams,
    MaterialParams,
    default_sky,
)
from ensem3a_openclraytracer_tpu.scene.scene import GeometryPack


def _quad(a, b, c, d, mat):
    """Two CCW triangles for the quad a-b-c-d, tagged with material id."""
    return [(a, b, c, mat), (a, c, d, mat)]


def _cube(center, size, mat):
    cx, cy, cz = center
    sx, sy, sz = (size, size, size) if np.isscalar(size) else size
    x0, x1 = cx - sx / 2, cx + sx / 2
    y0, y1 = cy - sy / 2, cy + sy / 2
    z0, z1 = cz - sz / 2, cz + sz / 2
    tris = []
    # windings chosen so cross(b-a, c-a) points OUT of the cube - the
    # estimator (like the reference) never flips normals toward the ray,
    # so inward normals trap bounce paths inside the solid
    tris += _quad((x0, y1, z0), (x1, y1, z0), (x1, y0, z0), (x0, y0, z0), mat)  # bottom -z
    tris += _quad((x1, y0, z1), (x1, y1, z1), (x0, y1, z1), (x0, y0, z1), mat)  # top +z
    tris += _quad((x0, y0, z1), (x0, y1, z1), (x0, y1, z0), (x0, y0, z0), mat)  # -x
    tris += _quad((x1, y1, z0), (x1, y1, z1), (x1, y0, z1), (x1, y0, z0), mat)  # +x
    tris += _quad((x1, y0, z0), (x1, y0, z1), (x0, y0, z1), (x0, y0, z0), mat)  # -y
    tris += _quad((x0, y1, z1), (x1, y1, z1), (x1, y1, z0), (x0, y1, z0), mat)  # +y
    return tris


def _pack(tris, use_bvh: bool) -> GeometryPack:
    from ensem3a_openclraytracer_tpu.scene.scene import morton_order

    v0 = np.asarray([t[0] for t in tris], np.float32)
    v1 = np.asarray([t[1] for t in tris], np.float32)
    v2 = np.asarray([t[2] for t in tris], np.float32)
    mat = np.asarray([t[3] for t in tris], np.int32)
    order = morton_order(v0, v1, v2)
    v0, v1, v2, mat = v0[order], v1[order], v2[order], mat[order]
    n = np.cross(v1 - v0, v2 - v0)
    n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    uv = np.zeros((len(tris), 2), np.float32)
    bvh: Optional[BVHNodes] = None
    feats = None
    if use_bvh:
        nodes = build_lbvh(v0, v1, v2)
        bvh = BVHNodes(*(jnp.asarray(a) for a in nodes))
    else:
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


# material ids (type codes per ops/bsdf.py: 0 emissive, 1 diffuse,
# 2 glossy-GGX, 3 glass)
M_LIGHT, M_WHITE, M_RED, M_GREEN, M_GLOSSY, M_GLASS = range(6)


def cornell_materials() -> MaterialParams:
    return MaterialParams(
        mtype=jnp.asarray([0, 1, 1, 1, 2, 3], jnp.int32),
        color=jnp.asarray(
            [
                [1.0, 1.0, 1.0],
                [0.75, 0.75, 0.75],
                [0.75, 0.15, 0.15],
                [0.15, 0.75, 0.15],
                [0.85, 0.85, 0.9],
                [0.9, 0.95, 0.9],
            ],
            jnp.float32,
        ),
        # slot doubles as emissive power for type 0
        roughness=jnp.asarray([12.0, 0.8, 0.9, 0.9, 0.15, 0.0], jnp.float32),
        ior=jnp.asarray([1.0, 1.0, 1.0, 1.0, 1.0, 1.5], jnp.float32),
    )


def cornell_geometry(use_bvh: bool = False) -> GeometryPack:
    """Cornell-style box interior along +y (the camera's forward axis):
    x in [-1, 1], z in [-1, 1], y in [0, 4]."""
    tris = []
    tris += _quad((-1, 0, -1), (1, 0, -1), (1, 4, -1), (-1, 4, -1), M_WHITE)  # floor z=-1
    tris += _quad((-1, 0, 1), (-1, 4, 1), (1, 4, 1), (1, 0, 1), M_WHITE)  # ceiling z=+1
    tris += _quad((-1, 4, -1), (1, 4, -1), (1, 4, 1), (-1, 4, 1), M_WHITE)  # back y=4
    tris += _quad((-1, 0, -1), (-1, 4, -1), (-1, 4, 1), (-1, 0, 1), M_RED)  # left x=-1
    tris += _quad((1, 0, -1), (1, 0, 1), (1, 4, 1), (1, 4, -1), M_GREEN)  # right x=+1
    # ceiling light panel just below the ceiling
    tris += _quad(
        (-0.4, 2.2, 0.98), (-0.4, 3.2, 0.98), (0.4, 3.2, 0.98), (0.4, 2.2, 0.98), M_LIGHT
    )
    tris += _cube((-0.45, 2.9, -0.62), (0.55, 0.55, 0.75), M_GLOSSY)
    tris += _cube((0.45, 2.2, -0.7), (0.5, 0.5, 0.6), M_GLASS)
    return _pack(tris, use_bvh)


def cornell_camera() -> CameraParams:
    return CameraParams.create(
        position=(0.0, 0.35, 0.0), rotation_deg=(0.0, 0.0, 0.0), fov_deg=50.0
    )


def cornell_env(ibl_res: Tuple[int, int] = (16, 32)) -> EnvParams:
    return EnvParams.create(
        sun_angles_deg=(30.0, 0.0, 20.0),
        sun_power=0.0,  # interior scene: no sun
        ibl_power=0.0,
        ibl=default_sky(*ibl_res),
    )


def make_cornell_scene(use_bvh: bool = False):
    """Returns ``(geom, materials, env, camera)`` ready for the renderer."""
    return cornell_geometry(use_bvh), cornell_materials(), cornell_env(), cornell_camera()


def make_glass_light_scene(use_bvh: bool = False):
    """Diffuse floor lit by an emissive panel with a wide glass pane in
    between: every floor->light path crosses the glass.  Exercises the
    NEE edge case where the shadow ray is glass-occluded but the BSDF
    chain (diffuse -> glass -> light) still carries the light; an
    estimator that suppresses BSDF emission after any NEE-sampled vertex
    renders this scene black."""
    tris = []
    # floor z=0, normal +z
    tris += _quad((-8, -4, 0), (8, -4, 0), (8, 12, 0), (-8, 12, 0), M_WHITE)
    # glass pane z=1.5, wide enough that no bounce path slips around it
    tris += _quad((-60, -60, 1.5), (60, -60, 1.5), (60, 60, 1.5), (-60, 60, 1.5), M_GLASS)
    # emissive panel z=3, likewise wide
    tris += _quad((-40, -40, 3), (40, -40, 3), (40, 40, 3), (-40, 40, 3), M_LIGHT)
    geom = _pack(tris, use_bvh)
    env = EnvParams.create(
        sun_angles_deg=(0.0, 0.0, 0.0),
        sun_power=0.0,
        ibl_power=0.0,
        ibl=default_sky(8, 16),
    )
    cam = CameraParams.create(
        position=(0.0, 0.0, 1.0), rotation_deg=(-35.0, 0.0, 0.0), fov_deg=55.0
    )
    mats = cornell_materials()
    # modest power so radiance stays O(1) for absolute-tolerance checks
    mats = mats._replace(roughness=mats.roughness.at[M_LIGHT].set(2.0))
    return geom, mats, env, cam


def make_outdoor_scene(n_cubes: int = 64, seed: int = 7, use_bvh: bool = True,
                       emissive_panel: bool = False):
    """An open scene exercising sun + IBL paths: a ground plane and a grid
    of jittered cubes under the procedural sky.  ``12 * n_cubes + 2``
    triangles - sized to stress BVH traversal.  ``emissive_panel`` adds
    a light panel over the cubes so the scene has a LightPack (NEE/MIS
    tests on multi-block geometry)."""
    rng = np.random.default_rng(seed)
    tris = []
    tris += _quad((-40, -40, 0), (40, -40, 0), (40, 40, 0), (-40, 40, 0), M_WHITE)
    if emissive_panel:
        tris += _quad((-3, 8, 6), (3, 8, 6), (3, 14, 6), (-3, 14, 6), M_LIGHT)
    side = int(np.ceil(np.sqrt(n_cubes)))
    for i in range(n_cubes):
        gx, gy = i % side, i // side
        x = (gx - side / 2) * 3.0 + rng.uniform(-0.8, 0.8)
        y = 6.0 + gy * 3.0 + rng.uniform(-0.8, 0.8)
        s = rng.uniform(0.5, 1.4)
        m = [M_WHITE, M_RED, M_GREEN, M_GLOSSY][i % 4]
        tris += _cube((x, y, s / 2), s, m)
    geom = _pack(tris, use_bvh)
    env = EnvParams.create(
        sun_angles_deg=(35.0, 0.0, 15.0),
        sun_power=2.0,
        ibl_power=0.6,
        ibl=default_sky(16, 32),
    )
    cam = CameraParams.create(
        position=(0.0, 0.0, 2.0), rotation_deg=(-12.0, 0.0, 0.0), fov_deg=60.0
    )
    return geom, cornell_materials(), env, cam
