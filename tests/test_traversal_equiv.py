"""Acceleration-structure equivalence: LBVH traversal == MXU == brute
force on the reference's stress scenes (SURVEY.md section 7 stage 4:
'traversal hit set == brute-force hit set on all five scenes')."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from ensem3a_openclraytracer_tpu.accel.lbvh import build_lbvh
from ensem3a_openclraytracer_tpu.ops.camera import camera_rays
from ensem3a_openclraytracer_tpu.ops.intersect import trace_bruteforce
from ensem3a_openclraytracer_tpu.ops.intersect_mxu import build_tri_features, trace_mxu
from ensem3a_openclraytracer_tpu.ops.traversal import BVHNodes, trace_bvh
from ensem3a_openclraytracer_tpu.scene.scene import Scene


SCENES = ["singleTriangle.obj", "Cornell box.obj", "FurnaceHD.obj",
          "Serre_leger.obj", "Cornell box_Monkey.obj"]


def _rays_for(sc, n=24):
    cam = sc.camera_params()
    return camera_rays(cam.position, cam.rotation_deg, cam.fov_deg, n, n)


@pytest.mark.parametrize("name", SCENES)
def test_bvh_equals_bruteforce(scenes_dir, name):
    path = os.path.join(str(scenes_dir), name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not present")
    sc = Scene.load(path, use_bvh=False)
    g = sc.geometry
    nodes = BVHNodes(*(jnp.asarray(a) for a in build_lbvh(
        np.asarray(g.v0), np.asarray(g.v1), np.asarray(g.v2))))
    ro, rd = _rays_for(sc)
    h_ref = trace_bruteforce(g.v0, g.v1, g.v2, ro, rd)
    h_bvh = trace_bvh(nodes, g.v0, g.v1, g.v2, ro, rd)
    h_mxu = trace_mxu(g.feats, ro, rd)
    np.testing.assert_array_equal(np.asarray(h_ref.hit), np.asarray(h_bvh.hit))
    both = np.asarray(h_ref.hit)
    np.testing.assert_allclose(
        np.asarray(h_bvh.t)[both], np.asarray(h_ref.t)[both], rtol=1e-4, atol=1e-4
    )
    assert (np.asarray(h_ref.hit) == np.asarray(h_mxu.hit)).mean() > 0.999
    np.testing.assert_allclose(
        np.asarray(h_mxu.t)[both], np.asarray(h_ref.t)[both], rtol=1e-3, atol=1e-3
    )


def test_bvh_bounce_rays_equivalence(scenes_dir, rng):
    """Incoherent (random) rays - the GI bounce case - agree too."""
    path = os.path.join(str(scenes_dir), "Cornell box_Monkey.obj")
    if not os.path.exists(path):
        pytest.skip("monkey not present")
    sc = Scene.load(path, use_bvh=False)
    g = sc.geometry
    lo = np.asarray(g.v0).min(axis=0)
    hi = np.asarray(g.v0).max(axis=0)
    ro = rng.uniform(lo, hi, size=(512, 3)).astype(np.float32)
    rd = rng.normal(size=(512, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro, rd = jnp.asarray(ro), jnp.asarray(rd)
    nodes = BVHNodes(*(jnp.asarray(a) for a in build_lbvh(
        np.asarray(g.v0), np.asarray(g.v1), np.asarray(g.v2))))
    h_ref = trace_bruteforce(g.v0, g.v1, g.v2, ro, rd)
    h_bvh = trace_bvh(nodes, g.v0, g.v1, g.v2, ro, rd)
    np.testing.assert_array_equal(np.asarray(h_ref.hit), np.asarray(h_bvh.hit))
    both = np.asarray(h_ref.hit)
    np.testing.assert_allclose(
        np.asarray(h_bvh.t)[both], np.asarray(h_ref.t)[both], rtol=1e-4, atol=1e-4
    )
