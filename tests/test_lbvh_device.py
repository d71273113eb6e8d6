"""On-device LBVH builder: must produce the host builder's exact tree
(same stable tie-breaking, same prefix oracle), pass the structural
validator, and yield identical traversal results."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ensem3a_openclraytracer_tpu.accel.lbvh import build_lbvh
from ensem3a_openclraytracer_tpu.accel.lbvh_device import build_lbvh_device
from ensem3a_openclraytracer_tpu.accel.validate import validate_bvh
from ensem3a_openclraytracer_tpu.ops.intersect import trace_bruteforce
from ensem3a_openclraytracer_tpu.ops.traversal import BVHNodes, trace_bvh
from ensem3a_openclraytracer_tpu.scene.objloader import load_obj

REF = "/root/reference/ObjFiles"


def _random_soup(rng, t):
    c = rng.uniform(-5, 5, size=(t, 3)).astype(np.float32)
    v0 = c + rng.normal(scale=0.4, size=(t, 3)).astype(np.float32)
    v1 = c + rng.normal(scale=0.4, size=(t, 3)).astype(np.float32)
    v2 = c + rng.normal(scale=0.4, size=(t, 3)).astype(np.float32)
    return v0, v1, v2


def _assert_same_tree(host: BVHNodes, dev: BVHNodes):
    np.testing.assert_array_equal(np.asarray(dev.left), host.left)
    np.testing.assert_array_equal(np.asarray(dev.right), host.right)
    np.testing.assert_array_equal(np.asarray(dev.tri), host.tri)
    np.testing.assert_array_equal(np.asarray(dev.bmin), host.bmin)
    np.testing.assert_array_equal(np.asarray(dev.bmax), host.bmax)


@pytest.mark.parametrize("t", [1, 2, 3, 7, 64, 211, 1000])
def test_device_build_equals_host_build(rng, t):
    v0, v1, v2 = _random_soup(rng, t)
    _assert_same_tree(build_lbvh(v0, v1, v2), build_lbvh_device(v0, v1, v2))


def test_device_build_duplicate_centroids(rng):
    """Equal Morton codes exercise the rank tie-breaking path."""
    v0, v1, v2 = _random_soup(rng, 16)
    v0 = np.repeat(v0[:4], 4, axis=0)
    v1 = np.repeat(v1[:4], 4, axis=0)
    v2 = np.repeat(v2[:4], 4, axis=0)
    dev = build_lbvh_device(v0, v1, v2)
    _assert_same_tree(build_lbvh(v0, v1, v2), dev)
    host_nodes = BVHNodes(*(np.asarray(a) for a in dev))
    validate_bvh(host_nodes, v0.shape[0],
                 np.minimum(np.minimum(v0, v1), v2),
                 np.maximum(np.maximum(v0, v1), v2))


def test_device_build_reference_scenes():
    """All reference scene files: identical trees + validator passes."""
    if not os.path.isdir(REF):
        pytest.skip("reference scenes unavailable")
    for name in ["singleTriangle.obj", "Cornell box.obj", "FurnaceHD.obj",
                 "Serre_leger.obj", "Cornell box_Monkey.obj"]:
        mesh = load_obj(os.path.join(REF, name))
        fd = mesh.face_data
        v0 = mesh.v_p[fd[:, 7]]
        v1 = mesh.v_p[fd[:, 8]]
        v2 = mesh.v_p[fd[:, 9]]
        dev = build_lbvh_device(v0, v1, v2)
        _assert_same_tree(build_lbvh(v0, v1, v2), dev)
        host_nodes = BVHNodes(*(np.asarray(a) for a in dev))
        validate_bvh(host_nodes, v0.shape[0],
                     np.minimum(np.minimum(v0, v1), v2),
                     np.maximum(np.maximum(v0, v1), v2))


def test_device_build_traversal_equivalence(rng):
    v0, v1, v2 = _random_soup(rng, 300)
    nodes = build_lbvh_device(v0, v1, v2)
    ro = rng.uniform(-8, 8, size=(500, 3)).astype(np.float32)
    rd = rng.normal(size=(500, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    h_ref = trace_bruteforce(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                             jnp.asarray(ro), jnp.asarray(rd))
    h_bvh = trace_bvh(nodes, jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                      jnp.asarray(ro), jnp.asarray(rd))
    np.testing.assert_array_equal(np.asarray(h_ref.hit), np.asarray(h_bvh.hit))
    np.testing.assert_allclose(np.asarray(h_ref.t), np.asarray(h_bvh.t), rtol=1e-6)


def test_device_build_is_jittable(rng):
    """The whole build lives in one XLA program (no host sync inside)."""
    v0, v1, v2 = _random_soup(rng, 128)

    @jax.jit
    def root_bounds(v0, v1, v2):
        nodes = build_lbvh_device(v0, v1, v2)
        return nodes.bmin[0], nodes.bmax[0]

    lo, hi = root_bounds(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))
    allv = np.concatenate([v0, v1, v2])
    np.testing.assert_allclose(np.asarray(lo), allv.min(0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(hi), allv.max(0), rtol=1e-6)
