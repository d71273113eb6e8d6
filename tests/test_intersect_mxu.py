"""MXU intersection engine: equivalence against Moller-Trumbore.

The Plucker matmul formulation (ops/intersect_mxu.py) must produce the
same closest-hit set as the scalar Moller-Trumbore oracle
(a re-derivation of the reference's MathLib.cl:117-160 semantics) on
random soups and on the procedural scenes; the Pallas fused kernel must
match the scan formulation bit-for-bit (validated in interpreter mode).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ensem3a_openclraytracer_tpu.ops.intersect import trace_bruteforce
from ensem3a_openclraytracer_tpu.ops.intersect_mxu import (
    build_tri_features,
    trace_mxu,
    trace_mxu_pallas,
)
from ensem3a_openclraytracer_tpu.ops.camera import camera_rays
from ensem3a_openclraytracer_tpu.testing import cornell_geometry, make_outdoor_scene


def random_soup(rng, t=211):
    v0 = rng.normal(size=(t, 3)).astype(np.float32)
    v1 = v0 + rng.normal(scale=0.7, size=(t, 3)).astype(np.float32)
    v2 = v0 + rng.normal(scale=0.7, size=(t, 3)).astype(np.float32)
    return v0, v1, v2


def random_rays(rng, n=2000, scale=2.0):
    ro = rng.normal(scale=scale, size=(n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def assert_hits_match(h_ref, h_new, t_tol=1e-4, idx_rate=0.995):
    # idx_rate < 1: on shared quad edges both triangles have the same t and
    # MT vs Plucker tie-breaking may legitimately pick either one
    hit_r = np.asarray(h_ref.hit)
    hit_n = np.asarray(h_new.hit)
    assert (hit_r == hit_n).mean() > 0.999
    both = hit_r & hit_n
    np.testing.assert_allclose(
        np.asarray(h_new.t)[both], np.asarray(h_ref.t)[both], atol=t_tol, rtol=1e-4
    )
    assert (np.asarray(h_ref.tri)[both] == np.asarray(h_new.tri)[both]).mean() >= idx_rate


def test_mxu_matches_moller_trumbore_random(rng):
    v0, v1, v2 = random_soup(rng)
    ro, rd = random_rays(rng)
    h_ref = trace_bruteforce(jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2), ro, rd)
    h_new = trace_mxu(build_tri_features(v0, v1, v2), ro, rd, tri_tile=128)
    assert_hits_match(h_ref, h_new)


def test_mxu_matches_on_cornell(rng):
    g = cornell_geometry()
    ro, rd = camera_rays((0.0, 0.35, 0.0), (0.0, 0.0, 0.0), 50.0, 64, 64)
    h_ref = trace_bruteforce(g.v0, g.v1, g.v2, ro, rd)
    h_new = trace_mxu(g.feats, ro, rd)
    assert_hits_match(h_ref, h_new)
    # every primary ray inside a closed box must hit
    assert bool(np.asarray(h_new.hit).all())


def test_mxu_matches_on_outdoor(rng):
    g, _, _, cam = make_outdoor_scene(n_cubes=40, use_bvh=False)
    ro, rd = camera_rays(cam.position, cam.rotation_deg, cam.fov_deg, 48, 48)
    h_ref = trace_bruteforce(g.v0, g.v1, g.v2, ro, rd)
    h_new = trace_mxu(g.feats, ro, rd)
    assert_hits_match(h_ref, h_new)


def test_pallas_kernel_matches_scan(rng):
    # the pallas kernel's hit distance carries 24 significant bits (the
    # low 8 carry the in-block argmin row) and its num/den run on the
    # 3-term split-bf16 MXU path (~2^-16 relative): compare at that
    # precision, not bit-for-bit
    g = cornell_geometry()
    ro, rd = camera_rays((0.0, 0.35, 0.0), (0.0, 0.0, 0.0), 50.0, 48, 48)
    h_ref = trace_mxu(g.feats, ro, rd)
    h_pal = trace_mxu_pallas(g.feats, ro, rd, interpret=True)
    assert_hits_match(h_ref, h_pal, t_tol=5e-4)


def test_pallas_kernel_ray_padding(rng):
    """Ray counts that are not a RAY_TILE multiple round-trip correctly."""
    v0, v1, v2 = random_soup(rng, t=37)
    ro, rd = random_rays(rng, n=301)
    h_ref = trace_mxu(build_tri_features(v0, v1, v2), ro, rd)
    h_pal = trace_mxu_pallas(build_tri_features(v0, v1, v2), ro, rd, interpret=True)
    assert_hits_match(h_ref, h_pal, t_tol=5e-4)


def test_degenerate_triangles_never_hit(rng):
    """Zero-area triangles are rejected (the padding convention)."""
    v0 = np.zeros((8, 3), np.float32)
    feats = build_tri_features(v0, v0, v0)
    ro, rd = random_rays(rng, n=64)
    h = trace_mxu(feats, ro, rd)
    assert not bool(np.asarray(h.hit).any())


def test_pallas_block_culling_matches_scan(rng):
    """Multi-block path (block-AABB culling + lax.cond) agrees with the
    scan engine on a large soup with spatial structure."""
    t = 1500  # ~6 blocks at TRI_TILE=256
    centers = rng.uniform(-10, 10, size=(t, 3)).astype(np.float32)
    v0 = centers + rng.normal(scale=0.3, size=(t, 3)).astype(np.float32)
    v1 = centers + rng.normal(scale=0.3, size=(t, 3)).astype(np.float32)
    v2 = centers + rng.normal(scale=0.3, size=(t, 3)).astype(np.float32)
    feats = build_tri_features(v0, v1, v2)
    assert feats.block_bounds.shape[0] >= 6
    ro, rd = random_rays(rng, n=700, scale=12.0)
    h_ref = trace_mxu(feats, ro, rd)
    h_pal = trace_mxu_pallas(feats, ro, rd, interpret=True)
    assert_hits_match(h_ref, h_pal, t_tol=3e-3)  # t up to ~40 at 3e-5 rel


def test_refine_hit_t_repairs_truncated_t():
    """pathtracer.refine_hit_t: given the right triangle with a
    packed-key-truncated t (low 8 mantissa bits zeroed, the bf16 Pallas
    engines' output), the refined t matches the exact f32 trace."""
    import numpy as np

    from ensem3a_openclraytracer_tpu.models.pathtracer import refine_hit_t
    from ensem3a_openclraytracer_tpu.ops.intersect import Hit
    from ensem3a_openclraytracer_tpu.testing import make_outdoor_scene

    geom, m, e, c = make_outdoor_scene(n_cubes=16, use_bvh=False)
    rng = np.random.default_rng(5)
    n = 256
    o = jnp.asarray(rng.uniform(-10, 10, (n, 3)).astype(np.float32) + np.float32([0, 0, 8]))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    exact = trace_mxu(geom.feats, o, d)
    t_trunc = jnp.asarray(
        np.asarray(exact.t).view(np.int32) & ~np.int32(0xFF)
    ).view(jnp.float32)
    got = refine_hit_t(
        geom.feats, o, d, Hit(t=t_trunc, tri=exact.tri, hit=exact.hit)
    )
    te, tg = np.asarray(exact.t), np.asarray(got.t)
    hit = np.asarray(exact.hit)
    np.testing.assert_allclose(tg[hit], te[hit], rtol=2e-6)
    # truncation alone is NOT that accurate - the repair did something
    assert np.abs(np.asarray(t_trunc)[hit] - te[hit]).max() > 0
