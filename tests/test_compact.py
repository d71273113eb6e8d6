"""Pair-compaction trace engine (ops/compact.py): hit equivalence with
the exact f32 scan trace, in Pallas interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ensem3a_openclraytracer_tpu.ops.compact import (
    MAX_RAYS_PER_CALL,
    trace_compact,
)
from ensem3a_openclraytracer_tpu.ops.intersect_mxu import (
    build_tri_features,
    trace_mxu,
)
from ensem3a_openclraytracer_tpu.testing import make_outdoor_scene


def _bounce_rays(geom, n, seed):
    """Surface-origin rays with random directions - the incoherent
    bounce-ray regime the engine exists for."""
    rng = np.random.default_rng(seed)
    v0 = np.asarray(geom.v0)
    v1 = np.asarray(geom.v1)
    v2 = np.asarray(geom.v2)
    ti = rng.integers(0, len(v0), n)
    r1, r2 = rng.random(n), rng.random(n)
    s = np.sqrt(r1)
    p = (v0[ti] * (1 - s)[:, None] + v1[ti] * (s * (1 - r2))[:, None]
         + v2[ti] * (s * r2)[:, None])
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # offset well past MIN_HIT_DIST: an offset AT the threshold parks
    # adjacent-face planes exactly on the accept boundary, where the two
    # engines' f32 rounding legitimately disagrees
    return (jnp.asarray(p + 5e-4 * d, jnp.float32),
            jnp.asarray(d, jnp.float32))


@pytest.mark.parametrize("n_cubes", [5, 64])
def test_compact_matches_exact_trace(n_cubes):
    geom, m, e, c = make_outdoor_scene(n_cubes=n_cubes, use_bvh=False)
    o, d = _bounce_rays(geom, 512, seed=n_cubes)
    got = trace_compact(geom.feats, o, d, interpret=True)
    ref = trace_mxu(geom.feats, o, d)
    hg, hr = np.asarray(got.hit), np.asarray(ref.hit)
    # engines may disagree on ties/grazing edges; bound the fraction
    assert (hg != hr).mean() < 0.01
    both = hg & hr
    tg, tr = np.asarray(got.t)[both], np.asarray(ref.t)[both]
    rel = np.abs(tg - tr) / np.maximum(np.abs(tr), 1e-9)
    # p50 at the packed-key truncation level, p99 within the small-t
    # absolute-rounding band of the recentered operands
    assert np.percentile(rel, 50) < 1e-4, np.percentile(rel, 50)
    assert np.percentile(rel, 99) < 5e-3, np.percentile(rel, 99)
    # a differing triangle with matching t is an edge tie between
    # adjacent faces (either pick is a legitimate closest hit); only a
    # different triangle at a different distance is a real miss
    tri_diff = (np.asarray(got.tri)[both] != np.asarray(ref.tri)[both])
    real_miss = tri_diff & (rel > 1e-3)
    assert real_miss.mean() < 0.01, (tri_diff.mean(), real_miss.mean())


def test_compact_camera_rays_and_misses():
    """Coherent camera-style rays incl. full misses (sky)."""
    from ensem3a_openclraytracer_tpu.ops.camera import camera_rays

    geom, m, e, c = make_outdoor_scene(n_cubes=32, use_bvh=False)
    o, d = camera_rays(c.position, c.rotation_deg, c.fov_deg, 24, 24)
    got = trace_compact(geom.feats, o, d, interpret=True)
    ref = trace_mxu(geom.feats, o, d)
    hg, hr = np.asarray(got.hit), np.asarray(ref.hit)
    assert (hg != hr).mean() < 0.01
    assert (~hr).any()  # scene has sky: the miss path is exercised
    both = hg & hr
    tg, tr = np.asarray(got.t)[both], np.asarray(ref.t)[both]
    rel = np.abs(tg - tr) / np.maximum(np.abs(tr), 1e-9)
    tri_diff = (np.asarray(got.tri)[both] != np.asarray(ref.tri)[both])
    assert (tri_diff & (rel > 1e-3)).mean() < 0.01


def test_compact_chunking():
    """The host-side ray chunking composes identically to one call."""
    geom, m, e, c = make_outdoor_scene(n_cubes=5, use_bvh=False)
    o, d = _bounce_rays(geom, 96, seed=3)
    whole = trace_compact(geom.feats, o, d, interpret=True)
    import ensem3a_openclraytracer_tpu.ops.compact as compact_mod

    orig = compact_mod.MAX_RAYS_PER_CALL
    compact_mod.MAX_RAYS_PER_CALL = 32
    try:
        # bypass the jit cache (the chunk split is a python-level branch
        # on the module constant)
        chunked = compact_mod.trace_compact.__wrapped__(
            geom.feats, o, d, interpret=True
        )
    finally:
        compact_mod.MAX_RAYS_PER_CALL = orig
    np.testing.assert_array_equal(np.asarray(whole.hit), np.asarray(chunked.hit))
    np.testing.assert_array_equal(np.asarray(whole.tri), np.asarray(chunked.tri))
    np.testing.assert_allclose(np.asarray(whole.t), np.asarray(chunked.t))
