"""Fused sample-kernel (ops/fused.py) equivalence vs the scan estimator.

Runs the Pallas kernel in interpreter mode on CPU with an explicit
uniform stream, so both estimators sample the exact same paths.  The
engines still differ in the side-test precision (bf16 MXU signs vs f32)
and the hit distance's low 8 mantissa bits (packed argmin), so a few
silhouette pixels may pick a different-but-equally-valid hit: the
comparison is quantile-based, not exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ensem3a_openclraytracer_tpu.models.pathtracer import (
    _gather_surface,
    radiance_for_rays,
    trace,
)
from ensem3a_openclraytracer_tpu.ops.camera import camera_rays
from ensem3a_openclraytracer_tpu.ops.envmap import sample_ibl, sun_direction
from ensem3a_openclraytracer_tpu.ops.fused import build_tri_attrs, sample_fused
from ensem3a_openclraytracer_tpu.testing import make_cornell_scene, make_outdoor_scene


def _fused_radiance(geom, materials, env, ray_o, ray_d, uniforms, *,
                    max_bounce, sun_enabled, nee=False, lights=None):
    """One-sample radiance via the fused kernel (interpret mode) +
    outside env/escape accumulation, mirroring the pathtracer wiring."""
    h = trace(geom, ray_o, ray_d)
    s = _gather_surface(geom, materials, ray_o, ray_d, h)
    attrs = build_tri_attrs(
        geom.n, geom.mat, materials.mtype, materials.color,
        materials.roughness, geom.feats.edges.shape[-1],
    )
    rad, esc_thr, esc_dir = sample_fused(
        geom.feats, attrs, s.p, s.n, s.mtype, s.color, s.rough, h.hit,
        ray_d, sun_direction(env.sun_angles_deg), env.sun_power,
        jax.random.PRNGKey(0), max_bounce=max_bounce,
        sun_enabled=sun_enabled, interpret=True, uniforms=uniforms,
        nee=nee, lights=lights,
    )
    env_l = sample_ibl(env.ibl, esc_dir) * env.ibl_power
    primary_miss = jnp.where(
        h.hit[:, None], 0.0, sample_ibl(env.ibl, ray_d) * env.ibl_power
    )
    return rad + esc_thr * env_l + primary_miss


@pytest.mark.parametrize(
    "sun_enabled,scene",
    [
        (False, "cornell"),
        (True, "outdoor"),
        # >128 tris -> multi-block kernel: rolled bounce loop, per-block
        # AABB culling, scalar-prefetched front-to-back visit order
        (True, "outdoor_multiblock"),
    ],
)
def test_fused_matches_scan_same_stream(sun_enabled, scene):
    if scene == "cornell":
        geom, materials, env, camera = make_cornell_scene(use_bvh=False)
    elif scene == "outdoor_multiblock":
        geom, materials, env, camera = make_outdoor_scene(n_cubes=24, use_bvh=False)
    else:
        geom, materials, env, camera = make_outdoor_scene(n_cubes=4, use_bvh=False)
    res, mb = 24, 3
    ray_o, ray_d = camera_rays(
        camera.position, camera.rotation_deg, camera.fov_deg, res, res
    )
    n = ray_o.shape[0]
    uniforms = jax.random.uniform(jax.random.PRNGKey(7), (1, mb + 1, n, 2))

    scan = radiance_for_rays(
        geom, materials, env, ray_o, ray_d, jax.random.PRNGKey(0),
        spp=1, max_bounce=mb, sun_enabled=sun_enabled, uniforms=uniforms,
        fused=False,
    )
    fused = _fused_radiance(
        geom, materials, env, ray_o, ray_d, uniforms[0],
        max_bounce=mb, sun_enabled=sun_enabled,
    )
    diff = np.abs(np.asarray(scan) - np.asarray(fused)).max(axis=-1)
    # silhouette/bf16 edge cases may flip a handful of pixels
    assert np.quantile(diff, 0.98) < 1e-3, (
        f"p98 {np.quantile(diff, 0.98)}, max {diff.max()}"
    )
    assert np.median(diff) < 1e-5
    assert np.isfinite(np.asarray(fused)).all()


def test_fused_rejects_bad_configs():
    geom, materials, env, camera = make_cornell_scene(use_bvh=True)
    geom = geom._replace(feats=None)
    ray_o, ray_d = camera_rays(
        camera.position, camera.rotation_deg, camera.fov_deg, 8, 8
    )
    with pytest.raises(ValueError):
        radiance_for_rays(
            geom, materials, env, ray_o, ray_d, jax.random.PRNGKey(0),
            spp=1, max_bounce=1, sun_enabled=False, fused=True,
        )


def test_merged_operand_branch_matches_unmerged():
    """ADVICE round-1: the merged single-matmul branch (num_tiles == 1
    and 5 * tri_tile <= 128) rewires operand packing and kernel ref
    unpacking; assert it is bit-identical to the non-merged path on the
    same stream.  A 14-tri scene pads to 16 (merged on); rebuilding the
    features at pad_to=32 keeps the same geometry but forces 5*32 > 128
    (merged off)."""
    from ensem3a_openclraytracer_tpu.ops.intersect_mxu import build_tri_features

    geom, materials, env, camera = make_outdoor_scene(n_cubes=1, use_bvh=False)
    assert geom.feats.edges.shape[-1] == 16  # 14 tris -> sublane pad 16
    res, mb = 16, 2
    ray_o, ray_d = camera_rays(
        camera.position, camera.rotation_deg, camera.fov_deg, res, res
    )
    uniforms = jax.random.uniform(
        jax.random.PRNGKey(3), (mb + 1, ray_o.shape[0], 2)
    )
    v = [np.asarray(x) for x in (geom.v0, geom.v1, geom.v2)]
    geom_unmerged = geom._replace(feats=build_tri_features(*v, pad_to=32))
    assert 5 * geom_unmerged.feats.edges.shape[-1] > 128

    out_m = _fused_radiance(geom, materials, env, ray_o, ray_d, uniforms,
                            max_bounce=mb, sun_enabled=True)
    out_u = _fused_radiance(geom_unmerged, materials, env, ray_o, ray_d,
                            uniforms, max_bounce=mb, sun_enabled=True)
    np.testing.assert_array_equal(np.asarray(out_m), np.asarray(out_u))


def test_fused_nee_matches_scan_same_stream():
    """In-kernel NEE (light pick + area sample + shadow trace + emission
    suppression) against the scan path's nee_contribution on one stream."""
    from ensem3a_openclraytracer_tpu.scene.scene import build_light_pack
    from ensem3a_openclraytracer_tpu.testing import cornell_materials

    geom, materials, env, camera = make_cornell_scene(use_bvh=False)
    lights = build_light_pack(geom, materials)
    res, mb = 24, 3
    ray_o, ray_d = camera_rays(
        camera.position, camera.rotation_deg, camera.fov_deg, res, res
    )
    n = ray_o.shape[0]
    us = jax.random.uniform(jax.random.PRNGKey(7), (1, mb + 1, n, 2))
    uls = jax.random.uniform(jax.random.PRNGKey(8), (1, mb + 1, n, 3))

    scan = radiance_for_rays(
        geom, materials, env, ray_o, ray_d, jax.random.PRNGKey(0),
        spp=1, max_bounce=mb, sun_enabled=False, uniforms=us,
        light_uniforms=uls, lights=lights, nee=True, fused=False,
    )
    fused = _fused_radiance(
        geom, materials, env, ray_o, ray_d,
        jnp.concatenate([us[0], uls[0]], axis=-1),
        max_bounce=mb, sun_enabled=False, nee=True, lights=lights,
    )
    diff = np.abs(np.asarray(scan) - np.asarray(fused)).max(axis=-1)
    assert np.quantile(diff, 0.98) < 1e-3, (
        f"p98 {np.quantile(diff, 0.98)}, max {diff.max()}"
    )
    assert np.median(diff) < 1e-5
    assert np.isfinite(np.asarray(fused)).all()
