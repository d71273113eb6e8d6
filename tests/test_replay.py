"""Path-replay gradient engine: the replayed estimator must be the scan
estimator - same primal to float32 accuracy on the same threefry stream,
and matching gradients - while its backward pass contains no trace."""

import jax
import jax.numpy as jnp
import numpy as np

from ensem3a_openclraytracer_tpu.models.pathtracer import render_radiance
from ensem3a_openclraytracer_tpu.models.replay import (
    record_paths,
    render_radiance_replay,
)
from ensem3a_openclraytracer_tpu.testing import (
    cornell_camera,
    cornell_env,
    cornell_geometry,
    cornell_materials,
    make_outdoor_scene,
)

RES, SPP, MB = 24, 3, 3


def _scenes():
    yield "cornell", (
        cornell_geometry(), cornell_materials(), cornell_env(), cornell_camera()
    ), False
    yield "outdoor", make_outdoor_scene(n_cubes=5, use_bvh=False), True
    yield "outdoor_bvh", make_outdoor_scene(n_cubes=5, use_bvh=True), True


def test_replay_primal_matches_scan():
    key = jax.random.PRNGKey(3)
    for name, (geom, m, e, c), sun in _scenes():
        img_scan = render_radiance(
            geom, m, e, c, key, height=RES, width=RES, spp=SPP,
            max_bounce=MB, sun_enabled=sun, fused=False,
        )
        img_rep = render_radiance_replay(
            geom, m, e, c, key, height=RES, width=RES, spp=SPP,
            max_bounce=MB, sun_enabled=sun,
        )
        np.testing.assert_allclose(
            np.asarray(img_rep), np.asarray(img_scan), rtol=2e-5, atol=2e-5,
            err_msg=name,
        )


def test_replay_gradients_match_scan():
    """Gradients w.r.t. every differentiable family agree between the
    replay engine and straight AD through the scan estimator."""
    geom, m, e, c = make_outdoor_scene(n_cubes=4, use_bvh=False)
    key = jax.random.PRNGKey(7)

    def loss(render_fn, color, rough, sun_p, ibl_p, ibl):
        m2 = m._replace(color=color, roughness=rough)
        e2 = e._replace(sun_power=sun_p, ibl_power=ibl_p, ibl=ibl)
        img = render_fn(
            geom, m2, e2, c, key, height=RES, width=RES, spp=SPP,
            max_bounce=MB, sun_enabled=True,
        )
        return jnp.mean(img ** 2)

    args = (m.color, m.roughness, e.sun_power, e.ibl_power, e.ibl)
    g_scan = jax.grad(
        lambda *a: loss(
            lambda *r, **k: render_radiance(*r, fused=False, **k), *a
        ),
        argnums=tuple(range(5)),
    )(*args)
    g_rep = jax.grad(
        lambda *a: loss(render_radiance_replay, *a), argnums=tuple(range(5)),
    )(*args)
    names = ["color", "roughness", "sun_power", "ibl_power", "ibl"]
    for gs, gr, name in zip(g_scan, g_rep, names):
        gs, gr = np.asarray(gs), np.asarray(gr)
        scale = max(np.abs(gs).max(), 1e-6)
        np.testing.assert_allclose(gr / scale, gs / scale, atol=1e-5, err_msg=name)
        if name in ("color", "ibl_power", "sun_power"):
            assert np.abs(gs).max() > 0.0, f"{name} grad unexpectedly zero"


def test_replay_backward_contains_no_trace():
    """Structural guarantee: the VJP of the replay never re-traces.  The
    recorded path structure is the only trace consumer, and it is fully
    detached - so the gradient must be INDEPENDENT of any retrace and the
    backward HLO must contain no scan over triangle tiles beyond the
    recorder's.  Checked behaviorally: gradients computed from
    pre-recorded paths (no geometry access in the grad closure at all)
    equal the end-to-end gradients."""
    geom, m, e, c = make_outdoor_scene(n_cubes=4, use_bvh=False)
    key = jax.random.PRNGKey(7)
    from ensem3a_openclraytracer_tpu.models.replay import replay_radiance
    from ensem3a_openclraytracer_tpu.ops.camera import camera_rays

    ray_o, ray_d = camera_rays(c.position, c.rotation_deg, c.fov_deg, RES, RES)
    records = record_paths(
        geom, m, e, ray_o, ray_d, key, spp=SPP, max_bounce=MB, sun_enabled=True
    )

    def loss_from_records(color):
        img = replay_radiance(
            records, geom, m._replace(color=color), e, ray_d, sun_enabled=True
        )
        return jnp.mean(img ** 2)

    def loss_end_to_end(color):
        img = render_radiance_replay(
            geom, m._replace(color=color), e, c, key,
            height=RES, width=RES, spp=SPP, max_bounce=MB, sun_enabled=True,
        )
        return jnp.mean(img ** 2)

    g1 = jax.grad(loss_from_records)(m.color)
    g2 = jax.grad(loss_end_to_end)(m.color)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


def test_replay_explicit_uniforms_match_scan():
    """With a caller-supplied uniform stream both engines are driven by
    identical randomness end to end."""
    geom, m, e, c = cornell_geometry(), cornell_materials(), cornell_env(), cornell_camera()
    rng = np.random.default_rng(42)
    u = rng.random(size=(SPP, MB + 1, RES * RES, 2), dtype=np.float64).astype(np.float32)
    key = jax.random.PRNGKey(0)
    img_scan = render_radiance(
        geom, m, e, c, key, height=RES, width=RES, spp=SPP, max_bounce=MB,
        sun_enabled=False, uniforms=jnp.asarray(u), fused=False,
    )
    img_rep = render_radiance_replay(
        geom, m, e, c, key, height=RES, width=RES, spp=SPP, max_bounce=MB,
        sun_enabled=False, uniforms=jnp.asarray(u),
    )
    np.testing.assert_allclose(
        np.asarray(img_rep), np.asarray(img_scan), rtol=2e-5, atol=2e-5
    )


def test_fused_recorder_matches_scan_recorder():
    """The in-kernel recorder (sample_fused(record=True), interpret mode)
    emits the exact same discrete path structure as the scan-path
    recorder when both consume the same explicit uniform stream."""
    from ensem3a_openclraytracer_tpu.ops import fused as fused_ops
    from ensem3a_openclraytracer_tpu.ops.camera import camera_rays
    from ensem3a_openclraytracer_tpu.ops.envmap import sun_direction
    from ensem3a_openclraytracer_tpu.models.pathtracer import (
        _gather_surface,
        trace,
    )

    from ensem3a_openclraytracer_tpu.testing import make_outdoor_scene as _mos

    scenes = list(_scenes())
    # a >TRI_TILE scene: the rolled multi-block bounce loop carries the
    # record accumulators through lax.fori_loop (different lowering path
    # than the unrolled single-block kernel)
    scenes.append(("outdoor_multiblock", _mos(n_cubes=64, use_bvh=False), True))
    for name, (geom, m, e, c), sun in scenes:
        if geom.feats is None:
            continue  # the fused kernel needs the MXU geometry path
        ray_o, ray_d = camera_rays(
            c.position, c.rotation_deg, c.fov_deg, RES, RES
        )
        n = ray_o.shape[0]
        u = jax.random.uniform(
            jax.random.PRNGKey(11), (SPP, MB + 1, n, 2)
        )
        ref = record_paths(
            geom, m, e, ray_o, ray_d, None, spp=SPP, max_bounce=MB,
            sun_enabled=sun, uniforms=u, fused=False,
        )

        primary_hit = trace(geom, ray_o, ray_d)
        surf = _gather_surface(geom, m, ray_o, ray_d, primary_hit)
        tri_attrs = fused_ops.build_tri_attrs(
            geom.n, geom.mat, m.mtype, m.color, m.roughness,
            geom.feats.edges.shape[-1],
        )
        for s in range(SPP):
            _, _, _, u_rec, tri_rec, sun_rec = fused_ops.sample_fused(
                geom.feats, tri_attrs, surf.p, surf.n, surf.mtype,
                surf.color, surf.rough, primary_hit.hit, ray_d,
                sun_direction(e.sun_angles_deg), e.sun_power,
                jax.random.PRNGKey(0),
                max_bounce=MB, sun_enabled=sun, interpret=True,
                uniforms=u[s], record=True,
            )
            np.testing.assert_allclose(
                np.asarray(u_rec), np.asarray(u[s]), rtol=0, atol=0,
                err_msg=f"{name} uniforms echo",
            )
            # the two recorders trace with different engines (split-bf16
            # kernel vs HIGHEST-precision scan): ties and edge pixels can
            # pick different triangles, and a divergent pick forks the
            # whole rest of that lane's path - bound the FRACTION, like
            # the image-parity tests
            for rec, ref_rec, what in (
                (tri_rec, ref.tri[s], "tri"),
                (sun_rec, ref.sun_tri[s], "sun"),
            ):
                frac = (np.asarray(rec) != np.asarray(ref_rec)).mean()
                assert frac < 0.02, (
                    f"{name} sample {s} {what} records diverge on "
                    f"{frac:.2%} of lanes"
                )


def test_replay_nee_primal_matches_scan():
    """NEE replay is the NEE scan estimator: same key => the recorder's
    threefry stream (fold 0 for bounces, fold 1 for lights) is the scan
    path's, so the primal matches to float32 accuracy."""
    from ensem3a_openclraytracer_tpu.scene.scene import build_light_pack

    geom = cornell_geometry()
    m, e, c = cornell_materials(), cornell_env(), cornell_camera()
    lights = build_light_pack(geom, m)
    key = jax.random.PRNGKey(5)
    img_scan = render_radiance(
        geom, m, e, c, key, height=RES, width=RES, spp=SPP, max_bounce=MB,
        sun_enabled=False, lights=lights, nee=True, fused=False,
    )
    img_rep = render_radiance_replay(
        geom, m, e, c, key, height=RES, width=RES, spp=SPP, max_bounce=MB,
        sun_enabled=False, lights=lights, nee=True,
    )
    np.testing.assert_allclose(
        np.asarray(img_rep), np.asarray(img_scan), rtol=2e-5, atol=2e-5,
    )


def test_replay_nee_gradients_match_scan():
    """NEE gradients agree between replay and straight AD through the
    scan estimator - including d/d(emissive power), which flows through
    the NEE light-power column (materials.roughness[lights.mat])."""
    from ensem3a_openclraytracer_tpu.scene.scene import build_light_pack

    geom = cornell_geometry()
    m, e, c = cornell_materials(), cornell_env(), cornell_camera()
    lights = build_light_pack(geom, m)
    key = jax.random.PRNGKey(9)

    def loss(render_fn, color, rough):
        m2 = m._replace(color=color, roughness=rough)
        img = render_fn(
            geom, m2, e, c, key, height=RES, width=RES, spp=SPP,
            max_bounce=MB, sun_enabled=False, lights=lights, nee=True,
        )
        return jnp.mean(img ** 2)

    g_scan = jax.grad(
        lambda *a: loss(
            lambda *r, **k: render_radiance(*r, fused=False, **k), *a
        ),
        argnums=(0, 1),
    )(m.color, m.roughness)
    g_rep = jax.grad(
        lambda *a: loss(render_radiance_replay, *a), argnums=(0, 1),
    )(m.color, m.roughness)
    for gs, gr, name in zip(g_scan, g_rep, ["color", "roughness"]):
        gs, gr = np.asarray(gs), np.asarray(gr)
        scale = max(np.abs(gs).max(), 1e-6)
        np.testing.assert_allclose(gr / scale, gs / scale, atol=1e-5, err_msg=name)
        assert np.abs(gs).max() > 0.0, f"{name} grad unexpectedly zero"
    # emissive power (the roughness slot of the type-0 material) must
    # receive gradient even though NEE suppresses BSDF-path emission
    mtypes = np.asarray(m.mtype)
    emissive_rows = np.nonzero(mtypes == 0)[0]
    g_rough_rep = np.asarray(g_rep[1])
    assert np.abs(g_rough_rep[emissive_rows]).max() > 0.0, (
        "emissive-power gradient lost through the NEE path"
    )
