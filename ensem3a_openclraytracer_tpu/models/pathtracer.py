"""Wavefront path tracer - the flagship estimator.

TPU-native re-design of the reference's per-pixel OpenCL megakernel
(Raytracing.cl:39-221): the whole image is one SoA ray batch; the bounce
loop is a ``lax.scan`` with a live mask (SURVEY.md section 5: the bounce
axis is the sequential "sequence" dimension, pixels/spp are the parallel
axes); samples accumulate under an outer scan with rematerialization so
reverse-mode AD stays O(image) in memory.

Estimator semantics reproduced from the reference (capability checklist,
SURVEY.md section 2.5):
  * primary-hit caching: the camera ray and its hit are computed once and
    reused for every sample (Raytracing.cl:184-197);
  * unidirectional path tracing, no NEE/MIS/Russian roulette; paths still
    on a non-emissive surface after ``max_bounce`` bounces contribute 0
    (Raytracing.cl:99-103);
  * lobe sampling/attenuation exactly as Raytracing.cl:58-87 (see
    ops/bsdf.py);
  * escaped rays: lat-long IBL * ibl_power, plus - for bounce rays only -
    a sun term gated by a shadow ray: full sun if unoccluded and the
    bounced-off surface is not glass, tinted sun if occluded only by glass
    (Raytracing.cl:115-136);
  * output: mean over spp; the display path clamps to [0, 1]
    (Raytracing.cl:211-219).

Differentiable w.r.t. material color/roughness/emissive power, sun/IBL
power, and IBL texels; geometry/visibility is detached (stop_gradient
around tracing) per the north star (BASELINE.json).

Randoms are counter-based (threefry ``fold_in`` by sample then bounce), or
caller-provided uniform tensors (``uniforms [spp, max_bounce+1, N, 2]``)
so CPU/torch oracles can follow the identical stream.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from ensem3a_openclraytracer_tpu.ops.bsdf import (
    EMISSIVE,
    GLASS,
    GLOSSY,
    eval_ggx,
    eval_lambert,
    sample_bounce,
)
from ensem3a_openclraytracer_tpu.ops.sampling import PI
from ensem3a_openclraytracer_tpu.ops.geometry import (
    normalize as _normalize,
    sample_point_in_triangle,
)
from ensem3a_openclraytracer_tpu.ops.camera import camera_rays
from ensem3a_openclraytracer_tpu.ops.envmap import sample_ibl, sun_direction
from ensem3a_openclraytracer_tpu.ops.gathers import gather_rows
from ensem3a_openclraytracer_tpu.ops import fused as fused_ops
from ensem3a_openclraytracer_tpu.ops.pairs import (
    trace_pairs,
    trace_pairs_streamed,
)
from ensem3a_openclraytracer_tpu.ops.intersect import Hit, trace_bruteforce
from ensem3a_openclraytracer_tpu.ops.intersect_mxu import trace_mxu, trace_mxu_pallas
from ensem3a_openclraytracer_tpu.ops.traversal import trace_bvh
from ensem3a_openclraytracer_tpu.scene.materials import (
    CameraParams,
    EnvParams,
    MaterialParams,
)
from ensem3a_openclraytracer_tpu.scene.scene import GeometryPack, LightPack


import functools as _functools


@_functools.cache
def _on_tpu() -> bool:
    """True when the default backend is a TPU-family device (the fused
    Pallas engine needs Mosaic; CPU runs use the XLA scan engine)."""
    return jax.default_backend() not in ("cpu", "gpu")


# the fused whole-bounce-loop kernel (in-kernel tile-union culling)
# stays the forward engine up to this block count; beyond it the scan
# estimator + tile-pair trace engine wins.  Cutover measured per scene
# on hardware (round 4/5): fused wins at Serre's 29 blocks (35 vs 19
# Mrays/s) and everywhere below; the pair engine wins at Monkey's 62
# blocks (6.8 vs 5.8).  48 splits the measured regimes.
_FUSED_MAX_BLOCKS = 48

# above this block count feats.comb is f32 (not VMEM-resident); the
# dispatch falls back to the resident multi-block kernel, and beyond
# its SMEM visit tables to the HBM-streamed compaction engine
_RESIDENT_MAX_BLOCKS = 256


def refine_hit_t(feats, ray_o, ray_d, h: Hit) -> Hit:
    """Recompute the hit distance of an already-found triangle exactly
    in f32 from the global-frame plane equation (t = [o,1]@plane /
    d@normal_d - the same algebra as ops/intersect_mxu.trace_mxu, but
    per winning triangle instead of per candidate).

    The bf16 Pallas engines' packed (t | row) keys zero t's low 8
    mantissa bits and their split-bf16 products carry an absolute error
    band of ~2^-16 x block scale; both shift shading POSITIONS p = o +
    t*d, which the backward pass differentiates through - measured as
    the round-3/4 nonlinear-gradient discrepancy (VERDICT round 5 item
    6).  One [N, 7] row gather + two dots repairs t to exact f32; the
    engine's discrete pick (tri, hit) is kept as-is."""
    rows = gather_rows(
        jnp.concatenate([feats.plane.T, feats.normal_d.T], axis=1), h.tri
    )  # [N, 7]: plane [-n | n.A], normal_d [n]
    num = (
        rows[:, 0] * ray_o[:, 0]
        + rows[:, 1] * ray_o[:, 1]
        + rows[:, 2] * ray_o[:, 2]
        + rows[:, 3]
    )
    den = jnp.sum(rows[:, 4:7] * ray_d, axis=-1)
    t = num / jnp.where(den == 0.0, 1.0, den)
    ok = h.hit & (den != 0.0)
    return Hit(t=jnp.where(ok, t, h.t), tri=h.tri, hit=h.hit)


def trace(geom: GeometryPack, ray_o: jnp.ndarray, ray_d: jnp.ndarray) -> Hit:
    """Closest-hit dispatch on the MXU matmul engines when the pack
    carries triangle features: single-block scenes on the VMEM-resident
    kernel; multi-block scenes up to the bf16-comb cap (64 blocks) on
    the flat tile-pair engine (ops/pairs.py); beyond that on its
    HBM-streamed twin (double-buffered block DMA) - any scene size,
    like the reference's stack walk (MathLib.cl:234-288).  LBVH
    traversal when
    the pack carries only a tree, tiled Moller-Trumbore otherwise.
    Visibility is non-differentiable by design; inputs are detached so
    no AD path enters the trace.  All multi-block engines want coherent
    ray tiles, so rays are sorted by (direction octant, origin Morton)
    and the hits scattered back."""
    ray_o = jax.lax.stop_gradient(ray_o)
    ray_d = jax.lax.stop_gradient(ray_d)
    _name = lambda h: Hit(
        t=checkpoint_name(h.t, "trace_out"),
        tri=checkpoint_name(h.tri, "trace_out"),
        hit=checkpoint_name(h.hit, "trace_out"),
    )
    if geom.feats is not None and (_on_tpu() or geom.bvh is None):
        feats = geom.feats
        n_blocks = feats.block_bounds.shape[0]
        if _on_tpu():
            if n_blocks == 1:
                h = trace_mxu_pallas(feats, ray_o, ray_d)
                return _name(refine_hit_t(feats, ray_o, ray_d, h))
            order = fused_ops.coherent_order(ray_o, ray_d)
            o_s, d_s = ray_o[order], ray_d[order]
            if feats.comb is not None and feats.comb.dtype == jnp.bfloat16:
                h = trace_pairs(feats, o_s, d_s)
            elif feats.comb is not None:
                h = trace_pairs_streamed(feats, o_s, d_s)
            else:
                h = trace_mxu_pallas(feats, o_s, d_s)
            h = refine_hit_t(feats, o_s, d_s, h)
            unsort = lambda x: jnp.zeros_like(x).at[order].set(x)
            return _name(
                Hit(t=unsort(h.t), tri=unsort(h.tri), hit=unsort(h.hit))
            )
        return _name(trace_mxu(geom.feats, ray_o, ray_d))
    if geom.bvh is not None:
        return _name(
            trace_bvh(geom.bvh, geom.v0, geom.v1, geom.v2, ray_o, ray_d)
        )
    return _name(trace_bruteforce(geom.v0, geom.v1, geom.v2, ray_o, ray_d))


class _Escape(NamedTuple):
    """Per-lane escape record: a path leaves the scene at most once, so
    the sun shadow trace + IBL lookup settle ONCE per sample after the
    bounce scan instead of per bounce (the replay engine's trick,
    models/replay.py)."""

    escaped: jnp.ndarray  # [N] bool
    p: jnp.ndarray  # [N, 3] escape vertex (shadow-ray origin)
    dir: jnp.ndarray  # [N, 3] escape direction (IBL lookup)
    thr: jnp.ndarray  # [N, 3] throughput at escape
    glass: jnp.ndarray  # [N] bool: escape vertex was glass (sun gate)


class _Surface(NamedTuple):
    """Per-lane shading state at the current path vertex."""

    p: jnp.ndarray  # [N, 3] hit point
    n: jnp.ndarray  # [N, 3] unit shading normal
    mtype: jnp.ndarray  # [N] int32
    color: jnp.ndarray  # [N, 3]
    rough: jnp.ndarray  # [N] (emissive power for type 0)
    ior: jnp.ndarray  # [N] (glass index of refraction; used when
    #                   glass_mode == "refract", dead weight otherwise)


def _gather_surface(geom, materials, origin, direction, hit: Hit) -> _Surface:
    idx = hit.tri
    # fuse the per-face (normal, material id) lookup into one row gather
    face_rows = jnp.concatenate(
        [geom.n, geom.mat.astype(jnp.float32)[:, None]], axis=1
    )
    rows = gather_rows(face_rows, idx)
    n = rows[:, :3]
    midx = jnp.round(rows[:, 3]).astype(jnp.int32)
    # material table lookup likewise (mtype/color/rough in one record)
    mat_rows = jnp.concatenate(
        [
            materials.mtype.astype(jnp.float32)[:, None],
            materials.color,
            materials.roughness[:, None],
            materials.ior[:, None],
        ],
        axis=1,
    )
    mrows = gather_rows(mat_rows, midx)
    return _Surface(
        p=origin + direction * hit.t[:, None],
        n=n,
        mtype=jnp.round(mrows[:, 0]).astype(jnp.int32),
        color=mrows[:, 1:4],
        rough=mrows[:, 4],
        ior=mrows[:, 5],
    )


def radiance_for_rays(
    geom: GeometryPack,
    materials: MaterialParams,
    env: EnvParams,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    key: jax.Array,
    *,
    spp: int,
    max_bounce: int,
    sun_enabled: bool = True,
    ibl_bilinear: bool = True,
    uniforms: Optional[jnp.ndarray] = None,
    lights: Optional[LightPack] = None,
    nee: bool = False,
    fused: Optional[bool] = None,
    glass_mode: str = "tint",
    light_uniforms: Optional[jnp.ndarray] = None,
    mis: bool = False,
) -> jnp.ndarray:
    """Estimate radiance ``[N, 3]`` for an arbitrary primary-ray batch
    (unclamped mean over ``spp`` samples).  This is the shardable core:
    the parallel layer slices the pixel set into per-chip ray batches and
    calls this under ``shard_map`` (scene replicated, rays data-parallel).
    ``uniforms`` optionally supplies the random stream as
    ``[spp, max_bounce + 1, N, 2]`` for oracle parity.

    ``fused`` selects the single-kernel sample engine (ops/fused.py:
    bounce loop + RNG + shading in VMEM).  Default (None) auto-enables
    it on TPU for forward renders on the MXU geometry path; it is
    forward-only (no autodiff through Pallas), so differentiating
    callers must pass ``fused=False``.

    ``nee=True`` (requires ``lights``) switches the estimator to
    next-event estimation: one area-sampled shadow ray per diffuse/glossy
    vertex, with BSDF-path emission suppressed at vertices whose direct
    light was already sampled - an unbiased, far lower-variance estimator
    than the reference's pure BSDF sampling (its ``sampleLight`` is dead
    code, MathLib.cl:419-454).  NEE perturbs the random stream, so it is
    mutually exclusive with ``uniforms``.

    ``mis=True`` (requires ``nee``) combines the two strategies with the
    balance heuristic instead of NEE's binary emission suppression: the
    NEE contribution is weighted by ``p_nee / (p_nee + p_bsdf)`` and
    BSDF-path emission by ``p_bsdf / (p_bsdf + p_nee)`` (both pdfs in
    solid-angle measure; delta lobes - glass - keep weight 1, matching
    the glass-chain accounting the per-bounce NEE flag fixed).  Unbiased
    for any light size; lower-variance than either strategy alone when
    lights are small AND lobes are wide or vice versa."""
    if mis and not nee:
        raise ValueError("mis=True requires nee=True (and lights)")
    if nee and lights is None:
        raise ValueError("nee=True requires a LightPack")
    if nee and uniforms is not None and light_uniforms is None:
        raise ValueError(
            "nee with an explicit uniform stream also needs light_uniforms "
            "[spp, max_bounce + 1, N, 3]"
        )
    n_rays = ray_o.shape[0]

    # Primary hit, cached across all samples (Raytracing.cl:184-187).
    primary_hit = trace(geom, ray_o, ray_d)
    primary_surf = _gather_surface(geom, materials, ray_o, ray_d, primary_hit)

    sun_dir = jnp.broadcast_to(sun_direction(env.sun_angles_deg), (n_rays, 3))
    env_radiance = lambda d: sample_ibl(env.ibl, d, bilinear=ibl_bilinear) * env.ibl_power

    # Primary misses see the IBL only, once - independent of the sample loop
    # (Raytracing.cl:148).
    primary_miss_rad = jnp.where(
        primary_hit.hit[:, None], 0.0, env_radiance(ray_d)
    )

    if fused is None:
        # the whole-bounce-loop kernel is the forward engine for the MXU
        # geometry path: for multi-block sun scenes it is ~5x the scan
        # estimator (in-kernel shadow traces, VMEM-resident ray state;
        # FurnaceHD measured 84 vs 16 Mrays/s) and a wash on sun-less
        # Monkey.  NEE auto-fuses whenever the fused engine would run
        # (the in-kernel NEE path is hardware-validated single- AND
        # multi-block, tests/test_tpu_gated.py); refract and
        # explicit-uniform renders use the scan estimator.
        fused = (
            _on_tpu()
            and geom.feats is not None
            # beyond a few blocks the fused kernel's tile-union culling
            # loses to the scan estimator + per-ray pair-queue engine
            and geom.feats.block_bounds.shape[0] <= _FUSED_MAX_BLOCKS
            and uniforms is None
            and glass_mode == "tint"
            and not mis
            and (not nee or lights is not None)
        )
    if fused:
        if mis:
            raise ValueError("mis runs on the scan estimator (fused=False)")
        if geom.feats is None:
            raise ValueError("fused=True requires the MXU geometry path (feats)")
        if uniforms is not None or glass_mode != "tint":
            raise ValueError("fused=True supports the tint-glass threefry-free path")
        tri_attrs = fused_ops.build_tri_attrs(
            geom.n,
            geom.mat,
            materials.mtype,
            materials.color,
            materials.roughness,
            geom.feats.edges.shape[-1],
        )
        sun_dir_v = sun_direction(env.sun_angles_deg)

        # Multi-block scenes: permute rays by primary-hit Morton order so
        # each kernel ray tile is spatially local and the per-block AABB
        # culling bites.  Primary hits are cached across samples - one
        # sort serves the whole render; the radiance is unsorted at the
        # end.  Single-block scenes skip the shuffle (nothing to cull).
        multi_block = geom.feats.block_bounds.shape[0] > 1
        if multi_block:
            order = fused_ops.morton_order_points(
                jnp.where(primary_hit.hit[:, None], primary_surf.p, ray_o)
            )
        else:
            order = None

        def pick(x):
            return x[order] if order is not None else x

        f_surf = _Surface(*(pick(x) for x in primary_surf))
        f_hit = pick(primary_hit.hit)
        f_dir = pick(ray_d)

        def fused_spp_step(acc, k):
            rad, esc_thr, esc_dir = fused_ops.sample_fused(
                geom.feats,
                tri_attrs,
                f_surf.p,
                f_surf.n,
                f_surf.mtype,
                f_surf.color,
                f_surf.rough,
                f_hit,
                f_dir,
                sun_dir_v,
                env.sun_power,
                k,
                max_bounce=max_bounce,
                sun_enabled=sun_enabled,
                nee=nee,
                lights=lights,
            )
            return acc + rad + esc_thr * env_radiance(esc_dir), None

        acc, _ = jax.lax.scan(
            fused_spp_step, jnp.zeros_like(ray_d), jax.random.split(key, spp)
        )
        if order is not None:
            acc = jnp.zeros_like(acc).at[order].set(acc)
        return acc / spp + primary_miss_rad

    n_lights = 0 if lights is None else lights.v0.shape[0]
    if mis:
        # per-face areas for the NEE pdf of a BSDF-sampled hit (every
        # emissive face is in the light list, so no identity lookup is
        # needed - just its area and normal)
        face_area = jax.lax.stop_gradient(
            0.5
            * jnp.linalg.norm(
                jnp.cross(geom.v1 - geom.v0, geom.v2 - geom.v0), axis=-1
            )
        )

    def nee_contribution(live, thr, in_dir, surf, ul):
        """One shadow ray toward an area-sampled light point; returns the
        direct-light radiance for diffuse/glossy lanes (area-measure pdf
        converted to solid angle; lights are double-sided like the
        reference's emissive surfaces)."""
        u3, u4, u5 = ul[:, 0], ul[:, 1], ul[:, 2]
        li = jnp.clip((u3 * n_lights).astype(jnp.int32), 0, n_lights - 1)
        # light power re-derived from the material table (not the
        # LightPack's constant snapshot) so d/d(emissive power) flows
        # through NEE exactly as it does through BSDF-path emission
        lpow_tab = materials.roughness[lights.mat]
        lrows = gather_rows(
            jnp.concatenate(
                [lights.v0, lights.v1, lights.v2, lights.n,
                 lpow_tab[:, None], lights.area[:, None]], axis=1
            ),
            li,
        )
        lv0, lv1, lv2 = lrows[:, 0:3], lrows[:, 3:6], lrows[:, 6:9]
        ln, lpow, larea = lrows[:, 9:12], lrows[:, 12], lrows[:, 13]
        x = sample_point_in_triangle(lv0, lv1, lv2, u4, u5)
        delta = x - surf.p
        dist2 = jnp.maximum(jnp.sum(delta * delta, axis=-1), 1e-8)
        dist = jnp.sqrt(dist2)
        ldir = delta / dist[:, None]
        ldir = jax.lax.stop_gradient(ldir)

        cos_s = jnp.sum(ldir * surf.n, axis=-1)
        cos_l = jnp.abs(jnp.sum(ldir * ln, axis=-1))
        shadow = trace(geom, surf.p, ldir)
        visible = shadow.t >= dist * (1.0 - 1e-3)

        is_glossy = surf.mtype == GLOSSY
        brdf = jnp.where(
            is_glossy[:, None],
            eval_ggx(surf.color, surf.rough, -in_dir, ldir, surf.n),
            eval_lambert(surf.color),
        )
        # pdf_area = 1/(L * area); solid-angle conversion dist^2 / cos_l
        weight = (n_lights * larea) * cos_l / dist2
        sampled = live & (surf.mtype != EMISSIVE) & (surf.mtype != GLASS)
        ok = sampled & visible & (cos_s > 0.0) & (cos_l > 1e-6)
        contrib = thr * brdf * (jnp.maximum(cos_s, 0.0) * weight * lpow)[:, None]
        if mis:
            # balance heuristic vs the BSDF strategy's pdf for ldir:
            # cosine-weighted for diffuse, uniform hemisphere for glossy
            # (the reference's lobe samplers, MathLib.cl:313-366).
            # weight == 1 / p_nee_solid, so w = 1 / (1 + p_bsdf * weight)
            p_b = jnp.where(
                is_glossy, 1.0 / (2.0 * PI), jnp.maximum(cos_s, 0.0) / PI
            )
            contrib = contrib / (1.0 + p_b * weight)[:, None]
        return jnp.where(ok[:, None], contrib, 0.0), sampled

    def bounce_step(carry, xs):
        live, thr, rad, in_dir, surf, emis_w, esc = carry
        j, u, ul = xs
        u1, u2 = u[:, 0], u[:, 1]

        # terminal event: sitting on an emissive surface (power lives in
        # the roughness slot, Raytracing.cl:107/:142); with NEE active the
        # emission was already estimated at the previous vertex, so
        # emis_w is 0 there (or the MIS balance weight with mis=True)
        emis = live & (surf.mtype == EMISSIVE)
        rad = rad + jnp.where(
            emis[:, None], thr * (surf.rough * emis_w)[:, None], 0.0
        )
        live = live & ~emis

        if nee:
            direct, sampled = nee_contribution(live, thr, in_dir, surf, ul)
            rad = rad + direct
            if not mis:
                # Emission at the NEXT vertex is suppressed only when THIS
                # vertex NEE-sampled the light; the flag resets every
                # bounce.  Glass vertices never NEE-sample (delta lobe)
                # and their shadow rays treat glass as an occluder, so
                # BSDF emission through a diffuse->glass->light chain must
                # stay enabled - a sticky flag loses that light entirely
                # (round-1 bias).  (With mis=True the balance weight below
                # replaces this binary gate.)
                emis_w = jnp.where(
                    live, 1.0 - sampled.astype(emis_w.dtype), emis_w
                )

        # sample the bounce and update throughput (Raytracing.cl:58-87)
        bdir, factor = sample_bounce(
            surf.mtype, surf.color, surf.rough, in_dir, surf.n, u1, u2,
            ior=surf.ior, glass_mode=glass_mode,
        )
        thr = jnp.where(live[:, None], thr * factor, thr)

        bounce_hit = trace(geom, surf.p, bdir)
        miss = live & ~bounce_hit.hit

        # escaped: record the escape vertex instead of paying the sun
        # shadow trace + IBL lookup per bounce - a path escapes at most
        # ONCE, so one_sample settles sun + IBL in a single batched pass
        # after the scan (the replay engine's escape-record trick; 5x
        # fewer shadow traces at max_bounce 4).  Same estimator as
        # Raytracing.cl:115-136, different accumulation point.
        mm = miss[:, None]
        esc = esc._replace(
            escaped=esc.escaped | miss,
            p=jnp.where(mm, surf.p, esc.p),
            dir=jnp.where(mm, bdir, esc.dir),
            thr=jnp.where(mm, thr, esc.thr),
            glass=jnp.where(miss, surf.mtype == GLASS, esc.glass),
        )
        live = live & bounce_hit.hit

        # advance the path for lanes that hit something solid
        new_surf = _gather_surface(geom, materials, surf.p, bdir, bounce_hit)
        if mis:
            # balance weight for BSDF-path emission at the NEXT vertex:
            # p_bsdf of the sampled bdir vs the pdf NEE would have had
            # for the triangle the bounce ray actually hit (solid-angle
            # measure; valid only when that triangle is emissive, which
            # is exactly when emis_w is consumed).  Vertices that did not
            # NEE-sample (glass / dead) keep weight 1.
            p_b = jnp.where(
                surf.mtype == GLOSSY,
                1.0 / (2.0 * PI),
                jnp.maximum(jnp.sum(bdir * surf.n, axis=-1), 0.0) / PI,
            )
            area_hit = gather_rows(face_area[:, None], bounce_hit.tri)[:, 0]
            cos_l = jnp.abs(jnp.sum(bdir * new_surf.n, axis=-1))
            p_nee_hit = (bounce_hit.t * bounce_hit.t) / (
                n_lights * area_hit * jnp.maximum(cos_l, 1e-6)
            )
            w_b = p_b / (p_b + p_nee_hit)
            emis_w = jnp.where(
                live, jnp.where(sampled, w_b, 1.0), emis_w
            )
        lm = live[:, None]
        surf = _Surface(
            p=jnp.where(lm, new_surf.p, surf.p),
            n=jnp.where(lm, new_surf.n, surf.n),
            mtype=jnp.where(live, new_surf.mtype, surf.mtype),
            color=jnp.where(lm, new_surf.color, surf.color),
            rough=jnp.where(live, new_surf.rough, surf.rough),
            ior=jnp.where(live, new_surf.ior, surf.ior),
        )
        in_dir = jnp.where(lm, bdir, in_dir)
        return (live, thr, rad, in_dir, surf, emis_w, esc), None

    # Threefry everywhere: the TPU hardware-PRNG kernel (ops/rng.py) is
    # ~2x cheaper in isolation but a per-sample pallas_call serializes
    # the sample pipeline (measured 0.36 -> 0.53 s on the Cornell bench),
    # so it is reserved for fused kernels that consume bits in-register.
    _uniform = lambda k, s: jax.random.uniform(k, s)

    def one_sample(sample_key, sample_uniforms, sample_light_uniforms=None):
        """One spp sample for every pixel -> radiance [N, 3]."""
        if sample_uniforms is None:
            us = _uniform(
                jax.random.fold_in(sample_key, 0), (max_bounce + 1, n_rays, 2)
            )
        else:
            us = sample_uniforms
        if nee:
            if sample_light_uniforms is not None:
                uls = sample_light_uniforms
            else:
                uls = _uniform(
                    jax.random.fold_in(sample_key, 1),
                    (max_bounce + 1, n_rays, 3),
                )
        else:
            uls = jnp.zeros((max_bounce + 1, n_rays, 0), jnp.float32)
        carry0 = (
            primary_hit.hit,
            jnp.ones_like(ray_d),  # *_like keeps shard_map vma typing
            primary_miss_rad,
            ray_d,
            primary_surf,
            jnp.ones_like(primary_hit.t),  # emis_w
            _Escape(
                escaped=jnp.zeros_like(primary_hit.hit),
                p=jnp.zeros_like(ray_d),
                # unit init: sample_ibl normalizes, 0-vectors would NaN
                # (masked NaN still poisons the where-select gradient)
                dir=jnp.zeros_like(ray_d) + jnp.array([0.0, 0.0, 1.0]),
                thr=jnp.zeros_like(ray_d),
                glass=jnp.zeros_like(primary_hit.hit),
            ),
        )
        xs = (np.arange(max_bounce + 1), us, uls)
        (live, thr, rad, _, surf, emis_w, esc), _ = jax.lax.scan(
            bounce_step, carry0, xs
        )
        # settle every escape at once: one sun shadow trace + one IBL
        # lookup per SAMPLE instead of per bounce (paths escape at most
        # once; Raytracing.cl:115-136 semantics preserved)
        env_light = env_radiance(esc.dir)
        if sun_enabled:
            sun_hit = trace(geom, esc.p, sun_dir)
            sun_midx = gather_rows(geom.mat[:, None], sun_hit.tri)[:, 0]
            srows = gather_rows(
                jnp.concatenate(
                    [materials.mtype.astype(jnp.float32)[:, None],
                     materials.color],
                    axis=1,
                ),
                sun_midx,
            )
            sun_mtype = jnp.round(srows[:, 0]).astype(jnp.int32)
            sun_color = srows[:, 1:4]
            unoccluded = (~sun_hit.hit) & ~esc.glass
            glass_occluded = sun_hit.hit & (sun_mtype == GLASS)
            sun_light = (
                unoccluded[:, None].astype(jnp.float32) * env.sun_power
                + glass_occluded[:, None].astype(jnp.float32)
                * sun_color * env.sun_power
            )
        else:
            sun_light = jnp.zeros_like(env_light)
        rad = rad + jnp.where(
            esc.escaped[:, None], esc.thr * (sun_light + env_light), 0.0
        )
        # final terminal check: a path whose last bounce landed on a light
        # still contributes; anything else live contributes 0
        # (the reference's max-bounce nullification, Raytracing.cl:99-109)
        final_emis = live & (surf.mtype == EMISSIVE)
        rad = rad + jnp.where(
            final_emis[:, None], thr * (surf.rough * emis_w)[:, None], 0.0
        )
        return rad

    # rematerialize the sample under backward - but SAVE the trace
    # outputs: the recomputed forward's f32 re-association can flip
    # knife-edge hit decisions, and a path whose remat disagrees with
    # its primal contributes garbage cotangents (measured: reverse-mode
    # d/d(glass color) off by 12% vs forward-mode/torch on TPU until
    # the traces were pinned).  Saving them also spares the backward
    # pass every intersection kernel.
    one_sample = jax.checkpoint(
        one_sample,
        static_argnums=(),
        policy=jax.checkpoint_policies.save_only_these_names("trace_out"),
    )

    if uniforms is not None:
        if nee:
            def spp_step(acc, xs):
                return acc + one_sample(None, xs[0], xs[1]), None
            acc, _ = jax.lax.scan(
                spp_step, jnp.zeros_like(ray_d), (uniforms, light_uniforms)
            )
        else:
            def spp_step(acc, us):
                return acc + one_sample(None, us), None
            acc, _ = jax.lax.scan(spp_step, jnp.zeros_like(ray_d), uniforms)
    else:
        sample_keys = jax.random.split(key, spp)

        def spp_step(acc, k):
            return acc + one_sample(k, None), None

        acc, _ = jax.lax.scan(spp_step, jnp.zeros_like(ray_d), sample_keys)

    return acc / spp


def render_radiance(
    geom: GeometryPack,
    materials: MaterialParams,
    env: EnvParams,
    camera: CameraParams,
    key: jax.Array,
    *,
    height: int,
    width: int,
    spp: int,
    max_bounce: int,
    sun_enabled: bool = True,
    ibl_bilinear: bool = True,
    uniforms: Optional[jnp.ndarray] = None,
    lights: Optional[LightPack] = None,
    nee: bool = False,
    fused: Optional[bool] = None,
    glass_mode: str = "tint",
    light_uniforms: Optional[jnp.ndarray] = None,
    mis: bool = False,
) -> jnp.ndarray:
    """Estimate the radiance image ``[height, width, 3]`` (unclamped mean
    over ``spp`` samples) for a pinhole camera view."""
    ray_o, ray_d = camera_rays(
        camera.position, camera.rotation_deg, camera.fov_deg, height, width
    )
    rad = radiance_for_rays(
        geom,
        materials,
        env,
        ray_o,
        ray_d,
        key,
        spp=spp,
        max_bounce=max_bounce,
        sun_enabled=sun_enabled,
        ibl_bilinear=ibl_bilinear,
        uniforms=uniforms,
        lights=lights,
        nee=nee,
        fused=fused,
        glass_mode=glass_mode,
        light_uniforms=light_uniforms,
        mis=mis,
    )
    return rad.reshape(height, width, 3)


def render_image(*args, **kwargs) -> jnp.ndarray:
    """Radiance -> display image: clamp to [0, 1] (the reference's output
    stage, Raytracing.cl:216-219; its gamma kernel is bypassed)."""
    return jnp.clip(render_radiance(*args, **kwargs), 0.0, 1.0)


render_radiance_jit = jax.jit(
    render_radiance,
    static_argnames=(
        "height",
        "width",
        "spp",
        "max_bounce",
        "sun_enabled",
        "ibl_bilinear",
        "nee",
        "fused",
        "glass_mode",
        "mis",
    ),
)


def render_scene(scene, key=None, overrides: Optional[dict] = None) -> jnp.ndarray:
    """Convenience: render a loaded :class:`Scene` at its ini settings.

    ``overrides`` may remap resolution/spp/max_bounce.  Returns the
    clamped display image [res, res, 3]."""
    overrides = overrides or {}
    rs = scene.config.render_settings()
    res = int(overrides.get("resolution", rs.resolution))
    spp = int(overrides.get("spp", rs.spp))
    max_bounce = int(overrides.get("max_bounce", rs.max_bounce))
    nee = bool(overrides.get("nee", False))
    mis = bool(overrides.get("mis", False))
    nee = nee or mis
    glass_mode = str(overrides.get("glass_mode", "tint"))
    if key is None:
        key = jax.random.PRNGKey(0)
    env = scene.env_params()
    materials = scene.material_params()
    sun_enabled = bool(float(env.sun_power) != 0.0)
    lights = None
    if nee:
        lights = scene.light_pack(materials)
        nee = lights is not None
    radiance = render_radiance_jit(
        scene.geometry,
        materials,
        env,
        scene.camera_params(),
        key,
        height=res,
        width=res,
        spp=spp,
        max_bounce=max_bounce,
        sun_enabled=sun_enabled,
        lights=lights,
        nee=nee,
        mis=mis and nee,
        glass_mode=glass_mode,
    )
    return jnp.clip(radiance, 0.0, 1.0)
