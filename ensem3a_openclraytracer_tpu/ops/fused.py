"""Fused path-tracing sample kernel: the whole bounce loop in VMEM.

The scan estimator (models/pathtracer.py) runs each bounce as a chain of
XLA ops over [N, 3] arrays - every intermediate round-trips HBM, and the
threefry uniforms, one-hot gathers and IBL lookups each cost another
pass.  This kernel executes ONE full Monte-Carlo sample (primary-hit
state -> radiance) for a tile of rays entirely on-chip:

  * scene intersection features stay VMEM-resident (TriFeatures +
    an [8, Tp] per-triangle attribute table: normal, material type,
    color, roughness - material records pre-joined per face);
  * the bounce loop is sequential (SURVEY.md section 5): a static
    Python loop over ``max_bounce + 1`` for single-tile scenes, a rolled
    ``lax.fori_loop`` for multi-block scenes (unrolling a body that
    itself contains the block-traversal loop multiplies Mosaic compile
    time);
  * closest-hit uses the same Plucker/plane tests as ops/intersect_mxu
    with packed int32 (t | row) single-reduction min - the in-tile
    argmin row doubles as a one-hot (keys are unique per row), so the
    winner's attributes come from one small f32 matmul;
  * uniforms come from the TPU core PRNG (pltpu.prng_*), seeded per
    (sample key, ray tile) - zero HBM traffic for randomness;
  * sun shadow rays (closest-hit + occluder attributes, for the
    reference's glass-tinted sun, Raytracing.cl:115-133) run in-kernel;
  * IBL lookups are hoisted OUT: a path escapes at most once, so the
    kernel emits an escape record (throughput, direction) per ray and
    the caller adds ``esc_thr * ibl(esc_dir)`` - arbitrary-size
    environment maps without in-kernel gathers.

HBM traffic per sample collapses to: primary state in (~14 f32/ray),
(radiance, escape) out (9 f32/ray).  Forward-only by construction
(Pallas has no autodiff); differentiable renders use the scan estimator.

Semantics match the scan estimator's BSDF-only path exactly except for
the random stream (hardware PRNG vs threefry) and the hit distance
carrying 24 significant mantissa bits (the low 8 carry the argmin row;
relative 3e-5 - far below MIN_HIT_DIST).  NEE and explicit-uniform
renders stay on the scan path.
"""

from __future__ import annotations

import functools

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ensem3a_openclraytracer_tpu.ops.geometry import MAX_DIST, MIN_HIT_DIST
from ensem3a_openclraytracer_tpu.ops.intersect_mxu import (
    refined_recip,
    _MAXKEY,
    TRI_TILE,
    TriFeatures,
    block_centroid,
    build_ecat,
    build_edge_lhs,
    build_edge_rhs,
    build_nd_rhs,
    build_pnd,
)
from ensem3a_openclraytracer_tpu.ops.sampling import PI

# rays per grid step; the in-kernel [3*TT, R] products scale VMEM with
# tri_tile * ray_tile, so large (multi-block) scenes drop to 1024 lanes
RAY_TILE = 2048
RAY_TILE_BIG_SCENE = 1024

# attribute rows in the per-triangle table
_A_NX, _A_NY, _A_NZ, _A_MT, _A_CR, _A_CG, _A_CB, _A_RO = range(8)
_N_ATTR = 8

_EMISSIVE, _DIFFUSE, _GLOSSY, _GLASS = 0.0, 1.0, 2.0, 3.0


def build_tri_attrs(face_n, face_mat, mtype, color, roughness, tp: int):
    """[8, Tp] per-triangle attribute table: the face normal joined with
    the face's material record (type, rgb, roughness/emissive-power).
    Traced (not host) so material edits don't rebuild geometry; padding
    triangles get zeros = emissive with power 0 (contribute nothing,
    and padding never wins the closest-hit anyway)."""
    face_n = jnp.asarray(face_n, jnp.float32)
    midx = jnp.asarray(face_mat, jnp.int32)
    mt = jnp.asarray(mtype, jnp.float32)[midx]  # [T]
    col = jnp.asarray(color, jnp.float32)[midx]  # [T, 3]
    ro = jnp.asarray(roughness, jnp.float32)[midx]  # [T]
    t = face_n.shape[0]
    attrs = jnp.concatenate(
        [face_n, mt[:, None], col, ro[:, None]], axis=1
    ).T  # [8, T]
    return jnp.pad(attrs, ((0, 0), (0, tp - t)))


def _u01(shape):
    """Uniforms in [0, 1) from the core PRNG (top 24 bits, exact f32)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    top = pltpu.bitcast(bits >> 8, jnp.int32)
    return top.astype(jnp.float32) * (1.0 / (1 << 24))


def _dot3(a, b):
    """Row-wise dot of two [3, R] stacks -> [1, R]."""
    return (a[0:1] * b[0:1] + a[1:2] * b[1:2] + a[2:3] * b[2:3])


def _cross3(a, b):
    return jnp.concatenate(
        [
            a[1:2] * b[2:3] - a[2:3] * b[1:2],
            a[2:3] * b[0:1] - a[0:1] * b[2:3],
            a[0:1] * b[1:2] - a[1:2] * b[0:1],
        ],
        axis=0,
    )


def _where3(m, a, b):
    """Select [3, R] by a [1, R] mask."""
    return jnp.where(jnp.broadcast_to(m, a.shape), a, b)


def _make_kernel(max_bounce: int, sun_enabled: bool, tp: int, num_tiles: int,
                 tri_tile: int, use_prng: bool = True, merged: bool = False,
                 nee: bool = False, n_lights: int = 0, lp: int = 0,
                 record: bool = False):
    """Build the fused kernel for static (max_bounce, sun, scene-size).

    ``use_prng=False`` swaps the in-kernel PRNG for an explicit uniform
    input ``[(max_bounce + 1) * 2, R]`` - the CPU-interpretable test
    mode (prng_seed has no CPU lowering), which also lets equivalence
    tests drive the fused kernel and the scan estimator with the SAME
    random stream.

    ``record=True`` additionally emits the discrete path structure the
    replay gradient engine consumes (models/replay.py): per bounce the
    drawn uniforms, the global winner-triangle row of the bounce
    segment, and (with sun) the sun-shadow occluder row - so recording
    runs at fused-kernel speed instead of re-tracing bounce-by-bounce
    through the scan path.  Extra outputs: ``u_rec [(mb+1)*2, R]``,
    ``tri_rec [mb+1 pad 8, R]``, ``sun_rec [same]`` (ints; -1 = miss).
    Incompatible with ``nee`` (the replay engine is BSDF-only)."""

    def dot_bf16(a, b):
        return lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    def dot_select(a, b):
        # one-hot selector contraction: b is exact 0/1 (bf16-exact), so
        # per-output the sum selects a single a-element.  A two-term
        # bf16 split of a (hi + residual) recovers ~17 mantissa bits of
        # the selected value at a third of the 6-pass HIGHEST cost.
        # hi and lo are stacked into ONE [2*rows, TT] matmul: both row
        # counts live inside a single 128-row MXU tile, so the stacked
        # product costs one pass where hi/lo separately cost two.
        rows = a.shape[0]
        hi = a.astype(jnp.bfloat16)
        lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        both = dot_bf16(jnp.concatenate([hi, lo], axis=0), b)
        return both[:rows] + both[rows:]

    def kernel(*refs):
        refs = list(refs)
        seed_ref = refs.pop(0)
        env_ref = refs.pop(0)
        # per-tile block visit order lives in SMEM (scalar prefetch):
        # it is read one scalar at a time at a dynamic index, which VMEM
        # vector loads cannot do on the lane axis
        perm_ref = refs.pop(0) if num_tiles > 1 else None
        if merged:
            # single [27, 5*TT] operand: edge rows + num/den rows packed
            # into one sub-128-row MXU tile (tiny scenes: one matmul per
            # block instead of two)
            (comb_ref, blocks_ref, attrs_ref,
             p_ref, n_ref, misc_ref, color_ref, indir_ref) = refs[:8]
            ecat_ref = pnd_ref = None
            rest = refs[8:]
        else:
            (ecat_ref, pnd_ref, blocks_ref, attrs_ref,
             p_ref, n_ref, misc_ref, color_ref, indir_ref) = refs[:9]
            rest = refs[9:]
        lights_ref = rest.pop(0) if nee else None
        u_ref = None if use_prng else rest.pop(0)
        if record:
            (rad_ref, escthr_ref, escdir_ref, u_rec_ref,
             tri_rec_ref, *sun_rest) = rest
            sun_rec_ref = sun_rest[0] if sun_enabled else None
        else:
            rad_ref, escthr_ref, escdir_ref = rest
        r = p_ref.shape[-1]
        row_idx = lax.broadcasted_iota(jnp.int32, (tri_tile, r), 0)
        # hoisted: program_id inside a rolled lax loop body would be
        # closure-lifted into a pallas_call constant, which cannot lower
        pid = pl.program_id(0)

        def trace(p, dirv):
            """Closest hit of [3, R] rays; returns (t [1,R], hit [1,R],
            attrs [8, R] of the winning triangle)."""
            tiny = 1e-12
            d_safe = jnp.where(
                jnp.abs(dirv) < tiny, jnp.where(dirv < 0, -tiny, tiny), dirv
            )
            inv_d = 1.0 / d_safe

            def intersect_block(j, best_key, best_attr, best_tri=None):
                # multiple_of: j may come from a VMEM permutation load,
                # whose divisibility Mosaic can't derive on its own
                sl = pl.ds(pl.multiple_of(j * tri_tile, 128), tri_tile)
                # per-block local frame + split-bf16 operand rows: bf16
                # truncation error scales with the block extent instead
                # of the scene extent (ops/intersect_mxu precision notes)
                c = block_centroid(blocks_ref, j)
                oc = jnp.concatenate(
                    [p[k : k + 1] - c[k] for k in range(3)], axis=0
                )  # [3, R]
                q4c = jnp.concatenate(
                    [oc, jnp.ones_like(oc[0:1])], axis=0
                )  # [4, R]
                if merged:
                    # tiny scene: ONE [5*TT, 39] @ [39, R] matmul covers
                    # the three edge tests AND num/den (operand layout
                    # [edge lhs rows | A_num | A_den], see sample_fused) -
                    # separate matmuls each waste a mostly-empty 128-row
                    # MXU tile when 5*TT <= 128
                    rhs39 = jnp.concatenate(
                        [build_edge_rhs(dirv, oc), build_nd_rhs(q4c, dirv)],
                        axis=0,
                    )
                    out = dot_bf16(comb_ref[:].T, rhs39)  # [5*TT, R]
                    w1 = out[0:tri_tile]
                    w2 = out[tri_tile : 2 * tri_tile]
                    w3 = out[2 * tri_tile : 3 * tri_tile]
                    num = out[3 * tri_tile : 4 * tri_tile]
                    den = out[4 * tri_tile : 5 * tri_tile]
                else:
                    # one [3*TT, 18] @ [18, R] matmul for all three edge
                    # tests (blocks of ecat are laid out [e_AB|e_BC|e_CA])
                    sl3 = pl.ds(
                        pl.multiple_of(j * 3 * tri_tile, 128), 3 * tri_tile
                    )
                    w = dot_bf16(
                        build_edge_lhs(ecat_ref[:, sl3]).T,
                        build_edge_rhs(dirv, oc),
                    )  # [3*TT, R]
                    w1 = w[0:tri_tile]
                    w2 = w[tri_tile : 2 * tri_tile]
                    w3 = w[2 * tri_tile : 3 * tri_tile]
                wmin = jnp.minimum(jnp.minimum(w1, w2), w3)
                wmax = jnp.maximum(jnp.maximum(w1, w2), w3)
                inside = (wmin >= 0) | (wmax <= 0)
                if not merged:
                    # num (plane . [o,1]) and den (n . d) in ONE MXU
                    # matmul: block j of pnd holds [A_num | A_den] columns
                    # (split-bf16 plane/normal rows, see sample_fused), so
                    # the [2*TT, 21] @ [21, R] product stacks num over den
                    # - this replaces ~576 VPU flops/ray of outer-product
                    # accumulation
                    slnd = pl.ds(
                        pl.multiple_of(j * 2 * tri_tile, 128), 2 * tri_tile
                    )
                    nd_out = dot_bf16(
                        pnd_ref[:, slnd].T, build_nd_rhs(q4c, dirv)
                    )  # [2*TT, R]
                    num = nd_out[:tri_tile]
                    den = nd_out[tri_tile:]
                t = num * refined_recip(den)
                # scale-aware self-hit epsilon (block_bounds col 6);
                # den == 0 rides the reciprocal's inf/nan semantics
                eps = jnp.maximum(blocks_ref[j, 6], MIN_HIT_DIST)
                valid = inside & (t > eps)
                t = jnp.where(valid, t, MAX_DIST)
                key = (pltpu.bitcast(t, jnp.int32) & jnp.int32(~0xFF)) | row_idx
                kmin = jnp.min(key, axis=0, keepdims=True)  # [1, R]
                better = kmin < best_key
                # keys are unique per row (the low 8 bits ARE the row), so
                # (key == kmin) is an exact one-hot of the in-block winner
                onehot = (key == jnp.broadcast_to(kmin, key.shape)).astype(
                    jnp.float32
                )
                cand = dot_select(attrs_ref[:, sl], onehot)  # [8, R]
                best_attr = jnp.where(
                    jnp.broadcast_to(better, cand.shape), cand, best_attr
                )
                best_key = jnp.where(better, kmin, best_key)
                if not record:
                    return best_key, best_attr
                # global winner row: the replay engine gathers per-face
                # attributes by this index (models/replay.py).  The tri
                # carry exists only in record mode - extra rolled-loop
                # state measurably costs the forward path (round 2).
                tri_cand = j * tri_tile + (kmin & jnp.int32(0xFF))
                best_tri = jnp.where(better, tri_cand, best_tri)
                return best_key, best_attr, best_tri

            def body(jj, carry):
                if num_tiles == 1:
                    return intersect_block(jj, *carry)
                # front-to-back: visit blocks by distance from the tile's
                # origin centroid (perm precomputed outside) so near hits
                # shrink best_t early and the tmin prune kills far blocks
                j = perm_ref[pid, jj]
                lo = [blocks_ref[j, k] for k in range(3)]
                hi = [blocks_ref[j, 3 + k] for k in range(3)]
                tmin = jnp.full((1, r), -jnp.inf, jnp.float32)
                tmax = jnp.full((1, r), jnp.inf, jnp.float32)
                for k in range(3):
                    t1 = (lo[k] - p[k : k + 1]) * inv_d[k : k + 1]
                    t2 = (hi[k] - p[k : k + 1]) * inv_d[k : k + 1]
                    tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
                    tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
                best_key = carry[0]
                best_t = pltpu.bitcast(best_key & jnp.int32(~0xFF), jnp.float32)
                live = (tmax >= tmin) & (tmax >= 0.0) & (tmin <= best_t)
                return lax.cond(
                    jnp.any(live),
                    lambda *c: intersect_block(j, *c),
                    lambda *c: c,
                    *carry,
                )

            init = (
                jnp.full((1, r), _MAXKEY, jnp.int32),
                jnp.zeros((_N_ATTR, r), jnp.float32),
            )
            if record:
                init = init + (jnp.zeros((1, r), jnp.int32),)
            out = lax.fori_loop(0, num_tiles, body, init)
            best_key, best_attr = out[0], out[1]
            t = pltpu.bitcast(best_key & jnp.int32(~0xFF), jnp.float32)
            hit = t < MAX_DIST * 0.999
            if record:
                return t, hit, best_attr, jnp.where(hit, out[2], -1)
            return t, hit, best_attr

        # ---- per-sample state (transposed SoA, rays on lanes) ----
        if use_prng:
            pltpu.prng_seed(
                seed_ref[0] + pl.program_id(0) * jnp.int32(-1640531527),
                seed_ref[1],
            )
        sun_dir = jnp.concatenate(
            [jnp.full((1, r), env_ref[k], jnp.float32) for k in range(3)], axis=0
        )
        sun_power = env_ref[3]

        p = p_ref[:]  # [3, R] current vertex
        n = n_ref[:]  # [3, R] unit shading normal
        mtype = misc_ref[0:1]  # [1, R] material type (f32-coded)
        rough = misc_ref[1:2]  # [1, R]
        live = misc_ref[2:3] > 0.5  # [1, R]
        color = color_ref[:]  # [3, R]
        in_dir = indir_ref[:]  # [3, R]
        # initializers derived from p (not pure splats): a splat constant
        # gets a replicated Mosaic layout, which cannot serve as the carry
        # slot of the rolled bounce fori_loop (the body produces tiled
        # layouts - "Invalid relayout ... replicated in destination")
        zero3 = p * 0.0
        thr = zero3 + 1.0
        rad = zero3
        esc_thr = zero3
        # default escape dir is +z so the caller's IBL lookup is NaN-free
        esc_dir = zero3 + jnp.concatenate(
            [jnp.zeros((2, r), jnp.float32), jnp.ones((1, r), jnp.float32)],
            axis=0,
        )

        def ggx_eval(color, rough, v, l, n):
            """GGX + Schlick + Smith BRDF [3, R] (ops/bsdf.eval_ggx)."""
            h = l + v
            h = h * lax.rsqrt(jnp.maximum(_dot3(h, h), 1e-20))
            alpha_sqr = rough * rough
            ndoth = jnp.maximum(_dot3(n, h), 0.0)
            d_den = jnp.maximum(
                PI * jnp.square(ndoth * ndoth * (alpha_sqr - 1.0) + 1.0), 1e-12
            )
            kk = rough * np.float32(np.sqrt(2.0 / np.pi))
            ndotv = jnp.maximum(_dot3(n, v), 0.0)
            ndotl = jnp.maximum(_dot3(n, l), 0.0)
            g1_den = jnp.maximum(ndotv * (1.0 - kk) + kk, 1e-12)
            g2_den = jnp.maximum(ndotl * (1.0 - kk) + kk, 1e-12)
            one_m_hv = 1.0 - jnp.maximum(_dot3(h, v), 0.0)
            p2 = one_m_hv * one_m_hv
            f = 0.04 + 0.96 * (p2 * p2 * one_m_hv)
            spec = (f * alpha_sqr * ndotv * ndotl) / (
                d_den * g1_den * g2_den * jnp.maximum(4.0 * ndotv * ndotl, 1e-3)
            )
            return ((1.0 - f) * 0.5) * color * (1.0 / PI) + spec

        def bounce_body(bounce_j, state):
            # the emit_ok flag exists only under NEE; the non-NEE kernel
            # carries 11 slots (the extra state measurably cost the
            # single-block forward path ~3% in round 2).  Record mode
            # appends per-bounce accumulator planes (uniforms + winner
            # rows) updated by a one-hot row select - no dynamic stores,
            # so the rolled multi-block loop lowers unchanged.
            state = list(state)
            if record:
                u_acc, tri_acc, sun_acc = state[-3:]
                state = state[:-3]
            if nee:
                (p, n, mtype, rough, live_f, color, in_dir,
                 thr, rad, esc_thr, esc_dir, emit_ok_f) = state
                emit_ok = emit_ok_f > 0.5
            else:
                (p, n, mtype, rough, live_f, color, in_dir,
                 thr, rad, esc_thr, esc_dir) = state
                emit_ok = None
            # the live mask crosses the rolled-loop carry as f32: Mosaic
            # cannot legalize scf.for with i1-vector carries
            live = live_f > 0.5
            # terminal: emissive vertex (power in the roughness slot);
            # with NEE, suppressed when the PREVIOUS vertex light-sampled
            emis = live & (mtype == _EMISSIVE)
            rad = rad + _where3(
                (emis & emit_ok) if nee else emis,
                thr * rough, jnp.zeros_like(rad)
            )
            live = live & ~emis

            # ---- next-event estimation (fused port of the scan path's
            # nee_contribution): one area-sampled shadow ray per
            # diffuse/glossy vertex; emission of the NEXT vertex is then
            # suppressed (per-bounce flag - glass chains keep theirs)
            # NOTE: placed below after uniforms are drawn.
            n_u = 5 if nee else 2
            if use_prng:
                u = _u01((n_u, r))
            else:
                # bounce on the leading axis of the 3D ref (see the
                # operand builder): dynamic leading-axis indexing is the
                # layout Mosaic handles correctly on this toolchain
                u = u_ref[bounce_j][:n_u]
            u1, u2 = u[0:1], u[1:2]
            if nee:
                u3, u4, u5 = u[2:3], u[3:4], u[4:5]
                li = jnp.clip(
                    (u3 * float(n_lights)).astype(jnp.int32), 0, n_lights - 1
                )  # [1, R]
                lrow_idx = lax.broadcasted_iota(jnp.int32, (lp, r), 0)
                onehot_l = (lrow_idx == jnp.broadcast_to(li, (lp, r))).astype(
                    jnp.float32
                )
                lrows = dot_select(lights_ref[:], onehot_l)  # [14, R]
                lv0, lv1, lv2 = lrows[0:3], lrows[3:6], lrows[6:9]
                ln_, lpow, larea = lrows[9:12], lrows[12:13], lrows[13:14]
                sx = jnp.sqrt(u4)
                xl = lv0 + (lv1 - lv0) * (1.0 - sx) + (lv2 - lv0) * (u5 * sx)
                delta = xl - p
                dist2 = jnp.maximum(_dot3(delta, delta), 1e-8)
                dist = jnp.sqrt(dist2)
                ldir = delta / dist
                cos_s = _dot3(ldir, n)
                cos_l = jnp.abs(_dot3(ldir, ln_))
                st, _, _ = trace(p, ldir)
                visible = st >= dist * (1.0 - 1e-3)
                is_glossy_n = mtype == _GLOSSY
                brdf_n = jnp.where(
                    jnp.broadcast_to(is_glossy_n, (3, r)),
                    ggx_eval(color, rough, -in_dir, ldir, n),
                    color * (1.0 / PI),
                )
                sampled = live & (mtype != _GLASS)
                ok = sampled & visible & (cos_s > 0.0) & (cos_l > 1e-6)
                weight = (float(n_lights) * larea) * cos_l / dist2
                contrib = thr * brdf_n * (
                    jnp.maximum(cos_s, 0.0) * weight * lpow
                )
                rad = rad + _where3(ok, contrib, jnp.zeros_like(rad))
                # pure mask algebra: Mosaic cannot lower select_n on
                # i1 vectors (the interpret-mode tests would not catch
                # it); live lanes take ~sampled, dead lanes keep theirs
                emit_ok = (live & ~sampled) | (~live & emit_ok)
            nx, ny, nz = n[0:1], n[1:2], n[2:3]
            sign = jnp.where(nz >= 0.0, 1.0, -1.0)
            a = -1.0 / (sign + nz)
            b = nx * ny * a
            tg = jnp.concatenate(
                [1.0 + sign * nx * nx * a, sign * b, -sign * nx], axis=0
            )
            bt = jnp.concatenate([b, sign + ny * ny * a, -ny], axis=0)
            phi = (2.0 * PI) * u2
            cphi = jnp.cos(phi)
            sphi = jnp.sin(phi)
            rr = jnp.sqrt(u1)
            z_cos = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
            d_diff = tg * (rr * cphi) + bt * (rr * sphi) + n * z_cos
            invpdf_diff = PI / jnp.maximum(z_cos, 1e-6)
            cos_u = 1.0 - u1
            sin_u = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_u * cos_u))
            d_unif = tg * (sin_u * cphi) + bt * (sin_u * sphi) + n * cos_u

            is_glossy = mtype == _GLOSSY
            is_glass = mtype == _GLASS
            bdir = _where3(is_glass, in_dir, _where3(is_glossy, d_unif, d_diff))

            cos_abs = jnp.abs(_dot3(bdir, n))
            # GGX + Schlick + Smith (ops/bsdf.eval_ggx, single division)
            v = -in_dir
            h = bdir + v
            h = h * lax.rsqrt(jnp.maximum(_dot3(h, h), 1e-20))
            alpha_sqr = rough * rough
            ndoth = jnp.maximum(_dot3(n, h), 0.0)
            d_den = jnp.maximum(
                PI * jnp.square(ndoth * ndoth * (alpha_sqr - 1.0) + 1.0), 1e-12
            )
            kk = rough * np.float32(np.sqrt(2.0 / np.pi))
            ndotv = jnp.maximum(_dot3(n, v), 0.0)
            ndotl = jnp.maximum(_dot3(n, bdir), 0.0)
            g1_den = jnp.maximum(ndotv * (1.0 - kk) + kk, 1e-12)
            g2_den = jnp.maximum(ndotl * (1.0 - kk) + kk, 1e-12)
            one_m_hv = 1.0 - jnp.maximum(_dot3(h, v), 0.0)
            p2 = one_m_hv * one_m_hv
            f = 0.04 + 0.96 * (p2 * p2 * one_m_hv)
            spec = (f * alpha_sqr * ndotv * ndotl) / (
                d_den * g1_den * g2_den * jnp.maximum(4.0 * ndotv * ndotl, 1e-3)
            )
            brdf_glossy = ((1.0 - f) * 0.5) * color * (1.0 / PI) + spec
            factor_diff = color * ((1.0 / PI) * invpdf_diff * cos_abs)
            factor_glossy = brdf_glossy * ((2.0 * PI) * cos_abs)
            factor = _where3(
                is_glass, color, _where3(is_glossy, factor_glossy, factor_diff)
            )
            thr = _where3(live, thr * factor, thr)

            # ---- bounce segment ----
            if record:
                t, hit, attr, seg_tri = trace(p, bdir)
            else:
                t, hit, attr = trace(p, bdir)
            miss = live & ~hit

            # escape record: at most one escape per path, env added outside
            esc_thr = _where3(miss, thr, esc_thr)
            esc_dir = _where3(miss, bdir, esc_dir)

            if sun_enabled:
                if record:
                    st, shit, sattr, sun_tri = trace(p, sun_dir)
                else:
                    st, shit, sattr = trace(p, sun_dir)
                s_mtype = sattr[_A_MT : _A_MT + 1]
                s_color = sattr[_A_CR : _A_RO]
                unocc = (~shit) & (mtype != _GLASS)
                glass_occ = shit & (s_mtype == _GLASS)
                sun_light = (
                    unocc.astype(jnp.float32) * sun_power
                    + glass_occ.astype(jnp.float32) * s_color * sun_power
                )
                rad = rad + _where3(miss, thr * sun_light, jnp.zeros_like(rad))

            if record:
                # one-hot row select: bounce j's rows of each accumulator
                mb1 = max_bounce + 1
                rows_u = lax.broadcasted_iota(jnp.int32, (2 * mb1, r), 0)
                u_val = jnp.where(rows_u < mb1, jnp.broadcast_to(u1, (2 * mb1, r)),
                                  jnp.broadcast_to(u2, (2 * mb1, r)))
                hit_u = (rows_u == bounce_j) | (rows_u == mb1 + bounce_j)
                u_acc = jnp.where(hit_u, u_val, u_acc)
                rows_b = lax.broadcasted_iota(jnp.int32, (mb1, r), 0)
                tri_acc = jnp.where(
                    rows_b == bounce_j,
                    jnp.broadcast_to(seg_tri, (mb1, r)), tri_acc,
                )
                if sun_enabled:
                    sun_acc = jnp.where(
                        rows_b == bounce_j,
                        jnp.broadcast_to(sun_tri, (mb1, r)), sun_acc,
                    )

            live = live & hit

            # advance to the new vertex
            p = _where3(live, p + bdir * t, p)
            n = _where3(live, attr[_A_NX : _A_NX + 3], n)
            mtype = jnp.where(live, attr[_A_MT : _A_MT + 1], mtype)
            color = _where3(live, attr[_A_CR : _A_RO], color)
            rough = jnp.where(live, attr[_A_RO : _A_RO + 1], rough)
            in_dir = _where3(live, bdir, in_dir)
            out = (p, n, mtype, rough, live.astype(jnp.float32), color,
                   in_dir, thr, rad, esc_thr, esc_dir)
            if nee:
                out = out + (emit_ok.astype(jnp.float32),)
            if record:
                out = out + (u_acc, tri_acc, sun_acc)
            return out

        state = (p, n, mtype, rough, live.astype(jnp.float32), color,
                 in_dir, thr, rad, esc_thr, esc_dir)
        if nee:
            state = state + (thr[0:1] * 0.0 + 1.0,)
        if record:
            # seeds derived from p, not splat constants (the replicated-
            # layout carry pitfall, see zero3 above)
            mb1 = max_bounce + 1
            fz = p[0:1] * 0.0  # [1, r]
            iz = fz.astype(jnp.int32)
            state = state + (
                jnp.zeros((2 * mb1, r), jnp.float32) + fz,
                jnp.zeros((mb1, r), jnp.int32) + iz - 1,
                jnp.zeros((mb1, r), jnp.int32) + iz - 1,
            )
        if num_tiles > 1:
            # big scenes: rolled bounce loop - the per-bounce body embeds
            # a num_tiles-iteration traversal loop, and unrolling it
            # max_bounce+1 times multiplies Mosaic compile time (~14 min
            # for the 15.7k-tri Monkey scene unrolled)
            state = lax.fori_loop(0, max_bounce + 1, bounce_body, state)
        else:
            for bounce_j in range(max_bounce + 1):
                state = bounce_body(bounce_j, state)
        (p, n, mtype, rough, live_f, color, in_dir,
         thr, rad, esc_thr, esc_dir) = state[:11]

        # a path whose last segment landed on a light still contributes
        final_emis = (live_f > 0.5) & (mtype == _EMISSIVE)
        if nee:
            final_emis = final_emis & (state[11] > 0.5)
        rad = rad + _where3(final_emis, thr * rough, jnp.zeros_like(rad))

        rad_ref[:] = rad
        escthr_ref[:] = esc_thr
        escdir_ref[:] = esc_dir
        if record:
            u_rec_ref[:] = state[-3]
            tri_rec_ref[:] = state[-2]
            if sun_enabled:
                sun_rec_ref[:] = state[-1]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("max_bounce", "sun_enabled", "interpret", "nee", "record"),
)
def sample_fused(
    feats: TriFeatures,
    tri_attrs: jnp.ndarray,
    primary_p: jnp.ndarray,
    primary_n: jnp.ndarray,
    primary_mtype: jnp.ndarray,
    primary_color: jnp.ndarray,
    primary_rough: jnp.ndarray,
    primary_live: jnp.ndarray,
    in_dir: jnp.ndarray,
    sun_dir: jnp.ndarray,
    sun_power: jnp.ndarray,
    key: jax.Array,
    *,
    max_bounce: int,
    sun_enabled: bool,
    interpret: bool = False,
    uniforms: jnp.ndarray | None = None,
    nee: bool = False,
    lights=None,
    record: bool = False,
):
    """One Monte-Carlo sample for ``N`` rays starting at their (cached)
    primary vertices.  Returns ``(rad [N,3], esc_thr [N,3], esc_dir
    [N,3])``; total sample radiance = ``rad + esc_thr * env(esc_dir)``.

    ``record=True`` (BSDF path only, incompatible with ``nee``) extends
    the return with the discrete path structure for the replay gradient
    engine: ``(u [mb+1, N, 2], tri [mb+1, N], sun_tri [mb+1, N])``
    (ints, -1 = miss; ``sun_tri`` all -1 when the sun is off) - the
    recorder runs at fused-kernel speed (models/replay.py).

    ``uniforms [max_bounce + 1, N, 2]`` (or ``[..., N, 5]`` with NEE)
    switches the kernel to the explicit-stream test mode
    (CPU-interpretable; same stream as the scan estimator's per-sample
    uniforms).

    ``nee=True`` (requires ``lights``, a LightPack) adds in-kernel
    next-event estimation: per diffuse/glossy vertex one area-sampled
    light point, an in-kernel shadow trace, and per-bounce emission
    suppression - the fused twin of the scan path's NEE.
    """
    if nee and lights is None:
        raise ValueError("nee=True requires lights")
    tp0 = feats.edges.shape[-1]
    ray_tile = RAY_TILE if min(TRI_TILE, tp0) <= 64 else RAY_TILE_BIG_SCENE
    n_rays = primary_p.shape[0]
    pad = (-n_rays) % ray_tile
    n_pad = n_rays + pad

    def t3(x):  # [N, 3] -> [3, Np]
        return jnp.pad(x, ((0, pad), (0, 0))).T

    p = t3(primary_p)
    nrm = t3(primary_n)
    col = t3(primary_color)
    ind = t3(in_dir)
    misc = jnp.stack(
        [
            jnp.pad(primary_mtype.astype(jnp.float32), (0, pad)),
            jnp.pad(primary_rough, (0, pad)),
            jnp.pad(primary_live.astype(jnp.float32), (0, pad)),
        ]
    )  # [3, Np]

    tp = feats.edges.shape[-1]
    tri_tile = min(TRI_TILE, tp)
    num_tiles = tp // tri_tile

    kd = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    if kd.shape[0] < 2:
        kd = jnp.concatenate([kd, kd])
    seeds = lax.bitcast_convert_type(kd[:2], jnp.int32)
    env_scalars = jnp.concatenate(
        [
            jnp.asarray(sun_dir, jnp.float32).reshape(3),
            jnp.asarray(sun_power, jnp.float32).reshape(1),
        ]
    )

    use_prng = uniforms is None
    n_lights = 0 if lights is None else int(lights.v0.shape[0])
    lp_pad = ((max(n_lights, 1) + 7) // 8) * 8 if nee else 0
    # tiny scenes: edges (3*TT rows) and num/den (2*TT rows) each occupy
    # a mostly-empty 128-row MXU tile; when all 5*TT rows fit in one tile
    # a single merged matmul per block saves a third of the MXU passes
    merged = num_tiles == 1 and 5 * tri_tile <= 128
    if record and nee:
        raise ValueError("record mode is BSDF-only (replay has no NEE)")
    kernel = _make_kernel(
        max_bounce, sun_enabled, tp, num_tiles, tri_tile,
        use_prng=use_prng, merged=merged,
        nee=nee, n_lights=n_lights, lp=lp_pad, record=record,
    )

    full = lambda *shape: pl.BlockSpec(
        shape, lambda i, *_: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    ray_spec = lambda k: pl.BlockSpec(
        (k, ray_tile), lambda i, *_: (0, i), memory_space=pltpu.VMEM
    )
    # shared packed operands (ops/intersect_mxu.py): block-recentered
    # split-bf16 edge features and the 3-term split-bf16 num/den table
    ecat = build_ecat(feats.edges_c, num_tiles, tri_tile)
    pnd = build_pnd(feats.plane_c, feats.normal_d, num_tiles, tri_tile)

    if merged:
        # [39, 5*TT]: rows 0-17 (edge-rhs side) carry the edge columns,
        # rows 18-38 (nd_rhs side) carry the num/den columns - zero
        # elsewhere so the single matmul computes the separate products
        comb = jnp.zeros((39, 5 * tp), jnp.float32)
        comb = comb.at[0:18, 0 : 3 * tp].set(build_edge_lhs(ecat))
        comb = comb.at[18:39, 3 * tp : 5 * tp].set(pnd)
        geom_specs = [full(39, 5 * tp)]
        geom_ops = [comb]
    else:
        geom_specs = [full(6, 3 * tp), full(21, 2 * tp)]
        geom_ops = [ecat, pnd]
    in_specs = geom_specs + [
        full(*feats.block_bounds.shape),
        full(_N_ATTR, tp),
        ray_spec(3),
        ray_spec(3),
        ray_spec(3),
        ray_spec(3),
        ray_spec(3),
    ]
    operands = [seeds, env_scalars] + geom_ops + [
        feats.block_bounds,
        tri_attrs,
        p,
        nrm,
        misc,
        col,
        ind,
    ]
    if nee:
        # [14, Lp] light table: v0|v1|v2|n (3 rows each), power, area
        ltab = jnp.concatenate(
            [
                jnp.asarray(lights.v0, jnp.float32).T,
                jnp.asarray(lights.v1, jnp.float32).T,
                jnp.asarray(lights.v2, jnp.float32).T,
                jnp.asarray(lights.n, jnp.float32).T,
                jnp.asarray(lights.power, jnp.float32)[None, :],
                jnp.asarray(lights.area, jnp.float32)[None, :],
            ],
            axis=0,
        )
        ltab = jnp.pad(ltab, ((0, 0), (0, lp_pad - n_lights)))
        # the kernel pops the light table FIRST from the refs after the
        # nine fixed operands, i.e. it follows indir
        in_specs.append(full(14, lp_pad))
        operands.append(ltab)
    if num_tiles > 1:
        # per-tile front-to-back block visit order: distance from the
        # tile's mean origin to each block centroid, ascending.  One
        # [n_tiles, B] argsort per call (loop-invariant across samples -
        # XLA hoists it out of the spp scan).
        n_tiles_rays = n_pad // ray_tile
        tile_c = p.reshape(3, n_tiles_rays, ray_tile).mean(axis=2).T  # [G, 3]
        block_c = 0.5 * (
            feats.block_bounds[:, :3] + feats.block_bounds[:, 3:6]
        )  # [B, 3]
        dist = jnp.sum(
            jnp.square(tile_c[:, None, :] - block_c[None, :, :]), axis=-1
        )  # [G, B]
        perm = jnp.argsort(dist, axis=1).astype(jnp.int32)
        # scalar-prefetch operand: insert after (seeds, env_scalars)
        operands.insert(2, perm)
    if not use_prng:
        # [mb+1, N, n_u] -> [mb+1, 8, Np]: 3D with the bounce on the
        # LEADING axis so the rolled loop indexes u_ref[bounce_j] like
        # the streamed engine indexes its comb blocks - dynamic sublane
        # slicing (the old 2D layout) miscompiles on this toolchain
        # (wrong values on hardware, exact in interpret mode)
        n_u = 5 if nee else 2
        u = jnp.pad(uniforms, ((0, 0), (0, pad), (0, 0)))
        u = u.transpose(0, 2, 1)  # [mb+1, n_u, Np]
        u = jnp.pad(u, ((0, 0), (0, 8 - n_u), (0, 0)))
        in_specs.append(
            pl.BlockSpec(
                (max_bounce + 1, 8, ray_tile),
                lambda i, *_: (0, 0, i),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(u)
    out_specs = [ray_spec(3), ray_spec(3), ray_spec(3)]
    out_shape = [
        jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
    ]
    mb1 = max_bounce + 1
    if record:
        out_specs.append(ray_spec(2 * mb1))
        out_shape.append(jax.ShapeDtypeStruct((2 * mb1, n_pad), jnp.float32))
        out_specs.append(ray_spec(mb1))
        out_shape.append(jax.ShapeDtypeStruct((mb1, n_pad), jnp.int32))
        if sun_enabled:
            out_specs.append(ray_spec(mb1))
            out_shape.append(jax.ShapeDtypeStruct((mb1, n_pad), jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if num_tiles > 1 else 2,
        grid=(n_pad // ray_tile,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(*operands)
    rad, esc_thr, esc_dir = outs[:3]
    if not record:
        return rad.T[:n_rays], esc_thr.T[:n_rays], esc_dir.T[:n_rays]
    u_rec = outs[3]  # [2*mb1, Np]: u1 rows then u2 rows
    tri_rec = outs[4][:, :n_rays]
    sun_rec = (outs[5][:, :n_rays] if sun_enabled
               else jnp.full((mb1, n_rays), -1, jnp.int32))
    u = jnp.stack([u_rec[:mb1, :n_rays], u_rec[mb1:, :n_rays]], axis=-1)
    return (rad.T[:n_rays], esc_thr.T[:n_rays], esc_dir.T[:n_rays],
            u, tri_rec, sun_rec)


# ---------------------------------------------------------------------------
# Spatial ray ordering: tiles of spatially-local rays make the kernel's
# per-block AABB culling effective for multi-block scenes.
# ---------------------------------------------------------------------------


def _expand_bits_10_jnp(v):
    v = v & jnp.uint32(0x3FF)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def coherent_order(p: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Argsort of rays by (direction octant, 27-bit origin Morton code).

    Rays that land in the same kernel tile then share BOTH a spatial
    cluster and a direction octant, so the tile's frustum is tight and
    the multi-block trace kernel's per-tile AABB culling + front-to-back
    early exit actually bite (unsorted bounce rays point everywhere, and
    one divergent lane drags its whole tile through every block)."""
    lo = jnp.min(p, axis=0)
    hi = jnp.max(p, axis=0)
    q = jnp.clip((p - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 0.9999999)
    g = (q * 512.0).astype(jnp.uint32)  # 9 bits/axis -> 27-bit Morton
    code = (
        (_expand_bits_10_jnp(g[:, 0]) << 2)
        | (_expand_bits_10_jnp(g[:, 1]) << 1)
        | _expand_bits_10_jnp(g[:, 2])
    )
    octant = (
        ((d[:, 0] >= 0).astype(jnp.uint32) << 2)
        | ((d[:, 1] >= 0).astype(jnp.uint32) << 1)
        | (d[:, 2] >= 0).astype(jnp.uint32)
    )
    return jnp.argsort((octant << jnp.uint32(27)) | code)


def morton_order_points(p: jnp.ndarray) -> jnp.ndarray:
    """Argsort of ``[N, 3]`` points by 30-bit Morton code (device-side
    mirror of accel.lbvh.morton_codes).  Used to permute rays so that
    consecutive kernel lanes start at nearby scene positions: the
    fused kernel's ray tiles then share tight frusta and skip most
    triangle blocks.  Primary hits are cached across samples, so one
    sort serves the whole render."""
    lo = jnp.min(p, axis=0)
    hi = jnp.max(p, axis=0)
    q = jnp.clip((p - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 0.9999999)
    g = (q * 1024.0).astype(jnp.uint32)
    code = (
        (_expand_bits_10_jnp(g[:, 0]) << 2)
        | (_expand_bits_10_jnp(g[:, 1]) << 1)
        | _expand_bits_10_jnp(g[:, 2])
    )
    return jnp.argsort(code)
