"""Sharded rendering: pixels x samples over a (dp, sp) device mesh.

TPU-native replacement for the reference's single-device dispatch
(KernelLauncher.py:33-88).  The image's row blocks are sharded over the
``dp`` mesh axis, Monte-Carlo sample sets over ``sp``; the scene pack and
all parameters are replicated.  Forward rendering needs zero inter-chip
traffic except one ``pmean`` over ``sp`` to average the sample sets; the
assembled framebuffer comes back sharded over rows (an ``all_gather``
only happens if the host pulls the array).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ensem3a_openclraytracer_tpu.models.pathtracer import radiance_for_rays
from ensem3a_openclraytracer_tpu.ops.camera import camera_rays
from ensem3a_openclraytracer_tpu.parallel.mesh import DP_AXIS, SP_AXIS


def _shard_radiance(
    geom,
    materials,
    env,
    ray_o,
    ray_d,
    key,
    *,
    spp_local: int,
    max_bounce: int,
    sun_enabled: bool,
    ibl_bilinear: bool,
    fused=None,
    lights=None,
    nee: bool = False,
    glass_mode: str = "tint",
    mis: bool = False,
):
    """Per-shard body: render my row block with my sample subset, then
    average sample sets across the sp axis."""
    dp_idx = jax.lax.axis_index(DP_AXIS)
    sp_idx = jax.lax.axis_index(SP_AXIS)
    shard_key = jax.random.fold_in(jax.random.fold_in(key, dp_idx), sp_idx)
    # each sp shard draws different randoms, so every downstream value is
    # varying over sp; mark the rays up-front so scan/while carries unify
    ray_o = jax.lax.pcast(ray_o, (SP_AXIS,), to="varying")
    ray_d = jax.lax.pcast(ray_d, (SP_AXIS,), to="varying")
    rad = radiance_for_rays(
        geom,
        materials,
        env,
        ray_o,
        ray_d,
        shard_key,
        spp=spp_local,
        max_bounce=max_bounce,
        sun_enabled=sun_enabled,
        ibl_bilinear=ibl_bilinear,
        fused=fused,
        lights=lights,
        nee=nee,
        glass_mode=glass_mode,
        mis=mis,
    )
    return jax.lax.pmean(rad, SP_AXIS)


def render_radiance_sharded(
    mesh: Mesh,
    geom,
    materials,
    env,
    camera,
    key: jax.Array,
    *,
    height: int,
    width: int,
    spp: int,
    max_bounce: int,
    sun_enabled: bool = True,
    ibl_bilinear: bool = True,
    fused=None,
    lights=None,
    nee: bool = False,
    glass_mode: str = "tint",
    mis: bool = False,
) -> jnp.ndarray:
    """Radiance image ``[height, width, 3]`` rendered over ``mesh``.

    ``height`` must divide evenly by the dp axis size and ``spp`` by the
    sp axis size.  Differentiable w.r.t. materials/env exactly like the
    single-device path — XLA inserts the gradient ``psum`` collectives
    when this is transposed.

    ``nee=True`` (with ``lights``, replicated to every shard) and
    ``glass_mode`` mirror the single-device estimator options: each
    (dp, sp) shard NEE-samples its own light points from its fold_in key,
    so the sharded NEE render is a valid (differently-seeded) estimate of
    the same integral."""
    n_dp = mesh.shape[DP_AXIS]
    n_sp = mesh.shape[SP_AXIS]
    if height % n_dp != 0:
        raise ValueError(f"height {height} not divisible by dp={n_dp}")
    if spp % n_sp != 0:
        raise ValueError(f"spp {spp} not divisible by sp={n_sp}")

    ray_o, ray_d = camera_rays(
        camera.position, camera.rotation_deg, camera.fov_deg, height, width
    )
    # [H*W, 3] -> [H, W*3] so rows shard cleanly on dp.
    ray_o = ray_o.reshape(height, width * 3)
    ray_d = ray_d.reshape(height, width * 3)

    body = partial(
        _shard_radiance,
        spp_local=spp // n_sp,
        max_bounce=max_bounce,
        sun_enabled=sun_enabled,
        ibl_bilinear=ibl_bilinear,
        fused=fused,
        nee=nee,
        glass_mode=glass_mode,
        mis=mis,
    )

    def shard_body(geom, materials, env, lights, ro, rd, key):
        h_local = ro.shape[0]
        rad = body(
            geom,
            materials,
            env,
            ro.reshape(h_local * width, 3),
            rd.reshape(h_local * width, 3),
            key,
            lights=lights,
        )
        return rad.reshape(h_local, width, 3)

    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(DP_AXIS, None), P(DP_AXIS, None), P()),
        out_specs=P(DP_AXIS, None, None),
    )
    return sharded(geom, materials, env, lights, ray_o, ray_d, key)


def make_sharded_renderer(
    mesh: Mesh,
    *,
    height: int,
    width: int,
    spp: int,
    max_bounce: int,
    sun_enabled: bool = True,
    ibl_bilinear: bool = True,
):
    """jit-compiled sharded render fn ``(geom, materials, env, camera,
    key) -> [H, W, 3]`` with the output left sharded over dp rows."""

    @jax.jit
    def fn(geom, materials, env, camera, key):
        return render_radiance_sharded(
            mesh,
            geom,
            materials,
            env,
            camera,
            key,
            height=height,
            width=width,
            spp=spp,
            max_bounce=max_bounce,
            sun_enabled=sun_enabled,
            ibl_bilinear=ibl_bilinear,
        )

    return fn


def shard_target_image(mesh: Mesh, target: jnp.ndarray) -> jnp.ndarray:
    """Place a target/reference image with the same row sharding the
    renderer produces, so losses are computed without resharding."""
    return jax.device_put(
        target, NamedSharding(mesh, P(DP_AXIS, None, None))
    )
