"""Inverse rendering: gradient-based scene-parameter optimization.

The reference is forward-only; differentiability is this framework's
capability extension (BASELINE.json north star: pixel gradients w.r.t.
material albedo/roughness/emissive power, sun/IBL powers, and IBL
texels; geometry/visibility detached).  This module packages that as a
"training" loop: render -> image loss vs a target -> ``jax.grad`` ->
optax update, all under one ``jit``, optionally sharded over a
``(dp, sp)`` device mesh (gradient all-reduce collectives are inserted
by XLA when differentiating through ``shard_map``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ensem3a_openclraytracer_tpu.models.pathtracer import render_radiance
from ensem3a_openclraytracer_tpu.models.replay import render_radiance_replay
from ensem3a_openclraytracer_tpu.parallel.render import render_radiance_sharded
from ensem3a_openclraytracer_tpu.scene.materials import EnvParams, MaterialParams


class TrainableParams(NamedTuple):
    """The differentiable parameter pytree (the continuous leaves of the
    material table + environment; integer material types and geometry are
    static)."""

    color: jnp.ndarray  # [M, 3]
    roughness: jnp.ndarray  # [M] (emissive power for type-0 materials)
    sun_power: jnp.ndarray  # []
    ibl_power: jnp.ndarray  # []
    ibl: jnp.ndarray  # [H, W, 3]

    @staticmethod
    def from_scene_params(materials: MaterialParams, env: EnvParams) -> "TrainableParams":
        return TrainableParams(
            color=materials.color,
            roughness=materials.roughness,
            sun_power=env.sun_power,
            ibl_power=env.ibl_power,
            ibl=env.ibl,
        )

    def apply(
        self, materials: MaterialParams, env: EnvParams
    ) -> Tuple[MaterialParams, EnvParams]:
        """Graft the trainable leaves back onto full parameter structs."""
        m = materials._replace(color=self.color, roughness=self.roughness)
        e = env._replace(
            sun_power=self.sun_power, ibl_power=self.ibl_power, ibl=self.ibl
        )
        return m, e


def image_loss(rendered: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error in linear radiance."""
    return jnp.mean((rendered - target) ** 2)


def render_for_grad(
    params: TrainableParams,
    geom,
    materials: MaterialParams,
    env: EnvParams,
    camera,
    key,
    *,
    height: int,
    width: int,
    spp: int,
    max_bounce: int,
    sun_enabled: bool = True,
    mesh=None,
):
    """Differentiable render from a :class:`TrainableParams` pytree - the
    single entry point every gradient consumer (train step, fwd+bwd
    bench) goes through, so engine upgrades to the backward path land
    everywhere at once.  Single-device renders use the path-replay
    engine (models/replay.py: trace once, differentiate a shading-only
    replay); sharded renders differentiate through the scan estimator
    under ``shard_map``."""
    m, e = params.apply(materials, env)
    if mesh is None:
        return render_radiance_replay(
            geom, m, e, camera, key,
            height=height, width=width, spp=spp, max_bounce=max_bounce,
            sun_enabled=sun_enabled,
        )
    return render_radiance_sharded(
        mesh, geom, m, e, camera, key,
        height=height, width=width, spp=spp, max_bounce=max_bounce,
        sun_enabled=sun_enabled, fused=False,
    )


def make_train_step(
    geom,
    materials: MaterialParams,
    env: EnvParams,
    camera,
    optimizer: optax.GradientTransformation,
    *,
    height: int,
    width: int,
    spp: int,
    max_bounce: int,
    mesh=None,
    sun_enabled: bool = True,
):
    """Build ``(init, step)`` for inverse rendering against a target image.

    ``step(params, opt_state, target, key) -> (params, opt_state, loss)``
    is a single jitted function; with ``mesh`` it renders sharded over
    ``(dp, sp)`` and XLA all-reduces the parameter gradients."""

    def render_fn(params: TrainableParams, key):
        return render_for_grad(
            params,
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
            mesh=mesh,
        )

    def loss_fn(params, target, key):
        return image_loss(render_fn(params, key), target)

    @jax.jit
    def step(params, opt_state, target, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, target, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # keep physical quantities in range
        params = params._replace(
            color=jnp.clip(params.color, 0.0, 1.0),
            roughness=jnp.clip(params.roughness, 0.0, None),
            sun_power=jnp.clip(params.sun_power, 0.0, None),
            ibl_power=jnp.clip(params.ibl_power, 0.0, None),
            ibl=jnp.clip(params.ibl, 0.0, None),
        )
        return params, opt_state, loss

    def init(params: Optional[TrainableParams] = None):
        if params is None:
            p = TrainableParams.from_scene_params(materials, env)
        else:
            p = params
        return p, optimizer.init(p)

    return init, step
