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

import os
import tempfile
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
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
    nee: bool = False,
    lights=None,
    mis: bool = False,
):
    """Differentiable render from a :class:`TrainableParams` pytree - the
    single entry point every gradient consumer (train step, fwd+bwd
    bench) goes through, so engine upgrades to the backward path land
    everywhere at once.  Single-device renders use the path-replay
    engine (models/replay.py: trace once, differentiate a shading-only
    replay); sharded renders differentiate through the scan estimator
    under ``shard_map``.  ``nee=True`` (with ``lights``) switches both
    engines to the low-variance next-event estimator; ``mis=True``
    (implies nee) uses the balance-heuristic combination, which runs on
    the scan estimator (the replay recorder has no MIS mode)."""
    m, e = params.apply(materials, env)
    if mesh is None:
        if mis:
            from ensem3a_openclraytracer_tpu.models.pathtracer import (
                render_radiance,
            )

            return render_radiance(
                geom, m, e, camera, key,
                height=height, width=width, spp=spp, max_bounce=max_bounce,
                sun_enabled=sun_enabled, fused=False,
                nee=True, lights=lights, mis=True,
            )
        return render_radiance_replay(
            geom, m, e, camera, key,
            height=height, width=width, spp=spp, max_bounce=max_bounce,
            sun_enabled=sun_enabled, nee=nee, lights=lights,
        )
    return render_radiance_sharded(
        mesh, geom, m, e, camera, key,
        height=height, width=width, spp=spp, max_bounce=max_bounce,
        sun_enabled=sun_enabled, fused=False, nee=nee or mis, lights=lights,
        mis=mis,
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
    nee: bool = False,
    lights=None,
    mis: bool = False,
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
            nee=nee,
            lights=lights,
            mis=mis,
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


# ---------------------------------------------------------------------------
# Optimizer checkpointing: the inverse-rendering analog of the renderer's
# progressive checkpoints (models/progressive.py).  The reference persists
# only *state* (ini files), never computation (SURVEY.md section 5); here a
# killed optimization resumes mid-run with the identical loss trajectory.
# ---------------------------------------------------------------------------


def save_optimizer_checkpoint(path, params, opt_state, iteration: int, key) -> None:
    """Atomically persist ``(params, opt_state, iteration, key)`` as .npz.

    Pytree leaves are stored by flattening order; the structures are
    rebuilt at load time from a template (`optimizer.init`), so no
    pickling of treedefs is needed."""
    p_leaves = jax.tree.leaves(params)
    o_leaves = jax.tree.leaves(opt_state)
    payload = {f"p{i}": np.asarray(x) for i, x in enumerate(p_leaves)}
    payload.update({f"o{i}": np.asarray(x) for i, x in enumerate(o_leaves)})
    payload["iteration"] = np.asarray(iteration, np.int64)
    payload["key"] = np.asarray(jax.random.key_data(key))
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)  # atomic: a crash never corrupts the file
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_optimizer_checkpoint(path, template_params: TrainableParams,
                              optimizer: optax.GradientTransformation):
    """Restore ``(params, opt_state, iteration, key)`` saved by
    :func:`save_optimizer_checkpoint`.  ``template_params`` must have the
    same structure/shapes as the saved run (same scene + trainables)."""
    with np.load(path) as z:
        p_treedef = jax.tree.structure(template_params)
        n_p = p_treedef.num_leaves
        p_leaves = [jnp.asarray(z[f"p{i}"]) for i in range(n_p)]
        params = jax.tree.unflatten(p_treedef, p_leaves)
        o_template = optimizer.init(params)
        o_treedef = jax.tree.structure(o_template)
        o_leaves = [
            jnp.asarray(z[f"o{i}"]) for i in range(o_treedef.num_leaves)
        ]
        opt_state = jax.tree.unflatten(o_treedef, o_leaves)
        iteration = int(z["iteration"])
        key = jax.random.wrap_key_data(jnp.asarray(z["key"]))
    return params, opt_state, iteration, key


def run_optimization(
    init,
    step,
    target,
    key,
    *,
    iters: int,
    optimizer: optax.GradientTransformation,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 25,
    log: Optional[Callable[[int, float], None]] = None,
):
    """Drive ``step`` for ``iters`` iterations with resumable checkpoints.

    Per-iteration keys are ``fold_in(key, i)``, so a run killed at
    iteration k and resumed from its checkpoint consumes the exact same
    random stream - the loss trajectory is bit-reproducible
    (tests/test_optimize_checkpoint.py).  Returns
    ``(params, opt_state, last_loss)``."""
    params, opt_state = init()
    start = 0
    if checkpoint_path and os.path.exists(checkpoint_path):
        params, opt_state, start, key = load_optimizer_checkpoint(
            checkpoint_path, params, optimizer
        )
    loss = None
    for i in range(start, iters):
        # transient-failure retry (same policy as the progressive
        # renderer): the iteration key is pure in (key, i), so a retry
        # reproduces the identical update - no trajectory skew
        for attempt in range(3):
            try:
                params_i, opt_state_i, loss = step(
                    params, opt_state, target, jax.random.fold_in(key, i)
                )
                break
            except (RuntimeError, jax.errors.JaxRuntimeError):
                if attempt == 2:
                    raise
                print(f"optimization step {i} failed, retrying", flush=True)
        params, opt_state = params_i, opt_state_i
        if log is not None:
            log(i, float(loss))
        if checkpoint_path and (
            (i + 1) % checkpoint_every == 0 or i == iters - 1
        ):
            save_optimizer_checkpoint(checkpoint_path, params, opt_state, i + 1, key)
    return params, opt_state, loss
