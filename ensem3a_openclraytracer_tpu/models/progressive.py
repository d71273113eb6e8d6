"""Progressive, resumable rendering with on-disk checkpoints.

The reference's renders are atomic - the whole spp loop lives inside one
kernel launch (Raytracing.cl:191) with no accumulation across
invocations and no resume (SURVEY.md section 5, checkpoint/resume).
Here rendering is a fold over sample chunks: checkpoint state is
``(accumulated radiance, spp_done, base RNG key)``, saved as an ``.npz``
after any chunk, so long renders survive preemption and the image can be
previewed at any point - the standard requirement for production batch
rendering.

The chunked estimator is statistically identical to the one-shot
estimator: chunk ``i`` uses ``fold_in(base_key, i)`` so resuming never
replays a sample set.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ensem3a_openclraytracer_tpu.models.pathtracer import render_radiance


@dataclass
class ProgressiveState:
    """Running spp accumulator; ``image`` is the current radiance mean."""

    accum: np.ndarray  # [H, W, 3] float64 sum of per-chunk mean radiance * chunk spp
    spp_done: int
    base_seed: int

    @property
    def image(self) -> np.ndarray:
        if self.spp_done == 0:
            return np.zeros_like(self.accum, dtype=np.float32)
        return (self.accum / self.spp_done).astype(np.float32)

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        np.savez_compressed(
            tmp if tmp.endswith(".npz") else tmp,
            accum=self.accum,
            spp_done=np.int64(self.spp_done),
            base_seed=np.int64(self.base_seed),
        )
        # numpy appends .npz to names without it
        written = tmp if tmp.endswith(".npz") else tmp + ".npz"
        os.replace(written, path)

    @staticmethod
    def load(path: str) -> "ProgressiveState":
        with np.load(path) as z:
            return ProgressiveState(
                accum=z["accum"],
                spp_done=int(z["spp_done"]),
                base_seed=int(z["base_seed"]),
            )


class ProgressiveRenderer:
    """Accumulates spp in chunks; checkpointable between chunks.

    One jit-compiled chunk function is reused for every chunk (static
    shapes), so resume pays no recompilation beyond the first chunk.
    """

    def __init__(
        self,
        geom,
        materials,
        env,
        camera,
        *,
        height: int,
        width: int,
        max_bounce: int,
        chunk_spp: int = 16,
        sun_enabled: bool = True,
        base_seed: int = 0,
        state: Optional[ProgressiveState] = None,
        lights=None,
        nee: bool = False,
        glass_mode: str = "tint",
        mis: bool = False,
    ):
        self.geom = geom
        self.materials = materials
        self.env = env
        self.camera = camera
        self.height = height
        self.width = width
        self.chunk_spp = chunk_spp
        self.state = state or ProgressiveState(
            accum=np.zeros((height, width, 3), np.float64),
            spp_done=0,
            base_seed=base_seed,
        )
        import functools

        self._chunk_fn = jax.jit(
            functools.partial(
                render_radiance,
                height=height,
                width=width,
                spp=chunk_spp,
                max_bounce=max_bounce,
                sun_enabled=sun_enabled,
                lights=lights,
                nee=nee,
                glass_mode=glass_mode,
                mis=mis,
            ),
            static_argnames=(),
        )

    # transient-failure policy: a chunk that raises a runtime error is
    # retried this many times before the error propagates.  The chunk
    # key is a pure function of (base_seed, chunk index), so a retry
    # reproduces the identical samples - no statistical skew.  This is
    # the failure-detection/elastic-recovery hook the reference lacks
    # entirely (SURVEY.md section 5): over a tunneled TPU backend a
    # long render dies to one dropped RPC without it, and together with
    # the .npz checkpoints a killed process resumes mid-render.
    max_chunk_retries = 2

    def _chunk_with_retry(self, key):
        last_err = None
        for attempt in range(self.max_chunk_retries + 1):
            try:
                return self._chunk_fn(
                    self.geom, self.materials, self.env, self.camera, key
                )
            except (RuntimeError, jax.errors.JaxRuntimeError) as e:  # noqa: PERF203
                last_err = e
                if attempt < self.max_chunk_retries:
                    print(
                        f"chunk failed ({type(e).__name__}), retrying "
                        f"({attempt + 1}/{self.max_chunk_retries})",
                        flush=True,
                    )
        raise last_err

    def step(self) -> np.ndarray:
        """Render one chunk, fold it into the accumulator, return the
        current image estimate."""
        chunk_idx = self.state.spp_done // self.chunk_spp
        key = jax.random.fold_in(
            jax.random.PRNGKey(self.state.base_seed), chunk_idx
        )
        chunk = self._chunk_fn(self.geom, self.materials, self.env, self.camera, key)
        self.state.accum = self.state.accum + np.asarray(chunk, np.float64) * self.chunk_spp
        self.state.spp_done += self.chunk_spp
        return self.state.image

    def render(self, total_spp: int, checkpoint_path: Optional[str] = None,
               checkpoint_every: int = 1, progress=None) -> np.ndarray:
        """Accumulate until ``total_spp`` (counting previously-resumed
        samples), checkpointing every ``checkpoint_every`` chunks.

        Chunks accumulate ON DEVICE and are fetched to the host only at
        checkpoint boundaries and the end: a per-chunk ``np.asarray``
        costs a full device sync (25-40 ms over a tunneled backend) and
        starves the async dispatch pipeline - measured 3x on the Monkey
        workload at the default chunk size."""
        chunks = 0
        dev_acc = None

        def fold():
            nonlocal dev_acc
            if dev_acc is not None:
                self.state.accum = self.state.accum + np.asarray(
                    dev_acc, np.float64
                )
                dev_acc = None

        while self.state.spp_done < total_spp:
            chunk_idx = self.state.spp_done // self.chunk_spp
            key = jax.random.fold_in(
                jax.random.PRNGKey(self.state.base_seed), chunk_idx
            )
            chunk = self._chunk_with_retry(key)
            scaled = chunk * float(self.chunk_spp)
            dev_acc = scaled if dev_acc is None else dev_acc + scaled
            self.state.spp_done += self.chunk_spp
            chunks += 1
            if checkpoint_path and chunks % checkpoint_every == 0:
                fold()
                self.state.save(checkpoint_path)
            if progress is not None:
                progress(self.state.spp_done, total_spp)
        fold()
        if checkpoint_path:
            self.state.save(checkpoint_path)
        return self.state.image

    @staticmethod
    def resume(checkpoint_path: str, geom, materials, env, camera, **kw):
        state = ProgressiveState.load(checkpoint_path)
        return ProgressiveRenderer(
            geom, materials, env, camera, state=state,
            base_seed=state.base_seed, **kw,
        )
