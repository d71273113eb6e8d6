"""Headline benchmark: forward path-tracing throughput in Mrays/s.

Workload mirrors the reference's canonical Cornell-box run (512^2, 100
spp, 4 bounces - /root/reference/ObjFiles/Cornell box.ini) on the
procedural Cornell scene with BVH traversal.  Ray accounting follows
BASELINE.md: rays = res^2 * spp * (bounce rays) + res^2 primaries (+ sun
shadow rays when the sun is enabled; disabled here, interior scene).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is this repo's own first recorded TPU run (BENCH_r1); until one
exists we report 1.0.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Keep the door open for CPU smoke runs: `python bench.py --cpu`
if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if "--cpu" in sys.argv:
    # the TPU plugin force-sets jax_platforms at registration; override back
    jax.config.update("jax_platforms", "cpu")

RES = 512 if "--cpu" not in sys.argv else 64
SPP = 100 if "--cpu" not in sys.argv else 4
MAX_BOUNCE = 4
# First recorded single-chip number (BENCH_r1 when available).
BASELINE_MRAYS = None


def main():
    from ensem3a_openclraytracer_tpu.models.pathtracer import render_radiance
    from ensem3a_openclraytracer_tpu.testing import make_cornell_scene

    geom, materials, env, camera = make_cornell_scene(use_bvh=False)  # MXU engine
    key = jax.random.PRNGKey(0)

    import functools

    fn = jax.jit(
        functools.partial(
            render_radiance,
            height=RES,
            width=RES,
            spp=SPP,
            max_bounce=MAX_BOUNCE,
            sun_enabled=False,
        )
    )

    import jax.numpy as jnp

    # compile + warmup; the scalar fetch forces real completion (plain
    # block_until_ready can return early over tunneled backends)
    img = fn(geom, materials, env, camera, key)
    float(jnp.sum(img))

    runs = 3
    # derive per-run keys OUTSIDE the timed region: the first eager
    # fold_in dispatch compiles its own executable (~1s of host-side
    # compile, not render throughput)
    keys = [jax.random.fold_in(key, i) for i in range(runs)]
    jax.block_until_ready(keys)
    t0 = time.perf_counter()
    for k in keys:
        img = fn(geom, materials, env, camera, k)
        float(jnp.sum(img))  # per-run completion barrier
    dt = (time.perf_counter() - t0) / runs

    # primary rays are cached once per pixel; each sample shoots up to
    # max_bounce+1 bounce-segment rays (count them all: live-masking means
    # the hardware does the full batch regardless)
    rays = RES * RES * (1 + SPP * (MAX_BOUNCE + 1))
    mrays = rays / dt / 1e6
    vs = mrays / BASELINE_MRAYS if BASELINE_MRAYS else 1.0
    print(
        json.dumps(
            {
                "metric": "cornell_forward_mrays_per_s",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
