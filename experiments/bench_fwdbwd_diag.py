"""Diagnose the r03 fwd+bwd drop: time value_and_grad through the replay
engine at the bench workload under different spp_chunk settings, plus the
recorder alone."""
import functools, time, sys
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
from ensem3a_openclraytracer_tpu.models.optimize import TrainableParams, image_loss
from ensem3a_openclraytracer_tpu.models.replay import (
    record_paths, render_radiance_replay,
)
from ensem3a_openclraytracer_tpu.ops.camera import camera_rays
from ensem3a_openclraytracer_tpu.testing import make_cornell_scene

RES, SPP, MB = 512, 100, 4
geom, materials, env, camera = make_cornell_scene(use_bvh=False)
key = jax.random.PRNGKey(1)
target = jnp.zeros((RES, RES, 3), jnp.float32)
rays = RES * RES * (1 + SPP * (MB + 1))

def timeit(fn, *a, runs=3):
    out = fn(*a); float(jnp.sum(jax.tree.leaves(out)[0]))
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn(*a); float(jnp.sum(jax.tree.leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts)//2]

# recorder alone (fused), full spp
ray_o, ray_d = camera_rays(camera.position, camera.rotation_deg, camera.fov_deg, RES, RES)
rec_fn = jax.jit(functools.partial(
    record_paths, spp=SPP, max_bounce=MB, sun_enabled=False))
dt = timeit(lambda k: rec_fn(geom, materials, env, ray_o, ray_d, k), key)
print(f"record(fused,100spp): {dt:.3f}s  {rays/dt/1e6:.1f} Mrays/s")

for chunk in (None, SPP, 20):
    def loss_fn(p, k):
        m, e = p.apply(materials, env)
        img = render_radiance_replay(
            geom, m, e, camera, k, height=RES, width=RES, spp=SPP,
            max_bounce=MB, sun_enabled=False, spp_chunk=chunk)
        return image_loss(img, target)
    params = TrainableParams.from_scene_params(materials, env)
    vg = jax.jit(jax.value_and_grad(loss_fn))
    dt = timeit(lambda k: vg(params, k), key)
    print(f"vg(spp_chunk={chunk}): {dt:.3f}s  {rays/dt/1e6:.1f} Mrays/s")
