"""Quick ref_monkey + big150k forward timing (the bench's workloads)."""
import os
import shutil
import sys
import tempfile
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from ensem3a_openclraytracer_tpu.models.pathtracer import render_radiance_jit
from ensem3a_openclraytracer_tpu.scene.scene import Scene

which = sys.argv[1] if len(sys.argv) > 1 else "monkey"

if which == "monkey":
    with tempfile.TemporaryDirectory() as tmp:
        for name in os.listdir("/root/reference/ObjFiles"):
            shutil.copy(os.path.join("/root/reference/ObjFiles", name), tmp)
        scene = Scene.load(os.path.join(tmp, "Cornell box_Monkey.obj"))
        rs = scene.config.render_settings()
        res, spp, mb = rs.resolution, rs.spp, rs.max_bounce
        env = scene.env_params()
        materials = scene.material_params()
        sun = bool(float(env.sun_power) != 0.0)
        geom, cam = scene.geometry, scene.camera_params()
        print(f"monkey {res}^2/{spp}spp/{mb}b sun={sun}")
        key = jax.random.PRNGKey(0)

        chunk = spp
        while chunk * res * res > 40 * 512 * 512 and chunk % 2 == 0:
            chunk //= 2

        def run(k):
            acc = None
            for c in range(spp // chunk):
                img = render_radiance_jit(
                    geom, materials, env, cam, jax.random.fold_in(k, c),
                    height=res, width=res, spp=chunk, max_bounce=mb,
                    sun_enabled=sun,
                )
                acc = img if acc is None else acc + img
            return acc / (spp // chunk)

        float(jnp.sum(run(key)))
        t0 = time.perf_counter()
        float(jnp.sum(run(jax.random.fold_in(key, 7))))
        dt = time.perf_counter() - t0
        rays = res * res * (1 + spp * (mb + 1) * (2 if sun else 1))
        print(f"monkey: {dt:.2f} s  {rays/dt/1e6:.2f} Mrays/s")
else:
    from ensem3a_openclraytracer_tpu.testing import make_outdoor_scene
    import functools
    from ensem3a_openclraytracer_tpu.models.pathtracer import render_radiance

    geom, materials, env, camera = make_outdoor_scene(
        n_cubes=12500, use_bvh=False
    )
    res, spp, mb = 256, 16, 4
    fn = jax.jit(functools.partial(
        render_radiance, height=res, width=res, spp=spp, max_bounce=mb,
        sun_enabled=True,
    ))
    key = jax.random.PRNGKey(0)
    float(jnp.sum(fn(geom, materials, env, camera, key)))
    t0 = time.perf_counter()
    float(jnp.sum(fn(geom, materials, env, camera, jax.random.fold_in(key, 1))))
    dt = time.perf_counter() - t0
    rays = res * res * (1 + spp * (mb + 1) * 2)
    print(f"big150k: {dt:.2f} s  {rays/dt/1e6:.2f} Mrays/s")
