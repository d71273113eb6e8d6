"""Monkey (15.7k tris, 62 blocks) through the pair-compaction engine vs
the resident fused kernel: is per-RAY block culling the way past the
5.8 Mrays/s multi-block ceiling?  Forces the compact path by dropping
_RESIDENT_MAX_BLOCKS."""
import os, shutil, sys, tempfile, time
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

import ensem3a_openclraytracer_tpu.models.pathtracer as pt
from ensem3a_openclraytracer_tpu.models.pathtracer import render_radiance
from ensem3a_openclraytracer_tpu.scene.scene import Scene

force_compact = "--compact" in sys.argv
if force_compact:
    pt._RESIDENT_MAX_BLOCKS = 0

REF = "/root/reference/ObjFiles"
tmp = tempfile.mkdtemp()
for name in os.listdir(REF):
    shutil.copy(os.path.join(REF, name), tmp)
scene = Scene.load(os.path.join(tmp, "Cornell box_Monkey.obj"))
rs = scene.config.render_settings()
res, spp, mb = rs.resolution, rs.spp, rs.max_bounce
env = scene.env_params()
materials = scene.material_params()
sun = bool(float(env.sun_power) != 0.0)
print(f"res={res} spp={spp} mb={mb} sun={sun} blocks="
      f"{scene.geometry.feats.block_bounds.shape[0]} compact={force_compact}")
import functools
fn = jax.jit(functools.partial(
    render_radiance, height=res, width=res, spp=spp, max_bounce=mb,
    sun_enabled=sun))
key = jax.random.PRNGKey(0)
t0 = time.perf_counter()
img = fn(scene.geometry, materials, env, scene.camera_params(), key)
print(f"compile+first: {time.perf_counter()-t0:.1f}s mean={float(img.mean()):.4f}")
ts = []
for i in range(3):
    t0 = time.perf_counter()
    img = fn(scene.geometry, materials, env, scene.camera_params(),
             jax.random.fold_in(key, i))
    float(img.mean())
    ts.append(time.perf_counter() - t0)
dt = sorted(ts)[1]
rays = res * res * (1 + spp * (mb + 1) * (2 if sun else 1))
print(f"monkey: {dt:.3f}s  {rays/dt/1e6:.2f} Mrays/s")
