import os, time, shutil, tempfile, functools
import numpy as np
import jax, jax.numpy as jnp

d = tempfile.mkdtemp()
for f in os.listdir('/root/reference/ObjFiles'):
    shutil.copy(os.path.join('/root/reference/ObjFiles', f), d)

from ensem3a_openclraytracer_tpu.scene.scene import Scene
from ensem3a_openclraytracer_tpu.models.pathtracer import render_radiance

t0 = time.time()
sc = Scene.load(os.path.join(d, 'Cornell box_Monkey.obj'))
print('scene load:', time.time()-t0, 's', flush=True)

RES, SPP, MB = 256, 100, 4
fn = jax.jit(functools.partial(render_radiance, height=RES, width=RES, spp=SPP, max_bounce=MB, sun_enabled=False))
geom, mats, env, cam = sc.geometry, sc.material_params(), sc.env_params(), sc.camera_params()

t2 = time.time()
s = float(fn(geom, mats, env, cam, jax.random.PRNGKey(0)).sum())
print('first call (compile+run):', time.time()-t2, 's  sum=', s, flush=True)
for i in range(1, 4):
    t4 = time.time()
    s = float(fn(geom, mats, env, cam, jax.random.PRNGKey(i)).sum())
    dt = time.time()-t4
    print(f'steady run: {dt:.3f} s  sum={s:.2f}  Mrays/s={RES*RES*SPP*MB/dt/1e6:.1f}', flush=True)
