import time, functools, jax, jax.numpy as jnp
from ensem3a_openclraytracer_tpu.models.pathtracer import render_radiance, trace, _gather_surface
from ensem3a_openclraytracer_tpu.testing import make_cornell_scene
from ensem3a_openclraytracer_tpu.ops.camera import camera_rays
from ensem3a_openclraytracer_tpu.ops.bsdf import sample_bounce
from ensem3a_openclraytracer_tpu.ops.envmap import sample_ibl

geom, materials, env, camera = make_cornell_scene(use_bvh=False)
key = jax.random.PRNGKey(0)
RES, SPP, MB = 512, 100, 4
N = RES*RES
REPS = 1 + SPP*(MB+1)

def timeit(f, *a, n=3):
    r = f(*a); jax.block_until_ready(r); float(jnp.sum(jax.tree.leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a); float(jnp.sum(jax.tree.leaves(r)[0]))
    return (time.perf_counter()-t0)/n

full = jax.jit(functools.partial(render_radiance, height=RES, width=RES, spp=SPP, max_bounce=MB, sun_enabled=False))
t_full = timeit(full, geom, materials, env, camera, key)
print(f"full render: {t_full:.3f} s  -> {N*REPS/t_full/1e6:.0f} Mrays/s headline")

ray_o, ray_d = camera_rays(camera.position, camera.rotation_deg, camera.fov_deg, RES, RES)
def traces(o, d):
    def body(c, _):
        h = trace(geom, o, d)
        return c + h.t, None
    acc, _ = jax.lax.scan(body, jnp.zeros(o.shape[0]), None, length=REPS)
    return acc
t_tr = timeit(jax.jit(traces), ray_o, ray_d)
print(f"trace x{REPS}: {t_tr:.3f} s ({100*t_tr/t_full:.0f}%)")

# gather_surface x 501
def gathers(o, d):
    h0 = trace(geom, o, d)
    def body(c, _):
        s = _gather_surface(geom, materials, o, d, h0)
        return c + s.p[:,0] + s.color[:,0] + s.rough, None
    acc, _ = jax.lax.scan(body, jnp.zeros(o.shape[0]), None, length=REPS)
    return acc
t_g = timeit(jax.jit(gathers), ray_o, ray_d)
print(f"gather_surface x{REPS}: {t_g:.3f} s ({100*t_g/t_full:.0f}%)")

# sample_bounce x 500
def bounces(o, d, k):
    h0 = trace(geom, o, d)
    s = _gather_surface(geom, materials, o, d, h0)
    def body(c, k2):
        u = jax.random.uniform(k2, (o.shape[0], 2))
        bdir, fac = sample_bounce(s.mtype, s.color, s.rough, d, s.n, u[:,0], u[:,1])
        return c + bdir[:,0] + fac[:,0], None
    acc, _ = jax.lax.scan(body, jnp.zeros(o.shape[0]), jax.random.split(k, SPP*(MB+1)))
    return acc
t_b = timeit(jax.jit(bounces), ray_o, ray_d, key)
print(f"sample_bounce+rng x{SPP*(MB+1)}: {t_b:.3f} s ({100*t_b/t_full:.0f}%)")

# ibl x 500
def ibls(d):
    def body(c, _):
        e = sample_ibl(env.ibl, d, bilinear=True)
        return c + e[:,0], None
    acc, _ = jax.lax.scan(body, jnp.zeros(d.shape[0]), None, length=SPP*(MB+1))
    return acc
t_i = timeit(jax.jit(ibls), ray_d)
print(f"sample_ibl x{SPP*(MB+1)}: {t_i:.3f} s ({100*t_i/t_full:.0f}%)")
