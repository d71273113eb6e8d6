"""Round-5 engine timing: closest-hit engines head-to-head on coherent
(camera-ish) and incoherent (bounce) rays, Monkey + 150k outdoor.

Usage:  python experiments/bench_engines_r5.py [monkey|big|both]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from ensem3a_openclraytracer_tpu.ops.intersect_mxu import (
    build_tri_features, trace_mxu, trace_mxu_pallas,
)
from ensem3a_openclraytracer_tpu.ops.pairs import trace_pairs
from ensem3a_openclraytracer_tpu.ops.pairs import trace_pairs_streamed
from ensem3a_openclraytracer_tpu.ops import fused as fused_ops
from ensem3a_openclraytracer_tpu.scene.objloader import load_obj
from ensem3a_openclraytracer_tpu.scene.scene import morton_order


def bounce_rays(v0, v1, v2, n, seed=0):
    rng = np.random.default_rng(seed)
    ti = rng.integers(0, len(v0), n)
    r1, r2 = rng.random(n), rng.random(n)
    s = np.sqrt(r1)
    p = (v0[ti] * (1 - s)[:, None] + v1[ti] * (s * (1 - r2))[:, None]
         + v2[ti] * (s * r2)[:, None]).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(p + 1e-3 * d), jnp.asarray(d)


def load_feats(obj):
    mesh = load_obj(obj)
    fd = mesh.face_data
    v0, v1, v2 = mesh.v_p[fd[:, 7]], mesh.v_p[fd[:, 8]], mesh.v_p[fd[:, 9]]
    order = morton_order(v0, v1, v2)
    return (v0[order], v1[order], v2[order])


def timeit(fn, *args, runs=5):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


@jax.jit
def sorted_pairs(feats, o, d):
    order = fused_ops.coherent_order(o, d)
    h = trace_pairs(feats, o[order], d[order])
    return h


@jax.jit
def sorted_resident(feats, o, d):
    order = fused_ops.coherent_order(o, d)
    return trace_mxu_pallas(feats, o[order], d[order])


@jax.jit
def sorted_compact(feats, o, d):
    order = fused_ops.coherent_order(o, d)
    return trace_pairs_streamed(feats, o[order], d[order])


def run_scene(name, verts, n=65536, engines=("pairs", "resident")):
    v0, v1, v2 = verts
    feats = build_tri_features(v0, v1, v2)
    nb = feats.block_bounds.shape[0]
    print(f"== {name}: tris={len(v0)} blocks={nb}")
    o, d = bounce_rays(v0, v1, v2, n)
    for eng in engines:
        fn = {"pairs": sorted_pairs, "resident": sorted_resident,
              "streamed": sorted_compact}[eng]
        if eng == "pairs" and (feats.comb is None
                               or feats.comb.dtype != jnp.bfloat16):
            print(f"  {eng}: skipped (comb not bf16)")
            continue
        dt = timeit(fn, feats, o, d)
        print(f"  {eng}: {dt*1e3:.2f} ms  {n/dt/1e6:.1f} Mrays/s", flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "both"
if which in ("monkey", "both"):
    run_scene(
        "monkey",
        load_feats("/root/reference/ObjFiles/Cornell box_Monkey.obj"),
        engines=("pairs", "resident", "streamed"),
    )
if which == "sort":
    # cost of the coherent sort + unsort alone
    verts = load_feats("/root/reference/ObjFiles/Cornell box_Monkey.obj")
    v0, v1, v2 = verts
    feats = build_tri_features(v0, v1, v2)
    o, d = bounce_rays(v0, v1, v2, 65536)

    @jax.jit
    def just_sort(o, d):
        order = fused_ops.coherent_order(o, d)
        return o[order], d[order]

    dt = timeit(just_sort, o, d)
    print(f"coherent sort: {dt*1e3:.2f} ms")
    o_s, d_s = just_sort(o, d)
    dt = timeit(trace_pairs, feats, o_s, d_s)
    print(f"pairs (presorted): {dt*1e3:.2f} ms {65536/dt/1e6:.1f} Mrays/s")
if which in ("big", "both"):
    from ensem3a_openclraytracer_tpu.testing import make_outdoor_scene

    geom, m, e, c = make_outdoor_scene(n_cubes=12500, use_bvh=False)
    v0 = np.asarray(geom.v0)
    v1 = np.asarray(geom.v1)
    v2 = np.asarray(geom.v2)
    run_scene("big150k", (v0, v1, v2), engines=("streamed",))

if which == "iter":
    # amortize the tunnel RTT: 10 chained engine calls inside one jit
    verts = load_feats("/root/reference/ObjFiles/Cornell box_Monkey.obj")
    v0, v1, v2 = verts
    feats = build_tri_features(v0, v1, v2)
    o, d = bounce_rays(v0, v1, v2, 65536)

    @jax.jit
    def nop(o):
        return o + 1.0

    dt = timeit(nop, o)
    print(f"rtt floor: {dt*1e3:.2f} ms")

    def make_iter(engine):
        @jax.jit
        def f(o, d):
            acc = 0.0
            for i in range(10):
                oo = o + 1e-4 * i  # defeat CSE
                order = fused_ops.coherent_order(oo, d)
                h = engine(feats, oo[order], d[order])
                acc = acc + jnp.sum(h.t)
            return acc
        return f

    for name, eng in (("pairs", trace_pairs),
                      ("resident", trace_mxu_pallas)):
        dt = timeit(make_iter(eng), o, d)
        per = dt / 10
        print(f"{name} x10: {dt*1e3:.1f} ms -> {per*1e3:.2f} ms/call "
              f"{65536/per/1e6:.1f} Mrays/s", flush=True)

    @jax.jit
    def sort10(o, d):
        acc = 0.0
        for i in range(10):
            oo = o + 1e-4 * i
            order = fused_ops.coherent_order(oo, d)
            acc = acc + jnp.sum(order)
        return acc

    dt = timeit(sort10, o, d)
    print(f"sort x10: {dt*1e3:.1f} ms -> {dt/10*1e3:.2f} ms/call")

if which == "iter2":
    # difference 30-iter and 10-iter totals to cancel the tunnel RTT
    verts = load_feats("/root/reference/ObjFiles/Cornell box_Monkey.obj")
    v0, v1, v2 = verts
    feats = build_tri_features(v0, v1, v2)
    o, d = bounce_rays(v0, v1, v2, 65536)

    def make_iter(engine, k, with_sort=True):
        @jax.jit
        def f(o, d):
            acc = 0.0
            for i in range(k):
                oo = o + 1e-4 * i
                if with_sort:
                    order = fused_ops.coherent_order(oo, d)
                    h = engine(feats, oo[order], d[order])
                else:
                    h = engine(feats, oo, d)
                acc = acc + jnp.sum(h.t)
            return acc
        return f

    for name, eng, ws in (("pairs+sort", trace_pairs, True),
                          ("pairs nosort", trace_pairs, False),
                          ("resident+sort", trace_mxu_pallas, True)):
        t10 = timeit(make_iter(eng, 10, ws), o, d, runs=3)
        t30 = timeit(make_iter(eng, 30, ws), o, d, runs=3)
        per = (t30 - t10) / 20
        print(f"{name}: {per*1e3:.2f} ms/call {65536/per/1e6:.1f} Mrays/s",
              flush=True)
