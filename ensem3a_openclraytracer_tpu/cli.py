"""Command-line product surface - replaces the reference's Tkinter UI.

Every capability of the reference UI (UI.py:92-160; SURVEY.md section
2.5 item 11) has a subcommand equivalent:

  render    path-trace a scene to PNG (progressive, resumable)
  optimize  inverse rendering: fit material/env parameters to a target
  bench     throughput benchmark, one-line JSON
  info      scene statistics (triangles, materials, lights, config)
  set/get   edit per-scene ini parameters (material/camera/env round trip)

Usage:  python -m ensem3a_openclraytracer_tpu render ObjFiles/scene.obj
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _load_scene(path: str, use_bvh=None):
    from ensem3a_openclraytracer_tpu.scene.scene import Scene

    return Scene.load(path, use_bvh=use_bvh)


def _parse_mesh(spec):
    """``--mesh dp,sp`` -> a (dp, sp) device mesh; ``--mesh auto`` uses
    all local devices as pure data parallelism.  Returns None when the
    flag was not given."""
    if not spec:
        return None
    import jax

    from ensem3a_openclraytracer_tpu.parallel.mesh import make_mesh

    if spec == "auto":
        return make_mesh(sp=1)
    dp, sp = (int(x) for x in spec.split(","))
    n = len(jax.devices())
    if dp * sp > n:
        raise SystemExit(f"--mesh {spec} needs {dp * sp} devices, have {n}")
    return make_mesh(jax.devices()[: dp * sp], sp=sp)


GLOBAL_CONFIG = "config.ini"


def _global_scene_path():
    """Read ``scenePath`` from the cwd ``config.ini`` - the reference's
    last-scene memory (/root/reference/config.ini:1, UI.py:57-61)."""
    try:
        with open(GLOBAL_CONFIG) as f:
            for line in f:
                k, _, v = line.partition("=")
                if k.strip() == "scenePath":
                    return v.strip()
    except OSError:
        return None
    return None


def _remember_scene_path(path: str) -> None:
    try:
        with open(GLOBAL_CONFIG, "w") as f:
            f.write(f"scenePath={os.path.abspath(path)}\n")
    except OSError:
        pass  # read-only cwd: last-scene memory is best-effort


def cmd_render(args) -> int:
    import jax
    import numpy as np

    from ensem3a_openclraytracer_tpu.models.progressive import (
        ProgressiveRenderer,
        ProgressiveState,
    )
    from ensem3a_openclraytracer_tpu.utils.image import save_png
    from ensem3a_openclraytracer_tpu.utils.profiling import (
        RenderMetrics,
        StageTimer,
        xla_trace,
    )

    if not args.scene:
        args.scene = _global_scene_path()
        if not args.scene:
            raise SystemExit(
                "no scene given and no scenePath in ./config.ini"
            )
    timer = StageTimer()
    with timer.stage("scene_load"):
        sc = _load_scene(args.scene)
    _remember_scene_path(args.scene)

    def one_render(sc):
        """One full render of ``sc`` at its current config - re-entered
        by --watch with the geometry reused (UI.py:92-104 round trip)."""
        rs = sc.config.render_settings()
        res = args.resolution or rs.resolution
        spp = args.spp or rs.spp
        max_bounce = args.max_bounce or rs.max_bounce
        env = sc.env_params()
        sun_enabled = float(env.sun_power) != 0.0
        lights = None
        mis = bool(getattr(args, "mis", False))
        nee = bool(getattr(args, "nee", False)) or mis
        glass_mode = getattr(args, "glass", "tint")
        if nee:
            lights = sc.light_pack()
            if lights is None:
                print("warning: --nee/--mis requested but scene has no "
                      "emissive faces; disabled")
                nee = mis = False

        mesh = _parse_mesh(args.mesh)
        t0 = time.time()
        if mesh is not None:
            # one-shot sharded render over the (dp, sp) mesh (progressive
            # checkpointing is the single-device path's job); NEE and glass
            # mode plumb through like the single-device estimator
            from ensem3a_openclraytracer_tpu.parallel.render import render_radiance_sharded

            spp_done = spp
            with xla_trace(args.profile), timer.stage("render"):
                rad = render_radiance_sharded(
                    mesh, sc.geometry, sc.material_params(), env, sc.camera_params(),
                    jax.random.PRNGKey(args.seed),
                    height=res, width=res, spp=spp, max_bounce=max_bounce,
                    sun_enabled=sun_enabled,
                    lights=lights, nee=nee, glass_mode=glass_mode, mis=mis,
                )
                img = jax.block_until_ready(jnp_clip_img(rad))
        else:
            chunk = min(args.chunk_spp, spp)
            kw = dict(
                height=res,
                width=res,
                max_bounce=max_bounce,
                chunk_spp=chunk,
                sun_enabled=sun_enabled,
                lights=lights,
                nee=nee,
                glass_mode=glass_mode,
                mis=mis,
            )
            ckpt = args.checkpoint
            with timer.stage("setup"):
                if ckpt and os.path.exists(ckpt) and not args.restart:
                    r = ProgressiveRenderer.resume(
                        ckpt, sc.geometry, sc.material_params(), env, sc.camera_params(), **kw
                    )
                    print(f"resumed at {r.state.spp_done} spp from {ckpt}")
                else:
                    r = ProgressiveRenderer(
                        sc.geometry, sc.material_params(), env, sc.camera_params(),
                        base_seed=args.seed, **kw,
                    )
            with xla_trace(args.profile), timer.stage("render"):
                img = r.render(
                    spp,
                    checkpoint_path=ckpt,
                    progress=lambda done, total: print(f"  {done}/{total} spp", flush=True)
                    if args.verbose
                    else None,
                )
            spp_done = r.state.spp_done
        wall = time.time() - t0
        out = args.out or os.path.join("output", "out.png")
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        from ensem3a_openclraytracer_tpu.ops.tonemap import postprocess

        with timer.stage("write"):
            save_png(np.asarray(postprocess(img, mode=args.tonemap)), out)
            # raw (pre-tonemap) copy next to it, reference parity
            # (main.py:101-104 writes output/out.png AND output/src.png)
            src = os.path.join(os.path.dirname(out) or ".", "src.png")
            save_png(np.clip(np.asarray(img), 0.0, 1.0), src)
        m = RenderMetrics(wall, res, spp_done, max_bounce, sun_enabled)
        print(f"rendered {res}x{res} @ {spp_done} spp in {wall:.2f}s "
              f"({m.mrays_per_s:.1f} Mrays/s) -> {out}")
        if args.profile:
            print(f"XLA trace -> {args.profile}")
        if args.verbose:
            print("stages:", timer.report())

    one_render(sc)
    if getattr(args, "watch", None) is not None:
        # interactive loop (the reference UI's edit -> render -> refresh
        # cycle, UI.py:92-104): poll the scene ini, re-render on change
        # WITHOUT re-importing geometry or rebuilding acceleration
        # structures (the buildBVH=False path, UI.py:98).  --watch N
        # exits after N re-renders (0 = forever), so tests can drive it.
        from ensem3a_openclraytracer_tpu.scene.scene import Scene

        ini = sc.config.config_path

        def _ini_state():
            # content hash, not mtime: filesystems with 1 s mtime
            # granularity would miss rapid edits
            try:
                with open(ini, "rb") as f:
                    return f.read()
            except OSError:
                return b""

        last = _ini_state()
        todo = args.watch
        done = 0
        print(f"watching {ini} (ctrl-C to stop)", flush=True)
        try:
            while todo == 0 or done < todo:
                time.sleep(args.watch_poll)
                cur = _ini_state()
                if cur == last:
                    continue
                last = cur
                with timer.stage("scene_reload"):
                    sc = Scene.load(
                        args.scene, rebuild_accel=False, geometry=sc.geometry
                    )
                one_render(sc)
                done += 1
        except KeyboardInterrupt:
            pass
    return 0


def jnp_clip_img(rad):
    import jax.numpy as jnp

    return jnp.clip(rad, 0.0, 1.0)


def cmd_optimize(args) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ensem3a_openclraytracer_tpu.models.optimize import (
        make_train_step,
        run_optimization,
    )
    from ensem3a_openclraytracer_tpu.utils.image import load_png, save_png

    sc = _load_scene(args.scene)
    rs = sc.config.render_settings()
    res = args.resolution or min(rs.resolution, 128)
    env = sc.env_params()
    target = jnp.asarray(load_png(args.target))
    if target.shape[0] != res or target.shape[1] != res:
        raise SystemExit(
            f"target is {target.shape[0]}x{target.shape[1]}, render is {res}x{res}; "
            "pass --resolution to match"
        )
    mesh = _parse_mesh(args.mesh)
    # estimator flags mirror `render`: --mis implies --nee; both need
    # emissive faces (the reference's optimize-analog is manual UI
    # tweaking, so any estimator upgrade here is pure win)
    mis = bool(getattr(args, "mis", False))
    nee = bool(getattr(args, "nee", False)) or mis
    lights = None
    if nee:
        lights = sc.light_pack()
        if lights is None:
            print("warning: --nee/--mis requested but scene has no emissive "
                  "faces; disabled")
            nee = mis = False
    optimizer = optax.adam(args.lr)
    init, step = make_train_step(
        sc.geometry, sc.material_params(), env, sc.camera_params(),
        optimizer,
        height=res, width=res, spp=args.spp, max_bounce=args.max_bounce,
        sun_enabled=float(env.sun_power) != 0.0,
        mesh=mesh, nee=nee, lights=lights, mis=mis,
    )
    every = max(1, args.iters // 20)
    params, opt_state, loss = run_optimization(
        init, step, target, jax.random.PRNGKey(args.seed),
        iters=args.iters, optimizer=optimizer,
        checkpoint_path=args.checkpoint,
        checkpoint_every=args.checkpoint_every,
        log=lambda i, l: print(f"iter {i:4d}  loss {l:.6f}", flush=True)
        if (i % every == 0 or i == args.iters - 1)
        else None,
    )

    # write the fitted materials back to the scene config (UI round trip)
    if not args.dry_run:
        m, e = params.apply(sc.material_params(), env)
        table = m.to_table()
        for idx in range(table.shape[0]):
            sc.config.set_material(
                idx, color=table[idx, 1:4], roughness=table[idx, 4]
            )
        sc.config.set_many({
            "sun_Power": float(e.sun_power), "IBL_Power": float(e.ibl_power)
        })
        print(f"wrote fitted parameters back to {sc.config.config_path}")
    if args.out:
        from ensem3a_openclraytracer_tpu.models.pathtracer import render_radiance

        m, e = params.apply(sc.material_params(), env)
        img = render_radiance(
            sc.geometry, m, e, sc.camera_params(), jax.random.PRNGKey(0),
            height=res, width=res, spp=args.spp * 4, max_bounce=args.max_bounce,
            sun_enabled=float(env.sun_power) != 0.0,
        )
        save_png(np.clip(np.asarray(img), 0, 1), args.out)
        print(f"fitted render -> {args.out}")
    return 0


def cmd_bench(args) -> int:
    if getattr(args, "scaling", False):
        return cmd_bench_scaling(args)
    import bench as bench_mod  # repo-root bench.py is the single source of truth

    bench_mod.main()
    return 0


def cmd_bench_scaling(args) -> int:
    """Scaling sweep, two parts (the BASELINE.md >= 85% linear-scaling
    harness; runs on a virtual CPU mesh today, real pod slices when they
    exist):

      1. **device-count scaling** — render the same workload on meshes of
         1, 2, 4, ... devices (dp only) and report each count's Mrays/s
         plus ``efficiency`` = rate / (n * rate_1), the linear-scaling
         fraction the >= 85% target reads directly;
      2. **mesh-shape sweep** — every (dp, sp) factorization of the full
         device set, reporting rays/s per shape relative to the first.

    ``--out FILE`` additionally writes every record as a JSON line so the
    sweep is a durable artifact (VERDICT round 2 item 7)."""
    import time as _time

    import jax

    from ensem3a_openclraytracer_tpu.parallel.mesh import make_mesh
    from ensem3a_openclraytracer_tpu.parallel.render import make_sharded_renderer
    from ensem3a_openclraytracer_tpu.testing import make_cornell_scene
    from ensem3a_openclraytracer_tpu.utils.profiling import rays_per_render

    geom, materials, env, camera = make_cornell_scene(use_bvh=False)
    # default 120^2: divisible by 1..6 and 8, so the device-count sweep
    # includes NON-power-of-two counts (ADVICE round 3: a po2-only sweep
    # can hide sharding bugs that only appear at odd splits)
    res, spp, mb = args.resolution or 120, args.spp or 16, 4
    devices = jax.devices()
    n = len(devices)
    key = jax.random.PRNGKey(0)
    records = []
    # on a virtual CPU mesh every "device" is a thread on the same host,
    # so device-count efficiency measures host oversubscription, not ICI
    # scaling - flag that in the artifact so the numbers can't be misread
    virtual = jax.default_backend() == "cpu"

    def emit(rec):
        records.append(rec)
        print(json.dumps(rec), flush=True)

    def measure(mesh):
        fn = make_sharded_renderer(
            mesh, height=res, width=res, spp=spp, max_bounce=mb,
            sun_enabled=False,
        )
        jax.block_until_ready(fn(geom, materials, env, camera, key))  # compile
        runs = []
        for _ in range(3):
            t0 = _time.perf_counter()
            jax.block_until_ready(fn(geom, materials, env, camera, key))
            runs.append(_time.perf_counter() - t0)
        dt = sorted(runs)[1]
        return rays_per_render(res, spp, mb, False) / dt / 1e6

    # part 1: device-count scaling (dp only), efficiency vs linear
    counts = [c for c in range(1, min(n, 32) + 1) if res % c == 0]
    rate1 = None
    for c in counts:
        mesh = make_mesh(devices[:c], sp=1)
        mrays = measure(mesh)
        if rate1 is None:
            rate1 = mrays
        rec = {
            "metric": f"scaling_ndev{c}_mrays_per_s",
            "value": round(mrays, 3),
            "unit": "Mrays/s",
            "efficiency": round(mrays / (c * rate1), 3),
            "platform": jax.default_backend(),
            "workload": f"cornell {res}^2/{spp}spp/{mb}b",
        }
        if virtual:
            rec["note"] = (
                "virtual host devices share one CPU; efficiency here "
                "proves the harness, not ICI scaling"
            )
        emit(rec)

    # part 2: mesh-shape sweep over the full device set
    base = None
    for sp in range(1, n + 1):
        if n % sp == 0 and spp % sp == 0 and res % (n // sp) == 0:
            dp = n // sp
            mrays = measure(make_mesh(devices, sp=sp))
            if base is None:
                base = mrays
            emit({
                "metric": f"scaling_dp{dp}_sp{sp}_mrays_per_s",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / base, 3),
                "platform": jax.default_backend(),
            })

    if getattr(args, "out", None):
        with open(args.out, "w") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
        print(f"scaling sweep -> {args.out}")
    return 0


def cmd_info(args) -> int:
    sc = _load_scene(args.scene)
    rs = sc.config.render_settings()
    cam = sc.config.camera_settings()
    env = sc.config.environment_settings()
    info = {
        "scene": args.scene,
        "triangles": sc.num_tris,
        "materials": int(sc.material_table.shape[0]),
        "emissive_faces": int(len(sc.light_faces)),
        "accel": "lbvh" if sc.geometry.bvh is not None else "mxu-dense",
        "resolution": rs.resolution,
        "spp": rs.spp,
        "max_bounce": rs.max_bounce,
        "camera": {"position": cam.position, "rotation_deg": cam.rotation_deg,
                   "fov_deg": cam.fov_deg},
        "environment": {"sun_power": env.sun_power, "ibl_power": env.ibl_power,
                        "sun_angles_deg": env.sun_angles_deg, "ibl_file": env.ibl_file},
        "material_table": sc.material_table.tolist(),
    }
    print(json.dumps(info, indent=2))
    return 0


def cmd_set(args) -> int:
    sc = _load_scene(args.scene)
    sc.config.setParameter(args.key, args.value)
    print(f"{args.key}={args.value} -> {sc.config.config_path}")
    return 0


def cmd_get(args) -> int:
    sc = _load_scene(args.scene)
    print(sc.config.getParameter(args.key))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ensem3a_openclraytracer_tpu",
        description="TPU-native differentiable path tracer",
    )
    sub = p.add_subparsers(dest="command", required=True)

    r = sub.add_parser("render", help="path-trace a scene to PNG")
    r.add_argument("scene", nargs="?",
                   help="scene .obj (default: scenePath from ./config.ini)")
    r.add_argument("--watch", type=int, nargs="?", const=0, default=None,
                   help="re-render when the scene ini changes, reusing the "
                        "imported geometry (N = stop after N re-renders; "
                        "no N = forever)")
    r.add_argument("--watch-poll", type=float, default=0.5,
                   dest="watch_poll", help="ini poll interval seconds")
    r.add_argument("--resolution", type=int)
    r.add_argument("--spp", type=int)
    r.add_argument("--max-bounce", type=int, dest="max_bounce")
    r.add_argument("--out", help="output PNG path (default output/out.png)")
    r.add_argument("--seed", type=int, default=0)
    r.add_argument("--chunk-spp", type=int, default=16, dest="chunk_spp")
    r.add_argument("--checkpoint", help="progressive .npz checkpoint path (resume if exists)")
    r.add_argument("--restart", action="store_true", help="ignore an existing checkpoint")
    r.add_argument("--tonemap", default="clamp",
                   choices=["clamp", "gamma", "reference_gamma"],
                   help="output transform (reference default: clamp)")
    r.add_argument("--nee", action="store_true",
                   help="next-event estimation (lower variance; needs emissive faces)")
    r.add_argument("--mis", action="store_true",
                   help="balance-heuristic BSDF+NEE combination (implies --nee)")
    r.add_argument("--glass", default="tint", choices=["tint", "refract"],
                   help="glass model: reference straight-through tint, or "
                        "physically-based refraction using the material ior")
    r.add_argument("--mesh", help="(dp,sp) device mesh, e.g. 4,2 - or 'auto'")
    r.add_argument("--profile", help="write a jax.profiler XLA trace to this dir")
    r.add_argument("--verbose", action="store_true")
    r.set_defaults(fn=cmd_render)

    o = sub.add_parser("optimize", help="fit material/env params to a target image")
    o.add_argument("scene")
    o.add_argument("--target", required=True, help="target PNG")
    o.add_argument("--iters", type=int, default=100)
    o.add_argument("--lr", type=float, default=1e-2)
    o.add_argument("--spp", type=int, default=4)
    o.add_argument("--max-bounce", type=int, default=3, dest="max_bounce")
    o.add_argument("--resolution", type=int)
    o.add_argument("--seed", type=int, default=0)
    o.add_argument("--out", help="render the fitted scene to this PNG")
    o.add_argument("--dry-run", action="store_true", help="do not write the ini back")
    o.add_argument("--checkpoint", help="optimizer .npz checkpoint (resume if exists)")
    o.add_argument("--checkpoint-every", type=int, default=25, dest="checkpoint_every")
    o.add_argument("--mesh", help="(dp,sp) device mesh, e.g. 4,2 - or 'auto'")
    o.add_argument("--nee", action="store_true",
                   help="next-event estimation for the optimization renders")
    o.add_argument("--mis", action="store_true",
                   help="balance-heuristic BSDF+NEE combination (implies --nee)")
    o.set_defaults(fn=cmd_optimize)

    b = sub.add_parser("bench", help="throughput benchmark (one JSON line)")
    b.add_argument("--scaling", action="store_true",
                   help="sweep (dp,sp) mesh shapes over available devices")
    b.add_argument("--resolution", type=int)
    b.add_argument("--spp", type=int)
    b.add_argument("--out", help="also write the scaling records as JSON lines")
    b.set_defaults(fn=cmd_bench)

    i = sub.add_parser("info", help="scene statistics as JSON")
    i.add_argument("scene")
    i.set_defaults(fn=cmd_info)

    s = sub.add_parser("set", help="set a per-scene ini parameter")
    s.add_argument("scene")
    s.add_argument("key")
    s.add_argument("value")
    s.set_defaults(fn=cmd_set)

    g = sub.add_parser("get", help="read a per-scene ini parameter")
    g.add_argument("scene")
    g.add_argument("key")
    g.set_defaults(fn=cmd_get)

    return p


def main(argv=None) -> int:
    import jax

    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        # the environment's TPU plugin force-overrides jax_platforms at
        # registration; a user asking for CPU must actually get CPU
        jax.config.update("jax_platforms", "cpu")
    # persistent compilation cache: a cold 512^2 render program costs
    # minutes of XLA compile over a tunneled backend, milliseconds
    # cached - the same setup bench.py uses
    cache_dir = os.environ.get(
        "ENSEM3A_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a requirement
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
