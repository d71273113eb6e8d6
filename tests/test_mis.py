"""Multiple importance sampling (balance heuristic, BSDF + NEE): must be
unbiased and lower-variance than either strategy alone on the Cornell
scene (big close light: BSDF sampling hits it often, so NEE-only's
binary emission suppression costs variance that the balance weights
recover).  The reference has neither strategy (its ``sampleLight`` is
dead code, MathLib.cl:419-454)."""

import jax
import numpy as np

from ensem3a_openclraytracer_tpu.models.pathtracer import render_radiance
from ensem3a_openclraytracer_tpu.scene.scene import build_light_pack
from ensem3a_openclraytracer_tpu.testing import (
    cornell_camera,
    cornell_env,
    cornell_geometry,
    cornell_materials,
    make_glass_light_scene,
)

RES, MB = 24, 3


def _renders(mode, spp, keys, scene=None):
    if scene is None:
        scene = (
            cornell_geometry(), cornell_materials(), cornell_env(),
            cornell_camera(),
        )
    geom, m, e, c = scene
    lights = build_light_pack(geom, m) if mode in ("nee", "mis") else None
    out = []
    for k in keys:
        out.append(
            np.asarray(
                render_radiance(
                    geom, m, e, c, jax.random.PRNGKey(k),
                    height=RES, width=RES, spp=spp, max_bounce=MB,
                    sun_enabled=False, lights=lights,
                    nee=mode in ("nee", "mis"), mis=mode == "mis",
                )
            )
        )
    return np.stack(out)


def test_mis_unbiased_and_lower_variance():
    base = _renders("bsdf", 96, [0, 1, 2, 3]).mean(axis=0)
    mis = _renders("mis", 16, [10, 11, 12, 13])
    nee = _renders("nee", 16, [30, 31, 32, 33])
    # unbiased: matches the converged BSDF estimator's mean
    assert abs(mis.mean() - base.mean()) < 0.02
    # variance: below BOTH single-strategy estimators at the same spp
    bsdf = _renders("bsdf", 16, [20, 21, 22, 23])
    v_mis = mis.std(axis=0).mean()
    assert v_mis < 0.9 * nee.std(axis=0).mean(), (
        f"mis std {v_mis} vs nee {nee.std(axis=0).mean()}"
    )
    assert v_mis < 0.5 * bsdf.std(axis=0).mean(), (
        f"mis std {v_mis} vs bsdf {bsdf.std(axis=0).mean()}"
    )


def test_mis_glass_light_unbiased():
    """Light behind glass: NEE shadow rays are always occluded, so ALL
    direct light arrives via the BSDF chain - the balance weight must be
    ~1 there (glass is a delta lobe, never NEE-sampled) or the frame
    goes dark (the round-1 sticky-flag bias, test_nee.py:53)."""
    spp = 128
    scene = make_glass_light_scene()
    bsdf = _renders("bsdf", spp, [0, 1], scene).mean(axis=0)
    mis = _renders("mis", spp, [10, 11], scene).mean(axis=0)
    assert mis.mean() > 0.5 * bsdf.mean() and bsdf.mean() > 0.3
    d = np.abs(mis - bsdf)
    assert d.max() < 0.2, f"per-pixel bias: max={d.max()} mean={d.mean()}"


def test_mis_requires_nee():
    geom, m, e, c = (
        cornell_geometry(), cornell_materials(), cornell_env(),
        cornell_camera(),
    )
    try:
        render_radiance(
            geom, m, e, c, jax.random.PRNGKey(0), height=8, width=8,
            spp=1, max_bounce=1, sun_enabled=False, mis=True,
        )
    except ValueError as ex:
        assert "nee" in str(ex)
    else:
        raise AssertionError("mis without nee should raise")
