"""Next-event estimation: unbiasedness + variance reduction vs the
reference's pure-BSDF estimator."""

import jax
import jax.numpy as jnp
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

RES = 32
MB = 3


def _renders(nee, spp, keys):
    geom = cornell_geometry()
    m, e, c = cornell_materials(), cornell_env(), cornell_camera()
    lights = build_light_pack(geom, m) if nee else None
    out = []
    for k in keys:
        out.append(
            np.asarray(
                render_radiance(
                    geom, m, e, c, jax.random.PRNGKey(k),
                    height=RES, width=RES, spp=spp, max_bounce=MB,
                    sun_enabled=False, lights=lights, nee=nee,
                )
            )
        )
    return np.stack(out)


def test_nee_unbiased_and_lower_variance():
    base = _renders(False, 64, [0, 1, 2, 3]).mean(axis=0)
    nee = _renders(True, 16, [10, 11, 12, 13])
    # unbiased: matches the BSDF estimator's converged mean
    assert abs(nee.mean() - base.mean()) < 0.02
    # variance: per-pixel std across independent NEE renders is far below
    # the BSDF estimator's at the same spp
    bsdf_same_spp = _renders(False, 16, [20, 21, 22, 23])
    v_nee = nee.std(axis=0).mean()
    v_bsdf = bsdf_same_spp.std(axis=0).mean()
    assert v_nee < 0.5 * v_bsdf, f"nee std {v_nee} vs bsdf std {v_bsdf}"


def test_nee_glass_transmitted_light_unbiased():
    """Per-pixel: light seen through glass must survive under NEE.

    The NEE shadow ray treats the glass pane as an occluder, so ALL of
    this scene's direct light arrives via the BSDF chain
    (diffuse -> glass -> light).  A sticky emission-suppression flag
    (round-1 bug) counts it in neither estimator branch and renders the
    floor near-black; the correct per-bounce flag makes the NEE render
    match a converged BSDF-only render pixel for pixel."""
    res, mb, spp = 16, 3, 196
    geom, m, e, c = make_glass_light_scene()
    lights = build_light_pack(geom, m)
    assert lights is not None

    def render(nee, k):
        return np.asarray(
            render_radiance(
                geom, m, e, c, jax.random.PRNGKey(k),
                height=res, width=res, spp=spp, max_bounce=mb,
                sun_enabled=False, lights=lights if nee else None, nee=nee,
            )
        )

    bsdf = (render(False, 0) + render(False, 1)) / 2
    nee = (render(True, 10) + render(True, 11)) / 2
    # the scene is lit: a black frame is the bias signature
    assert nee.mean() > 0.5 * bsdf.mean() and bsdf.mean() > 0.3
    d = np.abs(nee - bsdf)
    assert d.max() < 0.15, f"per-pixel bias: max={d.max()} mean={d.mean()}"


def test_nee_light_pack_contents():
    geom = cornell_geometry()
    m = cornell_materials()
    lp = build_light_pack(geom, m)
    assert lp is not None and lp.v0.shape[0] == 2  # the 2-tri light panel
    np.testing.assert_allclose(float(lp.power[0]), 12.0)
    assert float(lp.area.sum()) > 0.0


def test_nee_no_lights_returns_none():
    geom = cornell_geometry()
    m = cornell_materials()
    m = m._replace(mtype=jnp.where(m.mtype == 0, 1, m.mtype))
    assert build_light_pack(geom, m) is None
