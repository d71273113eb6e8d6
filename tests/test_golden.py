"""Golden-image regression: the estimator's exact output for pinned RNG
keys (the framework version of the reference's checked-in output/*.png
eyeball check, SURVEY.md section 4 - but asserted, not eyeballed)."""

import os

import jax
import numpy as np
import pytest

from ensem3a_openclraytracer_tpu.models.pathtracer import render_radiance
from ensem3a_openclraytracer_tpu.scene.scene import build_light_pack
from ensem3a_openclraytracer_tpu.testing import (
    make_cornell_scene,
    make_outdoor_scene,
)

HERE = os.path.join(os.path.dirname(__file__), "golden")


def _check(name, img):
    path = os.path.join(HERE, name)
    # a missing golden is a FAILURE, not a skip: silently degrading the
    # regression gate inverts its safety (a deleted golden must be
    # noticed, then regenerated deliberately via make_goldens.py)
    assert os.path.exists(path), (
        f"golden {name} missing - regenerate with tests/golden/make_goldens.py"
    )
    ref = np.load(path)
    np.testing.assert_allclose(np.asarray(img), ref, atol=2e-5, rtol=1e-4)


def test_golden_cornell_bsdf():
    geom, m, e, c = make_cornell_scene(use_bvh=False)
    img = render_radiance(geom, m, e, c, jax.random.PRNGKey(0),
                          height=48, width=48, spp=8, max_bounce=3,
                          sun_enabled=False)
    _check("cornell_bsdf.npy", img)


def test_golden_cornell_nee():
    geom, m, e, c = make_cornell_scene(use_bvh=False)
    lp = build_light_pack(geom, m)
    img = render_radiance(geom, m, e, c, jax.random.PRNGKey(0),
                          height=48, width=48, spp=8, max_bounce=3,
                          sun_enabled=False, lights=lp, nee=True)
    _check("cornell_nee.npy", img)


def test_golden_outdoor_sun():
    geom, m, e, c = make_outdoor_scene(n_cubes=6, use_bvh=False)
    img = render_radiance(geom, m, e, c, jax.random.PRNGKey(0),
                          height=48, width=48, spp=8, max_bounce=3,
                          sun_enabled=True)
    _check("outdoor_sun.npy", img)
