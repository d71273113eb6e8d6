"""Regenerate golden renders. Run from repo root:
    JAX_PLATFORMS=cpu python tests/golden/make_goldens.py
Goldens pin the estimator's exact output for a fixed RNG key; regenerate
ONLY on an intentional estimator change, and say so in the commit.
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from ensem3a_openclraytracer_tpu.models.pathtracer import render_radiance
from ensem3a_openclraytracer_tpu.scene.scene import build_light_pack
from ensem3a_openclraytracer_tpu.testing import (
    make_cornell_scene, make_outdoor_scene, cornell_materials,
)

here = os.path.dirname(__file__)

geom, m, e, c = make_cornell_scene(use_bvh=False)
img = render_radiance(geom, m, e, c, jax.random.PRNGKey(0),
                      height=48, width=48, spp=8, max_bounce=3, sun_enabled=False)
np.save(os.path.join(here, "cornell_bsdf.npy"), np.asarray(img))

lp = build_light_pack(geom, m)
img = render_radiance(geom, m, e, c, jax.random.PRNGKey(0),
                      height=48, width=48, spp=8, max_bounce=3, sun_enabled=False,
                      lights=lp, nee=True)
np.save(os.path.join(here, "cornell_nee.npy"), np.asarray(img))

geom, m, e, c = make_outdoor_scene(n_cubes=6, use_bvh=False)
img = render_radiance(geom, m, e, c, jax.random.PRNGKey(0),
                      height=48, width=48, spp=8, max_bounce=3, sun_enabled=True)
np.save(os.path.join(here, "outdoor_sun.npy"), np.asarray(img))
print("goldens written")
