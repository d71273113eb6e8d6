"""Scene/asset pipeline against the five canonical reference scenes.

Validates the importer reproduces the reference's data contracts
(SURVEY.md section 2.3): triangle counts, material tables from ini keys,
emissive-face light lists, and ini write-back round trips
(FileManager.py:209-331, configReader :350-425).
"""

import os

import numpy as np
import pytest

from ensem3a_openclraytracer_tpu.scene.scene import Scene

# (file, tris, materials, emissive faces) - counts from the reference assets
CANON = [
    ("singleTriangle.obj", 2, 4, 0),
    ("Cornell box.obj", 36, 4, 2),
    ("Cornell box_Monkey.obj", 15756, 5, 2),
    ("FurnaceHD.obj", 3968, 1, 0),
    ("Serre_leger.obj", 7256, 20, 0),
]


def _skip_if_missing(scenes_dir, name):
    if not os.path.exists(os.path.join(str(scenes_dir), name)):
        pytest.skip(f"reference asset {name} not present")


@pytest.mark.parametrize("name,tris,mats,lights", CANON)
def test_reference_scene_loads(scenes_dir, name, tris, mats, lights):
    _skip_if_missing(scenes_dir, name)
    sc = Scene.load(os.path.join(str(scenes_dir), name))
    assert sc.num_tris == tris
    assert sc.material_table.shape == (mats, 6)
    assert len(sc.light_faces) == lights
    g = sc.geometry
    assert g.v0.shape == (tris, 3)
    # per-face shading normals are unit length
    norms = np.linalg.norm(np.asarray(g.n), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # material ids index into the table
    assert int(np.asarray(g.mat).max()) < mats


def test_cornell_material_table_matches_ini(scenes_dir):
    """Material ABI [type, R, G, B, roughness, ior] vs the checked-in ini."""
    _skip_if_missing(scenes_dir, "Cornell box.obj")
    sc = Scene.load(os.path.join(str(scenes_dir), "Cornell box.obj"))
    t = sc.material_table
    # M_1 is the red wall: type 1, color (1, 0, 0), roughness 0.2
    np.testing.assert_allclose(t[1], [1.0, 1.0, 0.0, 0.0, 0.2, 0.0], atol=1e-6)
    # M_3 is the (zero-power) emissive light: type 0
    assert t[3, 0] == 0.0


def test_cornell_light_faces_are_emissive(scenes_dir):
    _skip_if_missing(scenes_dir, "Cornell box.obj")
    sc = Scene.load(os.path.join(str(scenes_dir), "Cornell box.obj"))
    mat_ids = np.asarray(sc.geometry.mat)
    for f in sc.light_faces:
        assert sc.material_table[mat_ids[f], 0] == 0.0  # type 0 = emissive


def test_config_write_back_round_trip(scenes_dir):
    """setParameter persists and reloads (the UI edit loop,
    FileManager.py:410-423)."""
    _skip_if_missing(scenes_dir, "Cornell box.obj")
    path = os.path.join(str(scenes_dir), "Cornell box.obj")
    sc = Scene.load(path)
    old = sc.config.get("spp")
    sc.config.setParameter("spp", "7")
    sc2 = Scene.load(path, rebuild_accel=False, geometry=sc.geometry)
    assert sc2.config.get("spp") == "7"
    assert sc2.config.render_settings().spp == 7
    sc.config.setParameter("spp", old)


def test_material_edit_without_accel_rebuild(scenes_dir):
    """The UI.py:98 path: material edits re-import without BVH rebuild and
    the carried geometry is reused."""
    _skip_if_missing(scenes_dir, "Cornell box.obj")
    path = os.path.join(str(scenes_dir), "Cornell box.obj")
    sc = Scene.load(path)
    sc.config.setParameter("M_1_Color_G", "0.5")
    sc2 = Scene.load(path, rebuild_accel=False, geometry=sc.geometry)
    assert sc2.material_table[1, 2] == pytest.approx(0.5)
    assert sc2.geometry is sc.geometry
    sc.config.setParameter("M_1_Color_G", "0.0")


def test_ini_created_with_defaults(tmp_path, scenes_dir):
    """Loading an obj with no ini auto-creates defaults
    (FileManager.py:355-383)."""
    _skip_if_missing(scenes_dir, "singleTriangle.obj")
    import shutil

    obj = tmp_path / "fresh.obj"
    shutil.copy(os.path.join(str(scenes_dir), "singleTriangle.obj"), obj)
    sc = Scene.load(str(obj))
    assert (tmp_path / "fresh.ini").exists()
    rs = sc.config.render_settings()
    assert rs.resolution > 0 and rs.spp > 0 and rs.max_bounce > 0
