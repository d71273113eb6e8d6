"""CLI surface + progressive/resumable rendering."""

import json
import os
import shutil

import numpy as np
import pytest

from ensem3a_openclraytracer_tpu.cli import main
from ensem3a_openclraytracer_tpu.models.progressive import (
    ProgressiveRenderer,
    ProgressiveState,
)
from ensem3a_openclraytracer_tpu.testing import (
    cornell_camera,
    cornell_env,
    cornell_geometry,
    cornell_materials,
)


@pytest.fixture()
def scene_path(scenes_dir, tmp_path):
    src = os.path.join(str(scenes_dir), "singleTriangle.obj")
    if not os.path.exists(src):
        pytest.skip("reference asset missing")
    dst = tmp_path / "scene.obj"
    shutil.copy(src, dst)
    ini = os.path.join(str(scenes_dir), "singleTriangle.ini")
    if os.path.exists(ini):
        shutil.copy(ini, tmp_path / "scene.ini")
    return str(dst)


def test_cli_render(scene_path, tmp_path, capsys):
    out = str(tmp_path / "img.png")
    rc = main([
        "render", scene_path, "--resolution", "32", "--spp", "4",
        "--max-bounce", "2", "--out", out,
    ])
    assert rc == 0
    assert os.path.exists(out)
    assert "Mrays/s" in capsys.readouterr().out


def test_cli_info(scene_path, capsys):
    assert main(["info", scene_path]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["triangles"] == 2
    assert info["accel"] == "mxu-dense"


def test_cli_set_get(scene_path, capsys):
    assert main(["set", scene_path, "spp", "33"]) == 0
    capsys.readouterr()
    assert main(["get", scene_path, "spp"]) == 0
    assert capsys.readouterr().out.strip() == "33"


def test_cli_render_resume(scene_path, tmp_path, capsys):
    """A checkpointed render resumes instead of restarting."""
    out = str(tmp_path / "img.png")
    ckpt = str(tmp_path / "render.npz")
    rc = main([
        "render", scene_path, "--resolution", "32", "--spp", "4",
        "--max-bounce", "2", "--out", out, "--chunk-spp", "2",
        "--checkpoint", ckpt,
    ])
    assert rc == 0 and os.path.exists(ckpt)
    rc = main([
        "render", scene_path, "--resolution", "32", "--spp", "8",
        "--max-bounce", "2", "--out", out, "--chunk-spp", "2",
        "--checkpoint", ckpt,
    ])
    text = capsys.readouterr().out
    assert "resumed at 4 spp" in text
    st = ProgressiveState.load(ckpt)
    assert st.spp_done == 8


def test_progressive_equals_oneshot_statistically():
    """Chunked accumulation matches a long one-shot render in expectation
    and is exactly resumable."""
    geom = cornell_geometry()
    m, e, c = cornell_materials(), cornell_env(), cornell_camera()
    kw = dict(height=24, width=24, max_bounce=2, chunk_spp=4, sun_enabled=False)
    r1 = ProgressiveRenderer(geom, m, e, c, base_seed=5, **kw)
    img_a = r1.render(16)

    # same render split across a save/load boundary
    r2 = ProgressiveRenderer(geom, m, e, c, base_seed=5, **kw)
    r2.render(8)
    import tempfile

    path = os.path.join(tempfile.mkdtemp(), "st.npz")
    r2.state.save(path)
    r3 = ProgressiveRenderer(
        geom, m, e, c, state=ProgressiveState.load(path), **kw
    )
    img_b = r3.render(16)
    np.testing.assert_allclose(img_a, img_b, atol=1e-6)


def test_render_watch_rerenders_on_ini_change(scene_path, tmp_path, monkeypatch):
    """--watch (the reference UI's edit -> render -> refresh loop,
    UI.py:92-104): a config edit triggers a re-render without geometry
    rebuild; src.png lands next to out.png (main.py:101-104); the cwd
    config.ini remembers the scene (UI.py:57-61)."""
    import threading
    import time

    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "w" / "out.png")
    result = {}

    def run():
        result["rc"] = main([
            "render", scene_path, "--resolution", "16", "--spp", "2",
            "--max-bounce", "1", "--out", out,
            "--watch", "1", "--watch-poll", "0.1",
        ])

    t = threading.Thread(target=run)
    t.start()
    deadline = time.time() + 120
    while not os.path.exists(out) and time.time() < deadline:
        time.sleep(0.1)
    assert os.path.exists(out), "first render never finished"
    first_mtime = os.path.getmtime(out)
    time.sleep(0.3)
    # a real config edit (the UI round trip writes through setParameter)
    ini = scene_path[:-len(".obj")] + ".ini"
    from ensem3a_openclraytracer_tpu.scene.config import ConfigReader

    ConfigReader(ini, material_count=0).setParameter("IBL_Power", "0.25")
    t.join(timeout=120)
    assert not t.is_alive(), "watch loop did not exit after 1 re-render"
    assert result.get("rc") == 0
    assert os.path.getmtime(out) > first_mtime, "no re-render happened"
    assert os.path.exists(os.path.join(tmp_path, "w", "src.png"))
    cfg = (tmp_path / "config.ini").read_text()
    assert "scenePath=" in cfg and "scene.obj" in cfg


def test_progressive_retries_transient_chunk_failure():
    """Fault injection (SURVEY.md section 5 failure-detection gap): a
    chunk that dies to a transient runtime error is retried with the
    SAME key (identical samples, no statistical skew) and the render
    completes; a permanently failing chunk still raises."""
    geom = cornell_geometry()
    m, e, c = cornell_materials(), cornell_env(), cornell_camera()
    r = ProgressiveRenderer(
        geom, m, e, c, height=16, width=16, max_bounce=1, chunk_spp=2,
        sun_enabled=False,
    )
    real_fn = r._chunk_fn
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # second chunk fails once
            raise RuntimeError("injected transient failure")
        return real_fn(*a, **kw)

    r._chunk_fn = flaky
    img = r.render(6)
    assert calls["n"] == 4  # 3 chunks + 1 retry
    assert np.isfinite(img).all() and r.state.spp_done == 6

    # deterministic equivalence: same seed without faults
    r2 = ProgressiveRenderer(
        geom, m, e, c, height=16, width=16, max_bounce=1, chunk_spp=2,
        sun_enabled=False,
    )
    np.testing.assert_allclose(img, r2.render(6), rtol=1e-6)

    r3 = ProgressiveRenderer(
        geom, m, e, c, height=16, width=16, max_bounce=1, chunk_spp=2,
        sun_enabled=False,
    )

    def always_fail(*a, **kw):
        raise RuntimeError("permanent failure")

    r3._chunk_fn = always_fail
    with pytest.raises(RuntimeError):
        r3.render(2)
