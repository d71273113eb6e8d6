"""CLI multi-chip + profiling surfaces on the virtual 8-device mesh:
``render --mesh``, ``optimize --mesh --checkpoint``, ``bench --scaling``,
``render --profile`` (VERDICT round-1 gaps 5/7/9)."""

import io
import json
import os
import shutil
import sys

import numpy as np
import pytest

from ensem3a_openclraytracer_tpu.cli import main


@pytest.fixture()
def tri_scene(scenes_dir, tmp_path):
    src = os.path.join(scenes_dir, "singleTriangle.obj")
    if not os.path.exists(src):
        pytest.skip("reference scenes unavailable")
    dst = tmp_path / "singleTriangle.obj"
    shutil.copy(src, dst)
    ini = os.path.join(scenes_dir, "singleTriangle.ini")
    if os.path.exists(ini):
        shutil.copy(ini, tmp_path / "singleTriangle.ini")
    return str(dst)


def _capture(argv):
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        rc = main(argv)
    finally:
        sys.stdout = old
    return rc, buf.getvalue()


def test_render_mesh_flag(tri_scene, tmp_path):
    out = str(tmp_path / "mesh.png")
    rc, text = _capture([
        "render", tri_scene, "--resolution", "32", "--spp", "8",
        "--max-bounce", "2", "--mesh", "4,2", "--out", out,
    ])
    assert rc == 0 and os.path.exists(out)
    assert "rendered 32x32 @ 8 spp" in text


def test_render_mesh_matches_single_device(tri_scene, tmp_path):
    """The sharded render is the same estimator - images agree up to the
    per-shard RNG split (statistically; here just sanity: finite, same
    brightness scale)."""
    from ensem3a_openclraytracer_tpu.utils.image import load_png

    out1, out8 = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    _capture(["render", tri_scene, "--resolution", "32", "--spp", "16",
              "--max-bounce", "2", "--out", out1])
    _capture(["render", tri_scene, "--resolution", "32", "--spp", "16",
              "--max-bounce", "2", "--mesh", "auto", "--out", out8])
    a, b = load_png(out1), load_png(out8)
    assert np.isfinite(b).all()
    assert abs(a.mean() - b.mean()) < 0.1


def test_render_profile_writes_trace(tri_scene, tmp_path):
    prof = str(tmp_path / "trace")
    rc, _ = _capture([
        "render", tri_scene, "--resolution", "16", "--spp", "2",
        "--max-bounce", "1", "--profile", prof,
        "--out", str(tmp_path / "p.png"), "--verbose",
    ])
    assert rc == 0
    assert os.path.isdir(prof) and len(os.listdir(prof)) > 0


def test_optimize_mesh_and_checkpoint(tri_scene, tmp_path):
    from ensem3a_openclraytracer_tpu.utils.image import save_png

    target = str(tmp_path / "target.png")
    save_png(np.full((16, 16, 3), 0.25, np.float32), target)
    ckpt = str(tmp_path / "opt.npz")
    rc, text = _capture([
        "optimize", tri_scene, "--target", target, "--resolution", "16",
        "--iters", "3", "--spp", "2", "--max-bounce", "1",
        "--mesh", "4,2", "--checkpoint", ckpt, "--checkpoint-every", "2",
        "--dry-run",
    ])
    assert rc == 0 and os.path.exists(ckpt)
    assert "loss" in text
    # resume consumes the remaining iterations without error
    rc2, _ = _capture([
        "optimize", tri_scene, "--target", target, "--resolution", "16",
        "--iters", "5", "--spp", "2", "--max-bounce", "1",
        "--mesh", "4,2", "--checkpoint", ckpt, "--checkpoint-every", "2",
        "--dry-run",
    ])
    assert rc2 == 0


def test_bench_scaling_sweeps_mesh_shapes():
    rc, text = _capture(["bench", "--scaling", "--resolution", "32", "--spp", "8"])
    assert rc == 0
    lines = [json.loads(l) for l in text.strip().splitlines() if l.startswith("{")]
    assert len(lines) >= 2  # at least (8,1) and (1,8) on the virtual mesh
    names = {l["metric"] for l in lines}
    assert any("dp8_sp1" in n for n in names)
    for l in lines:
        assert l["value"] > 0
