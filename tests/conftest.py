"""Test harness: force JAX onto CPU with 8 virtual devices so sharding
tests run without TPU hardware (SURVEY.md section 4 test-strategy gap).

``ENSEM3A_TPU_TESTS=1`` keeps the real TPU backend instead, so the
``tpu_only`` tests in tests/test_tpu_gated.py / tests/test_rng.py run
against the actual Mosaic lowering:

    ENSEM3A_TPU_TESTS=1 python -m pytest tests/test_tpu_gated.py -q
"""

import os

_USE_TPU = os.environ.get("ENSEM3A_TPU_TESTS") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    # The environment's TPU plugin force-sets jax_platforms at
    # registration, overriding the env var - override it back after
    # import.
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_OBJ_DIR = "/root/reference/ObjFiles"


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def scenes_dir(tmp_path_factory):
    """Copy reference scene assets into a writable dir (loading creates or
    reads .ini files next to the .obj)."""
    import shutil

    src = REFERENCE_OBJ_DIR
    dst = tmp_path_factory.mktemp("ObjFiles")
    if os.path.isdir(src):
        for name in os.listdir(src):
            shutil.copy(os.path.join(src, name), dst / name)
    return dst
