"""TPU hardware-PRNG uniforms (ops/rng.py).

The kernel needs the Mosaic prng primitives, which have no CPU lowering,
so these tests only run when a real TPU backend is present (the CI suite
runs on CPU and skips them; the fused kernel's PRNG path is exercised on
TPU by bench.py and the driver).
"""

import numpy as np
import pytest

import jax

tpu_only = pytest.mark.skipif(
    jax.default_backend() in ("cpu", "gpu"),
    reason="pltpu.prng_* has no CPU lowering",
)


@tpu_only
def test_uniforms_tpu_statistics_and_determinism():
    from ensem3a_openclraytracer_tpu.ops.rng import uniforms_tpu

    k = jax.random.PRNGKey(42)
    u = np.asarray(uniforms_tpu(k, (4, 100_000, 2)))
    assert u.shape == (4, 100_000, 2)
    assert 0.0 <= u.min() and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 2e-3
    assert abs(u.std() - np.sqrt(1 / 12)) < 2e-3
    # deterministic per key; different keys decorrelate
    u2 = np.asarray(uniforms_tpu(k, (4, 100_000, 2)))
    assert np.array_equal(u, u2)
    u3 = np.asarray(uniforms_tpu(jax.random.PRNGKey(43), (4, 100_000, 2)))
    assert not np.array_equal(u, u3)
