"""Sampler distribution + BSDF invariant tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ensem3a_openclraytracer_tpu.ops import bsdf, sampling
from ensem3a_openclraytracer_tpu.ops.geometry import dot, norm, normalize


def _uniforms(n, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return jax.random.uniform(k1, (n,)), jax.random.uniform(k2, (n,))


def _normals(n, seed=1):
    v = jax.random.normal(jax.random.PRNGKey(seed), (n, 3))
    return normalize(v)


def test_onb_is_orthonormal(rng):
    n = _normals(256)
    t, b = sampling.orthonormal_basis(n)
    np.testing.assert_allclose(np.asarray(norm(t)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(norm(b)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dot(t, b)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dot(t, n)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dot(b, n)), 0.0, atol=1e-5)


def test_onb_handles_poles():
    n = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    t, b = sampling.orthonormal_basis(n)
    assert np.isfinite(np.asarray(t)).all() and np.isfinite(np.asarray(b)).all()
    np.testing.assert_allclose(np.asarray(dot(t, n)), 0.0, atol=1e-6)


def test_cosine_sampling_above_surface():
    n = _normals(4096)
    u1, u2 = _uniforms(4096)
    d, inv_pdf = sampling.sample_hemisphere_cosine(n, u1, u2)
    cos = np.asarray(dot(d, n))
    assert (cos > -1e-4).all()
    assert np.isfinite(np.asarray(inv_pdf)).all()


def test_cosine_sampling_mean_cos():
    # E[cos theta] = 2/3 for the cosine-weighted hemisphere
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (200000, 3))
    u1 = jax.random.uniform(jax.random.PRNGKey(3), (200000,))
    u2 = jax.random.uniform(jax.random.PRNGKey(4), (200000,))
    d, _ = sampling.sample_hemisphere_cosine(n, u1, u2)
    mean_cos = float(jnp.mean(d[:, 2]))
    assert abs(mean_cos - 2.0 / 3.0) < 0.01


def test_uniform_sampling_mean_cos():
    # E[cos theta] = 1/2 for the uniform hemisphere
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (200000, 3))
    u1 = jax.random.uniform(jax.random.PRNGKey(5), (200000,))
    u2 = jax.random.uniform(jax.random.PRNGKey(6), (200000,))
    d, inv_pdf = sampling.sample_hemisphere_uniform(n, u1, u2)
    assert abs(float(jnp.mean(d[:, 2])) - 0.5) < 0.01
    np.testing.assert_allclose(np.asarray(inv_pdf), 2 * np.pi, rtol=1e-6)


def test_uniform_sampling_frame_invariance():
    # the marginal cos distribution must not depend on the normal direction
    n = normalize(jnp.broadcast_to(jnp.array([1.0, 2.0, -0.5]), (200000, 3)))
    u1 = jax.random.uniform(jax.random.PRNGKey(7), (200000,))
    u2 = jax.random.uniform(jax.random.PRNGKey(8), (200000,))
    d, _ = sampling.sample_hemisphere_uniform(n, u1, u2)
    cos = np.asarray(dot(d, n))
    assert (cos > -1e-4).all()
    assert abs(cos.mean() - 0.5) < 0.01


def test_glass_passthrough():
    d_in = normalize(jnp.array([[0.3, -0.7, 0.1]]))
    d, inv_pdf = sampling.sample_glass(d_in)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_in))
    assert float(inv_pdf[0]) == 1.0


def test_lambert_furnace():
    # integral of BRDF * cos over the hemisphere == albedo; with the
    # estimator's cosine importance sampling each sample's weight is
    # exactly the albedo.
    color = jnp.array([[0.25, 0.5, 0.75]])
    val = bsdf.eval_lambert(color)
    np.testing.assert_allclose(np.asarray(val), np.asarray(color) / np.pi, rtol=1e-6)


def test_ggx_energy_reasonable():
    n = jnp.array([[0.0, 0.0, 1.0]])
    v = normalize(jnp.array([[0.0, 0.5, 1.0]]))
    l = normalize(jnp.array([[0.0, -0.5, 1.0]]))
    f = bsdf.eval_ggx(jnp.array([[1.0, 1.0, 1.0]]), jnp.array([0.5]), v, l, n)
    f = np.asarray(f)
    assert np.isfinite(f).all() and (f >= 0).all()


def test_sample_bounce_lobe_selection():
    n_lanes = 4
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n_lanes, 3))
    in_dir = jnp.broadcast_to(normalize(jnp.array([0.0, 0.7, -0.7])), (n_lanes, 3))
    mtype = jnp.array([bsdf.EMISSIVE, bsdf.DIFFUSE, bsdf.GLOSSY, bsdf.GLASS])
    color = jnp.ones((n_lanes, 3)) * 0.5
    rough = jnp.full((n_lanes,), 0.3)
    u1 = jnp.full((n_lanes,), 0.4)
    u2 = jnp.full((n_lanes,), 0.6)
    d, factor = bsdf.sample_bounce(mtype, color, rough, in_dir, n, u1, u2)
    d = np.asarray(d)
    factor = np.asarray(factor)
    # glass lane continues straight
    np.testing.assert_allclose(d[3], np.asarray(in_dir)[3], atol=1e-6)
    # glass factor is the pure tint
    np.testing.assert_allclose(factor[3], 0.5, atol=1e-6)
    # diffuse factor is exactly the albedo (cosine importance sampling
    # cancels the cos/pi, Raytracing.cl:64-66 + MathLib.cl:337)
    np.testing.assert_allclose(factor[1], 0.5, rtol=1e-4)
    assert np.isfinite(factor).all()


def test_sample_bounce_direction_detached():
    # directions are stop_gradient'd: d(dir)/d(color) == 0 by construction
    def f(color_scalar):
        color = jnp.full((1, 3), color_scalar)
        n = jnp.array([[0.0, 0.0, 1.0]])
        d_in = normalize(jnp.array([[0.1, 0.8, -0.6]]))
        d, factor = bsdf.sample_bounce(
            jnp.array([bsdf.DIFFUSE]), color, jnp.array([0.2]), d_in, n,
            jnp.array([0.3]), jnp.array([0.9]),
        )
        return jnp.sum(d)

    g = jax.grad(f)(jnp.float32(0.5))
    assert float(g) == 0.0
