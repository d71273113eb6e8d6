"""Unit tests for ops/geometry.py against analytic cases."""

import jax.numpy as jnp
import numpy as np

from ensem3a_openclraytracer_tpu.ops import geometry as g


def test_normalize_unit_length(rng):
    v = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    n = g.normalize(v)
    np.testing.assert_allclose(np.asarray(g.norm(n)), 1.0, atol=1e-5)


def test_rotate_axis_angle_quarter_turn():
    v = jnp.array([[1.0, 0.0, 0.0]])
    out = g.rotate_axis_angle(v, jnp.array([0.0, 0.0, 1.0]), jnp.array([np.pi / 2]))
    np.testing.assert_allclose(np.asarray(out), [[0.0, 1.0, 0.0]], atol=1e-6)


def test_euler_matrix_order_x_then_y_then_z():
    # rotating +x by 90 deg about z gives +y regardless of x-rotation first
    m = g.euler_xyz_matrix(jnp.array([90.0, 0.0, 90.0]))
    out = m @ jnp.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(out), [0.0, 1.0, 0.0], atol=1e-6)
    # and a vector on the x-rotation axis is affected only by later stages
    m2 = g.euler_xyz_matrix(jnp.array([45.0, 0.0, 0.0]))
    out2 = m2 @ jnp.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(out2), [1.0, 0.0, 0.0], atol=1e-6)


def test_euler_matches_axis_angle_composition(rng):
    angles = jnp.asarray(rng.uniform(-180, 180, size=3), jnp.float32)
    v = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    got = g.rotate_euler_xyz_deg(v, angles)
    step = g.rotate_axis_angle(v, jnp.array([1.0, 0, 0]), jnp.full((8,), angles[0] * np.pi / 180))
    step = g.rotate_axis_angle(step, jnp.array([0.0, 1, 0]), jnp.full((8,), angles[1] * np.pi / 180))
    step = g.rotate_axis_angle(step, jnp.array([0.0, 0, 1]), jnp.full((8,), angles[2] * np.pi / 180))
    np.testing.assert_allclose(np.asarray(got), np.asarray(step), atol=1e-4)


class TestMollerTrumbore:
    v0 = jnp.array([0.0, 0.0, 0.0])
    v1 = jnp.array([1.0, 0.0, 0.0])
    v2 = jnp.array([0.0, 1.0, 0.0])

    def _shoot(self, o, d):
        t, u, v, hit = g.moller_trumbore(
            jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32), self.v0, self.v1, self.v2
        )
        return float(t), float(u), float(v), bool(hit)

    def test_center_hit(self):
        t, u, v, hit = self._shoot([0.25, 0.25, 1.0], [0.0, 0.0, -1.0])
        assert hit and abs(t - 1.0) < 1e-6
        assert abs(u - 0.25) < 1e-6 and abs(v - 0.25) < 1e-6

    def test_backface_hit(self):
        # reference intersects both faces (no culling)
        _, _, _, hit = self._shoot([0.25, 0.25, -1.0], [0.0, 0.0, 1.0])
        assert hit

    def test_outside_miss(self):
        _, _, _, hit = self._shoot([2.0, 2.0, 1.0], [0.0, 0.0, -1.0])
        assert not hit

    def test_behind_origin_miss(self):
        _, _, _, hit = self._shoot([0.25, 0.25, -1.0], [0.0, 0.0, -1.0])
        assert not hit

    def test_parallel_miss(self):
        _, _, _, hit = self._shoot([0.25, 0.25, 1.0], [1.0, 0.0, 0.0])
        assert not hit

    def test_batched_broadcast(self, rng):
        o = jnp.asarray(rng.uniform(0.05, 0.28, size=(16, 3)), jnp.float32)
        o = o.at[:, 2].set(1.0)
        d = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (16, 3))
        t, _, _, hit = g.moller_trumbore(o, d, self.v0, self.v1, self.v2)
        assert bool(jnp.all(hit))
        np.testing.assert_allclose(np.asarray(t), 1.0, atol=1e-5)


class TestRayAABB:
    bmin = jnp.array([-1.0, -1.0, -1.0])
    bmax = jnp.array([1.0, 1.0, 1.0])

    def test_straight_hit(self):
        tmin, tmax = g.ray_aabb(
            jnp.array([0.0, 0.0, 5.0]), jnp.array([0.0, 0.0, -1.0]), self.bmin, self.bmax
        )
        assert float(tmin) == 4.0 and float(tmax) == 6.0

    def test_miss(self):
        assert not bool(
            g.aabb_hit(jnp.array([0.0, 5.0, 5.0]), jnp.array([0.0, 0.0, -1.0]), self.bmin, self.bmax)
        )

    def test_behind_ray_rejected(self):
        # the reference's slab test counts boxes fully behind the origin
        # (MathLib.cl:188); ours culls them - hits are unaffected since
        # triangle t must be > 0 anyway.
        assert not bool(
            g.aabb_hit(jnp.array([0.0, 0.0, 5.0]), jnp.array([0.0, 0.0, 1.0]), self.bmin, self.bmax)
        )

    def test_origin_inside(self):
        assert bool(
            g.aabb_hit(jnp.array([0.0, 0.0, 0.0]), jnp.array([0.0, 0.0, 1.0]), self.bmin, self.bmax)
        )

    def test_axis_aligned_ray_on_face_no_nan(self):
        # origin exactly on a slab plane with zero direction component
        tmin, tmax = g.ray_aabb(
            jnp.array([1.0, 0.0, 5.0]), jnp.array([0.0, 0.0, -1.0]), self.bmin, self.bmax
        )
        assert np.isfinite(float(tmin)) and np.isfinite(float(tmax))


def test_triangle_area():
    a = g.triangle_area(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([2.0, 0.0, 0.0]), jnp.array([0.0, 2.0, 0.0])
    )
    assert abs(float(a) - 2.0) < 1e-6


def test_sample_point_in_triangle_inside(rng):
    u = jnp.asarray(rng.uniform(size=(64,)), jnp.float32)
    v = jnp.asarray(rng.uniform(size=(64,)), jnp.float32)
    p = g.sample_point_in_triangle(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]), u, v
    )
    p = np.asarray(p)
    assert (p[:, 0] >= -1e-6).all() and (p[:, 1] >= -1e-6).all()
    assert (p[:, 0] + p[:, 1] <= 1 + 1e-5).all()
    assert np.allclose(p[:, 2], 0.0)
