"""Geometry kernel tests with hand-computed expectations (the reference's
pattern: UnitTests/main.cpp:697-787 re-derives plane/sphere hits)."""

import numpy as np
import jax.numpy as jnp

from buas_pathtracer_tpu.core.vec import Vec3, v3
from buas_pathtracer_tpu.ops import intersect

BIG = jnp.asarray(np.float32(3.4e38))


def _v(x, y, z):
    return Vec3(jnp.float32(x), jnp.float32(y), jnp.float32(z))


def test_plane_hit_and_parallel():
    o = _v(0.0, 4.0, 0.0)
    d = _v(0.0, -1.0, 0.0)
    hit, t = intersect.plane(o, d, _v(0, 1, 0), jnp.float32(0.0), BIG)
    assert bool(hit) and abs(float(t) - 4.0) < 1e-5

    # parallel ray: no hit
    hit, t = intersect.plane(o, _v(1, 0, 0), _v(0, 1, 0), jnp.float32(0.0), BIG)
    assert not bool(hit)

    # back-facing (denom > 0): reference rejects
    hit, _ = intersect.plane(_v(0, -4, 0), _v(0, 1, 0), _v(0, 1, 0), jnp.float32(0.0), BIG)
    assert not bool(hit)


def test_sphere_near_far_tangent():
    # ray at origin-centered unit sphere from z=-5 looking +z: t = 4
    o = _v(0, 0, -5)
    d = _v(0, 0, 1)
    hit, t = intersect.sphere(o, d, jnp.float32(1.0), BIG)
    assert bool(hit) and abs(float(t) - 4.0) < 1e-5

    # inside the sphere: far root
    hit, t = intersect.sphere(_v(0, 0, 0), d, jnp.float32(1.0), BIG)
    assert bool(hit) and abs(float(t) - 1.0) < 1e-5

    # miss
    hit, _ = intersect.sphere(_v(0, 3, -5), d, jnp.float32(1.0), BIG)
    assert not bool(hit)

    # behind
    hit, _ = intersect.sphere(_v(0, 0, 5), d, jnp.float32(1.0), BIG)
    assert not bool(hit)


def test_box_slab():
    o = _v(0, 0, -5)
    d = _v(0, 0, 1)
    hit, t = intersect.box(o, d, _v(1, 2, 3), BIG)
    assert bool(hit) and abs(float(t) - 2.0) < 1e-5
    hit, _ = intersect.box(_v(0, 5, -5), d, _v(1, 2, 3), BIG)
    assert not bool(hit)


def test_aabb_boolean():
    o = _v(0, 0, -5)
    inv_d = intersect.safe_inv_dir(_v(0.0, 0.0, 1.0))
    assert bool(intersect.aabb(o, inv_d, _v(0, 0, 0), _v(1, 1, 1), BIG))
    assert not bool(intersect.aabb(o, inv_d, _v(0, 0, 0), _v(1, 1, 1), jnp.float32(1.0)))
    assert bool(
        intersect.aabb_minmax(o, inv_d, _v(-1, -1, -1), _v(1, 1, 1), BIG)
    )


def test_triangle_moller_trumbore():
    a, b, c = _v(-1, -1, 0), _v(1, -1, 0), _v(0, 1, 0)
    o = _v(0, -0.2, -3)
    d = _v(0, 0, 1)
    hit, t, u, v, w = intersect.triangle(o, d, a, b, c, BIG)
    assert bool(hit) and abs(float(t) - 3.0) < 1e-5
    assert abs(float(u + v + w) - 1.0) < 1e-5

    # outside the triangle
    hit, *_ = intersect.triangle(_v(2, 2, -3), d, a, b, c, BIG)
    assert not bool(hit)

    # parallel to the plane (det ~ 0)
    hit, *_ = intersect.triangle(_v(0, 0, -3), _v(1, 0, 0), a, b, c, BIG)
    assert not bool(hit)

    # barycentrics at a known point: hit at (0,-1+eps)?  use centroid ray
    o2 = _v(0.0, -1.0 / 3.0, -1)
    hit, t, u, v, w = intersect.triangle(o2, d, a, b, c, BIG)
    assert bool(hit)
    np.testing.assert_allclose([float(u), float(v), float(w)], [1 / 3] * 3, atol=1e-5)


def test_batched_broadcast():
    # one ray vs many spheres
    o = Vec3(jnp.zeros(4), jnp.zeros(4), jnp.full(4, -5.0))
    d = Vec3(jnp.zeros(4), jnp.zeros(4), jnp.ones(4))
    r = jnp.array([1.0, 2.0, 0.5, 0.0])
    hit, t = intersect.sphere(o, d, r, jnp.full(4, 3.4e38))
    # r=0 degenerates to a tangent hit at the center (discr==0), same as the
    # reference's quadratic.
    np.testing.assert_array_equal(np.asarray(hit), [True, True, True, True])
    np.testing.assert_allclose(np.asarray(t), [4.0, 3.0, 4.5, 5.0], rtol=1e-5)
