"""Math oracle tests: Vec3/Affine validated against numpy (the reference
validates MathLib against glm the same way, UnitTests/main.cpp:112-695)."""

import numpy as np
import jax.numpy as jnp
import pytest

from buas_pathtracer_tpu.core import vec
from buas_pathtracer_tpu.core.vec import Vec3, v3


def _rand_vec(nprng, n=64):
    a = nprng.randn(3, n).astype(np.float32)
    return Vec3(jnp.asarray(a[0]), jnp.asarray(a[1]), jnp.asarray(a[2])), a


def test_basic_ops(nprng):
    va, a = _rand_vec(nprng)
    vb, b = _rand_vec(nprng)
    np.testing.assert_allclose((va + vb).stack(0), a + b, rtol=1e-6)
    np.testing.assert_allclose((va - vb).stack(0), a - b, rtol=1e-6)
    np.testing.assert_allclose((va * 2.5).stack(0), a * 2.5, rtol=1e-6)
    np.testing.assert_allclose((va * vb).stack(0), a * b, rtol=1e-6)
    np.testing.assert_allclose((-va).stack(0), -a, rtol=1e-6)
    np.testing.assert_allclose((1.0 / vb).stack(0), 1.0 / b, rtol=1e-5)


def test_dot_cross_length(nprng):
    va, a = _rand_vec(nprng)
    vb, b = _rand_vec(nprng)
    np.testing.assert_allclose(vec.dot(va, vb), np.sum(a * b, 0), rtol=1e-5)
    np.testing.assert_allclose(
        vec.cross(va, vb).stack(0), np.cross(a.T, b.T).T, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(vec.length(va), np.linalg.norm(a, axis=0), rtol=1e-5)


def test_normalize_noz(nprng):
    va, a = _rand_vec(nprng)
    n = np.asarray(vec.normalize(va).stack(0))
    np.testing.assert_allclose(np.linalg.norm(n, axis=0), 1.0, rtol=1e-5)
    # noz of zero / inf -> exactly zero (reference UnitTests main.cpp:213-233)
    bad = Vec3(jnp.array([0.0, np.inf, 1e30]), jnp.array([0.0, 0.0, 1e30]), jnp.array([0.0, 0.0, 1e30]))
    z = vec.noz(bad).stack(0)
    assert np.all(np.asarray(z[:, 0]) == 0.0)
    assert np.all(np.asarray(z[:, 1]) == 0.0)
    assert np.all(np.isfinite(np.asarray(z)))


def test_affine_compose_and_inverse(nprng):
    t = (
        vec.translate([1.0, 2.0, 3.0])
        @ vec.rotate_y(0.3)
        @ vec.rotate_x(-0.7)
        @ vec.scale([2.0, 3.0, 4.0])
    )
    # fwd @ inv == identity
    fi = vec._compose34(t.fwd, t.inv)
    np.testing.assert_allclose(fi[:, :3], np.eye(3), atol=1e-5)
    np.testing.assert_allclose(fi[:, 3], 0.0, atol=1e-5)

    # point transform matches 4x4 math
    p = nprng.randn(3, 8).astype(np.float32)
    vp = Vec3(jnp.asarray(p[0]), jnp.asarray(p[1]), jnp.asarray(p[2]))
    got = np.asarray(vec.transform_point(t.fwd, vp).stack(0))
    want = t.fwd[:, :3] @ p + t.fwd[:, 3:4]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # vector transform ignores translation
    gotv = np.asarray(vec.transform_vector(t.fwd, vp).stack(0))
    np.testing.assert_allclose(gotv, t.fwd[:, :3] @ p, rtol=1e-5, atol=1e-5)


def test_transform_normal_inverse_transpose():
    t = vec.scale([2.0, 1.0, 1.0])
    # normal of plane x=const under scale x2: inverse-transpose keeps it along x
    n = v3(jnp.array([1.0]), jnp.array([0.0]), jnp.array([0.0]))
    out = vec.transform_normal(t.inv, n)
    out = vec.normalize(out)
    np.testing.assert_allclose(np.asarray(out.x), 1.0, atol=1e-6)


def test_tangent_basis_orthonormal(nprng):
    va, _ = _rand_vec(nprng)
    n = vec.normalize(va)
    b1, b2 = vec.get_tangents(n)
    np.testing.assert_allclose(vec.dot(b1, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(vec.dot(b2, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(vec.dot(b1, b2), 0.0, atol=1e-5)
    np.testing.assert_allclose(vec.length(b1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(vec.length(b2), 1.0, rtol=1e-5)
