"""Scene traversal oracle tests (threaded BVH vs analytic expectations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from buas_pathtracer_tpu.core import vec
from buas_pathtracer_tpu.core.vec import Vec3
from buas_pathtracer_tpu.models.mesh import Mesh
from buas_pathtracer_tpu.models.scene import Scene
from buas_pathtracer_tpu.core.jitfix import safe_jit
from buas_pathtracer_tpu.ops import traverse


@pytest.fixture(scope="module")
def packed():
    sc = Scene(name="t")
    white = sc.add_diffuse_material((0.8, 0.8, 0.8), ior=1.5)
    sc.add_plane(white, (0, 1, 0), 0.0)
    sc.add_sphere(white, 1.0, vec.translate([0, 1, 0]))
    sc.add_box(white, (0.5, 0.5, 0.5), vec.translate([3, 0.5, 0]))
    tris = np.array([
        [[-1, 0, 2], [1, 0, 2], [1, 2, 2]],
        [[-1, 0, 2], [1, 2, 2], [-1, 2, 2]],
    ], np.float32)
    sc.add_mesh(white, Mesh(tris), vec.translate([-3, 0, 0]))
    # scaled sphere instance: sphere r=1 scaled x2 at (12, 1, 0)
    sc.add_sphere(white, 1.0, vec.translate([12, 1, 0]) * vec.scale(2.0))
    return sc.pack()


@pytest.fixture(scope="module")
def isect(packed):
    # safe_jit: jax 0.9.0 sporadically loses captured-constant
    # bookkeeping with a warm dispatch cache (core/jitfix.py)
    return safe_jit(lambda o, d: traverse.intersect_scene(packed, o, d))


def _rays(origins, dirs):
    o = np.asarray(origins, np.float32).T
    d = np.asarray(dirs, np.float32).T
    return (Vec3(jnp.asarray(o[0]), jnp.asarray(o[1]), jnp.asarray(o[2])),
            Vec3(jnp.asarray(d[0]), jnp.asarray(d[1]), jnp.asarray(d[2])))


def test_hits_each_primitive_kind(packed, isect):
    o, d = _rays(
        [[0, 0.8, -5], [3, 0.8, -5], [-3, 1.0, -5], [99, 99, -5]],
        [[0, 0, 1]] * 4,
    )
    hit = isect(o, d)
    t = np.asarray(hit.t)
    np.testing.assert_allclose(t[0], 5 - np.sqrt(1 - 0.04), rtol=1e-5)  # sphere
    np.testing.assert_allclose(t[1], 4.5, rtol=1e-5)  # box front face
    np.testing.assert_allclose(t[2], 7.0, rtol=1e-5)  # mesh quad at z=2
    assert hit.hit_id[3] == -1  # miss

    n = np.asarray(hit.n.stack(0))
    np.testing.assert_allclose(n[:, 1], [0, 0, -1], atol=1e-5)  # box -z face


def test_plane_hit_and_normal(packed, isect):
    o, d = _rays([[9, 3, 0]], [[0, -1, 0]])
    hit = isect(o, d)
    np.testing.assert_allclose(float(hit.t[0]), 3.0, rtol=1e-6)
    assert int(hit.hit_id[0]) == int(packed.prim_type.shape[0])  # plane 0
    np.testing.assert_allclose(
        [float(hit.n.x[0]), float(hit.n.y[0]), float(hit.n.z[0])],
        [0, 1, 0], atol=1e-6)


def test_scaled_instance_world_t(packed, isect):
    # sphere r=1 with scale(2) at (12,1,0): world radius 2, front at z=-2
    o, d = _rays([[12, 1, -6]], [[0, 0, 1]])
    hit = isect(o, d)
    np.testing.assert_allclose(float(hit.t[0]), 4.0, rtol=1e-4)
    # world normal at front point = -z
    np.testing.assert_allclose(
        [float(hit.n.x[0]), float(hit.n.y[0]), float(hit.n.z[0])],
        [0, 0, -1], atol=1e-4)


def test_shadow_ray_exclusion(packed):
    f = safe_jit(lambda o, d, mt, ig: traverse.intersect_shadow_ray(packed, o, d, mt, ig))
    o = Vec3(jnp.array([0.0]), jnp.array([0.001]), jnp.array([0.0]))
    d = Vec3(jnp.array([0.0]), jnp.array([1.0]), jnp.array([0.0]))
    assert bool(f(o, d, jnp.array([10.0]), jnp.array([-1]))[0])
    assert not bool(f(o, d, jnp.array([10.0]), jnp.array([0]))[0])
    # max_t shorter than the occluder -> unoccluded
    assert not bool(f(o, d, jnp.array([0.001]), jnp.array([-1]))[0])


def test_brute_force_oracle(packed, isect, nprng):
    """Random rays: BVH result must equal brute-force min over primitives."""
    n = 128
    o_np = nprng.randn(3, n).astype(np.float32) * 3 + np.array([[0], [2], [-4]], np.float32)
    d_np = nprng.randn(3, n).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=0, keepdims=True)
    o = Vec3(*(jnp.asarray(c) for c in o_np))
    d = Vec3(*(jnp.asarray(c) for c in d_np))
    hit = isect(o, d)

    # brute force in numpy over the same packed arrays
    def brute(o_np, d_np):
        import numpy as np
        K = int(np.asarray(packed.prim_type).shape[0])
        best_t = np.full(n, 3.0e38, np.float32)
        best_id = np.full(n, -1, np.int64)
        # planes
        pn = np.stack([np.asarray(packed.plane_n.x), np.asarray(packed.plane_n.y),
                       np.asarray(packed.plane_n.z)], 1)
        pd = np.asarray(packed.plane_d)
        for p in range(len(pd)):
            denom = pn[p] @ d_np
            tt = (pd[p] - pn[p] @ o_np) / np.where(denom == 0, -1.0, denom)
            ok = (denom < -1e-3) & (tt >= 1e-3) & (tt < best_t)
            best_t = np.where(ok, tt, best_t)
            best_id = np.where(ok, K + p, best_id)
        inv = np.asarray(packed.prim_inv).reshape(K, 3, 4)
        types = np.asarray(packed.prim_type)
        radii = np.asarray(packed.prim_r)
        boxr = np.stack([np.asarray(packed.prim_box_r.x),
                         np.asarray(packed.prim_box_r.y),
                         np.asarray(packed.prim_box_r.z)], 1)
        ta = np.stack([np.asarray(packed.tri_a.x), np.asarray(packed.tri_a.y), np.asarray(packed.tri_a.z)], 1)
        tb = np.stack([np.asarray(packed.tri_b.x), np.asarray(packed.tri_b.y), np.asarray(packed.tri_b.z)], 1)
        tc = np.stack([np.asarray(packed.tri_c.x), np.asarray(packed.tri_c.y), np.asarray(packed.tri_c.z)], 1)
        for k in range(K):
            oo = inv[k, :, :3] @ o_np + inv[k, :, 3:4]
            dd = inv[k, :, :3] @ d_np
            if types[k] == 2:  # sphere (general quadratic, see ops/intersect.py)
                a = np.sum(dd * dd, 0)
                b = np.sum(dd * oo, 0)
                c = np.sum(oo * oo, 0) - radii[k] ** 2
                disc = b * b - a * c
                root = np.sqrt(np.maximum(disc, 0))
                tn, tf = (-b - root) / a, (-b + root) / a
                tt = np.where(tn >= 0, tn, tf)
                ok = (disc >= 0) & (tt >= 1e-3) & (best_t > tt)
            elif types[k] == 3:  # box
                with np.errstate(divide="ignore", invalid="ignore"):
                    m = 1.0 / dd
                t1 = (-boxr[k][:, None] - oo) * m
                t2 = (boxr[k][:, None] - oo) * m
                tn = np.nanmax(np.minimum(t1, t2), 0)
                tf = np.nanmin(np.maximum(t1, t2), 0)
                tt = np.where(tn >= 0, tn, tf)
                ok = (tn < tf) & (best_t > tt) & (tt >= 1e-3)
            elif types[k] == 4:  # mesh: all triangles (shared object space)
                ok = np.zeros(n, bool)
                tt = np.full(n, 3.0e38, np.float32)
                for ti in range(len(ta)):
                    e1 = (tb[ti] - ta[ti])[:, None]
                    e2 = (tc[ti] - ta[ti])[:, None]
                    pv = np.cross(dd, e2, axis=0)
                    det = np.sum(e1 * pv, 0)
                    okt = np.abs(det) >= 1e-9
                    invd = 1.0 / np.where(okt, det, 1.0)
                    tv = oo - ta[ti][:, None]
                    v = np.sum(tv * pv, 0) * invd
                    qv = np.cross(tv, e1, axis=0)
                    w_ = np.sum(dd * qv, 0) * invd
                    t_ = np.sum(e2 * qv, 0) * invd
                    okt &= (v >= 0) & (v <= 1) & (w_ >= 0) & (v + w_ <= 1) & (t_ >= 1e-9)
                    upd = okt & (t_ < tt)
                    tt = np.where(upd, t_, tt)
                ok = (tt < best_t) & (tt < 3.0e37) & (tt >= 1e-9)
            else:
                continue
            best_t = np.where(ok, tt, best_t)
            best_id = np.where(ok, k, best_id)
        return best_t, best_id

    bt, bid = brute(o_np, d_np)
    ht = np.asarray(hit.t)
    hid = np.asarray(hit.hit_id)
    # t values agree everywhere a hit exists
    agree = np.isclose(ht, bt, rtol=2e-4, atol=2e-4)
    assert agree.mean() > 0.99, f"t mismatch on {np.where(~agree)[0][:10]}"
