"""Wide-BVH traversal vs the threaded-BVH oracle and brute force.

The threaded traversal (ops/traverse.py) is itself oracle-tested against
brute-force intersection in test_traverse.py; here the 8-wide row BVH
(ops/wide_bvh.py + ops/traverse_wide.py) must agree with it on closest hits,
shadow queries, normals, and light-primitive exclusion.

Includes a regression guard for the denormal-metadata bug: integer lanes in
wide rows must be stored as exact float VALUES, never bitcast patterns —
XLA CPU (DAZ/FTZ) and TPU hardware flush float32 denormals to zero.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from buas_pathtracer_tpu.core import vec
from buas_pathtracer_tpu.core.vec import Vec3
from buas_pathtracer_tpu.models.scene import Scene
from buas_pathtracer_tpu.ops import traverse, traverse_wide
from buas_pathtracer_tpu.utils.procgen import icosphere


def build_scene():
    sc = Scene(name="wide-test")
    m = sc.add_diffuse_material((0.7, 0.7, 0.7), 1.0)
    li = sc.add_emissive_material((20, 20, 20))
    sc.add_mesh(m, icosphere(subdivisions=2), vec.translate([0, 0, 2]))
    sc.add_mesh(m, icosphere(subdivisions=1),
                vec.translate([1.5, 0, 3]) * vec.scale(0.7))
    sc.add_sphere(li, 0.4, vec.translate([0, 2, 0]))
    sc.add_box(m, (0.5, 0.2, 0.5),
               vec.translate([-1.5, 0, 2.5]) * vec.rotate_y(0.5))
    sc.add_plane(m, (0, 1, 0), -1.0)
    return sc


@pytest.fixture(scope="module")
def packed():
    return build_scene().pack()


@pytest.fixture(scope="module")
def rays():
    rng = np.random.default_rng(0)
    n = 2048
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (Vec3(*[jnp.asarray(o[:, i]) for i in range(3)]),
            Vec3(*[jnp.asarray(d[:, i]) for i in range(3)]))


def test_int_lanes_are_not_denormal(packed):
    """Metadata lanes must be exact float values (safe under FTZ), and decode
    back to sane integers."""
    rows = np.asarray(packed.wide_rows)
    kinds = rows[:, 0]
    assert np.all(kinds == np.round(kinds))
    assert kinds.max() <= 3
    # no denormal bit patterns anywhere in metadata lanes of typed rows
    for r in rows:
        k = int(r[0])
        meta = r[1:4] if k in (1, 2) else r[1:2]
        nonzero = meta[meta != 0]
        if len(nonzero):
            assert np.abs(nonzero).min() >= 1.0  # integers, not denormals


def test_wide_matches_threaded_closest_hit(packed, rays):
    o, d = rays
    hw = jax.jit(lambda o, d: traverse_wide.intersect_scene(packed, o, d))(o, d)
    ht = jax.jit(lambda o, d: traverse.intersect_scene_threaded(packed, o, d))(o, d)
    id_w = np.asarray(hw.hit_id)
    id_t = np.asarray(ht.hit_id)
    agree = id_w == id_t
    # identical scenes, identical kernels: tiny AABB-epsilon tie-breaks only
    assert agree.mean() > 0.999, f"hit ids agree {agree.mean()}"
    m = agree & (id_w >= 0)
    np.testing.assert_allclose(np.asarray(hw.t)[m], np.asarray(ht.t)[m],
                               rtol=1e-4, atol=1e-4)
    for c_w, c_t in zip(hw.n, ht.n):
        np.testing.assert_allclose(np.asarray(c_w)[m], np.asarray(c_t)[m],
                                   rtol=1e-2, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(hw.mat_id)[m],
                                  np.asarray(ht.mat_id)[m])


def test_wide_matches_threaded_shadow(packed, rays):
    o, d = rays
    n = o.x.shape[0]
    mt = jnp.full((n,), 4.0)
    ig = jnp.full((n,), -1, jnp.int32)
    s_w = jax.jit(lambda o, d: traverse_wide.intersect_shadow_ray(
        packed, o, d, mt, ig))(o, d)
    s_t = jax.jit(lambda o, d: traverse.intersect_shadow_ray_threaded(
        packed, o, d, mt, ig))(o, d)
    assert (np.asarray(s_w) == np.asarray(s_t)).mean() > 0.999


def test_light_exclusion(packed, rays):
    """Shadow rays aimed at the light with the light excluded must not report
    occlusion by the light itself (intersection.cpp:416,468-470)."""
    n = 256
    # rays from origin-ish toward the light sphere at (0,2,0)
    o = Vec3(jnp.zeros(n), jnp.zeros(n), jnp.full((n,), -0.5))
    to_light = np.array([0, 2, 0.5])
    to_light = to_light / np.linalg.norm(to_light)
    d = Vec3(jnp.full((n,), to_light[0]), jnp.full((n,), to_light[1]),
             jnp.full((n,), to_light[2]))
    mt = jnp.full((n,), 10.0)
    light_prim = jnp.full((n,), 2, jnp.int32)  # prim 2 = the light sphere
    occ = traverse_wide.intersect_shadow_ray(packed, o, d, mt, light_prim)
    assert not bool(np.asarray(occ).any())


def test_chunked_equals_unchunked(packed, rays, monkeypatch):
    o, d = rays
    h1 = jax.jit(lambda o, d: traverse_wide.intersect_scene(packed, o, d))(o, d)
    monkeypatch.setattr(traverse_wide, "CHUNK", 512)  # forces 4 chunks
    h2 = jax.jit(lambda o, d: traverse_wide.intersect_scene(packed, o, d))(o, d)
    np.testing.assert_array_equal(np.asarray(h1.hit_id), np.asarray(h2.hit_id))
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t))


def test_nonuniform_scale_instances():
    """Pre-transformed world triangles must respect non-uniform scales."""
    sc = Scene(name="scale")
    m = sc.add_diffuse_material((0.5, 0.5, 0.5), 1.0)
    tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    from buas_pathtracer_tpu.models.mesh import Mesh
    sc.add_mesh(m, Mesh(triangles=tri),
                vec.translate([0, 0, 5]) * vec.scale((2.0, 3.0, 1.0)))
    ps = sc.pack()
    # hit inside the scaled triangle: world vertices (0,0,5),(2,0,5),(0,3,5)
    o = Vec3(jnp.array([0.5]), jnp.array([0.5]), jnp.array([0.0]))
    d = Vec3(jnp.array([0.0]), jnp.array([0.0]), jnp.array([1.0]))
    h = traverse_wide.intersect_scene(ps, o, d)
    assert int(h.hit_id[0]) == 0
    np.testing.assert_allclose(float(h.t[0]), 5.0, atol=1e-3)
    # miss outside the unscaled-but-inside-scaled region check (x=1.5 < 2)
    o2 = Vec3(jnp.array([1.5]), jnp.array([0.2]), jnp.array([0.0]))
    h2 = traverse_wide.intersect_scene(ps, o2, d)
    assert int(h2.hit_id[0]) == 0


def test_coincident_tlas_leaf_keeps_all_prims():
    """Concentric spheres have coincident TLAS centroids, so the binary
    builder emits a multi-item leaf even at leaf size 1; the wide collapse
    must expand ALL its items (round-1 silently dropped all but the first —
    the 'Week 5' nested-dielectric inner boundary vanished)."""
    from buas_pathtracer_tpu.ops import wide_bvh
    sc = Scene(name="concentric")
    g = sc.add_translucent_material((0.1, 0.1, 0.1), 1.5)
    radii = (1.0, 0.7, 0.4)
    ids = [sc.add_sphere(g, r, vec.translate([0, 0, 2])) for r in radii]
    ps = sc.pack()
    rows = np.asarray(ps.wide_rows)
    prim_rows = rows[rows[:, 0] == wide_bvh.KIND_PRIM]
    packed_ids = set(np.round(prim_rows[:, 1]).astype(int).tolist())
    assert set(ids) <= packed_ids, f"dropped prims: {set(ids) - packed_ids}"
    # a ray down +z hits the OUTER boundary first at t = 2 - 1 = 1
    o = Vec3(jnp.array([0.0]), jnp.array([0.0]), jnp.array([0.0]))
    d = Vec3(jnp.array([0.0]), jnp.array([0.0]), jnp.array([1.0]))
    h = traverse_wide.intersect_scene(ps, o, d)
    assert int(h.hit_id[0]) == ids[0]
    np.testing.assert_allclose(float(h.t[0]), 1.0, atol=1e-3)
    # from inside the innermost sphere, the nearest boundary is r=0.4
    o2 = Vec3(jnp.array([0.0]), jnp.array([0.0]), jnp.array([2.0]))
    h2 = traverse_wide.intersect_scene(ps, o2, d)
    assert int(h2.hit_id[0]) == ids[2]
    np.testing.assert_allclose(float(h2.t[0]), 0.4, atol=1e-3)


def test_coincident_triangles_all_packed():
    """Coincident-centroid triangles exceed any leaf bound unless the builder
    forces a median split; every triangle must land in some wide leaf row and
    no row may exceed WIDE_LEAF (round-1: native fill_leaf overflowed the
    row — heap corruption — and Python fill_terminal crashed)."""
    from buas_pathtracer_tpu.models.mesh import Mesh
    from buas_pathtracer_tpu.ops import wide_bvh
    tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    tris = np.repeat(tri, 9, axis=0)  # 9 identical AABBs
    sc = Scene(name="coincident-tris")
    m = sc.add_diffuse_material((0.5, 0.5, 0.5), 1.0)
    sc.add_mesh(m, Mesh(triangles=tris), vec.translate([0, 0, 3]))
    ps = sc.pack()
    rows = np.asarray(ps.wide_rows)
    tri_rows = rows[rows[:, 0] == wide_bvh.KIND_TRIS]
    counts = np.round(tri_rows[:, 1]).astype(int)
    assert counts.max() <= wide_bvh.WIDE_LEAF
    assert counts.sum() == 9, f"triangles in leaves: {counts.sum()} != 9"


def test_builder_leaf_size_invariant():
    """All build methods (numpy midpoint/sah/binned AND the native binned
    path) must respect max_leaf_size even for fully degenerate inputs."""
    from buas_pathtracer_tpu.ops import bvh as bvh_mod
    lo = np.zeros((13, 3), np.float32)
    hi = np.ones((13, 3), np.float32)
    for method in ("midpoint", "sah", "sah_binned"):
        b = bvh_mod.build_bvh(lo, hi, method, 6)
        leaves = b.count[b.count > 0]
        assert leaves.max() <= 6, f"{method}: leaf of {leaves.max()}"
        assert sorted(b.order.tolist()) == list(range(13))
        # internal consistency: leaf ranges tile [0, 13)
        total = int(leaves.sum())
        assert total == 13
