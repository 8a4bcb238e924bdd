"""Packet-traversal kernel parity: the Pallas block-coherent walk must find
the SAME hits as the XLA phased path (ops/traverse_wide) — same t, same
winning primitive/triangle, same barycentrics — for closest-hit and
occlusion queries, across primary-like and incoherent rays, live and dead
lanes.  Runs the kernel in interpret mode on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from buas_pathtracer_tpu.core import vec
from buas_pathtracer_tpu.core.vec import Vec3, normalize
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.models.scene import Scene, SceneSettings
from buas_pathtracer_tpu.ops import pallas_packet as pp
from buas_pathtracer_tpu.ops import traverse_wide as tw
from buas_pathtracer_tpu.utils.procgen import icosphere


@pytest.fixture(scope="module")
def scene():
    # 320-tri icospheres (subdiv 2), not 1280: interpret-mode kernel time
    # scales with walk length and this file dominated the fast suite's
    # wall clock (round-4 verdict item 8).  The structure the parity
    # tests exercise — two mesh-instance wide subtrees grafted into the
    # TLAS, analytic prims, multi-level internal descent, split tables
    # with merged leaves — is unchanged at this size.
    sc = Scene(name="packet-parity")
    grey = sc.add_diffuse_material((0.6, 0.6, 0.6), 1.2)
    red = sc.add_diffuse_material((0.8, 0.2, 0.2), 1.4)
    glass = sc.add_translucent_material((0.1, 0.05, 0.02), 1.5)
    mesh = icosphere(subdivisions=2)  # 320 tris
    sc.add_mesh(grey, mesh, vec.translate([0, 1.2, 2.5]))
    sc.add_mesh(red, mesh, vec.translate([-2.2, 1.0, 4.0]) * vec.scale(0.8))
    sc.add_sphere(glass, 0.9, vec.translate([2.0, 1.0, 3.0]))
    sc.add_box(grey, (8, 0.5, 8), vec.translate([0, -0.5, 3.0]))
    sc.camera = cm.aim_camera_at(
        cm.make_camera(p=(0, 2.0, -3.0), vfov=np.radians(55), aspect=1.0),
        (0, 1.0, 2.5))
    return sc


def _rays(sc, n, seed=0, incoherent=False, dead_frac=0.0):
    k = jax.random.PRNGKey(seed)
    if incoherent:
        px = jax.random.uniform(k, (n,)) * 4 - 2
        py = jax.random.uniform(jax.random.fold_in(k, 1), (n,)) * 3
        pz = jax.random.uniform(jax.random.fold_in(k, 2), (n,)) * 4
        g = jax.random.normal(jax.random.fold_in(k, 3), (3, n))
        o = Vec3(px, py, pz)
        d = normalize(Vec3(g[0], g[1], g[2]))
    else:
        side = int(np.sqrt(n))
        ys, xs = jnp.meshgrid(jnp.arange(side), jnp.arange(side),
                              indexing="ij")
        xs = jnp.pad(xs.reshape(-1), (0, n - side * side)).astype(jnp.float32)
        ys = jnp.pad(ys.reshape(-1), (0, n - side * side)).astype(jnp.float32)
        z = jnp.zeros((n,))
        pr = cm.generate_rays(sc.camera, xs, ys, side, side,
                              z + 0.5, z + 0.5, z, z, 0.0, 1.0, 6, 0.0, 0.0)
        o, d = pr.o, pr.d
    t0 = jnp.full((n,), tw.BIG_T)
    if dead_frac:
        dead = jax.random.uniform(jax.random.fold_in(k, 7), (n,)) < dead_frac
        t0 = jnp.where(dead, -1.0, t0)
    ign = jnp.full((n,), -1, jnp.int32)
    return o, d, t0, ign


def assert_tri_match(out, ref):
    """Winning-triangle parity, tolerant of exact t-TIES only: a ray that
    hits a shared mesh edge at bit-identical t may legitimately record
    either adjacent triangle depending on visit order (the kernels and the
    XLA oracle walk leaves in different orders).  Any tri mismatch must
    (a) agree exactly on t and on the winning prim, and (b) be rare —
    ties are measure-zero, so more than a handful means a real bug."""
    t_o, t_r = np.asarray(out[0]), np.asarray(ref[0])
    tri_o, tri_r = np.asarray(out[2]), np.asarray(ref[2])
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(ref[1]))
    diff = tri_o != tri_r
    if diff.any():
        assert diff.sum() <= max(2, tri_o.size // 1000), (
            f"{diff.sum()} tri mismatches of {tri_o.size}")
        np.testing.assert_array_equal(t_o[diff], t_r[diff])
        assert (tri_o[diff] >= 0).all() and (tri_r[diff] >= 0).all()


CASES = [
    dict(incoherent=False, dead_frac=0.0),
    dict(incoherent=True, dead_frac=0.0),
    dict(incoherent=True, dead_frac=0.6),
]


@pytest.fixture(params=["v2", "v1", "v2v"])
def kernel_version(request, monkeypatch):
    """All kernel generations stay parity-tested ("v2v" = the vector-stack
    v2 variant, BUAS_V2_VEC).  The version is a jit-static argument
    resolved from the env at trace time (pallas_packet.packet_traverse),
    so flipping the env per test is honored."""
    monkeypatch.setenv("BUAS_PACKET_V1",
                       "1" if request.param == "v1" else "0")
    monkeypatch.setenv("BUAS_V2_VEC",
                       "1" if request.param == "v2v" else "0")
    return request.param


@pytest.mark.parametrize("case", CASES)
def test_closest_hit_parity(scene, kernel_version, case):
    ps = scene.pack()
    n = 2048
    o, d, t0, ign = _rays(scene, n, **case)
    ref = tw._traverse(ps, o, d, t0, ign, occlusion=False)
    out = pp.packet_traverse(ps.wide_rows, o, d, t0, ign,
                             occlusion=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-5)
    assert_tri_match(out, ref)
    # barycentrics are only consumed for mesh hits (tri >= 0); lanes where
    # an analytic prim finally won may carry stale don't-care values whose
    # content depends on visit order
    mesh = np.asarray(ref[2]) >= 0
    np.testing.assert_allclose(np.asarray(out[3])[mesh],
                               np.asarray(ref[3])[mesh],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[4])[mesh],
                               np.asarray(ref[4])[mesh],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("case", CASES)
def test_occlusion_parity(scene, kernel_version, case):
    ps = scene.pack()
    n = 2048
    o, d, t0, ign = _rays(scene, n, seed=3, **case)
    # finite shadow-like max_t
    t0 = jnp.where(t0 > 0, 6.0, t0)
    ref = tw._traverse(ps, o, d, t0, ign, occlusion=True)
    out = pp.packet_traverse(ps.wide_rows, o, d, t0, ign,
                             occlusion=True, interpret=True)
    # occlusion contract: only prim>=0 matters
    np.testing.assert_array_equal(np.asarray(out[1]) >= 0,
                                  np.asarray(ref[1]) >= 0)


def test_dispatch_compacted_branch_parity(scene, monkeypatch):
    """traverse_dispatch's sparse path (Morton-compacted prefix) must agree
    with the XLA reference; shrink the compact capacity so a small batch
    exercises it in interpret mode."""
    monkeypatch.setattr(pp, "COMPACT_BLOCKS", 2)  # capacity 2048 rays
    ps = scene.pack()
    n = 8192
    o, d, t0, ign = _rays(scene, n, seed=9, incoherent=True, dead_frac=0.8)
    ref = tw._traverse(ps, o, d, t0, ign, occlusion=False)
    out = pp.traverse_dispatch(ps.wide_rows, ps.scene_lo, ps.scene_hi,
                               o, d, t0, ign, occlusion=False,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-5)
    assert_tri_match(out, ref)


@pytest.mark.parametrize("incoherent", [False, True])
def test_hybrid_route_parity(scene, monkeypatch, incoherent):
    """traverse_wide._traverse's closest-hit hybrid (lax.cond: coherent ->
    packet kernel, incoherent -> XLA phased) must agree with the plain XLA
    path on both branches.  The cond is opt-in (BUAS_INCOHERENT=xla; the
    in-frame measurement picked all-packet as default) but must stay
    correct.  Shrink COMPACT_BLOCKS so a small batch crosses the hybrid
    threshold in interpret mode."""
    monkeypatch.setattr(pp, "COMPACT_BLOCKS", 2)
    monkeypatch.setenv("BUAS_INCOHERENT", "xla")
    monkeypatch.setenv("BUAS_TRAVERSAL", "packet")
    monkeypatch.setenv("BUAS_PACKET_INTERPRET", "1")
    ps = scene.pack()
    n = 4096
    o, d, t0, ign = _rays(scene, n, seed=5, incoherent=incoherent)
    out = tw._traverse(ps, o, d, t0, ign, occlusion=False)
    monkeypatch.setenv("BUAS_TRAVERSAL", "wide")
    ref = tw._traverse(ps, o, d, t0, ign, occlusion=False)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-5)
    assert_tri_match(out, ref)


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("occlusion", [False, True])
def test_v4_leaf_dma_parity(scene, monkeypatch, case, occlusion):
    """The leaf-DMA kernel (v4: resident internal tree, HBM leaf rows
    streamed through the DMA ring) must find the same hits as the XLA
    phased path.  BUAS_V4=1 forces the pack-time table split so a small
    scene exercises it; interpret mode executes the DMA copies eagerly."""
    monkeypatch.setenv("BUAS_V4", "1")
    ps = scene.pack()
    assert ps.v4_res is not None and ps.v4_leaf is not None
    n = 2048
    o, d, t0, ign = _rays(scene, n, seed=21, **case)
    if occlusion:
        t0 = jnp.where(t0 > 0, 6.0, t0)
    ref = tw._traverse(ps, o, d, t0, ign, occlusion=occlusion)
    out = pp.packet_traverse(ps.wide_rows, o, d, t0, ign,
                             occlusion=occlusion, interpret=True,
                             v4_tables=(ps.v4_res, ps.v4_leaf))
    if occlusion:
        np.testing.assert_array_equal(np.asarray(out[1]) >= 0,
                                      np.asarray(ref[1]) >= 0)
        return
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-5)
    assert_tri_match(out, ref)
    mesh = np.asarray(ref[2]) >= 0
    np.testing.assert_allclose(np.asarray(out[3])[mesh],
                               np.asarray(ref[3])[mesh],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[4])[mesh],
                               np.asarray(ref[4])[mesh],
                               rtol=1e-4, atol=1e-5)


def test_v4_routing(scene, monkeypatch):
    """BUAS_TRAVERSAL=packet4 routes _traverse through the v4 kernel end to
    end (dispatch compaction included) and agrees with the XLA path."""
    monkeypatch.setenv("BUAS_V4", "1")
    monkeypatch.setenv("BUAS_TRAVERSAL", "packet4")
    monkeypatch.setenv("BUAS_PACKET_INTERPRET", "1")
    ps = scene.pack()
    n = 4096
    o, d, t0, ign = _rays(scene, n, seed=23, incoherent=True, dead_frac=0.3)
    out = tw._traverse(ps, o, d, t0, ign, occlusion=False)
    monkeypatch.setenv("BUAS_TRAVERSAL", "wide")
    ref = tw._traverse(ps, o, d, t0, ign, occlusion=False)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-5)
    assert_tri_match(out, ref)


def test_dispatch_natural_branch_parity(scene):
    """Dense wavefronts take the natural-order branch."""
    ps = scene.pack()
    n = 4096
    o, d, t0, ign = _rays(scene, n, seed=11, incoherent=False)
    ref = tw._traverse(ps, o, d, t0, ign, occlusion=False)
    out = pp.traverse_dispatch(ps.wide_rows, ps.scene_lo, ps.scene_hi,
                               o, d, t0, ign, occlusion=False,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(ref[1]))


def test_dispatch_occ_ladder_grouped_parity(scene, monkeypatch):
    """BUAS_OCC_LADDER_GROUPED=1 routes LADDER-compacted occlusion waves
    (BUAS_SHADOW_NATURAL=0) through the grouped kernel instead of the
    block-lockstep one: the light-major compact key makes most 16-lane
    groups light-uniform, which prof50 measured 1.5x faster on the real
    bounce-0 NEE wave.  Must satisfy the occlusion contract against the
    XLA phased oracle."""
    monkeypatch.setattr(pp, "COMPACT_BLOCKS", 2)
    monkeypatch.setenv("BUAS_SHADOW_NATURAL", "0")
    monkeypatch.setenv("BUAS_OCC_LADDER_GROUPED", "1")
    ps = scene.pack()
    n = 4096
    o, d, t0, ign = _rays(scene, n, seed=31, incoherent=True, dead_frac=0.4)
    t0 = jnp.where(t0 > 0, 6.0, t0)
    ref = tw._traverse(ps, o, d, t0, ign, occlusion=True)
    out = pp.traverse_dispatch(ps.wide_rows, ps.scene_lo, ps.scene_hi,
                               o, d, t0, ign, occlusion=True,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(out[1]) >= 0,
                                  np.asarray(ref[1]) >= 0)


@pytest.mark.parametrize("mode", ["0", "1", "2"])
def test_dispatch_shadow_natural_parity(scene, monkeypatch, mode):
    """BUAS_SHADOW_NATURAL routes occlusion waves: "0" = compaction
    ladder (the split-table default), "1" = natural order through the
    block-lockstep kernel (recorded dead-end), "2" = natural order
    through the grouped v6 kernel (independent 16-lane walks with
    per-group early exit; the resident-scene default).  All must satisfy
    the occlusion contract against the XLA phased oracle.  COMPACT_BLOCKS
    is shrunk so the batch crosses the small-wave threshold and reaches
    the knob."""
    monkeypatch.setattr(pp, "COMPACT_BLOCKS", 2)
    monkeypatch.setenv("BUAS_SHADOW_NATURAL", mode)
    # mode "0" must exercise the LOCKSTEP ladder here regardless of the
    # host environment; the grouped-ladder route has its own pinned test
    # above (ADVICE r4: don't depend on conftest's setdefault).
    monkeypatch.setenv("BUAS_OCC_LADDER_GROUPED", "0")
    ps = scene.pack()
    n = 4096
    o, d, t0, ign = _rays(scene, n, seed=31, incoherent=True, dead_frac=0.4)
    t0 = jnp.where(t0 > 0, 6.0, t0)
    ref = tw._traverse(ps, o, d, t0, ign, occlusion=True)
    out = pp.traverse_dispatch(ps.wide_rows, ps.scene_lo, ps.scene_hi,
                               o, d, t0, ign, occlusion=True,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(out[1]) >= 0,
                                  np.asarray(ref[1]) >= 0)


@pytest.mark.parametrize("occlusion", [False, True])
@pytest.mark.parametrize("groups,lpi", [(1, 2), (8, 1), (8, 4)])
@pytest.mark.parametrize("case", CASES[1:])  # incoherent +/- dead lanes
def test_v5_grouped_parity(scene, monkeypatch, groups, lpi, case, occlusion):
    """v5 grouped kind-uniform walks (per-group stacks + leaf queues,
    multi-leaf iterations) must agree with the XLA path for every
    (G, LPI) config, closest-hit and occlusion, including dead lanes and
    light exclusion.  Routing relies on the child-kind codes
    wide_bvh.annotate_child_kinds writes into row lanes 50..57."""
    monkeypatch.setenv("BUAS_PACKET_V5", "1")
    monkeypatch.setenv("BUAS_V5_VEC", "0")  # pin the scalar-state variant
    monkeypatch.setenv("BUAS_V5_LPI", str(lpi))
    ps = scene.pack()
    n = 4096
    o, d, t0, ign = _rays(scene, n, seed=31, **case)
    if occlusion:
        t0 = jnp.where(t0 > 0, 9.0, t0)
    ref = tw._traverse(ps, o, d, t0, ign, occlusion=occlusion)
    out = pp.packet_traverse(ps.wide_rows, o, d, t0, ign,
                             occlusion=occlusion, interpret=True,
                             groups=groups)
    if occlusion:
        np.testing.assert_array_equal(np.asarray(out[1]) >= 0,
                                      np.asarray(ref[1]) >= 0)
    else:
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                                   rtol=1e-5, atol=1e-5)
        assert_tri_match(out, ref)


@pytest.mark.parametrize("occlusion", [False, True])
@pytest.mark.parametrize("lpi,unroll,pair", [(1, 1, "1"), (4, 1, "1"),
                                             (8, 2, "1"), (8, 2, "0")])
@pytest.mark.parametrize("case", CASES[1:])  # incoherent +/- dead lanes
def test_v6_vector_state_parity(scene, monkeypatch, lpi, unroll, pair, case,
                                occlusion):
    """v6 = v5 with all per-group walk state vectorized into VMEM (vector
    stacks/queues, broadcast-uniform sps/lqs, masked-reduce pops, pure
    vector routing).  The iteration sequence is identical to v5 G=8 by
    construction, so results must match the XLA oracle exactly like v5's
    do.  ``pair`` pins both leaf-pop variants: packed-pair extracts (the
    default for even LPI on small tables) and the single-entry form."""
    monkeypatch.setenv("BUAS_PACKET_V5", "1")
    monkeypatch.setenv("BUAS_V5_VEC", "1")
    monkeypatch.setenv("BUAS_V5_LPI", str(lpi))
    monkeypatch.setenv("BUAS_V5_UNROLL", str(unroll))
    monkeypatch.setenv("BUAS_V5_PAIR", pair)
    ps = scene.pack()
    n = 4096
    o, d, t0, ign = _rays(scene, n, seed=47, **case)
    if occlusion:
        t0 = jnp.where(t0 > 0, 9.0, t0)
    ref = tw._traverse(ps, o, d, t0, ign, occlusion=occlusion)
    out = pp.packet_traverse(ps.wide_rows, o, d, t0, ign,
                             occlusion=occlusion, interpret=True,
                             groups=8)
    if occlusion:
        np.testing.assert_array_equal(np.asarray(out[1]) >= 0,
                                      np.asarray(ref[1]) >= 0)
    else:
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                                   rtol=1e-5, atol=1e-5)
        assert_tri_match(out, ref)


@pytest.mark.parametrize("occlusion", [False, True])
@pytest.mark.parametrize("lpi,unroll", [(1, 1), (4, 1), (8, 2)])
@pytest.mark.parametrize("case", CASES[1:])  # incoherent +/- dead lanes
def test_v7_grouped_leaf_dma_parity(scene, monkeypatch, lpi, unroll, case,
                                    occlusion):
    """v7 = the v6 vectorized grouped walk over the v4 SPLIT tables:
    resident internal tree + prims, triangle-leaf rows async-copied from
    HBM per queue pop.  Queue entries are the signed enc links (tri < 0,
    prim >= 0 — inverted vs the resident kernels) and child kinds come
    from the lane-58 packed bitfield, so this exercises every structural
    delta against the same XLA oracle."""
    monkeypatch.setenv("BUAS_V4", "1")
    monkeypatch.setenv("BUAS_PACKET_V7", "1")
    monkeypatch.setenv("BUAS_V5_LPI", str(lpi))
    monkeypatch.setenv("BUAS_V5_UNROLL", str(unroll))
    ps = scene.pack()
    assert ps.v4_res is not None and ps.v4_leaf is not None
    n = 4096
    o, d, t0, ign = _rays(scene, n, seed=53, **case)
    if occlusion:
        t0 = jnp.where(t0 > 0, 9.0, t0)
    ref = tw._traverse(ps, o, d, t0, ign, occlusion=occlusion)
    out = pp.packet_traverse(ps.wide_rows, o, d, t0, ign,
                             occlusion=occlusion, interpret=True,
                             v4_tables=(ps.v4_res, ps.v4_leaf), groups=8)
    if occlusion:
        np.testing.assert_array_equal(np.asarray(out[1]) >= 0,
                                      np.asarray(ref[1]) >= 0)
    else:
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                                   rtol=1e-5, atol=1e-5)
        assert_tri_match(out, ref)
        mesh = np.asarray(ref[2]) >= 0
        np.testing.assert_allclose(np.asarray(out[3])[mesh],
                                   np.asarray(ref[3])[mesh],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[4])[mesh],
                                   np.asarray(ref[4])[mesh],
                                   rtol=1e-4, atol=1e-5)


def test_shadow_natural_dispatch_parity(scene, monkeypatch):
    """BUAS_SHADOW_NATURAL=1 routes occlusion waves through the natural
    (zero-movement) branch; blockedness must match the XLA oracle."""
    monkeypatch.setenv("BUAS_SHADOW_NATURAL", "1")
    ps = scene.pack()
    n = 4096
    o, d, t0, ign = _rays(scene, n, seed=61, incoherent=True, dead_frac=0.4)
    t0 = jnp.where(t0 > 0, 7.0, t0)
    ref = tw._traverse(ps, o, d, t0, ign, occlusion=True)
    out = pp.traverse_dispatch(ps.wide_rows, ps.scene_lo, ps.scene_hi,
                               o, d, t0, ign, occlusion=True,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(out[1]) >= 0,
                                  np.asarray(ref[1]) >= 0)


def test_split_for_dma_leaf_merge_structure(scene):
    """Structural invariants of the dense DMA leaf merge
    (wide_bvh.split_for_dma): merged rows carry the exact multiset of
    leaf triangles with contiguous tri_base ranges and counts <= DMA_LEAF_K;
    every internal row's enc links and packed kind bits agree; merged-away
    child slots are EMPTY with a zero-volume AABB."""
    from buas_pathtracer_tpu.ops import wide_bvh as wb

    ps = scene.pack()
    rows = np.asarray(ps.wide_rows)
    res, leaf = wb.split_for_dma(rows)

    kind = rows[:, 0].astype(np.int64)
    orig_leaf = rows[kind == wb.KIND_TRIS]
    # triangle multiset (by (tri_base + k) global ids) is preserved exactly
    def tri_ids(table, leaf_k):
        ids = []
        for r in table:
            if int(r[0]) != wb.KIND_TRIS:
                continue
            c, b = int(r[1]), int(r[2])
            assert c <= leaf_k
            ids.extend(range(b, b + c))
        return sorted(ids)

    assert tri_ids(leaf, wb.DMA_LEAF_K) == tri_ids(orig_leaf, wb.WIDE_LEAF)

    # per-internal-row consistency: enc sign matches the packed kind bits,
    # EMPTY slots are zero-volume, tri data round-trips through the merge
    for r in res:
        if int(r[0]) != wb.KIND_INTERNAL:
            continue
        kb = int(r[58])
        for c in range(8):
            kd = (kb >> (2 * c)) & 3
            e = int(r[50 + c])
            if kd == wb.KIND_TRIS:
                assert e < 0
                lr = leaf[-e - 1]
                assert int(lr[0]) == wb.KIND_TRIS
                n = int(lr[1])
                for k in range(n):
                    s = 8 + 9 * k
                    assert np.any(lr[s:s + 9] != 0.0)
            elif kd == wb.KIND_EMPTY:
                assert e == 0
                lo = r[2 + 6 * c:5 + 6 * c]
                hi = r[5 + 6 * c:8 + 6 * c]
                assert np.all(lo == hi)  # zero-volume: slab test can't pass
