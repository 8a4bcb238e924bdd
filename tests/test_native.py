"""Native C++ host components vs their Python oracles.

Mirrors the reference's oracle-testing pattern (UnitTests/main.cpp validates
MathLib against glm): the C++ BVH builder / flattener / OBJ parser / HDR
decoder must agree with the numpy/pure-Python implementations they replace.
"""

import numpy as np
import pytest

from buas_pathtracer_tpu import native
from buas_pathtracer_tpu.ops import bvh as bvh_mod
from buas_pathtracer_tpu.utils import assets

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _random_aabbs(rng, m):
    c = rng.uniform(-10, 10, (m, 3)).astype(np.float32)
    r = rng.uniform(0.01, 1.5, (m, 3)).astype(np.float32)
    return c - r, c + r


def _leaves_cover_all(bn, m):
    covered = []
    for i in range(bn.count.shape[0]):
        if bn.count[i] > 0:
            s = int(bn.left_first[i])
            covered.extend(bn.order[s:s + int(bn.count[i])].tolist())
    assert sorted(covered) == list(range(m))


def _check_tree_valid(bn, lo, hi):
    """Every node's AABB contains its items; children partition the parent."""
    def items_under(i):
        if bn.count[i] > 0:
            s = int(bn.left_first[i])
            return bn.order[s:s + int(bn.count[i])]
        l = int(bn.left_first[i])
        return np.concatenate([items_under(l), items_under(l + 1)])

    for i in range(bn.count.shape[0]):
        idx = items_under(i)
        assert np.all(bn.lo[i] <= lo[idx].min(axis=0) + 1e-5)
        assert np.all(bn.hi[i] >= hi[idx].max(axis=0) - 1e-5)


class TestNativeBVH:
    def test_small_build_matches_python_semantics(self):
        rng = np.random.default_rng(7)
        lo, hi = _random_aabbs(rng, 37)
        bn = native.build_bvh_native(lo, hi, 4)
        assert bn is not None
        _leaves_cover_all(bn, 37)
        _check_tree_valid(bn, lo, hi)

    def test_leaf_sizes_respected(self):
        rng = np.random.default_rng(3)
        lo, hi = _random_aabbs(rng, 500)
        bn = native.build_bvh_native(lo, hi, 4)
        leaf_counts = bn.count[bn.count > 0]
        # SAH may keep up to 2*max_leaf_size when split cost exceeds leaf cost
        assert leaf_counts.max() <= 8
        _leaves_cover_all(bn, 500)

    def test_identical_sah_cost_to_numpy(self):
        """Same binning rules => identical tree shape on generic input."""
        rng = np.random.default_rng(11)
        lo, hi = _random_aabbs(rng, 200)
        nat = native.build_bvh_native(lo, hi, 4)
        import os
        os.environ["BUAS_NO_NATIVE"] = "1"
        try:
            # force the numpy path via direct call to the module internals
            py = bvh_mod.build_bvh.__wrapped__(lo, hi) if hasattr(
                bvh_mod.build_bvh, "__wrapped__") else None
        finally:
            del os.environ["BUAS_NO_NATIVE"]
        if py is None:
            # call numpy partition path explicitly instead
            import buas_pathtracer_tpu.ops.bvh as b

            def numpy_build(lo, hi):
                # replicate build_bvh's numpy body by temporarily disabling
                # the native dispatch
                orig = native.build_bvh_native
                native.build_bvh_native = lambda *a, **k: None
                try:
                    return b.build_bvh(lo, hi, "sah_binned")
                finally:
                    native.build_bvh_native = orig
            py = numpy_build(lo, hi)
        assert nat.count.shape[0] == py.count.shape[0]
        np.testing.assert_array_equal(nat.left_first, py.left_first)
        np.testing.assert_array_equal(nat.count, py.count)
        np.testing.assert_array_equal(nat.order, py.order)
        np.testing.assert_allclose(nat.lo, py.lo, rtol=1e-6)
        np.testing.assert_allclose(nat.hi, py.hi, rtol=1e-6)

    def test_flatten_subtree_matches_python(self):
        rng = np.random.default_rng(5)
        lo, hi = _random_aabbs(rng, 64)
        bn = native.build_bvh_native(lo, hi, 4)
        n = bn.count.shape[0]
        fwd = np.array([[1, 0, 0, 2.0], [0, 2, 0, -1.0], [0, 0, 1, 0.5]],
                       np.float32)

        out = dict(lo=np.empty((n, 3), np.float32),
                   hi=np.empty((n, 3), np.float32),
                   miss=np.empty(n, np.int32), kind=np.empty(n, np.int8),
                   first=np.empty(n, np.int32), count=np.empty(n, np.int32),
                   inst=np.empty(n, np.int32))
        ok = native.flatten_subtree_native(
            bn, fwd, bvh_mod._Emitter.PAD, 100, 7, 0,
            bvh_mod.KIND_INTERNAL, bvh_mod.KIND_TRIS,
            out["lo"], out["hi"], out["miss"], out["kind"], out["first"],
            out["count"], out["inst"])
        assert ok

        em = bvh_mod._Emitter()

        def emit(node_i):
            from buas_pathtracer_tpu.core.vec import transform_aabb
            l, h = transform_aabb(fwd, bn.lo[node_i], bn.hi[node_i])
            cnt = int(bn.count[node_i])
            if cnt > 0:
                me = em.emit(l, h, bvh_mod.KIND_TRIS,
                             100 + int(bn.left_first[node_i]), cnt, 7)
                em.miss[me] = em.n
                return
            me = em.emit(l, h, bvh_mod.KIND_INTERNAL, 0, 0, 7)
            left = int(bn.left_first[node_i])
            emit(left)
            emit(left + 1)
            em.miss[me] = em.n

        emit(0)
        ref = em.finish()
        np.testing.assert_array_equal(out["miss"], ref.miss)
        np.testing.assert_array_equal(out["kind"], ref.kind)
        np.testing.assert_array_equal(out["first"], ref.first)
        np.testing.assert_array_equal(out["count"], ref.count)
        np.testing.assert_array_equal(out["inst"], ref.inst)
        np.testing.assert_allclose(out["lo"], ref.lo, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(out["hi"], ref.hi, rtol=1e-5, atol=1e-5)


OBJ_TEXT = """
# comment
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
vt 0.5 0.5
f 1//1 2//1 3//1 4//1
f -4//1 -3//1 -2//1
"""


class TestNativeObj:
    def test_fan_and_negative_indices(self):
        m_nat = assets.parse_obj(OBJ_TEXT)
        m_py = assets._parse_obj_py(OBJ_TEXT)
        assert m_nat is not None and m_py is not None
        assert m_nat.triangles.shape == m_py.triangles.shape == (3, 3, 3)
        np.testing.assert_allclose(m_nat.triangles, m_py.triangles)

    def test_winding_flip(self):
        m_ccw = assets.parse_obj(OBJ_TEXT, "ccw")
        m_cw = assets.parse_obj(OBJ_TEXT, "cw")
        np.testing.assert_allclose(m_cw.triangles[:, ::-1, :], m_ccw.triangles)

    def test_normals_when_all_faces_have_them(self):
        txt = ("v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\n"
               "f 1//1 2//1 3//1\n")
        m = assets.parse_obj(txt)
        assert m.normals is not None
        np.testing.assert_allclose(m.normals[0], [[0, 0, 1]] * 3)

    def test_reject_big_face(self):
        corners = " ".join(str(i % 3 + 1) for i in range(40))
        txt = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf " + corners + "\n"
        assert assets.parse_obj(txt) is None
        assert assets._parse_obj_py(txt) is None


class TestNativeHdr:
    def _encode_rle(self, img_rgbe):
        """Adaptive RLE encoder (literal-only) for round-trip testing."""
        h, w, _ = img_rgbe.shape
        out = bytearray()
        for y in range(h):
            out += bytes([2, 2, w >> 8, w & 0xFF])
            for comp in range(4):
                x = 0
                while x < w:
                    n = min(128, w - x)
                    out += bytes([n]) + img_rgbe[y, x:x + n, comp].tobytes()
                    x += n
        return bytes(out)

    def test_roundtrip_vs_python(self):
        rng = np.random.default_rng(1)
        rgbe = rng.integers(0, 255, (4, 16, 4), np.uint8).astype(np.uint8)
        payload = self._encode_rle(rgbe)
        header = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n-Y 4 +X 16\n"
        img = assets.parse_hdr(header + payload)
        assert img is not None and img.shape == (4, 16, 3)
        decoded = native.hdr_decode_native(payload, 16, 4)
        np.testing.assert_array_equal(decoded, rgbe)

    def test_run_lengths(self):
        w = 16
        row = bytearray([2, 2, 0, w])
        for comp in range(4):
            row += bytes([128 + w, comp * 10 + 5])  # full run per component
        decoded = native.hdr_decode_native(bytes(row), w, 1)
        assert decoded is not None
        for comp in range(4):
            assert np.all(decoded[0, :, comp] == comp * 10 + 5)


def test_python_fallback_matches_native():
    """With BUAS_NO_NATIVE=1 the pure-Python builders must produce a scene
    that traverses identically (the fallback path is otherwise never
    exercised on machines with a toolchain).  Runs in a subprocess so the
    env var is seen before the native lib loads."""
    import os
    import subprocess
    import sys

    script = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from buas_pathtracer_tpu import native
assert not native.available(), "BUAS_NO_NATIVE not honored"
from buas_pathtracer_tpu.core import vec
from buas_pathtracer_tpu.core.vec import Vec3
from buas_pathtracer_tpu.models.scene import Scene
from buas_pathtracer_tpu.utils.procgen import icosphere
from buas_pathtracer_tpu.ops import traverse_wide, traverse
sc = Scene(name="pyfallback")
m = sc.add_diffuse_material((0.7, 0.7, 0.7), 1.0)
sc.add_mesh(m, icosphere(subdivisions=2), vec.translate([0, 0, 2]))
sc.add_sphere(m, 0.5, vec.translate([1.5, 0, 3]))
ps = sc.pack()
rng = np.random.default_rng(0)
n = 512
o = Vec3(*[jnp.asarray(rng.uniform(-2, 2, n).astype(np.float32)) for _ in range(3)])
dn = rng.normal(size=(n, 3)).astype(np.float32)
dn /= np.linalg.norm(dn, axis=1, keepdims=True)
d = Vec3(*[jnp.asarray(dn[:, i]) for i in range(3)])
hw = traverse_wide.intersect_scene(ps, o, d)
ht = traverse.intersect_scene_threaded(ps, o, d)
agree = (np.asarray(hw.hit_id) == np.asarray(ht.hit_id)).mean()
assert agree > 0.995, agree
print("PY_FALLBACK_OK")
"""
    env = dict(os.environ, BUAS_NO_NATIVE="1")
    res = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=480,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert "PY_FALLBACK_OK" in res.stdout, res.stderr[-1500:]
