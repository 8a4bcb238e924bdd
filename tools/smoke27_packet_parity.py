# Round-3: COMPILED packet-kernel parity on the real TPU chip (round-2
# verdict weak item 5 — interpret-mode tests can't catch Mosaic-vs-interpret
# divergences; this compares the compiled kernel against the XLA phased
# path on identical mixed closest-hit/occlusion wavefronts).
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

sys.argv = sys.argv[:1]
W, H = 640, 360
N = W * H
import bench as B
sc = B.build_bench_scene(W, H)
ps = sc.pack()

from buas_pathtracer_tpu.core.vec import Vec3
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.ops import pallas_packet as pp
from buas_pathtracer_tpu.ops import traverse_wide as tw
from buas_pathtracer_tpu.runtime.render import _tiled

print("backend:", jax.default_backend(), flush=True)

py_, px_ = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32),
                        jnp.arange(W, dtype=jnp.int32), indexing="ij")
PX = _tiled(px_).astype(jnp.float32)
PY = _tiled(py_).astype(jnp.float32)


@jax.jit
def rays(r):
    z = jnp.zeros((N,)) + r * 1e-7
    pr = cm.generate_rays(sc.camera, PX, PY, W, H, z + 0.5, z + 0.5, z, z,
                          0.0, 1.0, 6, 0.0, 0.0)
    # mix in some dead lanes + finite max_t like a real shadow wave
    t0 = jnp.where((PX.astype(jnp.int32) % 7) == 0, -1.0, tw.BIG_T)
    return pr.o.x, pr.o.y, pr.o.z, pr.d.x, pr.d.y, pr.d.z, t0


@jax.jit
def packet(ox, oy, oz, dx, dy, dz, t0):
    return pp.packet_traverse(ps.wide_rows, Vec3(ox, oy, oz),
                              Vec3(dx, dy, dz), t0,
                              jnp.full((N,), -1, jnp.int32), occlusion=False)


@jax.jit
def xla(ox, oy, oz, dx, dy, dz, t0):
    return tw._traverse_xla(ps, ps.wide_rows,
                            int(ps.wide_depth_arr.shape[0]),
                            Vec3(ox, oy, oz), Vec3(dx, dy, dz), t0,
                            jnp.full((N,), -1, jnp.int32), occlusion=False)


a = rays(jnp.float32(0))
out_p = [np.asarray(x) for x in packet(*a)[:5]]
out_x = [np.asarray(x) for x in xla(*a)[:5]]
np.testing.assert_allclose(out_p[0], out_x[0], rtol=1e-5, atol=1e-5)
np.testing.assert_array_equal(out_p[1], out_x[1])
# tri index: the compiled kernel's FMA contraction can flip the t >= t_new
# near-tie for coincident/shared-edge triangles, picking the other triangle
# of an equal-t pair.  Allow mismatches ONLY where t agrees (a tie-break,
# never a missed hit), and require them rare (<0.05%).
tri_mism = out_p[2] != out_x[2]
assert float(tri_mism.mean()) < 5e-4, f"tri mismatch {tri_mism.mean():.2%}"
np.testing.assert_allclose(out_p[0][tri_mism], out_x[0][tri_mism],
                           rtol=1e-4, atol=1e-5)
agree = (~tri_mism) & (out_x[2] >= 0)
np.testing.assert_allclose(out_p[3][agree], out_x[3][agree],
                           rtol=1e-4, atol=1e-5)
np.testing.assert_allclose(out_p[4][agree], out_x[4][agree],
                           rtol=1e-4, atol=1e-5)
print(f"tri tie-break flips: {int(tri_mism.sum())} lanes (t equal)",
      flush=True)
hit_frac = float((out_x[1] >= 0).mean())
print(f"closest-hit parity ok over {N} rays ({hit_frac*100:.0f}% hit)",
      flush=True)


@jax.jit
def packet_occ(ox, oy, oz, dx, dy, dz, t0):
    return pp.packet_traverse(ps.wide_rows, Vec3(ox, oy, oz),
                              Vec3(dx, dy, dz),
                              jnp.where(t0 > 0, 8.0, t0),
                              jnp.full((N,), -1, jnp.int32), occlusion=True)


@jax.jit
def xla_occ(ox, oy, oz, dx, dy, dz, t0):
    return tw._traverse_xla(ps, ps.wide_rows,
                            int(ps.wide_depth_arr.shape[0]),
                            Vec3(ox, oy, oz), Vec3(dx, dy, dz),
                            jnp.where(t0 > 0, 8.0, t0),
                            jnp.full((N,), -1, jnp.int32), occlusion=True)


occ_p = np.asarray(packet_occ(*a)[1]) >= 0
occ_x = np.asarray(xla_occ(*a)[1]) >= 0
np.testing.assert_array_equal(occ_p, occ_x)
print(f"occlusion parity ok ({float(occ_x.mean())*100:.0f}% blocked)",
      flush=True)
print("SMOKE27 COMPILED PACKET PARITY OK", flush=True)
