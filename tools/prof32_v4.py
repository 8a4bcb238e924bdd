# Round-3: leaf-DMA packet kernel (v4) on the REAL chip.
#
# The 655k-tri stress scene's ~33 MB unified table never fit the resident
# packet kernel (VMEM_TABLE_LIMIT_BYTES), so round 2 left it on the XLA
# phased path at 3.3 s/frame (960x540, docs/PERFORMANCE.md Scale).  v4
# keeps only the internal tree resident (~4 MB) and streams leaf rows from
# HBM through a DMA ring.  This probe:
#   1. compiles + runs v4 primary closest-hit on the stress scene,
#   2. checks parity against the XLA phased path ON CHIP,
#   3. times primary / incoherent / occlusion waves v4 vs XLA.
import os, sys, time

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

W, H = 960, 540
N = W * H

from buas_pathtracer_tpu.core import vec
from buas_pathtracer_tpu.core.vec import Vec3, normalize
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.models.scene import Scene, SceneSettings
from buas_pathtracer_tpu.utils.procgen import icosphere
from buas_pathtracer_tpu.ops import traverse_wide as tw
from buas_pathtracer_tpu.ops import pallas_packet as pp
from buas_pathtracer_tpu.runtime.render import _tiled

t0 = time.perf_counter()
sc = Scene(name="stress")
grey = sc.add_diffuse_material((0.6, 0.6, 0.6), 1.2)
red = sc.add_diffuse_material((0.75, 0.25, 0.2), 1.4)
light = sc.add_emissive_material((60.0, 60.0, 55.0))
mesh = icosphere(subdivisions=7)  # 327,680 tris
sc.add_mesh(grey, mesh, vec.translate([-2.2, 2.0, 0]) * vec.scale(2.0))
sc.add_mesh(red, mesh, vec.translate([2.2, 1.5, 1.0]) * vec.scale(1.5))
sc.add_box(grey, (20, 1, 20), vec.translate([0, -1.0, 0]))
sc.add_sphere(light, 1.5, vec.translate([0, 12.0, 4]))
sc.camera = cm.aim_camera_at(
    cm.make_camera(p=(0, 3.5, -9), vfov=np.radians(50), aspect=W / H),
    (0, 1.8, 0))
ps = sc.pack()
rows_mb = ps.wide_rows.shape[0] * ps.wide_rows.shape[1] * 4 / 2**20
print(f"pack {time.perf_counter()-t0:.1f}s: {ps.wide_rows.shape[0]} rows "
      f"({rows_mb:.1f} MB); v4 split: "
      f"res {None if ps.v4_res is None else tuple(ps.v4_res.shape)} "
      f"leaf {None if ps.v4_leaf is None else tuple(ps.v4_leaf.shape)}",
      flush=True)
assert ps.v4_res is not None

py_, px_ = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32),
                        jnp.arange(W, dtype=jnp.int32), indexing="ij")
PX = _tiled(px_).astype(jnp.float32)
PY = _tiled(py_).astype(jnp.float32)
depth = int(ps.wide_depth_arr.shape[0])


def waves(r):
    z = jnp.zeros((N,)) + r * 1e-7
    pr = cm.generate_rays(sc.camera, PX, PY, W, H, z + 0.5, z + 0.5, z, z,
                          0.0, 1.0, 6, 0.0, 0.0)
    g = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(0),
                                             r.astype(jnp.uint32)), (3, N))
    di = normalize(Vec3(g[0] + 0.0, jnp.abs(g[1]) * 0.3 + 0.05, g[2]))
    oi = Vec3(pr.o.x + (PX % 37) * 0.1, pr.o.y * 0 + 0.5,
              pr.o.z + (PY % 23) * 0.2)
    return pr.o, pr.d, oi, di


def mk(path, occlusion, incoh):
    os.environ["BUAS_TRAVERSAL"] = path

    @jax.jit
    def f(r):
        o, d, oi, di = waves(r)
        if incoh:
            o, d = oi, di
        t0_ = jnp.full((N,), 20.0 if occlusion else tw.BIG_T)
        out = tw._traverse(ps, o, d, t0_,
                           jnp.full((N,), -1, jnp.int32),
                           occlusion=occlusion)
        return out[0].sum(), out[1].sum(), out[1]
    return f


def tmin(f, reps=3):
    _ = np.asarray(f(jnp.float32(0.0))[0])
    ts = []
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        _ = np.asarray(f(jnp.float32(r))[0])
        ts.append(time.perf_counter() - t0)
    return (min(ts) - 0.028) * 1e3


# parity first (one arg set, both paths, full prim vector compare)
f4 = mk("packet4", False, False)
t0 = time.perf_counter()
s4, p4, prim4 = f4(jnp.float32(5.0))
prim4 = np.asarray(prim4)
print(f"v4 compile+run {time.perf_counter()-t0:.0f}s", flush=True)
fx = mk("wide", False, False)
sx, px2, primx = fx(jnp.float32(5.0))
primx = np.asarray(primx)
mism = int((prim4 != primx).sum())
print(f"parity: prim mismatches {mism}/{N}  "
      f"tsum {float(s4):.6g} vs {float(sx):.6g}", flush=True)

for name, occl, inc in (("primary ", False, False),
                        ("incoher ", False, True),
                        ("occlude ", True, False)):
    t4 = tmin(mk("packet4", occl, inc))
    tx = tmin(mk("wide", occl, inc))
    print(f"{name}: v4 {t4:7.1f} ms   xla {tx:7.1f} ms   "
          f"({N/t4/1e3:.1f} vs {N/tx/1e3:.1f} Mrays/s)", flush=True)
print("PROF32 DONE", flush=True)
