# Isolate intersect_scene overhead: kernel alone vs +dispatch vs +assembly.
import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

W, H = 1920, 1080
import bench as B
sc = B.build_bench_scene(W, H)
ps = sc.pack()
N = W * H

from buas_pathtracer_tpu.ops import pallas_packet as pp
from buas_pathtracer_tpu.ops import traverse_wide as tw
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.core.vec import Vec3
from buas_pathtracer_tpu.runtime.render import _tiled


def primary(r):
    py_, px_ = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32),
                            jnp.arange(W, dtype=jnp.int32), indexing="ij")
    px = _tiled(px_).astype(jnp.float32)
    py = _tiled(py_).astype(jnp.float32)
    z = jnp.zeros((N,)) + r * 1e-7
    pr = cm.generate_rays(sc.camera, px, py, W, H, z + 0.5, z + 0.5, z, z,
                          0.0, 1.0, 6, 0.0, 0.0)
    t0 = jnp.full((N,), tw.BIG_T)
    ign = jnp.full((N,), -1, jnp.int32)
    return pr.o.x, pr.o.y, pr.o.z, pr.d.x, pr.d.y, pr.d.z, t0, ign


@jax.jit
def kern(ox, oy, oz, dx, dy, dz, t0, ign):
    out = pp.packet_traverse(ps.wide_rows, Vec3(ox, oy, oz),
                             Vec3(dx, dy, dz), t0, ign, occlusion=False)
    return out[0].sum() + out[1].sum()


@jax.jit
def disp(ox, oy, oz, dx, dy, dz, t0, ign):
    out = pp.traverse_dispatch(ps.wide_rows, ps.scene_lo, ps.scene_hi,
                               Vec3(ox, oy, oz), Vec3(dx, dy, dz), t0, ign,
                               occlusion=False)
    return out[0].sum() + out[1].sum()


@jax.jit
def trav(ox, oy, oz, dx, dy, dz, t0, ign):
    out = tw._traverse(ps, Vec3(ox, oy, oz), Vec3(dx, dy, dz), t0, ign,
                       occlusion=False)
    return out[0].sum() + out[1].sum()


def tmin(fn, reps=3):
    a = primary(0)
    jax.block_until_ready(a)
    _ = np.asarray(fn(*a))
    ts = []
    for r in range(1, reps + 1):
        a = primary(r)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        _ = np.asarray(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts) - 0.028


print(f"kernel only     : {tmin(kern)*1e3:7.1f} ms", flush=True)
print(f"+dispatch policy: {tmin(disp)*1e3:7.1f} ms", flush=True)
print(f"via _traverse   : {tmin(trav)*1e3:7.1f} ms", flush=True)
print("PROF22 DONE", flush=True)
