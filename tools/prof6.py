# Real traversal body per-iteration cost via cap differencing.
import time, sys, os
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from functools import partial

W, H = 1920, 1080
import bench as B
sc = B.build_bench_scene(W, H)
ps = sc.pack()
rows = ps.wide_rows
depth = int(ps.wide_depth_arr.shape[0])
print(f"rows: {rows.shape} depth={depth}", flush=True)

from buas_pathtracer_tpu.ops import traverse_wide as tw
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.core.vec import Vec3


@partial(jax.jit, static_argnames=("cap", "occ"))
def trav(ox, oy, oz, dx, dy, dz, t0, ign, cap, occ):
    out = tw._traverse_chunk(rows, depth, Vec3(ox, oy, oz), Vec3(dx, dy, dz),
                             t0, ign, occ, cap=cap)
    return out[0].sum() + out[1].sum(), out[5]


def mk(r, n):
    k = jax.random.PRNGKey(r)
    px = jax.random.uniform(k, (n,)) * W
    py = jax.random.uniform(jax.random.fold_in(k, 1), (n,)) * H
    z = jnp.zeros((n,))
    pr = cm.generate_rays(sc.camera, px, py, W, H, z + 0.5, z + 0.5, z, z,
                          0.0, 1.0, 6, 0.0, 0.0)
    t0 = jnp.full((n,), tw.BIG_T)
    ign = jnp.full((n,), -1, jnp.int32)
    return pr.o.x, pr.o.y, pr.o.z, pr.d.x, pr.d.y, pr.d.z, t0, ign


def tmin(n, cap, occ, reps=3):
    o = trav(*mk(0, n), cap, occ); _ = np.asarray(o[0])
    ts = []
    for r in range(1, reps + 1):
        a = mk(r, n); jax.block_until_ready(a)
        t0 = time.perf_counter()
        o = trav(*a, cap, occ); _ = np.asarray(o[0])
        ts.append(time.perf_counter() - t0)
    return min(ts), float(np.asarray(o[1]))


print("== real traversal body: per-iter via cap 4 vs 20 ==", flush=True)
for n in (32768, 262144, 2097152):
    t4, _ = tmin(n, 4, False)
    t20, nv = tmin(n, 20, False)
    per = (t20 - t4) / 16
    print(f"n={n:>8}: {per*1e3:8.3f} ms/iter  {per/n*1e9:6.2f} ns/ray "
          f"t4={t4*1e3:.1f}ms  visits/ray={nv/n:.2f}", flush=True)

print("== uncapped full walk (global maxiter) ==", flush=True)
for n in (262144, 2097152):
    t, nv = tmin(n, None, False)
    print(f"n={n:>8}: {t*1e3:8.1f} ms  visits/ray={nv/n:.2f} "
          f"-> {n/t/1e6:.1f} Mrays/s", flush=True)

print("PROF6 DONE", flush=True)
