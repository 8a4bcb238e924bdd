# Phase-cap tuning data: alive fraction vs iteration count; W=16 comparison
# (run with BUAS_WIDE=16); shadow-ray maxiter.
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
print(f"WIDE={os.environ.get('BUAS_WIDE', '8')} rows: {rows.shape} "
      f"depth={depth}", flush=True)

from buas_pathtracer_tpu.ops import traverse_wide as tw
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.core.vec import Vec3


@partial(jax.jit, static_argnames=("cap", "occ"))
def trav_state(ox, oy, oz, dx, dy, dz, t0, ign, cap, occ):
    out = tw._traverse_chunk(rows, depth, Vec3(ox, oy, oz), Vec3(dx, dy, dz),
                             t0, ign, occ, cap=cap, full_state=True)
    alive = jnp.sum((out[0] != tw.DONE).astype(jnp.int32))
    return alive, out[12], out[5].sum(), out[10]


def mk(r, n, bounce_like=False):
    k = jax.random.PRNGKey(r)
    px = jax.random.uniform(k, (n,)) * W
    py = jax.random.uniform(jax.random.fold_in(k, 1), (n,)) * H
    z = jnp.zeros((n,))
    pr = cm.generate_rays(sc.camera, px, py, W, H, z + 0.5, z + 0.5, z, z,
                          0.0, 1.0, 6, 0.0, 0.0)
    o, d = pr.o, pr.d
    if bounce_like:
        # scatter origins onto surfaces-ish and randomize directions
        from buas_pathtracer_tpu.core.vec import normalize
        t = jax.random.uniform(jax.random.fold_in(k, 2), (n,)) * 10
        o = o + d * t
        g = jax.random.normal(jax.random.fold_in(k, 3), (3, n))
        d = normalize(Vec3(g[0], g[1], g[2]))
    t0 = jnp.full((n,), tw.BIG_T)
    ign = jnp.full((n,), -1, jnp.int32)
    return o.x, o.y, o.z, d.x, d.y, d.z, t0, ign


N = 262144
print("== alive fraction vs cap (closest-hit, primary) ==", flush=True)
a = mk(1, N)
for cap in (2, 4, 6, 8, 12, 16, 24, 32, 48, None):
    alive, its, _, nv = trav_state(*a, cap, False)
    print(f"cap={str(cap):>5}: alive={float(np.asarray(alive))/N*100:6.2f}%  "
          f"iters_run={int(np.asarray(its))}", flush=True)

print("== alive fraction vs cap (closest-hit, bounce-like incoherent) ==",
      flush=True)
a = mk(2, N, bounce_like=True)
for cap in (2, 4, 6, 8, 12, 16, 24, 32, 48, None):
    alive, its, _, nv = trav_state(*a, cap, False)
    print(f"cap={str(cap):>5}: alive={float(np.asarray(alive))/N*100:6.2f}%  "
          f"iters_run={int(np.asarray(its))}", flush=True)

print("== shadow (occlusion) ==", flush=True)
a = mk(3, N, bounce_like=True)
for cap in (2, 4, 8, 16, None):
    alive, its, _, nv = trav_state(*a, cap, True)
    print(f"cap={str(cap):>5}: alive={float(np.asarray(alive))/N*100:6.2f}%  "
          f"iters_run={int(np.asarray(its))}", flush=True)

print("PROF7 DONE", flush=True)
