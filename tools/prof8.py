# A/B the phased traversal end-to-end at 1080p on the real TPU.
#   usage: [env overrides] python tools/prof8.py [trav|shadow|frame8]
import time, sys, os
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else "trav"
W, H = 1920, 1080
import bench as B
sc = B.build_bench_scene(W, H)
ps = sc.pack()
N = W * H

from buas_pathtracer_tpu.ops import traverse_wide as tw
from buas_pathtracer_tpu.ops import traverse
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.core.vec import Vec3, normalize

print(f"WIDE={os.environ.get('BUAS_WIDE','8')} CHUNK={tw.CHUNK} "
      f"CAPS={tw.PHASE_CAPS} rows={ps.wide_rows.shape} "
      f"depth={int(ps.wide_depth_arr.shape[0])}", flush=True)


def mk(r, n=N, bounce_like=False, dead_frac=0.0):
    k = jax.random.PRNGKey(r)
    px = jax.random.uniform(k, (n,)) * W
    py = jax.random.uniform(jax.random.fold_in(k, 1), (n,)) * H
    z = jnp.zeros((n,))
    pr = cm.generate_rays(sc.camera, px, py, W, H, z + 0.5, z + 0.5, z, z,
                          0.0, 1.0, 6, 0.0, 0.0)
    o, d = pr.o, pr.d
    if bounce_like:
        t = jax.random.uniform(jax.random.fold_in(k, 2), (n,)) * 10
        o = o + d * t
        g = jax.random.normal(jax.random.fold_in(k, 3), (3, n))
        d = normalize(Vec3(g[0], g[1], g[2]))
    t0 = jnp.full((n,), tw.BIG_T)
    if dead_frac > 0:
        dead = jax.random.uniform(jax.random.fold_in(k, 4), (n,)) < dead_frac
        t0 = jnp.where(dead, -1.0, t0)
    ign = jnp.full((n,), -1, jnp.int32)
    return o, d, t0, ign


@jax.jit
def closest(o, d, t0, ign):
    h = tw.intersect_scene(ps, o, d, max_t=t0, ignored_prim=ign)
    return h.t.sum() + h.hit_id.sum(), h.node_visits


@jax.jit
def shadow(o, d, t0, ign):
    occ = tw.intersect_shadow_ray(ps, o, d, t0, ign)
    return occ.sum(), jnp.zeros((), jnp.int32)


def tmin(fn, mk_kw, reps=3):
    o = fn(*mk(0, **mk_kw)); _ = np.asarray(o[0])
    ts = []
    for r in range(1, reps + 1):
        a = mk(r, **mk_kw); jax.block_until_ready(a)
        t0 = time.perf_counter()
        o = fn(*a); _ = np.asarray(o[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) - 0.028, o  # subtract measured ~28ms axon call overhead


if MODE == "trav":
    for tag, kw in (("primary", dict()),
                    ("bounce-like", dict(bounce_like=True)),
                    ("50% dead", dict(bounce_like=True, dead_frac=0.5)),
                    ("90% dead", dict(bounce_like=True, dead_frac=0.9))):
        dt, o = tmin(closest, kw)
        print(f"closest {tag:>12}: {dt*1e3:7.1f} ms  {N/dt/1e6:6.1f} Mrays/s",
              flush=True)
elif MODE == "shadow":
    for tag, kw in (("bounce-like", dict(bounce_like=True)),
                    ("50% dead", dict(bounce_like=True, dead_frac=0.5)),
                    ("90% dead", dict(bounce_like=True, dead_frac=0.9))):
        dt, o = tmin(shadow, kw)
        print(f"shadow {tag:>12}: {dt*1e3:7.1f} ms  {N/dt/1e6:6.1f} Mrays/s",
              flush=True)
print("PROF8 DONE", MODE, flush=True)
