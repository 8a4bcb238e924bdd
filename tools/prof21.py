# Where does the in-frame traversal time REALLY go?
#  a) packet closest WITHOUT consuming normals (traversal only, DCE'd tail)
#  b) packet closest WITH normals consumed (the deferred-normal gathers)
#  c) b inside a 2-iteration while_loop (the integrator's structure)
import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

W, H = 1920, 1080
import bench as B
sc = B.build_bench_scene(W, H)
ps = sc.pack()
N = W * H

from buas_pathtracer_tpu.ops import traverse_wide as tw
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.core.vec import Vec3
from buas_pathtracer_tpu.runtime.render import _tiled

print(f"rows={ps.wide_rows.shape}", flush=True)


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
def trav_only(ox, oy, oz, dx, dy, dz, t0, ign):
    h = tw.intersect_scene(ps, Vec3(ox, oy, oz), Vec3(dx, dy, dz),
                           max_t=t0, ignored_prim=ign)
    return h.t.sum() + h.hit_id.sum()


@jax.jit
def with_normals(ox, oy, oz, dx, dy, dz, t0, ign):
    h = tw.intersect_scene(ps, Vec3(ox, oy, oz), Vec3(dx, dy, dz),
                           max_t=t0, ignored_prim=ign)
    return (h.t.sum() + h.hit_id.sum() + h.n.x.sum() + h.n.y.sum()
            + h.p.x.sum() + h.mat_id.sum() + h.bary_v.sum())


@jax.jit
def in_while(ox, oy, oz, dx, dy, dz, t0, ign):
    def cond(st):
        return st[0] < 2

    def body(st):
        i, acc = st
        h = tw.intersect_scene(ps, Vec3(ox, oy + 1e-4 * i.astype(jnp.float32),
                                        oz), Vec3(dx, dy, dz),
                               max_t=t0, ignored_prim=ign)
        return i + 1, acc + h.t.sum() + h.n.x.sum() + h.mat_id.sum()

    return jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.zeros(())))[1]


def tmin(fn, reps=3, scale=1):
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
    return (min(ts) - 0.028) / scale


print(f"trav only      : {tmin(trav_only)*1e3:7.1f} ms", flush=True)
print(f"with normals   : {tmin(with_normals)*1e3:7.1f} ms", flush=True)
print(f"in while (per) : {tmin(in_while, scale=2)*1e3:7.1f} ms", flush=True)
print("PROF21 DONE", flush=True)
