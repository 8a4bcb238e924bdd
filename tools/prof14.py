# Does the phased traversal degrade inside a lax.while_loop (the
# integrator's bounce loop)?  Same 1080p closest-hit, three harnesses:
#   top   — direct call under jit (prof8's setup, ~200 ms)
#   while — identical call inside a 2-iteration lax.while_loop
#   scan  — inside a 2-step lax.scan
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
from buas_pathtracer_tpu.core.vec import Vec3, normalize

print(f"CHUNK={tw.CHUNK} CAPS={tw.PHASE_CAPS}", flush=True)


def mk(r):
    k = jax.random.PRNGKey(r)
    px = jax.random.uniform(k, (N,)) * W
    py = jax.random.uniform(jax.random.fold_in(k, 1), (N,)) * H
    z = jnp.zeros((N,))
    pr = cm.generate_rays(sc.camera, px, py, W, H, z + 0.5, z + 0.5, z, z,
                          0.0, 1.0, 6, 0.0, 0.0)
    t0 = jnp.full((N,), tw.BIG_T)
    ign = jnp.full((N,), -1, jnp.int32)
    return pr.o.x, pr.o.y, pr.o.z, pr.d.x, pr.d.y, pr.d.z, t0, ign


def one_call(ox, oy, oz, dx, dy, dz, t0, ign):
    h = tw.intersect_scene(ps, Vec3(ox, oy, oz), Vec3(dx, dy, dz),
                           max_t=t0, ignored_prim=ign)
    return h.t, h.hit_id


@jax.jit
def top(ox, oy, oz, dx, dy, dz, t0, ign):
    acc = jnp.zeros(())
    for i in range(2):
        t, hid = one_call(ox, oy + 0.001 * i, oz, dx, dy, dz, t0, ign)
        acc = acc + t.sum() + hid.sum()
    return acc


@jax.jit
def wloop(ox, oy, oz, dx, dy, dz, t0, ign):
    def cond(st):
        return st[0] < 2

    def body(st):
        i, acc = st
        t, hid = one_call(ox, oy + 0.001 * i.astype(jnp.float32), oz,
                          dx, dy, dz, t0, ign)
        return i + 1, acc + t.sum() + hid.sum()

    return jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.zeros(())))[1]


@jax.jit
def sloop(ox, oy, oz, dx, dy, dz, t0, ign):
    def step(acc, i):
        t, hid = one_call(ox, oy + 0.001 * i.astype(jnp.float32), oz,
                          dx, dy, dz, t0, ign)
        return acc + t.sum() + hid.sum(), None

    acc, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(2))
    return acc


for name, fn in (("top x2", top), ("while x2", wloop), ("scan x2", sloop)):
    a = mk(0)
    jax.block_until_ready(a)
    _ = np.asarray(fn(*a))
    ts = []
    for r in (1, 2):
        a = mk(r)
        jax.block_until_ready(a)
        t0_ = time.perf_counter()
        _ = np.asarray(fn(*a))
        ts.append(time.perf_counter() - t0_)
    print(f"{name:10s}: {min(ts)*1e3:8.1f} ms", flush=True)
print("PROF14 DONE", flush=True)
