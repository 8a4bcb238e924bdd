# Phase-by-phase timing of the phased restart traversal at 1080p.
# Replicates ops/traverse_wide._traverse as host-level phases with a separate
# jit per piece so each can be timed with a hard sync.
import time, sys, os
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

W, H = 1920, 1080
import bench as B
sc = B.build_bench_scene(W, H)
ps = sc.pack()
N = W * H

from buas_pathtracer_tpu.ops import traverse_wide as tw
from buas_pathtracer_tpu.ops.traverse import _intersect_planes
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.core.vec import Vec3

CHUNK = tw.CHUNK
rows = ps.wide_rows
depth = int(ps.wide_depth_arr.shape[0])
print(f"CHUNK={CHUNK} caps={tw.PHASE_CAPS} rows={rows.shape} depth={depth}",
      flush=True)


def mk(r, n=N):
    k = jax.random.PRNGKey(r)
    px = jax.random.uniform(k, (n,)) * W
    py = jax.random.uniform(jax.random.fold_in(k, 1), (n,)) * H
    z = jnp.zeros((n,))
    pr = cm.generate_rays(sc.camera, px, py, W, H, z + 0.5, z + 0.5, z, z,
                          0.0, 1.0, 6, 0.0, 0.0)
    return pr.o, pr.d


c = -(-N // CHUNK)
npad = c * CHUNK
print(f"chunks={c} npad={npad}", flush=True)


@jax.jit
def prep(o, d):
    t0 = jnp.full((N,), tw.BIG_T)
    t_pl, _ = _intersect_planes(ps, o, d, t0)

    def pad1(x, fill=0.0):
        return jnp.pad(x, (0, npad - N), constant_values=fill)

    ox, oy, oz = pad1(o.x), pad1(o.y), pad1(o.z)
    dx, dy, dz = pad1(d.x), pad1(d.y, 1.0), pad1(d.z)
    ign = jnp.full((npad,), -1, jnp.int32)
    t = pad1(t_pl, -1.0)
    prim = jnp.full((npad,), -1, jnp.int32)
    tri = jnp.full((npad,), -1, jnp.int32)
    bv = jnp.zeros((npad,))
    bw = jnp.zeros((npad,))
    done = t < 0.0
    return ox, oy, oz, dx, dy, dz, ign, t, prim, tri, bv, bw, done


@jax.jit
def sort_ids(done):
    ridx = jnp.argsort(done, stable=True)
    n_todo = npad - jnp.sum(done.astype(jnp.int32))
    return ridx.reshape(c, CHUNK), n_todo


def phase_fn(cap):
    @jax.jit
    def run(ids, ox, oy, oz, dx, dy, dz, ign, t, prim, tri, bv, bw, done):
        go = Vec3(ox[ids], oy[ids], oz[ids])
        gd = Vec3(dx[ids], dy[ids], dz[ids])
        out = tw._traverse_chunk(
            rows, depth, go, gd, t[ids], ign[ids], False,
            cap=cap, full_state=True,
            carry=(prim[ids], tri[ids], bv[ids], bw[ids]))
        fin = out[0] == tw.DONE
        return (t.at[ids].set(out[5]), prim.at[ids].set(out[6]),
                tri.at[ids].set(out[7]), bv.at[ids].set(out[8]),
                bw.at[ids].set(out[9]), done.at[ids].set(fin), out[10])
    return run


ph = {cap: phase_fn(cap) for cap in list(tw.PHASE_CAPS) + [None]}


def sync(x):
    return np.asarray(x if not isinstance(x, tuple) else x[0])


def once(r, verbose):
    o, d = mk(r)
    jax.block_until_ready((o.x, d.x))
    T0 = time.perf_counter()
    st = prep(o, d)
    sync(st[7])
    t_prep = time.perf_counter() - T0
    ox, oy, oz, dx, dy, dz, ign, t, prim, tri, bv, bw, done = st
    total_nv = 0
    if verbose:
        print(f"  prep+planes: {t_prep*1e3:7.1f} ms", flush=True)
    for cap in list(tw.PHASE_CAPS) + [None]:
        T0 = time.perf_counter()
        ids_all, n_todo = sort_ids(done)
        n_todo = int(n_todo)
        t_sort = time.perf_counter() - T0
        run_chunks = -(-n_todo // CHUNK) if n_todo else 0
        T0 = time.perf_counter()
        for ci in range(run_chunks):
            t, prim, tri, bv, bw, done, nv = ph[cap](
                ids_all[ci], ox, oy, oz, dx, dy, dz, ign,
                t, prim, tri, bv, bw, done)
        if run_chunks:
            sync(t)
            total_nv += int(nv) * run_chunks  # approx; last nv only
        t_run = time.perf_counter() - T0
        if verbose:
            print(f"  cap={str(cap):>4}: sort {t_sort*1e3:6.1f} ms  "
                  f"todo {n_todo:8d} ({run_chunks} ch)  run {t_run*1e3:7.1f} ms",
                  flush=True)
    sync(t)
    return time.perf_counter()


# warm up all compiles
print("== warmup ==", flush=True)
once(0, True)
print("== timed ==", flush=True)
for r in (1, 2):
    T0 = time.perf_counter()
    once(r, True)
    print(f"TOTAL rep{r}: {(time.perf_counter()-T0)*1e3:7.1f} ms  "
          f"{N/(time.perf_counter()-T0)/1e6:5.1f} Mrays/s", flush=True)
print("PROF9 DONE", flush=True)
