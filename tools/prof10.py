# Decompose the phased-traversal step cost: gathers vs loop vs scatters.
# All timed fns return SCALARS (sums) so syncs don't ship arrays over the
# slow axon tunnel; inputs vary per rep to defeat caching/folding.
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

CHUNK = tw.CHUNK
rows = ps.wide_rows
depth = int(ps.wide_depth_arr.shape[0])
c = -(-N // CHUNK)
npad = c * CHUNK
print(f"CHUNK={CHUNK} chunks={c} rows={rows.shape} depth={depth}", flush=True)


def mk_full(r):
    """Padded full-batch state like _traverse builds."""
    k = jax.random.PRNGKey(r)
    px = jax.random.uniform(k, (N,)) * W
    py = jax.random.uniform(jax.random.fold_in(k, 1), (N,)) * H
    z = jnp.zeros((N,))
    pr = cm.generate_rays(sc.camera, px, py, W, H, z + 0.5, z + 0.5, z, z,
                          0.0, 1.0, 6, 0.0, 0.0)
    pad = lambda x, f=0.0: jnp.pad(x, (0, npad - N), constant_values=f)
    ox, oy, oz = pad(pr.o.x), pad(pr.o.y), pad(pr.o.z)
    dx, dy, dz = pad(pr.d.x), pad(pr.d.y, 1.0), pad(pr.d.z)
    t = pad(jnp.full((N,), tw.BIG_T), -1.0)
    ign = jnp.full((npad,), -1, jnp.int32)
    prim = jnp.full((npad,), -1, jnp.int32)
    tri = jnp.full((npad,), -1, jnp.int32)
    bv = jnp.zeros((npad,))
    bw = jnp.zeros((npad,))
    ids = jax.random.permutation(jax.random.fold_in(k, 9),
                                 npad).astype(jnp.int32)[:CHUNK]
    return (ox, oy, oz, dx, dy, dz, ign, t, prim, tri, bv, bw, ids)


@jax.jit
def gather12(st):
    ox, oy, oz, dx, dy, dz, ign, t, prim, tri, bv, bw, ids = st
    outs = [a[ids] for a in (ox, oy, oz, dx, dy, dz, t, bv, bw)]
    outs += [a[ids] for a in (ign, prim, tri)]
    return sum(o.sum().astype(jnp.float32) for o in outs)


@jax.jit
def scatter6(st):
    ox, oy, oz, dx, dy, dz, ign, t, prim, tri, bv, bw, ids = st
    nt = t.at[ids].set(ox[:CHUNK])
    np_ = prim.at[ids].set(ign[:CHUNK])
    ntri = tri.at[ids].set(ign[:CHUNK])
    nbv = bv.at[ids].set(oy[:CHUNK])
    nbw = bw.at[ids].set(oz[:CHUNK])
    return (nt.sum() + np_.sum().astype(jnp.float32) + ntri.sum()
            + nbv.sum() + nbw.sum())


@jax.jit
def scatter6u(st):
    ox, oy, oz, dx, dy, dz, ign, t, prim, tri, bv, bw, ids = st
    nt = t.at[ids].set(ox[:CHUNK], unique_indices=True)
    np_ = prim.at[ids].set(ign[:CHUNK], unique_indices=True)
    ntri = tri.at[ids].set(ign[:CHUNK], unique_indices=True)
    nbv = bv.at[ids].set(oy[:CHUNK], unique_indices=True)
    nbw = bw.at[ids].set(oz[:CHUNK], unique_indices=True)
    return (nt.sum() + np_.sum().astype(jnp.float32) + ntri.sum()
            + nbv.sum() + nbw.sum())


def loop_only(cap):
    @jax.jit
    def f(st):
        ox, oy, oz, dx, dy, dz, ign, t, prim, tri, bv, bw, ids = st
        go = Vec3(ox[:CHUNK], oy[:CHUNK], oz[:CHUNK])
        gd = Vec3(dx[:CHUNK], dy[:CHUNK], dz[:CHUNK])
        out = tw._traverse_chunk(rows, depth, go, gd, t[:CHUNK],
                                 ign[:CHUNK], False, cap=cap,
                                 full_state=True,
                                 carry=(prim[:CHUNK], tri[:CHUNK],
                                        bv[:CHUNK], bw[:CHUNK]))
        return out[5].sum() + out[6].sum().astype(jnp.float32)
    return f


def gather_loop(cap):
    @jax.jit
    def f(st):
        ox, oy, oz, dx, dy, dz, ign, t, prim, tri, bv, bw, ids = st
        go = Vec3(ox[ids], oy[ids], oz[ids])
        gd = Vec3(dx[ids], dy[ids], dz[ids])
        out = tw._traverse_chunk(rows, depth, go, gd, t[ids],
                                 ign[ids], False, cap=cap,
                                 full_state=True,
                                 carry=(prim[ids], tri[ids],
                                        bv[ids], bw[ids]))
        return out[5].sum() + out[6].sum().astype(jnp.float32)
    return f


def full_step(cap, unique):
    @jax.jit
    def f(st):
        ox, oy, oz, dx, dy, dz, ign, t, prim, tri, bv, bw, ids = st
        go = Vec3(ox[ids], oy[ids], oz[ids])
        gd = Vec3(dx[ids], dy[ids], dz[ids])
        out = tw._traverse_chunk(rows, depth, go, gd, t[ids],
                                 ign[ids], False, cap=cap,
                                 full_state=True,
                                 carry=(prim[ids], tri[ids],
                                        bv[ids], bw[ids]))
        kw = dict(unique_indices=True) if unique else {}
        nt = t.at[ids].set(out[5], **kw)
        np_ = prim.at[ids].set(out[6], **kw)
        ntri = tri.at[ids].set(out[7], **kw)
        nbv = bv.at[ids].set(out[8], **kw)
        nbw = bw.at[ids].set(out[9], **kw)
        return (nt.sum() + np_.sum().astype(jnp.float32) + ntri.sum()
                + nbv.sum() + nbw.sum())
    return f


@jax.jit
def argsort_only(st):
    t = st[7]
    done = t < 0.0
    ridx = jnp.argsort(done, stable=True)
    return ridx.astype(jnp.float32).sum()


FNS = [
    ("gather12 (262k of 2M)", gather12),
    ("scatter6", scatter6),
    ("scatter6 unique", scatter6u),
    ("argsort 2M", argsort_only),
    ("loop cap6 contiguous", loop_only(6)),
    ("loop cap24 contiguous", loop_only(24)),
    ("gather+loop cap6", gather_loop(6)),
    ("full step cap6", full_step(6, False)),
    ("full step cap6 unique", full_step(6, True)),
]

for name, fn in FNS:
    st = mk_full(0)
    jax.block_until_ready(st)
    _ = np.asarray(fn(st))  # compile
    ts = []
    for r in (1, 2, 3):
        st = mk_full(r)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        _ = np.asarray(fn(st))
        ts.append(time.perf_counter() - t0)
    print(f"{name:26s}: {min(ts)*1e3:8.1f} ms", flush=True)
print("PROF10 DONE", flush=True)
