# A/B the phase-dispatch mechanism: lax.scan+cond (current) vs python-unrolled
# chunks with/without cond.  Suspect: nested scan/cond inflates while-loop
# per-iteration cost.
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

CHUNK = tw.CHUNK
rows = ps.wide_rows
depth = int(ps.wide_depth_arr.shape[0])
c = -(-N // CHUNK)
npad = c * CHUNK
eye = jnp.eye(tw._NCOL, dtype=jnp.float32)
CIX = [tw._C_OX, tw._C_OY, tw._C_OZ, tw._C_DX, tw._C_DY, tw._C_DZ,
       tw._C_T, tw._C_BV, tw._C_BW, tw._C_IGN, tw._C_PRIM, tw._C_TRI,
       tw._C_ORIG, tw._C_DONE]
print(f"CHUNK={CHUNK} chunks={c}", flush=True)


def mk(r, dead_frac=0.0):
    k = jax.random.PRNGKey(r)
    px = jax.random.uniform(k, (N,)) * W
    py = jax.random.uniform(jax.random.fold_in(k, 1), (N,)) * H
    z = jnp.zeros((N,))
    pr = cm.generate_rays(sc.camera, px, py, W, H, z + 0.5, z + 0.5, z, z,
                          0.0, 1.0, 6, 0.0, 0.0)
    t0 = jnp.full((N,), tw.BIG_T)
    if dead_frac > 0:
        dead = jax.random.uniform(jax.random.fold_in(k, 4), (N,)) < dead_frac
        t0 = jnp.where(dead, -1.0, t0)
    ign = jnp.full((N,), -1, jnp.int32)
    return pr.o, pr.d, t0, ign


def pack_big(o, d, t0, ignored_prim):
    def pad1(x, fill=0.0):
        return jnp.pad(x, (0, npad - N), constant_values=fill)
    t_in = pad1(t0, -1.0)
    cols = [pad1(o.x), pad1(o.y), pad1(o.z),
            pad1(d.x), pad1(d.y, 1.0), pad1(d.z),
            t_in, jnp.zeros((npad,)), jnp.zeros((npad,)),
            jnp.pad(ignored_prim, (0, npad - N),
                    constant_values=-1).astype(jnp.float32),
            jnp.full((npad,), -1.0), jnp.full((npad,), -1.0),
            jnp.arange(npad, dtype=jnp.float32),
            (t_in < 0.0).astype(jnp.float32),
            jnp.zeros((npad,)), jnp.zeros((npad,))]
    return jax.lax.dot_general(jnp.stack(cols), eye, (((0,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def run_blk(blk, cap):
    bT = jax.lax.dot_general(eye, blk, (((1,), (1,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
    go = Vec3(bT[0], bT[1], bT[2])
    gd = Vec3(bT[3], bT[4], bT[5])
    sd = bT[tw._C_DONE] > 0.5
    out = tw._traverse_chunk(rows, depth, go, gd, bT[tw._C_T],
                             tw._i32(bT[tw._C_IGN]), False, cap=cap,
                             full_state=True,
                             carry=(tw._i32(bT[tw._C_PRIM]),
                                    tw._i32(bT[tw._C_TRI]),
                                    bT[tw._C_BV], bT[tw._C_BW]),
                             start_done=sd)
    fin = (out[0] == tw.DONE) | sd
    new_cols = [bT[0], bT[1], bT[2], bT[3], bT[4], bT[5],
                out[5], out[8], out[9], bT[tw._C_IGN],
                out[6].astype(jnp.float32), out[7].astype(jnp.float32),
                bT[tw._C_ORIG], fin.astype(jnp.float32), bT[14], bT[15]]
    nblk = jax.lax.dot_general(jnp.stack(new_cols), eye,
                               (((0,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
    return nblk, out[10], out[11]


def make_variant(mode):
    @jax.jit
    def f(o, d, t0, ign):
        big = pack_big(o, d, t0, ign)
        nv = jnp.zeros((), jnp.int32)
        tt = jnp.zeros((), jnp.int32)
        chunk_ix = jnp.arange(c, dtype=jnp.int32) * CHUNK
        for cap in list(tw.PHASE_CAPS) + [None]:
            done_col = big[:, tw._C_DONE]
            perm = jnp.argsort(done_col, stable=True)
            big = big[perm]
            n_todo = npad - jnp.sum(done_col.astype(jnp.int32))
            flags = chunk_ix < n_todo
            if mode == "unroll_cond" or mode == "unroll_nocond":
                blks = []
                for ci in range(c):
                    blk = jax.lax.slice_in_dim(big, ci * CHUNK,
                                               (ci + 1) * CHUNK, axis=0)
                    if mode == "unroll_cond":
                        nblk, dnv, dtt = jax.lax.cond(
                            flags[ci],
                            lambda b: run_blk(b, cap),
                            lambda b: (b, jnp.zeros((), jnp.int32),
                                       jnp.zeros((), jnp.int32)), blk)
                    else:
                        nblk, dnv, dtt = run_blk(blk, cap)
                    nv, tt = nv + dnv, tt + dtt
                    blks.append(nblk)
                big = jnp.concatenate(blks, axis=0)
            else:  # scan (current)
                def step(carry_st, xs, cap=cap):
                    nv, tt = carry_st
                    flag, blk = xs
                    nblk, dnv, dtt = jax.lax.cond(
                        flag, lambda b: run_blk(b, cap),
                        lambda b: (b, jnp.zeros((), jnp.int32),
                                   jnp.zeros((), jnp.int32)), blk)
                    return (nv + dnv, tt + dtt), nblk
                (nv, tt), big3 = jax.lax.scan(
                    step, (nv, tt), (flags, big.reshape(c, CHUNK, tw._NCOL)))
                big = big3.reshape(npad, tw._NCOL)
        orig = tw._i32(big[:, tw._C_ORIG])
        out = jnp.zeros((npad, tw._NCOL), jnp.float32).at[orig].set(
            big, unique_indices=True)
        return out[:N, tw._C_T].sum() + out[:N, tw._C_PRIM].sum(), nv
    return f


for mode in ("scan", "unroll_cond", "unroll_nocond"):
    fn = make_variant(mode)
    for tag, df in (("primary", 0.0), ("90% dead", 0.9)):
        a = mk(0, df); jax.block_until_ready(a)
        _ = np.asarray(fn(*a)[0])
        ts = []
        for r in (1, 2):
            a = mk(r, df); jax.block_until_ready(a)
            t0_ = time.perf_counter()
            o_ = fn(*a); _ = np.asarray(o_[0])
            ts.append(time.perf_counter() - t0_)
        nv = int(np.asarray(o_[1]))
        print(f"{mode:14s} {tag:>9}: {min(ts)*1e3:7.1f} ms   "
              f"visits/ray={nv/N:.2f}", flush=True)
print("PROF11 DONE", flush=True)
