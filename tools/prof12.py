# Decompose _traverse's whole-batch machinery: pack, sort+permute, scan
# staging, loop work, final scatter.  Cumulative variants; differences
# isolate each component.
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
eye = jnp.eye(tw._NCOL, dtype=jnp.float32)
print(f"CHUNK={CHUNK} chunks={c}", flush=True)


def mk(r, dead_frac=0.0):
    k = jax.random.PRNGKey(r)
    px = jax.random.uniform(k, (N,)) * W
    py = jax.random.uniform(jax.random.fold_in(k, 1), (N,)) * H
    z = jnp.zeros((N,))
    pr = cm.generate_rays(sc.camera, px, py, W, H, z + 0.5, z + 0.5, z, z,
                          0.0, 1.0, 6, 0.0, 0.0)
    t0 = jnp.full((N,), tw.BIG_T)
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


def make_variant(stage):
    @jax.jit
    def f(o, d, t0, ign):
        big = pack_big(o, d, t0, ign)
        nv = jnp.zeros((), jnp.int32)
        tt = jnp.zeros((), jnp.int32)
        chunk_ix = jnp.arange(c, dtype=jnp.int32) * CHUNK
        if stage >= 1:
            for cap in list(tw.PHASE_CAPS) + [None]:
                done_col = big[:, tw._C_DONE]
                perm = jnp.argsort(done_col, stable=True)
                big = big[perm]
                n_todo = npad - jnp.sum(done_col.astype(jnp.int32))
                flags = chunk_ix < n_todo
                if stage == 2:
                    flags = jnp.zeros_like(flags)  # staging only, never run
                if stage >= 2:
                    def step(carry_st, xs, cap=cap):
                        nv, tt = carry_st
                        flag, blk = xs
                        nblk, dnv, dtt = jax.lax.cond(
                            flag, lambda b: run_blk(b, cap),
                            lambda b: (b, jnp.zeros((), jnp.int32),
                                       jnp.zeros((), jnp.int32)), blk)
                        return (nv + dnv, tt + dtt), nblk
                    (nv, tt), big3 = jax.lax.scan(
                        step, (nv, tt),
                        (flags, big.reshape(c, CHUNK, tw._NCOL)))
                    big = big3.reshape(npad, tw._NCOL)
        if stage >= 4:
            orig = tw._i32(big[:, tw._C_ORIG])
            big = jnp.zeros((npad, tw._NCOL), jnp.float32).at[orig].set(
                big, unique_indices=True)
        return big[:, tw._C_T].sum() + big[:, tw._C_PRIM].sum(), nv
    return f


NAMES = {0: "pack only", 1: "pack+3x(sort+permute)", 2: "  +scan staging",
         3: "  +loop work (no unscatter)", 4: "full"}
for stage in (0, 1, 2, 3, 4):
    fn = make_variant(stage)
    a = mk(0); jax.block_until_ready(a)
    _ = np.asarray(fn(*a)[0])
    ts = []
    for r in (1, 2):
        a = mk(r); jax.block_until_ready(a)
        t0_ = time.perf_counter()
        o_ = fn(*a); _ = np.asarray(o_[0])
        ts.append(time.perf_counter() - t0_)
    print(f"stage {stage} {NAMES[stage]:30s}: {min(ts)*1e3:7.1f} ms",
          flush=True)
print("PROF12 DONE", flush=True)
