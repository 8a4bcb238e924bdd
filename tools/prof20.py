# Packet policy tuning: Morton-compacted vs natural on real bounce waves.
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
from buas_pathtracer_tpu.core.vec import Vec3

rows = ps.wide_rows


def wave(path, r, live_override=None):
    w = np.load(path)
    alive = w["alive"]
    if live_override is not None:
        # force higher liveness by resurrecting dead rays (keeps geometry)
        rng = np.random.RandomState(7)
        need = int(live_override * N) - alive.sum()
        dead_ids = np.where(~alive)[0]
        if need > 0:
            alive = alive.copy()
            alive[rng.choice(dead_ids, need, replace=False)] = True
    t0 = np.where(alive, tw.BIG_T, -1.0).astype(np.float32)
    ign = np.full((N,), -1, np.int32)
    return (jnp.asarray(w["ox"]) + r * 1e-6, jnp.asarray(w["oy"]),
            jnp.asarray(w["oz"]), jnp.asarray(w["dx"]),
            jnp.asarray(w["dy"]), jnp.asarray(w["dz"]),
            jnp.asarray(t0), jnp.asarray(ign))


@jax.jit
def natural(ox, oy, oz, dx, dy, dz, t0, ign):
    out = pp.packet_traverse(rows, Vec3(ox, oy, oz), Vec3(dx, dy, dz),
                             t0, ign, occlusion=False)
    return out[0].sum() + out[1].sum(), out[5]


@jax.jit
def compacted_full(ox, oy, oz, dx, dy, dz, t0, ign):
    # full-capacity morton compaction: sort EVERYTHING (dead to the back),
    # walk all blocks (dead blocks skip), scatter back
    live = t0 >= 0.0
    key = jnp.where(live, pp._morton_key(Vec3(ox, oy, oz),
                                         Vec3(dx, dy, dz),
                                         ps.scene_lo, ps.scene_hi),
                    jnp.int32(0x7FFFFFFF))
    ids = jnp.argsort(key, stable=True)
    eye8 = jnp.eye(8, dtype=jnp.float32)
    big = jax.lax.dot_general(
        jnp.stack([ox, oy, oz, dx, dy, dz, t0, ign.astype(jnp.float32)]),
        eye8, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    blk = big[ids]
    bT = jax.lax.dot_general(
        eye8, blk, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    out = pp.packet_traverse(rows, Vec3(bT[0], bT[1], bT[2]),
                             Vec3(bT[3], bT[4], bT[5]), bT[6],
                             bT[7].astype(jnp.int32), occlusion=False)
    z = jnp.zeros((N,))
    t = z.at[ids].set(out[0], unique_indices=True)
    pr = jnp.zeros((N,), jnp.int32).at[ids].set(out[1], unique_indices=True)
    return t.sum() + pr.sum(), out[5]


def tmin(fn, mk, reps=2):
    a = mk(0)
    jax.block_until_ready(a)
    o = fn(*a)
    _ = np.asarray(o[0])
    ts = []
    for r in range(1, reps + 1):
        a = mk(r)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        o = fn(*a)
        _ = np.asarray(o[0])
        ts.append(time.perf_counter() - t0)
    return min(ts) - 0.028, o


for tag, fn, mk in (
        ("b1 53% natural", natural,
         lambda r: wave("/tmp/wave_b1.npz", r)),
        ("b1 53% morton-full", compacted_full,
         lambda r: wave("/tmp/wave_b1.npz", r)),
        ("b2 10% natural", natural,
         lambda r: wave("/tmp/wave_b2.npz", r)),
        ("b2 10% morton-full", compacted_full,
         lambda r: wave("/tmp/wave_b2.npz", r))):
    dt, o = tmin(fn, mk)
    nv = float(np.asarray(o[1]))
    print(f"{tag:24s}: {dt*1e3:7.1f} ms   block-visits/ray={nv/N:.2f}",
          flush=True)
print("PROF20 DONE", flush=True)
