# Packet-traversal kernel on the real TPU: primary rays + captured REAL
# bounce wavefronts (/tmp/wave_b2.npz from tools/prof17.py) + shadow-like.
import time, sys, os
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
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.core.vec import Vec3

print(f"rows={ps.wide_rows.shape} ({ps.wide_rows.size*4/1e6:.1f} MB)",
      flush=True)


def primary(r, tile=0):
    # SCANLINE order: the real renderer's pixel order (blocks are 1024
    # consecutive pixels of a row).  tile=k reorders into (k, 1024//k)
    # pixel tiles per block.
    py_, px_ = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32),
                            jnp.arange(W, dtype=jnp.int32), indexing="ij")
    px = px_.reshape(-1).astype(jnp.float32)
    py = py_.reshape(-1).astype(jnp.float32)
    if tile:
        tw_, th_ = 1024 // tile, tile
        gx, gy = W // tw_, H // th_
        yi = py_.reshape(-1) // th_
        xi = px_.reshape(-1) // tw_
        order = ((yi * gx + xi) * (tw_ * th_)
                 + (py_.reshape(-1) % th_) * tw_ + px_.reshape(-1) % tw_)
        inv = jnp.argsort(order)
        px, py = px[inv], py[inv]
    z = jnp.zeros((N,)) + r * 1e-7
    pr = cm.generate_rays(sc.camera, px, py, W, H, z + 0.5, z + 0.5, z, z,
                          0.0, 1.0, 6, 0.0, 0.0)
    t0 = jnp.full((N,), tw.BIG_T)
    ign = jnp.full((N,), -1, jnp.int32)
    return pr.o.x, pr.o.y, pr.o.z, pr.d.x, pr.d.y, pr.d.z, t0, ign


def wave(path, r):
    w = np.load(path)
    t0 = np.where(w["alive"], tw.BIG_T, -1.0).astype(np.float32)
    ign = np.full((N,), -1, np.int32)
    # tiny seed-dependent jitter so calls are not deduped
    return (jnp.asarray(w["ox"]) + r * 1e-6, jnp.asarray(w["oy"]),
            jnp.asarray(w["oz"]), jnp.asarray(w["dx"]),
            jnp.asarray(w["dy"]), jnp.asarray(w["dz"]),
            jnp.asarray(t0), jnp.asarray(ign))


@jax.jit
def closest(ox, oy, oz, dx, dy, dz, t0, ign):
    out = pp.packet_traverse(ps.wide_rows, Vec3(ox, oy, oz),
                             Vec3(dx, dy, dz), t0, ign, occlusion=False)
    return out[0].sum() + out[1].sum(), out[5]


@jax.jit
def shadow(ox, oy, oz, dx, dy, dz, t0, ign):
    out = pp.packet_traverse(ps.wide_rows, Vec3(ox, oy, oz),
                             Vec3(dx, dy, dz),
                             jnp.where(t0 > 0, 8.0, t0), ign, occlusion=True)
    return (out[1] >= 0).sum(), out[5]


def tmin(fn, mk, reps=3):
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
        ("closest scanline", closest, primary),
        ("closest 8x128 tile", closest, lambda r: primary(r, tile=8)),
        ("closest 32x32 tile", closest, lambda r: primary(r, tile=32)),
        ("closest wave_b2 (10% live)", closest,
         lambda r: wave("/tmp/wave_b2.npz", r)),
        ("shadow scanline", shadow, primary)):
    dt, o = tmin(fn, mk)
    nv = float(np.asarray(o[1]))
    print(f"{tag:28s}: {dt*1e3:7.1f} ms  {N/dt/1e6:6.1f} Mrays/s  "
          f"block-visits/ray={nv/N:.2f}", flush=True)
print("PROF19 DONE", flush=True)
