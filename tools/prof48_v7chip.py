# Round-4 on-chip A/B: v4 (block-lockstep leaf-DMA) vs v7 (grouped
# leaf-DMA = v6's vectorized walks over the v4 split tables) on the REAL
# stress-scene waves (655k tris, table 77 MB >> VMEM residence).  One
# (wave, kernel) config per process — the axon tunnel's per-process
# executable budget and its cross-process result caching both demand it
# (CLAUDE.md 4b).
#
#   python tools/prof48_v7chip.py <wave> <kernel> [lpi] [unroll]
#     wave:   primary | bounce | shadow
#     kernel: v4 | v7
#     lpi:    leaves per leaf-iteration (v7: default 8; v4: BUAS_V4_LPI)
#
# Waves built exactly like production (prof43 methodology): primary =
# natural tile order; bounce = prefiltered survivors m6d-sorted into a
# compact prefix (host-side so the timed dispatch is ONLY the kernel);
# shadow = bounce-0 NEE occlusion wave.  Timing: varying real args +
# scalar-sum sync (pitfall 4b).
import os, sys, time

sys.path.insert(0, "/root/repo")

wave = sys.argv[1] if len(sys.argv) > 1 else "primary"
kernel = sys.argv[2] if len(sys.argv) > 2 else "v4"
lpi = sys.argv[3] if len(sys.argv) > 3 else "8"
unroll = sys.argv[4] if len(sys.argv) > 4 else "2"
if kernel == "v7":
    os.environ["BUAS_PACKET_V7"] = "1"
    os.environ["BUAS_V5_LPI"] = lpi
    os.environ["BUAS_V5_UNROLL"] = unroll
    groups = 8
else:
    os.environ["BUAS_PACKET_V7"] = "0"
    groups = 1

import jax

CPU = os.environ.get("PROF48_CPU", "0") == "1"  # interpret-mode smoke
if CPU:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

W, H = (256, 128) if CPU else (1920, 1080)
N = W * H
import bench as B

sc = B.build_stress_scene(W, H)
ps = sc.pack()
assert ps.v4_res is not None, "stress scene must split for the DMA path"
V4T = (ps.v4_res, ps.v4_leaf)
print(f"res rows {ps.v4_res.shape} leaf rows {ps.v4_leaf.shape}", flush=True)

from buas_pathtracer_tpu.core import rng
from buas_pathtracer_tpu.core.vec import Vec3, dot, normalize
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.ops import pallas_packet as pp
from buas_pathtracer_tpu.ops import traverse_wide as tw
from buas_pathtracer_tpu.ops.shading import map_to_cosine_weighted_hemisphere
from buas_pathtracer_tpu.ops.wide_bvh import WIDE
from buas_pathtracer_tpu.runtime.render import _tiled

py_, px_ = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32),
                        jnp.arange(W, dtype=jnp.int32), indexing="ij")
PX = _tiled(px_).astype(jnp.float32)
PY = _tiled(py_).astype(jnp.float32)


@jax.jit
def make_all(r):
    z = jnp.zeros((N,)) + r * 1e-7
    pr = cm.generate_rays(sc.camera, PX, PY, W, H, z + 0.5, z + 0.5, z, z,
                          0.0, 1.0, 6, 0.0, 0.0)
    hit = tw.intersect_scene(ps, pr.o, pr.d)
    live = hit.valid
    st = rng.seed_state((PX * 7 + PY * 13).astype(jnp.uint32)
                        + jnp.uint32(17) * r.astype(jnp.uint32))
    st, u1 = rng.next_unilateral(st)
    st, u2 = rng.next_unilateral(st)
    Nrm = Vec3(jnp.where(dot(pr.d, hit.n) < 0, hit.n.x, -hit.n.x),
               jnp.where(dot(pr.d, hit.n) < 0, hit.n.y, -hit.n.y),
               jnp.where(dot(pr.d, hit.n) < 0, hit.n.z, -hit.n.z))
    d1 = map_to_cosine_weighted_hemisphere(Nrm, u1, u2)
    o1 = hit.p + d1 * 1e-3
    # bounce-0 NEE shadow wave toward the light (sphere at (0,12,4), r=1.5)
    lp = Vec3(jnp.zeros(N), jnp.full((N,), 12.0), jnp.full((N,), 4.0))
    Ld = normalize(lp - hit.p)
    facing = (dot(Nrm, Ld) > 0.0) & live
    so_ = hit.p + Ld * 1e-3
    dist = jnp.sqrt(dot(lp - hit.p, lp - hit.p))
    return (pr.o.x, pr.o.y, pr.o.z, pr.d.x, pr.d.y, pr.d.z,
            o1.x, o1.y, o1.z, d1.x, d1.y, d1.z, live,
            so_.x, so_.y, so_.z, Ld.x, Ld.y, Ld.z, facing, dist)

vals = [np.asarray(x) for x in make_all(jnp.float32(0.0))]
(pox, poy, poz, pdx, pdy, pdz, ox, oy, oz, dx, dy, dz, live,
 sx, sy, sz, ldx, ldy, ldz, facing, dist) = vals

if wave == "primary":
    o3 = np.stack([pox, poy, poz], 1)
    d3 = np.stack([pdx, pdy, pdz], 1)
    t0 = np.full(N, tw.BIG_T, np.float32)
    occl = False
    order = np.arange(N)
else:
    if wave == "bounce":
        o3 = np.stack([ox, oy, oz], 1)
        d3 = np.stack([dx, dy, dz], 1)
        t0 = np.where(live, tw.BIG_T, -1.0).astype(np.float32)
        occl = False
    else:
        o3 = np.stack([sx, sy, sz], 1)
        d3 = np.stack([ldx, ldy, ldz], 1)
        t0 = np.where(facing, dist - 2e-3, -1.0).astype(np.float32)
        occl = True
    # host-side prefilter + m6d compaction (mirrors the dispatch)
    rows = np.asarray(ps.wide_rows)
    root = rows[0]
    with np.errstate(over="ignore", divide="ignore", invalid="ignore"):
        inv3 = np.where(np.abs(d3) > 1e-12, 1.0 / d3,
                        np.copysign(1e12, d3)).astype(np.float32)
    hitroot = np.zeros(N, bool)
    for c in range(WIDE):
        s = 2 + 6 * c
        with np.errstate(over="ignore", invalid="ignore"):
            t1 = (root[s:s + 3] - o3) * inv3
            t2 = (root[s + 3:s + 6] - o3) * inv3
        tn = np.minimum(t1, t2).max(1)
        tf = np.maximum(t1, t2).min(1)
        hitroot |= (tn < tf) & (tf > 0)
    surv = (t0 >= 0) & hitroot
    lo = np.asarray(ps.scene_lo, np.float64)
    hi = np.asarray(ps.scene_hi, np.float64)
    ext = np.maximum(hi - lo, 1e-6)
    q = np.clip((o3 - lo) / ext, 0, 1)
    c6 = [np.clip((q[:, i] * 64).astype(np.int64), 0, 63) for i in range(3)]
    dq = [np.clip(((d3[:, i] * 0.5 + 0.5) * 4).astype(np.int64), 0, 3)
          for i in range(3)]
    key = np.zeros(N, np.int64)
    shift = 0
    for b in range(6):
        for i in range(3):
            if b < 2:
                key |= ((dq[i] >> b) & 1) << shift
                shift += 1
        for i in range(3):
            key |= ((c6[i] >> b) & 1) << shift
            shift += 1
    key = np.where(surv, key, np.int64(1) << 60)
    order = np.argsort(key, kind="stable")
    nl = int(surv.sum())
    keep = -(-nl // 1024) * 1024
    order = order[:keep]
    t0 = t0[order].copy()
    o3 = o3[order].copy()
    d3 = d3[order].copy()
    print(f"{wave}: {nl} live -> {keep} compact lanes", flush=True)

n = o3.shape[0]
ign = jnp.full((n,), -1, jnp.int32)
oo = Vec3(jnp.asarray(o3[:, 0]), jnp.asarray(o3[:, 1]), jnp.asarray(o3[:, 2]))
dd = Vec3(jnp.asarray(d3[:, 0]), jnp.asarray(d3[:, 1]), jnp.asarray(d3[:, 2]))
t0j = jnp.asarray(t0)


@jax.jit
def walk(r):
    tt = t0j + jnp.where(t0j >= 0, r * 0.0, 0.0) + r * 1e-9
    out = pp.packet_traverse(ps.wide_rows, oo, dd, tt, ign,
                             occlusion=occl, groups=groups, interpret=CPU,
                             v4_tables=V4T)
    return out[0].sum() + out[1].sum() + out[5] + out[6]

_ = np.asarray(walk(jnp.float32(0.0)))
seed = int(time.time() * 1000) % 997
ts = []
for r in range(4):
    t0_ = time.perf_counter()
    _ = np.asarray(walk(jnp.float32(seed + r)))
    ts.append(time.perf_counter() - t0_)
el = min(ts) - 0.028
print(f"{wave} {kernel} lpi={lpi} unroll={unroll}: {el*1e3:7.1f} ms "
      f"({n/el/1e6:6.1f} Mrays/s over {n} lanes)  raw={min(ts)*1e3:.1f}",
      flush=True)
