# Round-3 OFFLINE lockstep simulator: replay the EXACT packet-kernel walk
# (block-shared stack, per-ray best-t, block-uniform pop) on sample blocks
# of the real bounce-1 wave, and count iterations exactly.  The serial
# union replay (prof31) underestimates on-chip iterations ~2.9x because a
# block's pop ORDER is shared: with mixed directions, min-tn-nearest-first
# is near-optimal for some rays and terrible for the rest, whose loose t
# keeps expanding the visit set.  This sim evaluates push-order heuristics
# and sort keys end-to-end, offline:
#   * minTn   — current kernel order (block-nearest first by min over rays)
#   * pop     — most-popular child first (count of rays whose slab passes)
#   * popTn   — popularity / distance hybrid
import os, sys, time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

W, H = 1920, 1080
N = W * H
import bench as B

sc = B.build_bench_scene(W, H)
ps = sc.pack()
rows = np.asarray(ps.wide_rows)

from buas_pathtracer_tpu.core import rng
from buas_pathtracer_tpu.core.vec import Vec3, dot
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.models.scene import PRIM_SPHERE
from buas_pathtracer_tpu.ops import traverse_wide as tw
from buas_pathtracer_tpu.ops import intersect as its
from buas_pathtracer_tpu.ops.shading import map_to_cosine_weighted_hemisphere
from buas_pathtracer_tpu.ops.wide_bvh import (KIND_INTERNAL, KIND_PRIM,
                                              KIND_TRIS, WIDE, WIDE_LEAF)
from buas_pathtracer_tpu.runtime.render import _tiled

py_, px_ = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32),
                        jnp.arange(W, dtype=jnp.int32), indexing="ij")
PX = _tiled(px_).astype(jnp.float32)
PY = _tiled(py_).astype(jnp.float32)


@jax.jit
def make_wave(r):
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
    return o1.x, o1.y, o1.z, d1.x, d1.y, d1.z, live

ox, oy, oz, dx, dy, dz, live = (np.asarray(x) for x in
                                make_wave(jnp.float32(0.0)))

o3 = np.stack([ox, oy, oz], 1).astype(np.float32)
d3 = np.stack([dx, dy, dz], 1).astype(np.float32)

# ---- prefilter + m6d order (matches the production dispatch) -------------
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
surv = live & hitroot
ids = np.nonzero(surv)[0]
NL = ids.size
print(f"live {live.mean()*100:.0f}%, survivors {NL}", flush=True)

lo = np.asarray(ps.scene_lo, np.float64)
hi = np.asarray(ps.scene_hi, np.float64)
ext = np.maximum(hi - lo, 1e-6)
q = (o3[ids] - lo) / ext
dl = d3[ids]


def spread6(pbits, dbits):
    c = [np.clip((q[:, i] * (1 << pbits)).astype(np.int64), 0,
                 (1 << pbits) - 1) for i in range(3)]
    dq = [np.clip(((dl[:, i] * 0.5 + 0.5) * (1 << dbits)).astype(np.int64),
                  0, (1 << dbits) - 1) for i in range(3)]
    out = np.zeros(NL, np.int64)
    shift = 0
    for b in range(max(pbits, dbits)):
        for i in range(3):
            if b < dbits:
                out |= ((dq[i] >> b) & 1) << shift
                shift += 1
        for i in range(3):
            if b < pbits:
                out |= ((c[i] >> b) & 1) << shift
                shift += 1
    return out


KEYS = {
    "m6d(6,2)": spread6(6, 2),
    "m6d(5,3)": spread6(5, 3),
    "m6d(7,1)": spread6(7, 1),
}

NBLK, BLOCK = 16, 1024

# ---- exact lockstep block walk in numpy ----------------------------------
kind_np = rows[:, 0].astype(np.int32)


def sim_block(o, d, heuristic):
    n = o.shape[0]
    with np.errstate(over="ignore", divide="ignore", invalid="ignore"):
        inv = np.where(np.abs(d) > 1e-12, 1.0 / d,
                       np.copysign(1e12, d)).astype(np.float32)
    t = np.full(n, tw.BIG_T, np.float32)
    stack = [0]
    iters = 0
    while stack:
        cur = stack.pop()
        iters += 1
        row = rows[cur]
        k = kind_np[cur]
        if k == KIND_INTERNAL:
            base = int(row[1])
            cands = []
            for c in range(WIDE):
                s = 2 + 6 * c
                with np.errstate(over="ignore", invalid="ignore"):
                    t1 = (row[s:s + 3] - o) * inv
                    t2 = (row[s + 3:s + 6] - o) * inv
                tn = np.minimum(t1, t2).max(1)
                tf = np.maximum(t1, t2).min(1)
                h = (tn < tf) & (tf > 0) & (tn < t)
                cnt = int(h.sum())
                if cnt:
                    tmin = float(np.maximum(tn, 0.0)[h].min())
                    cands.append((c, cnt, tmin))
            if heuristic == "minTn":
                cands.sort(key=lambda x: -x[2])  # farthest pushed first
            elif heuristic == "pop":
                cands.sort(key=lambda x: x[1])   # least popular first
            else:  # popTn: popularity / (1+dist)
                cands.sort(key=lambda x: x[1] / (1.0 + x[2]))
            for c, _, _ in cands:
                stack.append(base + c)
        elif k == KIND_TRIS:
            cnt = int(row[1])
            inst = np.float32(row[3])
            for kk in range(cnt):
                s = 8 + 9 * kk
                a, e1, e2 = row[s:s + 3], row[s + 3:s + 6], row[s + 6:s + 9]
                pv = np.cross(d, np.broadcast_to(e2, d.shape))
                det = (e1 * pv).sum(1)
                ok = np.abs(det) >= its.TRI_EPS
                invd = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
                tv = o - a
                v_ = (tv * pv).sum(1) * invd
                qv = np.cross(tv, np.broadcast_to(e1, d.shape))
                w_ = (d * qv).sum(1) * invd
                tn = (np.broadcast_to(e2, d.shape) * qv).sum(1) * invd
                h = (ok & (v_ >= 0) & (v_ <= 1) & (w_ >= 0) & (v_ + w_ <= 1)
                     & (tn >= its.TRI_EPS) & (t >= tn))
                t = np.where(h, tn, t)
        else:  # analytic prim: conservative — treat as sphere/box via jnp path
            m = row[4:16].reshape(3, 4)
            oo = o @ m[:, :3].T + m[:, 3]
            dd = d @ m[:, :3].T
            ptype = int(row[2])
            if ptype == PRIM_SPHERE:
                b_ = (oo * dd).sum(1)
                cc = (oo * oo).sum(1) - row[16] * row[16]
                disc = b_ * b_ - (dd * dd).sum(1) * cc
                okp = disc > 0
                sq = np.sqrt(np.maximum(disc, 0))
                a2 = (dd * dd).sum(1)
                t0_ = (-b_ - sq) / np.maximum(a2, 1e-30)
                t1_ = (-b_ + sq) / np.maximum(a2, 1e-30)
                tc = np.where(t0_ > 1e-4, t0_, t1_)
                h = okp & (tc > 1e-4) & (tc < t)
                t = np.where(h, tc, t)
            else:
                br = row[17:20]
                with np.errstate(over="ignore", divide="ignore",
                                 invalid="ignore"):
                    iv = np.where(np.abs(dd) > 1e-12, 1.0 / dd,
                                  np.copysign(1e12, dd))
                    t1 = (-br - oo) * iv
                    t2 = (br - oo) * iv
                tn = np.minimum(t1, t2).max(1)
                tf = np.maximum(t1, t2).min(1)
                h = (tn < tf) & (tf > 0) & (tn < t) & (tn > 1e-4)
                t = np.where(h, tn, t)
    return iters


for kname, key in KEYS.items():
    order = np.argsort(key, kind="stable")
    nb = NL // BLOCK
    picks = np.linspace(0, nb - 1, NBLK).astype(int)
    for heur in ("minTn", "pop", "popTn"):
        t0 = time.perf_counter()
        iters = []
        for p in picks:
            sel = ids[order[p * BLOCK:(p + 1) * BLOCK]]
            iters.append(sim_block(o3[sel], d3[sel], heur))
        est_ms = np.mean(iters) * nb * 0.35e-3
        print(f"{kname:10s} {heur:6s}: mean {np.mean(iters):6.0f} "
              f"iters/block  p90 {np.percentile(iters, 90):6.0f}  "
              f"-> est kernel {est_ms:5.0f} ms over {nb} blocks "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)
print("PROF36 DONE", flush=True)
