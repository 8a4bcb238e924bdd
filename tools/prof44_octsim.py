# Round-4 OFFLINE ordering-quality sim: exact v2 lockstep iteration counts
# with the per-iteration distance SORT replaced by a BUILD-TIME octant
# permutation (children ordered by centroid projection along the block's
# majority direction-sign octant; mirrored octants pop the same perm in
# reverse).  Motivation: prof42 on chip shows the ordered push costs
# ~1030 ns/iter and the cost is the compare/select CHAIN itself (sort
# 1353 / rank 1324 / sortnc 1297 / sortst 1317 / push1 1369 vs stores8
# 306 and internal 315 ns) — so the only way to keep nearest-first
# descent cheaply is to precompute the order.  This sim answers the
# quality half: how many extra lockstep iterations does octant order
# cost vs the exact block-min-tn sort, on the REAL waves?
#
#   python tools/prof44_octsim.py [primary|bounce] [NBLK]
import os, sys, time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

wave = sys.argv[1] if len(sys.argv) > 1 else "bounce"
NBLK = int(sys.argv[2]) if len(sys.argv) > 2 else 16

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
                                              KIND_TRIS, WIDE)
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
    return (pr.o.x, pr.o.y, pr.o.z, pr.d.x, pr.d.y, pr.d.z,
            o1.x, o1.y, o1.z, d1.x, d1.y, d1.z, live)

vals = [np.asarray(x) for x in make_wave(jnp.float32(0.0))]
pox, poy, poz, pdx, pdy, pdz, ox, oy, oz, dx, dy, dz, live = vals

if wave == "primary":
    o3 = np.stack([pox, poy, poz], 1).astype(np.float32)
    d3 = np.stack([pdx, pdy, pdz], 1).astype(np.float32)
    order = np.arange(N)
    nblocks = N // 1024
else:
    o3 = np.stack([ox, oy, oz], 1).astype(np.float32)
    d3 = np.stack([dx, dy, dz], 1).astype(np.float32)
    # prefilter + m6d compaction, like the production dispatch (prof43)
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
    order = order[:nl]
    nblocks = max(nl // 1024, 1)
    print(f"bounce: {nl} live compact", flush=True)

kind_np = rows[:, 0].astype(np.int32)

# per-row, per-octant child perms from child AABB centroids (what the
# builder would precompute; octants 4..7 = reverse of 7-oct)
_int_rows = np.nonzero(kind_np == KIND_INTERNAL)[0]
cent = np.zeros((rows.shape[0], WIDE, 3), np.float32)
for c in range(WIDE):
    s = 2 + 6 * c
    cent[:, c] = 0.5 * (rows[:, s:s + 3] + rows[:, s + 3:s + 6])
SIGNS = np.array([[1 if o & (1 << i) else -1 for i in range(3)]
                  for o in range(8)], np.float32)
# perm[o] sorted NEAR FIRST along octant signs; empty-child slots sort last
PERMS = {}
for o in range(4):
    proj = (cent * SIGNS[o]).sum(2)  # (rows, WIDE)
    PERMS[o] = np.argsort(proj, axis=1, kind="stable")


def block_perm(row_id, octant):
    if octant < 4:
        return PERMS[octant][row_id]
    return PERMS[7 - octant][row_id][::-1]


def sim_block(o, d, heuristic):
    with np.errstate(over="ignore", divide="ignore", invalid="ignore"):
        inv = np.where(np.abs(d) > 1e-12, 1.0 / d,
                       np.copysign(1e12, d)).astype(np.float32)
    # block-majority direction octant
    s = (d.sum(0) > 0)
    octant = int(s[0]) | (int(s[1]) << 1) | (int(s[2]) << 2)
    t = np.full(o.shape[0], tw.BIG_T, np.float32)
    stack = [0]
    it_int = it_leaf = 0
    while stack:
        cur = stack.pop()
        row = rows[cur]
        k = kind_np[cur]
        if k == KIND_INTERNAL:
            it_int += 1
            base = int(row[1])
            hits = []
            tmins = []
            for c in range(WIDE):
                sl = 2 + 6 * c
                with np.errstate(over="ignore", invalid="ignore"):
                    t1 = (row[sl:sl + 3] - o) * inv
                    t2 = (row[sl + 3:sl + 6] - o) * inv
                tn = np.minimum(t1, t2).max(1)
                tf = np.maximum(t1, t2).min(1)
                h = (tn < tf) & (tf > 0) & (tn < t)
                hits.append(bool(h.any()))
                tmins.append(float(np.maximum(tn, 0.0)[h].min())
                             if h.any() else 1e30)
            if heuristic == "minTn":
                cands = sorted((c for c in range(WIDE) if hits[c]),
                               key=lambda c: -tmins[c])
                for c in cands:
                    stack.append(base + c)
            else:  # octant perm: near-first pop => push far first
                perm = block_perm(cur, octant)
                for c in perm[::-1]:
                    if hits[c]:
                        stack.append(base + int(c))
        elif k == KIND_TRIS:
            it_leaf += 1
            cnt = int(row[1])
            for kk in range(cnt):
                sl = 8 + 9 * kk
                a, e1, e2 = (row[sl:sl + 3], row[sl + 3:sl + 6],
                             row[sl + 6:sl + 9])
                pv = np.cross(d, np.broadcast_to(e2, d.shape))
                det = (e1 * pv).sum(1)
                ok = np.abs(det) >= its.TRI_EPS
                invd = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
                tv = o - a
                v_ = (tv * pv).sum(1) * invd
                qv = np.cross(tv, np.broadcast_to(e1, d.shape))
                w_ = (d * qv).sum(1) * invd
                tn = (np.broadcast_to(e2, d.shape) * qv).sum(1) * invd
                h = (ok & (v_ >= 0) & (v_ <= 1) & (w_ >= 0)
                     & (v_ + w_ <= 1) & (tn >= its.TRI_EPS) & (t >= tn))
                t = np.where(h, tn, t)
        else:
            it_leaf += 1
            m = row[4:16].reshape(3, 4)
            oo = o @ m[:, :3].T + m[:, 3]
            dd = d @ m[:, :3].T
            if int(row[2]) == PRIM_SPHERE:
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
    return it_int, it_leaf, t


def main():
    rs = np.random.RandomState(7)
    picks = rs.choice(nblocks, size=min(NBLK, nblocks), replace=False)
    tot = {"minTn": [0, 0], "oct": [0, 0]}
    mism = 0
    for p in picks:
        sel = order[p * 1024:(p + 1) * 1024]
        o, d = o3[sel], d3[sel]
        ii, il, tA = sim_block(o, d, "minTn")
        jj, jl, tB = sim_block(o, d, "oct")
        if not np.array_equal(tA, tB):
            mism += 1
        tot["minTn"][0] += ii
        tot["minTn"][1] += il
        tot["oct"][0] += jj
        tot["oct"][1] += jl
    nb = len(picks)
    for k, (a, b) in tot.items():
        print(f"{wave} {k:6s}: int {a/nb:7.1f}  leaf {b/nb:7.1f}  "
              f"total {(a+b)/nb:7.1f} iters/block", flush=True)
    # cost model from prof42 on chip: sort-internal 1353 ns, omask
    # candidate internal ~(see prof42 omask), leaf6 285 ns
    print(f"t-parity mismatched blocks: {mism}/{nb} "
          f"(order must not change results)", flush=True)


if __name__ == "__main__":
    main()
