# Round-4 OFFLINE simulator: predict lockstep iterations for two candidate
# kernel changes BEFORE building them (memory: standalone on-chip probes have
# twice failed to transfer; the exact lockstep sim (prof36) is the validated
# design loop):
#
#   1. G independent WALK GROUPS per (8,128) block (G = 1 is the current v2
#      kernel's single shared stack; G = 8 gives every sublane row its own
#      stack + current node).  Each group's per-iteration node is a scalar
#      row read; the slab/tri math stays one (8,128) VPU op with per-sublane
#      broadcast, so per-iteration VPU cost is ~flat in G while each group
#      walks only the union of its own 1024/G rays.  Lockstep iterations =
#      max over groups (idle groups waste their slot).
#   2. POP CULLING: push stores the block-min slab-entry key next to the
#      node; the pop compares it against the CURRENT max live t of the
#      group and skips the whole body when key >= t_max (hits recorded
#      between push and pop tightened t).  A culled pop still costs its
#      lockstep slot (counted separately — in the kernel it is a scalar
#      compare, ~free vs the ~150-vector-op body).
#
# Waves: the real bounce-1 diffuse wave (dominant frame cost, m6d-sorted
# like production dispatch) and the primary closest-hit wave (natural tile
# order — the 100 Mrays/s headline workload).
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
def make_waves(r):
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

(pox, poy, poz, pdx, pdy, pdz,
 ox, oy, oz, dx, dy, dz, live) = (np.asarray(x) for x in
                                  make_waves(jnp.float32(0.0)))

po3 = np.stack([pox, poy, poz], 1).astype(np.float32)
pd3 = np.stack([pdx, pdy, pdz], 1).astype(np.float32)
o3 = np.stack([ox, oy, oz], 1).astype(np.float32)
d3 = np.stack([dx, dy, dz], 1).astype(np.float32)

# ---- bounce wave: prefilter + m6d(6,2) order (production dispatch) -------
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
print(f"bounce wave: live {live.mean()*100:.0f}%, survivors {NL}", flush=True)

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


ORDER = np.argsort(spread6(6, 2), kind="stable")

BLOCK = 1024
kind_np = rows[:, 0].astype(np.int32)


def sim_block_multi(o, d, G, pop_cull):
    """Exact lockstep walk of one 1024-ray block with G independent groups
    (contiguous 1024/G-ray slices) and optional pop culling.  Returns
    (lockstep_iters, full_bodies, culled_pops)."""
    n = o.shape[0]
    gs = n // G
    with np.errstate(over="ignore", divide="ignore", invalid="ignore"):
        inv = np.where(np.abs(d) > 1e-12, 1.0 / d,
                       np.copysign(1e12, d)).astype(np.float32)
    t = np.full(n, tw.BIG_T, np.float32)
    stacks = [[(0, 0.0)] for _ in range(G)]
    iters = 0
    bodies = 0
    culled = 0
    while any(stacks):
        iters += 1
        for g in range(G):
            if not stacks[g]:
                continue
            sl = slice(g * gs, (g + 1) * gs)
            og, dg, invg = o[sl], d[sl], inv[sl]
            cur, key = stacks[g].pop()
            if pop_cull and key >= float(t[sl].max()):
                culled += 1
                continue
            bodies += 1
            row = rows[cur]
            k = kind_np[cur]
            if k == KIND_INTERNAL:
                base = int(row[1])
                cands = []
                for c in range(WIDE):
                    s = 2 + 6 * c
                    with np.errstate(over="ignore", invalid="ignore"):
                        t1 = (row[s:s + 3] - og) * invg
                        t2 = (row[s + 3:s + 6] - og) * invg
                    tn = np.minimum(t1, t2).max(1)
                    tf = np.maximum(t1, t2).min(1)
                    h = (tn < tf) & (tf > 0) & (tn < t[sl])
                    if h.any():
                        tmin = float(np.maximum(tn, 0.0)[h].min())
                        cands.append((c, tmin))
                cands.sort(key=lambda x: -x[1])  # farthest pushed first
                for c, tmin in cands:
                    stacks[g].append((base + c, tmin))
            elif k == KIND_TRIS:
                cnt = int(row[1])
                for kk in range(cnt):
                    s = 8 + 9 * kk
                    a, e1, e2 = row[s:s + 3], row[s + 3:s + 6], row[s + 6:s + 9]
                    pv = np.cross(dg, np.broadcast_to(e2, dg.shape))
                    det = (e1 * pv).sum(1)
                    ok = np.abs(det) >= its.TRI_EPS
                    invd = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
                    tv = og - a
                    v_ = (tv * pv).sum(1) * invd
                    qv = np.cross(tv, np.broadcast_to(e1, dg.shape))
                    w_ = (dg * qv).sum(1) * invd
                    tn = (np.broadcast_to(e2, dg.shape) * qv).sum(1) * invd
                    h = (ok & (v_ >= 0) & (v_ <= 1) & (w_ >= 0)
                         & (v_ + w_ <= 1) & (tn >= its.TRI_EPS) & (t[sl] >= tn))
                    t[sl] = np.where(h, tn, t[sl])
            else:
                m = row[4:16].reshape(3, 4)
                oo = og @ m[:, :3].T + m[:, 3]
                dd = dg @ m[:, :3].T
                ptype = int(row[2])
                if ptype == PRIM_SPHERE:
                    b_ = (oo * dd).sum(1)
                    cc = (oo * oo).sum(1) - row[16] * row[16]
                    a2 = (dd * dd).sum(1)
                    disc = b_ * b_ - a2 * cc
                    okp = disc > 0
                    sq = np.sqrt(np.maximum(disc, 0))
                    t0_ = (-b_ - sq) / np.maximum(a2, 1e-30)
                    t1_ = (-b_ + sq) / np.maximum(a2, 1e-30)
                    tc = np.where(t0_ > 1e-4, t0_, t1_)
                    h = okp & (tc > 1e-4) & (tc < t[sl])
                    t[sl] = np.where(h, tc, t[sl])
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
                    h = (tn < tf) & (tf > 0) & (tn < t[sl]) & (tn > 1e-4)
                    t[sl] = np.where(h, tn, t[sl])
    return iters, bodies, culled


def run(wave_name, o_all, d_all, sel_ids, order, nblk=10):
    nb = sel_ids.size // BLOCK
    picks = np.linspace(0, nb - 1, nblk).astype(int)
    print(f"--- {wave_name}: {nb} blocks, sampling {nblk} ---", flush=True)
    base = None
    for G in (1, 2, 4, 8):
        for cull in (False, True):
            t0 = time.perf_counter()
            it_l, bd_l, cu_l = [], [], []
            for p in picks:
                sel = sel_ids[order[p * BLOCK:(p + 1) * BLOCK]]
                i_, b_, c_ = sim_block_multi(o_all[sel], d_all[sel], G, cull)
                it_l.append(i_); bd_l.append(b_); cu_l.append(c_)
            mi = np.mean(it_l)
            if base is None:
                base = mi
            print(f"G={G} cull={int(cull)}: lockstep {mi:6.0f} "
                  f"(x{base/mi:4.2f} vs v2)  bodies {np.mean(bd_l):6.0f}  "
                  f"culled {np.mean(cu_l):5.0f}  p90 {np.percentile(it_l,90):6.0f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)


# primary wave: natural tile order, all rays live
run("primary closest-hit (natural tiles)", po3, pd3,
    np.arange(N), np.arange(N), nblk=8)

# bounce-1 wave: prefiltered survivors in m6d order
run("bounce-1 diffuse (m6d-compacted)", o3, d3, ids, ORDER, nblk=8)
print("PROF40 DONE", flush=True)
