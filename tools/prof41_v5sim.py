# Round-4 OFFLINE simulator #2: exact lockstep model of the CANDIDATE v5
# kernel — G independent walk groups per (8,128) block with KIND-UNIFORM
# iterations (prof40's naive grouped sim let different groups process
# different node kinds in one slot, which a real Mosaic kernel cannot:
# the uniform-branch trick needs one kind per iteration).
#
# v5 design simulated here:
#   * per-group INTERNAL stack (minTn order) + per-group LEAF queue + a
#     shared analytic-PRIM queue; internal pops route children by kind.
#   * each lockstep iteration is either an INTERNAL step (every group with
#     a nonempty stack pops one internal node; vectorized (8,64) row fetch
#     + slabs) or a LEAF step (every group with a queued leaf row consumes
#     one; vectorized 6xMT) or a PRIM step (rare).  Policy per iteration:
#     majority — pick the kind with the most ready groups.
#   * iteration costs differ: internal ~ slabs+sort+pushes, leaf ~ 6 MT
#     tests.  Report each count; the est uses v2's measured 0.35 us with a
#     1.0x/1.0x cost ratio plus a pessimistic 1.5x internal variant (the
#     64 scalar pushes).
#
# Sampling fix vs prof40: RANDOM blocks (the per-block iteration
# distribution is heavily skewed — linspace picks missed every
# icosphere-covering tile of the primary wave and reported 2 iters/block).
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
child_base_np = rows[:, 1].astype(np.int32)


class Group:
    __slots__ = ("o", "d", "inv", "t", "stack", "leaves", "prims", "sl")

    def __init__(self, o, d):
        self.o, self.d = o, d
        with np.errstate(over="ignore", divide="ignore", invalid="ignore"):
            self.inv = np.where(np.abs(d) > 1e-12, 1.0 / d,
                                np.copysign(1e12, d)).astype(np.float32)
        self.t = np.full(o.shape[0], tw.BIG_T, np.float32)
        self.stack = []   # internal nodes, farthest pushed first
        self.leaves = []  # leaf rows,     farthest pushed first
        self.prims = []
        k = int(kind_np[0])
        if k == KIND_INTERNAL:
            self.stack = [0]
        elif k == KIND_TRIS:
            self.leaves = [0]
        else:
            self.prims = [0]


def step_internal(g: Group):
    cur = g.stack.pop()
    row = rows[cur]
    base = child_base_np[cur]
    cands = []
    for c in range(WIDE):
        s = 2 + 6 * c
        with np.errstate(over="ignore", invalid="ignore"):
            t1 = (row[s:s + 3] - g.o) * g.inv
            t2 = (row[s + 3:s + 6] - g.o) * g.inv
        tn = np.minimum(t1, t2).max(1)
        tf = np.maximum(t1, t2).min(1)
        h = (tn < tf) & (tf > 0) & (tn < g.t)
        if h.any():
            tmin = float(np.maximum(tn, 0.0)[h].min())
            cands.append((base + c, tmin))
    cands.sort(key=lambda x: -x[1])  # farthest first -> nearest pops first
    for node, _ in cands:
        k = int(kind_np[node])
        if k == KIND_INTERNAL:
            g.stack.append(node)
        elif k == KIND_TRIS:
            g.leaves.append(node)
        else:
            g.prims.append(node)


def step_leaf(g: Group):
    cur = g.leaves.pop()
    row = rows[cur]
    cnt = int(row[1])
    for kk in range(cnt):
        s = 8 + 9 * kk
        a, e1, e2 = row[s:s + 3], row[s + 3:s + 6], row[s + 6:s + 9]
        pv = np.cross(g.d, np.broadcast_to(e2, g.d.shape))
        det = (e1 * pv).sum(1)
        ok = np.abs(det) >= its.TRI_EPS
        invd = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tv = g.o - a
        v_ = (tv * pv).sum(1) * invd
        qv = np.cross(tv, np.broadcast_to(e1, g.d.shape))
        w_ = (g.d * qv).sum(1) * invd
        tn = (np.broadcast_to(e2, g.d.shape) * qv).sum(1) * invd
        h = (ok & (v_ >= 0) & (v_ <= 1) & (w_ >= 0) & (v_ + w_ <= 1)
             & (tn >= its.TRI_EPS) & (g.t >= tn))
        g.t = np.where(h, tn, g.t)


def step_prim(g: Group):
    cur = g.prims.pop()
    row = rows[cur]
    m = row[4:16].reshape(3, 4)
    oo = g.o @ m[:, :3].T + m[:, 3]
    dd = g.d @ m[:, :3].T
    if int(row[2]) == PRIM_SPHERE:
        b_ = (oo * dd).sum(1)
        cc = (oo * oo).sum(1) - row[16] * row[16]
        a2 = (dd * dd).sum(1)
        disc = b_ * b_ - a2 * cc
        sq = np.sqrt(np.maximum(disc, 0))
        t0_ = (-b_ - sq) / np.maximum(a2, 1e-30)
        t1_ = (-b_ + sq) / np.maximum(a2, 1e-30)
        tc = np.where(t0_ > 1e-4, t0_, t1_)
        h = (disc > 0) & (tc > 1e-4) & (tc < g.t)
        g.t = np.where(h, tc, g.t)
    else:
        br = row[17:20]
        with np.errstate(over="ignore", divide="ignore", invalid="ignore"):
            iv = np.where(np.abs(dd) > 1e-12, 1.0 / dd, np.copysign(1e12, dd))
            t1 = (-br - oo) * iv
            t2 = (br - oo) * iv
        tn = np.minimum(t1, t2).max(1)
        tf = np.maximum(t1, t2).min(1)
        h = (tn < tf) & (tf > 0) & (tn < g.t) & (tn > 1e-4)
        g.t = np.where(h, tn, g.t)


def sim_v5(o, d, G):
    """Kind-uniform lockstep: per iteration pick the kind with the most
    ready groups (majority policy); groups without that kind idle.
    Returns (int_iters, leaf_iters, prim_iters, active_slot_frac)."""
    n = o.shape[0]
    gs = n // G
    groups = [Group(o[g * gs:(g + 1) * gs], d[g * gs:(g + 1) * gs])
              for g in range(G)]
    ii = li = pi = 0
    slots_used = slots_total = 0
    while True:
        n_int = sum(1 for g in groups if g.stack)
        n_leaf = sum(1 for g in groups if g.leaves)
        n_prim = sum(1 for g in groups if g.prims)
        if n_int == n_leaf == n_prim == 0:
            break
        best = max((n_int, 0), (n_leaf, 1), (n_prim, 2))
        k = best[1]
        slots_total += G
        if k == 0:
            ii += 1
            for g in groups:
                if g.stack:
                    step_internal(g)
                    slots_used += 1
        elif k == 1:
            li += 1
            for g in groups:
                if g.leaves:
                    step_leaf(g)
                    slots_used += 1
        else:
            pi += 1
            for g in groups:
                if g.prims:
                    step_prim(g)
                    slots_used += 1
    return ii, li, pi, slots_used / max(slots_total, 1)


def sim_v2(o, d):
    return sim_v5(o, d, 1)


def run(wave_name, o_all, d_all, sel_ids, order, nblk=48, seed=5):
    nb = sel_ids.size // BLOCK
    rs = np.random.RandomState(seed)
    picks = rs.choice(nb, size=min(nblk, nb), replace=False)
    print(f"--- {wave_name}: {nb} blocks, sampling {len(picks)} random ---",
          flush=True)
    res = {}
    for G in (1, 4, 8):
        t0 = time.perf_counter()
        tot = np.zeros(3)
        occ = []
        for p in picks:
            sel = sel_ids[order[p * BLOCK:(p + 1) * BLOCK]]
            ii, li, pi, frac = sim_v5(o_all[sel], d_all[sel], G)
            tot += (ii, li, pi)
            occ.append(frac)
        tot /= len(picks)
        iters = tot.sum()
        res[G] = iters
        est = iters * nb * 0.35e-3
        est_p = (tot[0] * 1.5 + tot[1] + tot[2]) * nb * 0.35e-3
        print(f"G={G}: iters/block {iters:7.1f} (int {tot[0]:.0f} leaf "
              f"{tot[1]:.0f} prim {tot[2]:.0f})  occupancy "
              f"{np.mean(occ)*100:4.0f}%  x{res[1]/iters:4.2f} vs G=1  "
              f"est {est:5.1f} ms (pess {est_p:5.1f}) "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)


run("primary closest-hit (natural tiles)", po3, pd3,
    np.arange(N), np.arange(N), nblk=64)
run("bounce-1 diffuse (m6d-compacted)", o3, d3, ids, ORDER, nblk=32)
print("PROF41 DONE", flush=True)
