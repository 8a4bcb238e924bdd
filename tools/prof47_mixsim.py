# Round-4 OFFLINE simulator #3: where do the bounce-wave kernel's
# iterations go, and what would a MIXED-KIND iteration win?
#
# Models, per sampled (8,128) block of the REAL m6d-compacted bounce wave
# (G=8 groups of 128 rays):
#   prod   — the production v6 policy EXACTLY: per iteration
#            do_leaf = (n_leaf > n_int) | (n_int == 0) | overflow-guard;
#            a leaf iteration runs LPI reps, each ready group popping one
#            leaf row per rep; an internal iteration pops one stack node
#            per ready group.
#   mixed  — per-group INDEPENDENT choice each iteration: a group with
#            queued leaves beyond a threshold (or an empty stack) consumes
#            up to LPI leaf rows, else pops one internal node.  The
#            iteration pays BOTH bodies if both kinds are present.
#   indep  — per-group fully independent walks (lower bound): iterations
#            = max over groups of ceil(own schedule length); models what
#            per-ray-progress/persistent-queue designs chase.
#
# Cost model (ns/iteration/block), calibrated against prof42 + the
# measured end-to-end 256 us/block at v6 lpi8+unroll2:
#   internal body (slab + routing, v6) ~ IC; leaf rep (6xMT + state) ~ LC;
#   fixed per-iteration overhead (policy + fetch latency) ~ FC.
# We report RELATIVE totals under the same model, so miscalibration
# shifts every candidate equally.
import sys
import time

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
from buas_pathtracer_tpu.ops import traverse_wide as tw
from buas_pathtracer_tpu.ops import intersect as its
from buas_pathtracer_tpu.ops.shading import map_to_cosine_weighted_hemisphere
from buas_pathtracer_tpu.ops.wide_bvh import (KIND_INTERNAL, KIND_TRIS, WIDE)
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
    return (o1.x, o1.y, o1.z, d1.x, d1.y, d1.z, live)

(ox, oy, oz, dx, dy, dz, live) = (np.asarray(x) for x in
                                  make_waves(jnp.float32(0.0)))
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

c6 = [np.clip((q[:, i] * 64).astype(np.int64), 0, 63) for i in range(3)]
dq = [np.clip(((dl[:, i] * 0.5 + 0.5) * 4).astype(np.int64), 0, 3)
      for i in range(3)]
key = np.zeros(NL, np.int64)
shift = 0
for b in range(6):
    for i in range(3):
        if b < 2:
            key |= ((dq[i] >> b) & 1) << shift
            shift += 1
    for i in range(3):
        key |= ((c6[i] >> b) & 1) << shift
        shift += 1
ORDER = np.argsort(key, kind="stable")
BLOCK = 1024
G = 8
GS = BLOCK // G
LPI = 8
LQ_CAP = 96
kind_np = rows[:, 0].astype(np.int32)
child_base_np = rows[:, 1].astype(np.int32)


class Group:
    __slots__ = ("o", "d", "inv", "t", "stack", "leaves")

    def __init__(self, o, d):
        self.o, self.d = o, d
        with np.errstate(over="ignore", divide="ignore", invalid="ignore"):
            self.inv = np.where(np.abs(d) > 1e-12, 1.0 / d,
                                np.copysign(1e12, d)).astype(np.float32)
        self.t = np.full(o.shape[0], tw.BIG_T, np.float32)
        self.stack = []
        self.leaves = []  # leaf OR prim rows (prod treats both as queue)
        k = int(kind_np[0])
        if k == KIND_INTERNAL:
            self.stack = [0]
        else:
            self.leaves = [0]


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
    cands.sort(key=lambda x: -x[1])
    for node, _ in cands:
        if int(kind_np[node]) == KIND_INTERNAL:
            g.stack.append(node)
        else:
            g.leaves.append(node)


def step_leaf(g: Group):
    cur = g.leaves.pop()
    row = rows[cur]
    if int(kind_np[cur]) != KIND_TRIS:
        return  # analytic prim: cost carried by the leaf rep slot
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


def sim_prod(groups):
    """Production v6: kind-uniform iterations, leaf iterations run LPI
    reps.  Returns (int_iters, leaf_iters, int_pops, leaf_pops)."""
    ii = li = ipops = lpops = 0
    while True:
        n_int = sum(1 for g in groups if g.stack)
        n_leaf = sum(1 for g in groups if g.leaves)
        if n_int == n_leaf == 0:
            break
        max_lq = max(len(g.leaves) for g in groups)
        do_leaf = (n_leaf > n_int) or (n_int == 0) \
            or (max_lq >= LQ_CAP - 8 * LPI)
        if do_leaf:
            li += 1
            for _rep in range(LPI):
                for g in groups:
                    if g.leaves:
                        step_leaf(g)
                        lpops += 1
        else:
            ii += 1
            for g in groups:
                if g.stack:
                    step_internal(g)
                    ipops += 1
    return ii, li, ipops, lpops


def sim_mixed(groups, lpi):
    """Per-group independent kind choice each iteration.  A group prefers
    draining leaves once it has any (keeps the t bound tight), else pops
    internal.  Iteration pays the internal body if ANY group popped
    internal, and `reps` leaf reps where reps = max leaf pops any group
    made (vector slots are shared).  Returns (iters, int_iters_any,
    leaf_rep_slots, int_pops, leaf_pops)."""
    it = ia = lrs = ipops = lpops = 0
    while True:
        if not any(g.stack or g.leaves for g in groups):
            break
        it += 1
        reps = 0
        any_int = False
        for g in groups:
            if g.leaves:
                k = 0
                while g.leaves and k < lpi:
                    step_leaf(g)
                    lpops += 1
                    k += 1
                reps = max(reps, k)
            elif g.stack:
                step_internal(g)
                ipops += 1
                any_int = True
        ia += 1 if any_int else 0
        lrs += reps
    return it, ia, lrs, ipops, lpops


def sim_indep(groups, lpi):
    """Lower bound: every group runs its own schedule independently;
    block cost = max over groups of (own int steps * IC + own leaf reps
    * LC)."""
    per_g = []
    for g in groups:
        ii = lr = 0
        while g.stack or g.leaves:
            if g.leaves:
                k = 0
                while g.leaves and k < lpi:
                    step_leaf(g)
                    k += 1
                lr += 1
            else:
                step_internal(g)
                ii += 1
        per_g.append((ii, lr))
    return per_g


def run(nblk=24, seed=7):
    nb = NL // BLOCK
    rs = np.random.RandomState(seed)
    picks = rs.choice(nb, size=min(nblk, nb), replace=False)
    print(f"bounce wave: {NL} live rays, {nb} blocks, sampling {len(picks)}",
          flush=True)

    # calibration: v6 measured ~256 us/block end-to-end.  prof42 bodies:
    # internal slab ~315 ns + v6 routing ~300 ns -> IC ~ 615; leaf rep 6xMT
    # ~285 ns; fixed policy/fetch ~100 ns.
    IC, LC, FC = 615.0, 285.0, 100.0

    tots = {"prod": 0.0, "mixed": 0.0, "indep": 0.0}
    acc = {"prod": np.zeros(4), "mixed": np.zeros(5)}
    t0 = time.perf_counter()
    for p in picks:
        sel = ids[ORDER[p * BLOCK:(p + 1) * BLOCK]]
        o_b, d_b = o3[sel], d3[sel]

        def mk():
            return [Group(o_b[g * GS:(g + 1) * GS],
                          d_b[g * GS:(g + 1) * GS]) for g in range(G)]

        ii, li, ipop, lpop = sim_prod(mk())
        acc["prod"] += (ii, li, ipop, lpop)
        tots["prod"] += ii * (IC + FC) + li * (LPI * LC + FC)

        it, ia, lrs, ipop2, lpop2 = sim_mixed(mk(), LPI)
        acc["mixed"] += (it, ia, lrs, ipop2, lpop2)
        tots["mixed"] += ia * IC + lrs * LC + it * FC

        per_g = sim_indep(mk(), LPI)
        tots["indep"] += max(ii_ * (IC + FC) + lr_ * (LPI * LC + FC)
                             for ii_, lr_ in per_g)
    k = len(picks)
    pr = acc["prod"] / k
    mx = acc["mixed"] / k
    print(f"prod : int_iters {pr[0]:6.1f}  leaf_iters {pr[1]:6.1f}  "
          f"int_pops {pr[2]:7.1f} leaf_pops {pr[3]:7.1f}  "
          f"occupancy int {pr[2]/(pr[0]*G)*100:4.0f}% leaf "
          f"{pr[3]/(pr[1]*G*LPI)*100:4.0f}%  est {tots['prod']/k/1e3:6.1f} us/blk")
    print(f"mixed: iters {mx[0]:6.1f} (int-carrying {mx[1]:6.1f}, leaf rep "
          f"slots {mx[2]:7.1f})  int_pops {mx[3]:7.1f} leaf_pops {mx[4]:7.1f}"
          f"  est {tots['mixed']/k/1e3:6.1f} us/blk")
    print(f"indep lower bound: est {tots['indep']/k/1e3:6.1f} us/blk")
    print(f"ratios vs prod: mixed x{tots['prod']/max(tots['mixed'],1):.2f}, "
          f"indep x{tots['prod']/max(tots['indep'],1):.2f}  "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)


run()
print("PROF47 DONE", flush=True)
