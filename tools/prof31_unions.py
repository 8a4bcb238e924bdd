# Round-3 OFFLINE union study (CPU only, no TPU compiles).
#
# The packet kernel's incoherent-wave cost model is
#     time = blocks x mean(block union of node visits) x 0.35us
# (validated in docs/PERFORMANCE.md round 3).  The levers are (a) the sort
# key that packs rays into blocks and (b) the number of independent walkers
# per block (1 = current block-shared stack; 8 = one walker per sublane of
# 128 rays, paying mixed-kind bodies per iteration like kernel v1).
#
# This probe replays the REAL bounce-1 diffuse wave of the bench scene
# through a vmapped PER-RAY walk (same push semantics as the kernel:
# nearest-first, push iff tn < t at push time, no pop-time recheck) and
# measures, for each candidate ordering and walker count w in {1,2,4,8},
# the mean union of visited rows over groups of 1024/w rays.  Lockstep
# iterations for a w-walker block = max over its w groups.
#
# Also reports mean per-ray visits = the floor any per-ray-progress
# formulation (XLA phased path) pays.
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
rows_np = np.asarray(ps.wide_rows)
NROWS = rows_np.shape[0]
print(f"wide table: {NROWS} rows", flush=True)

from buas_pathtracer_tpu.core import rng
from buas_pathtracer_tpu.core.vec import Vec3, dot
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.models.scene import PRIM_SPHERE
from buas_pathtracer_tpu.ops import traverse_wide as tw
from buas_pathtracer_tpu.ops.wide_bvh import (KIND_INTERNAL, KIND_PRIM,
                                              KIND_TRIS, WIDE, WIDE_LEAF)
from buas_pathtracer_tpu.ops import intersect
from buas_pathtracer_tpu.ops.shading import map_to_cosine_weighted_hemisphere
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

t0 = time.perf_counter()
ox, oy, oz, dx, dy, dz, live = (np.asarray(x) for x in
                                make_wave(jnp.float32(0.0)))
print(f"wave built in {time.perf_counter()-t0:.0f}s; "
      f"live {live.mean()*100:.0f}%", flush=True)

# ---------------------------------------------------------------- per-ray walk
STACKS, LOGMAX = 192, 384


def walk_one(o3, d3):
    o = Vec3(o3[0], o3[1], o3[2])
    d = Vec3(d3[0], d3[1], d3[2])
    inv = intersect.safe_inv_dir(d)
    rows = ps.wide_rows

    def cond(st):
        return st[0] > 0

    def body(st):
        sp, stack, t, nlog, log = st
        sp = sp - 1
        cur = stack[sp]
        row = jax.lax.dynamic_index_in_dim(rows, cur, keepdims=False)
        kind = row[0].astype(jnp.int32)
        log = log.at[jnp.minimum(nlog, LOGMAX - 1)].set(cur.astype(jnp.int16))
        nlog = nlog + 1

        # internal: child slabs
        child_base = row[1].astype(jnp.int32)
        tns, hits = [], []
        for c in range(WIDE):
            s = 2 + 6 * c
            t1x = (row[s + 0] - o.x) * inv.x
            t2x = (row[s + 3] - o.x) * inv.x
            t1y = (row[s + 1] - o.y) * inv.y
            t2y = (row[s + 4] - o.y) * inv.y
            t1z = (row[s + 2] - o.z) * inv.z
            t2z = (row[s + 5] - o.z) * inv.z
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                         jnp.minimum(t1y, t2y)),
                             jnp.minimum(t1z, t2z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                         jnp.maximum(t1y, t2y)),
                             jnp.maximum(t1z, t2z))
            hits.append((tn < tf) & (tf > 0.0) & (tn < t))
            tns.append(jnp.maximum(tn, 0.0))
        keys = jnp.stack([jnp.where(h, tn, jnp.inf)
                          for h, tn in zip(hits, tns)])
        order = jnp.argsort(keys)  # nearest first
        is_int = kind == KIND_INTERNAL
        # push farthest first
        for j in range(WIDE - 1, -1, -1):
            c = order[j]
            ok = is_int & (keys[c] < jnp.inf) & (sp < STACKS)
            stack = stack.at[jnp.where(ok, sp, STACKS)].set(child_base + c)
            sp = sp + ok.astype(jnp.int32)

        # tri leaf
        is_tri = kind == KIND_TRIS
        count = row[1].astype(jnp.int32)
        for k in range(WIDE_LEAF):
            s = 8 + 9 * k
            a = Vec3(row[s], row[s + 1], row[s + 2])
            e1 = Vec3(row[s + 3], row[s + 4], row[s + 5])
            e2 = Vec3(row[s + 6], row[s + 7], row[s + 8])
            pv = Vec3(d.y * e2.z - d.z * e2.y, d.z * e2.x - d.x * e2.z,
                      d.x * e2.y - d.y * e2.x)
            det = e1.x * pv.x + e1.y * pv.y + e1.z * pv.z
            ok = jnp.abs(det) >= intersect.TRI_EPS
            invd = 1.0 / jnp.where(ok, det, 1.0)
            tv = Vec3(o.x - a.x, o.y - a.y, o.z - a.z)
            v_ = (tv.x * pv.x + tv.y * pv.y + tv.z * pv.z) * invd
            qv = Vec3(tv.y * e1.z - tv.z * e1.y, tv.z * e1.x - tv.x * e1.z,
                      tv.x * e1.y - tv.y * e1.x)
            w_ = (d.x * qv.x + d.y * qv.y + d.z * qv.z) * invd
            tn = (e2.x * qv.x + e2.y * qv.y + e2.z * qv.z) * invd
            h = (ok & (v_ >= 0) & (v_ <= 1) & (w_ >= 0) & (v_ + w_ <= 1)
                 & (tn >= intersect.TRI_EPS) & (t >= tn) & is_tri
                 & (k < count))
            t = jnp.where(h, tn, t)

        # analytic prim
        is_prim = (~is_int) & (~is_tri)
        ptype = row[2].astype(jnp.int32)
        m = [row[4 + i] for i in range(12)]
        oso = Vec3(m[0] * o.x + m[1] * o.y + m[2] * o.z + m[3],
                   m[4] * o.x + m[5] * o.y + m[6] * o.z + m[7],
                   m[8] * o.x + m[9] * o.y + m[10] * o.z + m[11])
        osd = Vec3(m[0] * d.x + m[1] * d.y + m[2] * d.z,
                   m[4] * d.x + m[5] * d.y + m[6] * d.z,
                   m[8] * d.x + m[9] * d.y + m[10] * d.z)
        hs, ts_ = intersect.sphere(oso, osd, row[16], t)
        hb, tb_ = intersect.box(oso, osd, Vec3(row[17], row[18], row[19]), t)
        sph = ptype == PRIM_SPHERE
        ph = is_prim & ((hs & sph) | (hb & ~sph))
        t = jnp.where(ph, jnp.where(sph, ts_, tb_), t)
        return sp, stack, t, nlog, log

    st0 = (jnp.int32(1), jnp.zeros((STACKS + 1,), jnp.int32),
           jnp.float32(tw.BIG_T), jnp.int32(0),
           jnp.full((LOGMAX,), -1, jnp.int16))
    sp, stack, t, nlog, log = jax.lax.while_loop(cond, body, st0)
    return nlog, log


walk = jax.jit(jax.vmap(walk_one))

# ---------------------------------------------------------------- orderings
live_ids = np.nonzero(live)[0]
NL = live_ids.size
o_l = np.stack([ox, oy, oz], 1)[live_ids]
d_l = np.stack([dx, dy, dz], 1)[live_ids]

lo = np.asarray(ps.scene_lo, np.float64)
hi = np.asarray(ps.scene_hi, np.float64)
ext = np.maximum(hi - lo, 1e-6)
q = ((o_l - lo) / ext)                     # [0,1) position
oct_ = ((d_l[:, 0] < 0) * 4 + (d_l[:, 1] < 0) * 2
        + (d_l[:, 2] < 0)).astype(np.int64)


def spread3(v, bits):
    out = np.zeros_like(v)
    for b in range(bits):
        out |= ((v >> b) & 1) << (3 * b)
    return out


def morton(bits):
    c = [np.clip((q[:, i] * (1 << bits)).astype(np.int64), 0,
                 (1 << bits) - 1) for i in range(3)]
    return (spread3(c[0], bits) | (spread3(c[1], bits) << 1)
            | (spread3(c[2], bits) << 2))


def spread6(pbits, dbits):
    """interleave 3 position axes (pbits each) + 3 direction axes (dbits)"""
    c = [np.clip((q[:, i] * (1 << pbits)).astype(np.int64), 0,
                 (1 << pbits) - 1) for i in range(3)]
    dq = [np.clip(((d_l[:, i] * 0.5 + 0.5) * (1 << dbits)).astype(np.int64),
                  0, (1 << dbits) - 1) for i in range(3)]
    # 6-way interleave, position major per level
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


m8 = morton(8)
orderings = {
    "current oct_major (corrupted)": (oct_ & 7) << 18 | m8,
    "morton8_minor_oct": (m8 << 3) | oct_,
    "clean oct_major m8": (oct_ << 24) | m8,
    "clean oct_major m10": (oct_ << 30) | morton(10),
    "6D pos6 dir2": spread6(6, 2),
    "6D pos7 dir3": spread6(7, 3),
    "natural (tile order)": np.arange(NL, dtype=np.int64),
}

NBLK, BLOCK = 24, 1024
sample = {}
for name, key in orderings.items():
    order = np.argsort(key, kind="stable")
    nb = NL // BLOCK
    picks = np.linspace(0, nb - 1, NBLK).astype(int)
    sample[name] = np.stack([order[p * BLOCK:(p + 1) * BLOCK] for p in picks])

all_ids = np.unique(np.concatenate([s.ravel() for s in sample.values()]))
print(f"{NL} live rays; walking {all_ids.size} sampled rays", flush=True)

logs = np.empty((all_ids.size, LOGMAX), np.int16)
nlogs = np.empty((all_ids.size,), np.int32)
t0 = time.perf_counter()
CH = 16384
for i in range(0, all_ids.size, CH):
    ids = all_ids[i:i + CH]
    nl, lg = walk(jnp.asarray(o_l[ids]), jnp.asarray(d_l[ids]))
    nlogs[i:i + CH] = np.asarray(nl)
    logs[i:i + CH] = np.asarray(lg)
    print(f"  walked {i + ids.size}/{all_ids.size} "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)
print(f"per-ray visits: mean {nlogs.mean():.1f}  p50 "
      f"{np.percentile(nlogs, 50):.0f}  p99 {np.percentile(nlogs, 99):.0f}  "
      f"max {nlogs.max()}  clipped {(nlogs > LOGMAX).mean()*100:.2f}%",
      flush=True)

pos = {rid: i for i, rid in enumerate(all_ids)}

print(f"\nmean union of visited rows per group "
      f"(w walkers/block -> group = {BLOCK}/w rays; lockstep iters = "
      f"max over w groups):", flush=True)
print(f"{'ordering':32s} {'w=1':>8s} {'w=2':>8s} {'w=4':>8s} {'w=8':>8s}",
      flush=True)
for name, blocks in sample.items():
    res = []
    for w in (1, 2, 4, 8):
        g = BLOCK // w
        iters = []
        for blk in blocks:
            li = np.array([pos[r] for r in blk])
            groups = li.reshape(w, g)
            us = []
            for grp in groups:
                lg = logs[grp]
                valid = lg[lg >= 0]
                us.append(np.unique(valid).size)
            iters.append(max(us))
        res.append(np.mean(iters))
    print(f"{name:32s} {res[0]:8.0f} {res[1]:8.0f} {res[2]:8.0f} "
          f"{res[3]:8.0f}", flush=True)

print("\nmodel: v2 time ~= nblocks * w1_union * 0.35us ; "
      "v3(w=8) time ~= nblocks * w8_max * c_iter(v3)", flush=True)
print(f"nblocks(full wave) = {NL // BLOCK}", flush=True)
print("PROF31 DONE", flush=True)
