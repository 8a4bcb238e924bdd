# Round-3 OFFLINE shadow-wave union study (CPU only).
#
# NEE occlusion waves cost ~248 ms of the 1040 ms frame (bench attribution,
# BENCH_NEE knob) — ~96 ms for the bounce-0 wave alone — while a synthetic
# coherent occlusion wave runs at 4.3 ms (docs/PERFORMANCE.md).  This probe
# replays the REAL bounce-0 NEE shadow wave through a per-ray ANY-HIT walk
# (first hit within max_t terminates; push order irrelevant) and measures
# per-block visited-row unions under candidate compaction keys, plus the
# per-ray visit floor.
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
NROWS = ps.wide_rows.shape[0]

from buas_pathtracer_tpu.core import rng
from buas_pathtracer_tpu.core.vec import Vec3, dot
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.models.scene import PRIM_SPHERE
from buas_pathtracer_tpu.ops import traverse_wide as tw
from buas_pathtracer_tpu.ops import intersect
from buas_pathtracer_tpu.ops.wide_bvh import (KIND_INTERNAL, KIND_PRIM,
                                              KIND_TRIS, WIDE, WIDE_LEAF)
from buas_pathtracer_tpu.runtime.render import _tiled
from buas_pathtracer_tpu.integrators.common import (light_rows,
                                                    pick_random_light_slot,
                                                    random_point_on_light_rows,
                                                    slot_to_prim)

py_, px_ = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32),
                        jnp.arange(W, dtype=jnp.int32), indexing="ij")
PX = _tiled(px_).astype(jnp.float32)
PY = _tiled(py_).astype(jnp.float32)


@jax.jit
def make_shadow(r):
    z = jnp.zeros((N,)) + r * 1e-7
    pr = cm.generate_rays(sc.camera, PX, PY, W, H, z + 0.5, z + 0.5, z, z,
                          0.0, 1.0, 6, 0.0, 0.0)
    hit = tw.intersect_scene(ps, pr.o, pr.d)
    live = hit.valid
    st = rng.seed_state((PX * 7 + PY * 13).astype(jnp.uint32)
                        + jnp.uint32(17) * r.astype(jnp.uint32))
    st, lu = rng.next_unilateral(st)
    st, su = rng.next_unilateral(st)
    st, sv = rng.next_unilateral(st)
    Nrm = Vec3(jnp.where(dot(pr.d, hit.n) < 0, hit.n.x, -hit.n.x),
               jnp.where(dot(pr.d, hit.n) < 0, hit.n.y, -hit.n.y),
               jnp.where(dot(pr.d, hit.n) < 0, hit.n.z, -hit.n.z))
    slot, _ = pick_random_light_slot(ps, lu, hit.p, True)
    lT = light_rows(ps, slot)
    ls = random_point_on_light_rows(lT, su, sv, hit.p)
    lprim = slot_to_prim(ps, slot)
    facing = (dot(Nrm, ls.L) > 0) & (-dot(ls.Nl, ls.L) > 0) & live
    so = hit.p + ls.L * 1e-3
    stt = jnp.where(facing, ls.dist - 2e-3, -1.0)
    return (so.x, so.y, so.z, ls.L.x, ls.L.y, ls.L.z, stt,
            lprim, facing)

t0 = time.perf_counter()
ox, oy, oz, dx, dy, dz, maxt, lprim, facing = (
    np.asarray(x) for x in make_shadow(jnp.float32(0.0)))
print(f"wave built in {time.perf_counter()-t0:.0f}s; "
      f"facing {facing.mean()*100:.0f}%", flush=True)

STACKS, LOGMAX = 192, 256


def walk_one(o3, d3, mt, ignp):
    o = Vec3(o3[0], o3[1], o3[2])
    d = Vec3(d3[0], d3[1], d3[2])
    inv = intersect.safe_inv_dir(d)
    rows = ps.wide_rows

    def cond(st):
        return st[0] > 0

    def body(st):
        sp, stack, blocked, nlog, log = st
        sp = sp - 1
        cur = stack[sp]
        row = jax.lax.dynamic_index_in_dim(rows, cur, keepdims=False)
        kind = row[0].astype(jnp.int32)
        log = log.at[jnp.minimum(nlog, LOGMAX - 1)].set(cur.astype(jnp.int16))
        nlog = nlog + 1

        child_base = row[1].astype(jnp.int32)
        is_int = kind == KIND_INTERNAL
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
            ok = is_int & (tn < tf) & (tf > 0.0) & (tn < mt) & (sp < STACKS)
            stack = stack.at[jnp.where(ok, sp, STACKS)].set(child_base + c)
            sp = sp + ok.astype(jnp.int32)

        is_tri = kind == KIND_TRIS
        count = row[1].astype(jnp.int32)
        inst_t = row[3].astype(jnp.int32)
        not_ign = inst_t != ignp
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
                 & (tn >= intersect.TRI_EPS) & (mt >= tn) & is_tri
                 & not_ign & (k < count))
            blocked = blocked | h

        is_prim = (~is_int) & (~is_tri)
        prim_id = row[1].astype(jnp.int32)
        ptype = row[2].astype(jnp.int32)
        m = [row[4 + i] for i in range(12)]
        oso = Vec3(m[0] * o.x + m[1] * o.y + m[2] * o.z + m[3],
                   m[4] * o.x + m[5] * o.y + m[6] * o.z + m[7],
                   m[8] * o.x + m[9] * o.y + m[10] * o.z + m[11])
        osd = Vec3(m[0] * d.x + m[1] * d.y + m[2] * d.z,
                   m[4] * d.x + m[5] * d.y + m[6] * d.z,
                   m[8] * d.x + m[9] * d.y + m[10] * d.z)
        hs, ts_ = intersect.sphere(oso, osd, row[16], mt)
        hb, tb_ = intersect.box(oso, osd, Vec3(row[17], row[18], row[19]), mt)
        sph = ptype == PRIM_SPHERE
        ph = is_prim & (prim_id != ignp) & ((hs & sph) | (hb & ~sph))
        blocked = blocked | ph
        sp = jnp.where(blocked, 0, sp)
        return sp, stack, blocked, nlog, log

    st0 = (jnp.int32(1), jnp.zeros((STACKS + 1,), jnp.int32),
           jnp.bool_(False), jnp.int32(0),
           jnp.full((LOGMAX,), -1, jnp.int16))
    sp, stack, blocked, nlog, log = jax.lax.while_loop(cond, body, st0)
    return nlog, log, blocked


walk = jax.jit(jax.vmap(walk_one))

ids_f = np.nonzero(facing)[0]
NL = ids_f.size
o_l = np.stack([ox, oy, oz], 1)[ids_f]
d_l = np.stack([dx, dy, dz], 1)[ids_f]
mt_l = maxt[ids_f]
ig_l = lprim[ids_f]

lo = np.asarray(ps.scene_lo, np.float64)
hi = np.asarray(ps.scene_hi, np.float64)
ext = np.maximum(hi - lo, 1e-6)
q = (o_l - lo) / ext
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
    c = [np.clip((q[:, i] * (1 << pbits)).astype(np.int64), 0,
                 (1 << pbits) - 1) for i in range(3)]
    dq = [np.clip(((d_l[:, i] * 0.5 + 0.5) * (1 << dbits)).astype(np.int64),
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


m8 = morton(8)
L = (ig_l.astype(np.int64) + 1) << 40  # light id rides above everything
orderings = {
    "light + oct_major (current)": L | ((oct_ & 7) << 18) | m8,
    "light + morton8": L | (m8 << 3) | oct_,
    "light + m6d(6,2)": L | spread6(6, 2),
    "light + m6d(7,3)": L | spread6(7, 3),
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
print(f"{NL} facing rays; walking {all_ids.size} sampled", flush=True)

logs = np.empty((all_ids.size, LOGMAX), np.int16)
nlogs = np.empty((all_ids.size,), np.int32)
blk_frac = np.empty((all_ids.size,), bool)
t0 = time.perf_counter()
CH = 16384
for i in range(0, all_ids.size, CH):
    ids = all_ids[i:i + CH]
    nl, lg, bl = walk(jnp.asarray(o_l[ids]), jnp.asarray(d_l[ids]),
                      jnp.asarray(mt_l[ids]), jnp.asarray(ig_l[ids]))
    nlogs[i:i + CH] = np.asarray(nl)
    logs[i:i + CH] = np.asarray(lg)
    blk_frac[i:i + CH] = np.asarray(bl)
print(f"walk {time.perf_counter()-t0:.0f}s; per-ray visits mean "
      f"{nlogs.mean():.1f} p50 {np.percentile(nlogs,50):.0f} "
      f"p99 {np.percentile(nlogs,99):.0f}; blocked {blk_frac.mean()*100:.0f}%",
      flush=True)

pos = {rid: i for i, rid in enumerate(all_ids)}
print(f"\n{'ordering':32s} {'union(1024)':>12s} {'max-sub(128)':>12s}",
      flush=True)
for name, blocks in sample.items():
    u1, u8 = [], []
    for blk in blocks:
        li = np.array([pos[r] for r in blk])
        lg = logs[li]
        u1.append(np.unique(lg[lg >= 0]).size)
        subs = [np.unique(logs[g][logs[g] >= 0]).size
                for g in li.reshape(8, 128)]
        u8.append(max(subs))
    print(f"{name:32s} {np.mean(u1):12.0f} {np.mean(u8):12.0f}", flush=True)
print("PROF34 DONE", flush=True)
