# Round-3 OFFLINE: root-child prefilter + treelet-keyed compaction.
#
# prof31 measured p50 = 1 visit/ray on the real bounce-1 wave: half the
# live rays hit NOTHING under the root and can be proven misses by one
# vectorized 8-slab test OUTSIDE the kernel (exact semantics — they scatter
# back as misses).  The survivors can additionally carry their nearest
# root-child index as a sort-key MAJOR component, so each packet block
# walks one root subtree ("treelet binning").  This probe measures, on the
# real bounce-1 wave:
#   * the prefilter kill fraction,
#   * per-block unions for surviving rays under m6d vs (child | m6d) keys,
#   * same for the bounce-0 NEE shadow wave (any-hit walk).
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

from buas_pathtracer_tpu.core import rng
from buas_pathtracer_tpu.core.vec import Vec3, dot
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.ops import traverse_wide as tw
from buas_pathtracer_tpu.ops.shading import map_to_cosine_weighted_hemisphere
from buas_pathtracer_tpu.runtime.render import _tiled
from buas_pathtracer_tpu.ops.wide_bvh import WIDE

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
print(f"live {live.mean()*100:.0f}%", flush=True)

# ---- vectorized root-child slab tests (numpy, float32 like the kernel) ----
root = rows_np[0]
o3 = np.stack([ox, oy, oz], 1).astype(np.float32)
d3 = np.stack([dx, dy, dz], 1).astype(np.float32)
with np.errstate(divide="ignore", invalid="ignore"):
    inv = np.where(np.abs(d3) > 1e-12, 1.0 / d3,
                   np.copysign(1e12, d3)).astype(np.float32)
tn_min = np.full(N, np.inf, np.float32)
hit_mask = np.zeros(N, bool)
first_child = np.zeros(N, np.int64)
best_tn = np.full(N, np.inf, np.float32)
for c in range(WIDE):
    s = 2 + 6 * c
    lo3, hi3 = root[s:s + 3], root[s + 3:s + 6]
    t1 = (lo3 - o3) * inv
    t2 = (hi3 - o3) * inv
    tn = np.minimum(t1, t2).max(1)
    tf = np.maximum(t1, t2).min(1)
    h = (tn < tf) & (tf > 0.0)
    hit_mask |= h
    better = h & (tn < best_tn)
    best_tn = np.where(better, tn, best_tn)
    first_child = np.where(better, c, first_child)

kill = live & ~hit_mask
surv = live & hit_mask
print(f"prefilter: kills {kill.sum()/max(live.sum(),1)*100:.1f}% of live "
      f"rays ({surv.sum()} survive -> "
      f"{surv.sum()//1024} blocks vs {live.sum()//1024})", flush=True)

# ---- per-ray walk (closest-hit) on survivors, union under keys ----------
sys.path.insert(0, "/root/repo/tools")
STACKS, LOGMAX = 192, 384
from buas_pathtracer_tpu.ops import intersect
from buas_pathtracer_tpu.models.scene import PRIM_SPHERE
from buas_pathtracer_tpu.ops.wide_bvh import (KIND_INTERNAL, KIND_PRIM,
                                              KIND_TRIS, WIDE_LEAF)
exec(open("/root/repo/tools/prof31_unions.py").read()
     .split("# ---------------------------------------------------------------- per-ray walk")[1]
     .split("# ---------------------------------------------------------------- orderings")[0])
walk = jax.jit(jax.vmap(walk_one))

ids = np.nonzero(surv)[0]
NL = ids.size
o_l = o3[ids]
d_l = d3[ids]
fc = first_child[ids]

lo = np.asarray(ps.scene_lo, np.float64)
hi = np.asarray(ps.scene_hi, np.float64)
ext = np.maximum(hi - lo, 1e-6)
q = (o_l - lo) / ext


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


m6 = spread6(6, 2)
orderings = {
    "m6d (survivors only)": m6,
    "child | m6d": (fc << 24) | m6,
    "child | tn | m6d": (fc << 40) | (np.clip(best_tn[ids] * 8, 0,
                                              255).astype(np.int64) << 32)
                        | m6,
}

NBLK, BLOCK = 24, 1024
sample = {}
for name, key in orderings.items():
    order = np.argsort(key, kind="stable")
    nb = NL // BLOCK
    picks = np.linspace(0, nb - 1, NBLK).astype(int)
    sample[name] = np.stack([order[p * BLOCK:(p + 1) * BLOCK] for p in picks])

all_ids = np.unique(np.concatenate([s.ravel() for s in sample.values()]))
print(f"walking {all_ids.size} sampled survivors", flush=True)
logs = np.empty((all_ids.size, LOGMAX), np.int16)
for i in range(0, all_ids.size, 16384):
    sel = all_ids[i:i + 16384]
    _, lg = walk(jnp.asarray(o_l[sel]), jnp.asarray(d_l[sel]))
    logs[i:i + 16384] = np.asarray(lg)

pos = {rid: i for i, rid in enumerate(all_ids)}
print(f"{'ordering':28s} {'union(1024)':>12s}  "
      f"(x {NL // BLOCK} blocks -> est iterations)", flush=True)
for name, blocks in sample.items():
    u1 = []
    for blk in blocks:
        li = np.array([pos[r] for r in blk])
        lg = logs[li]
        u1.append(np.unique(lg[lg >= 0]).size)
    est = np.mean(u1) * (NL // BLOCK)
    print(f"{name:28s} {np.mean(u1):12.0f}  ({est/1e3:.0f}k iters)",
          flush=True)
print("PROF35 DONE", flush=True)
