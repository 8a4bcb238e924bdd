# Round-4 on-chip A/B: scalar vs packed compaction RESTORE on the real
# bounce wave, timed through the PRODUCTION dispatch (compaction ladder +
# kernel + restore).  The kernel is identical in both configs, so the
# delta isolates the restore form (5 scalar scatters vs one (m,8) row
# scatter + 2 exact MXU transposes — docs/PERFORMANCE.md round-3 lever 2).
#
# VERDICT (2026-08-19, on chip, real 1080p bounce wave, bit-exact parity
# both ways): scalar 129.4 ms vs packed 141.0 ms — the packed form LOSES
# 12 ms.  The (m,8) row scatter + (n,8) default materialization costs
# more than the five scalar scatters it replaces (row scatters are
# per-ROW latency-bound at ~20x the scalar per-index cost, prof13).  The
# BUAS_PACKED_RESTORE variant was removed from pallas_packet.py; this
# probe file stays as the measurement record and still times the
# production restore path end to end.
#
#   python tools/prof45_restore.py [wave]
#     wave: bounce (default) | shadow
#
# One config per process (tunnel result caching + executable budget,
# CLAUDE.md 4b).  Sync consumes ALL FIVE restored outputs so no scatter
# can be DCE'd.
import os, sys, time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("BUAS_FORCE_COMPACT", "1")  # probe the compacted path

wave = sys.argv[1] if len(sys.argv) > 1 else "bounce"
mode = os.environ.get("BUAS_PACKED_RESTORE", "0")

import jax

CPU = os.environ.get("PROF45_CPU", "0") == "1"
if CPU:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

W, H = (256, 128) if CPU else (1920, 1080)
N = W * H
import bench as B

sc = B.build_bench_scene(W, H)
ps = sc.pack()

from buas_pathtracer_tpu.core import rng
from buas_pathtracer_tpu.core.vec import Vec3, dot, normalize
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.ops import pallas_packet as pp
from buas_pathtracer_tpu.ops import traverse_wide as tw
from buas_pathtracer_tpu.ops.shading import map_to_cosine_weighted_hemisphere
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
    lp = Vec3(jnp.zeros(N), jnp.full((N,), 14.0), jnp.full((N,), 6.0))
    Ld = normalize(lp - hit.p)
    facing = (dot(Nrm, Ld) > 0.0) & live
    so_ = hit.p + Ld * 1e-3
    dist = jnp.sqrt(dot(lp - hit.p, lp - hit.p))
    return (o1.x, o1.y, o1.z, d1.x, d1.y, d1.z, live,
            so_.x, so_.y, so_.z, Ld.x, Ld.y, Ld.z, facing, dist)

vals = [np.asarray(x) for x in make_all(jnp.float32(0.0))]
(ox, oy, oz, dx, dy, dz, live, sx, sy, sz, ldx, ldy, ldz, facing,
 dist) = vals

if wave == "bounce":
    oo = Vec3(*(jnp.asarray(v) for v in (ox, oy, oz)))
    dd = Vec3(*(jnp.asarray(v) for v in (dx, dy, dz)))
    t0j = jnp.asarray(np.where(live, tw.BIG_T, -1.0).astype(np.float32))
    occl = False
else:
    oo = Vec3(*(jnp.asarray(v) for v in (sx, sy, sz)))
    dd = Vec3(*(jnp.asarray(v) for v in (ldx, ldy, ldz)))
    t0j = jnp.asarray(np.where(facing, dist - 2e-3, -1.0).astype(np.float32))
    occl = True
ign = jnp.full((N,), -1, jnp.int32)


@jax.jit
def walk(r):
    tt = t0j + r * 1e-9  # varying real arg: defeat tunnel result caching
    t, prim, tri, bv, bw, nv, ttst = pp.traverse_dispatch(
        ps.wide_rows, ps.scene_lo, ps.scene_hi, oo, dd, tt, ign,
        occlusion=occl, interpret=CPU)
    return (jnp.where(t < tw.BIG_T, t, 0.0).sum() + prim.sum() + tri.sum()
            + bv.sum() + bw.sum() + nv + ttst)

base = np.asarray(walk(jnp.float32(0.0)))
seed = int(time.time() * 1000) % 997
ts = []
for r in range(4):
    t0_ = time.perf_counter()
    _ = np.asarray(walk(jnp.float32(seed + r)))
    ts.append(time.perf_counter() - t0_)
el = min(ts) - 0.028
print(f"{wave} packed={mode}: {el*1e3:7.1f} ms  raw={min(ts)*1e3:.1f}  "
      f"checksum={float(base):.6g}", flush=True)
