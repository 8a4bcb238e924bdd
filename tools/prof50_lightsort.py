# Round-4 probe: how much do LIGHT-MIXED groups cost the natural-order
# grouped occlusion walk?  The production bounce-0 NEE wave picks one of
# the bench scene's two lights per LANE, so a 16-lane walk group mixes
# both occluder cones.  Three dispatch shapes over the same wave:
#
#   mixed    — per-lane random pick, natural tile order (the production
#              round-4o default shape)
#   sorted   — same picks, host-side STABLE-sorted by light id (within a
#              light: natural order).  Upper bound for an integrator-side
#              light-major re-sort.
#   guniform — light picked once per 16-lane GROUP (shared u).  Upper
#              bound for a correlated group-uniform pick (estimator
#              change: per-pixel unbiased, adds intra-group correlation).
#
#   python tools/prof50_lightsort.py <mixed|sorted|guniform>
#
# One config per process (tunnel executable budget + cross-process result
# caching, CLAUDE.md 4b); varying real args + scalar-sum sync.
import os, sys, time

sys.path.insert(0, "/root/repo")

mode = sys.argv[1] if len(sys.argv) > 1 else "mixed"

import jax

CPU = os.environ.get("PROF50_CPU", "0") == "1"
if CPU:
    jax.config.update("jax_platforms", "cpu")
else:
    _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("BUAS_JAX_CACHE",
                                     os.path.join(_repo, ".jax_cache")))

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
from buas_pathtracer_tpu.runtime.render import _tiled

py_, px_ = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32),
                        jnp.arange(W, dtype=jnp.int32), indexing="ij")
PX = _tiled(px_).astype(jnp.float32)
PY = _tiled(py_).astype(jnp.float32)

# the bench scene's two area lights (bench.py build_bench_scene)
LIGHTS = np.array([[0.0, 14.0, 6.0], [-8.0, 10.0, -6.0]], np.float32)


@jax.jit
def make_all(r):
    z = jnp.zeros((N,)) + r * 1e-7
    pr = cm.generate_rays(sc.camera, PX, PY, W, H, z + 0.5, z + 0.5, z, z,
                          0.0, 1.0, 6, 0.0, 0.0)
    hit = tw.intersect_scene(ps, pr.o, pr.d)
    live = hit.valid
    st = rng.seed_state((PX * 7 + PY * 13).astype(jnp.uint32)
                        + jnp.uint32(17) * r.astype(jnp.uint32))
    st, u = rng.next_unilateral(st)
    Nrm = Vec3(jnp.where(dot(pr.d, hit.n) < 0, hit.n.x, -hit.n.x),
               jnp.where(dot(pr.d, hit.n) < 0, hit.n.y, -hit.n.y),
               jnp.where(dot(pr.d, hit.n) < 0, hit.n.z, -hit.n.z))
    return (hit.p.x, hit.p.y, hit.p.z, Nrm.x, Nrm.y, Nrm.z, live, u)


hx, hy, hz, nx, ny, nz, live, u = (np.asarray(x)
                                   for x in make_all(jnp.float32(0.0)))

lane = np.arange(N)
if mode == "guniform":
    # one draw per 16-lane group: reuse lane 0's u for the whole group
    u = u[(lane // 16) * 16]
pick = (u < 0.5).astype(np.int32)  # 0 = big light, 1 = small light

lp = LIGHTS[pick]                       # (N, 3)
p3 = np.stack([hx, hy, hz], 1)
n3 = np.stack([nx, ny, nz], 1)
Ld = lp - p3
dist = np.linalg.norm(Ld, axis=1)
Ld = Ld / np.maximum(dist, 1e-9)[:, None]
facing = ((Ld * n3).sum(1) > 0.0) & live
o3 = p3 + Ld * 1e-3
t0 = np.where(facing, dist - 2e-3, -1.0).astype(np.float32)
d3 = Ld.astype(np.float32)

if mode == "sorted":
    key = np.where(facing, pick, 2)     # dead lanes last, else by light
    order = np.argsort(key, kind="stable")
    o3, d3, t0 = o3[order].copy(), d3[order].copy(), t0[order].copy()

print(f"{mode}: facing {facing.sum()} / {N}  light0 "
      f"{int((pick[facing] == 0).sum())} light1 "
      f"{int((pick[facing] == 1).sum())}", flush=True)

ign = jnp.full((N,), -1, jnp.int32)
oo = Vec3(jnp.asarray(o3[:, 0]), jnp.asarray(o3[:, 1]), jnp.asarray(o3[:, 2]))
dd = Vec3(jnp.asarray(d3[:, 0]), jnp.asarray(d3[:, 1]), jnp.asarray(d3[:, 2]))
t0j = jnp.asarray(t0)


@jax.jit
def walk(r):
    tt = t0j + r * 1e-9
    out = pp.packet_traverse(ps.wide_rows, oo, dd, tt, ign,
                             occlusion=True, groups=8, interpret=CPU,
                             shadow_grouped=True)
    return (out[1] >= 0).sum() + out[5] + out[6]

_ = np.asarray(walk(jnp.float32(0.0)))
seed = int(time.time() * 1000) % 997
ts = []
for r in range(4):
    t0_ = time.perf_counter()
    _ = np.asarray(walk(jnp.float32(seed + r)))
    ts.append(time.perf_counter() - t0_)
el = min(ts) - 0.028
print(f"{mode}: {el*1e3:7.1f} ms ({N/el/1e6:6.1f} Mrays/s over {N} lanes)"
      f"  raw={min(ts)*1e3:.1f}", flush=True)
