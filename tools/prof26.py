# Round-3 wavefront probes: where the frame time lives AFTER the shading
# fixes.  Times the REAL bounce-1 closest-hit wave and the REAL bounce-0
# NEE shadow wave through traverse_dispatch under different compaction
# policies (BUAS_COMPACT_KEY / BUAS_FORCE_COMPACT read at trace time, so
# each variant jits its own program).
import os, time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

W, H = 1920, 1080
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
from buas_pathtracer_tpu.integrators.common import (light_rows,
                                                    pick_random_light_slot,
                                                    random_point_on_light_rows,
                                                    slot_to_prim)

py_, px_ = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32),
                        jnp.arange(W, dtype=jnp.int32), indexing="ij")
PX = _tiled(px_).astype(jnp.float32)
PY = _tiled(py_).astype(jnp.float32)


@jax.jit
def make_waves(r):
    """(primary hit) -> bounce-1 diffuse wave + bounce-0 NEE shadow wave."""
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
    t1 = jnp.where(live, tw.BIG_T, -1.0)

    st, lu = rng.next_unilateral(st)
    st, su = rng.next_unilateral(st)
    st, sv = rng.next_unilateral(st)
    slot, _ = pick_random_light_slot(ps, lu, hit.p, True)
    lT = light_rows(ps, slot)
    ls = random_point_on_light_rows(lT, su, sv, hit.p)
    lprim = slot_to_prim(ps, slot)
    facing = (dot(Nrm, ls.L) > 0) & (-dot(ls.Nl, ls.L) > 0) & live
    so = hit.p + ls.L * 1e-3
    stt = jnp.where(facing, ls.dist - 2e-3, -1.0)
    return (o1.x, o1.y, o1.z, d1.x, d1.y, d1.z, t1,
            so.x, so.y, so.z, ls.L.x, ls.L.y, ls.L.z, stt,
            lprim.astype(jnp.float32),
            jnp.sum(live.astype(jnp.float32)),
            jnp.sum(facing.astype(jnp.float32)))


def tmin(fn, args_of, reps=3):
    a = args_of(0)
    jax.block_until_ready(a)
    _ = np.asarray(fn(*a))
    ts = []
    for r in range(1, reps + 1):
        a = args_of(r)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        _ = np.asarray(fn(*a))
        ts.append(time.perf_counter() - t0)
    return (min(ts) - 0.028) * 1e3


waves = {}
def wave_args(r):
    if r not in waves:
        w = make_waves(jnp.float32(r))  # stays on DEVICE (tunnel is slow)
        jax.block_until_ready(w)
        waves[r] = w
    return waves[r]

w0 = wave_args(0)
print(f"bounce-1 live: {float(w0[15])/N*100:.0f}%  "
      f"NEE facing: {float(w0[16])/N*100:.0f}%", flush=True)


def bounce_fn():
    @jax.jit
    def f(*a):
        out = pp.traverse_dispatch(ps.wide_rows, ps.scene_lo, ps.scene_hi,
                                   Vec3(a[0], a[1], a[2]),
                                   Vec3(a[3], a[4], a[5]), a[6],
                                   jnp.full((N,), -1, jnp.int32),
                                   occlusion=False)
        return out[0].sum() + out[1].sum()
    return f


def shadow_fn():
    @jax.jit
    def f(*a):
        out = pp.traverse_dispatch(ps.wide_rows, ps.scene_lo, ps.scene_hi,
                                   Vec3(a[7], a[8], a[9]),
                                   Vec3(a[10], a[11], a[12]), a[13],
                                   a[14].astype(jnp.int32), occlusion=True)
        return out[1].sum()
    return f


def primary_fn():
    @jax.jit
    def f(*a):
        z = a[0] * 0 + 0.5
        pr = cm.generate_rays(sc.camera, PX, PY, W, H, z, z, z * 0, z * 0,
                              0.0, 1.0, 6, 0.0, 0.0)
        out = pp.packet_traverse(ps.wide_rows, pr.o, pr.d,
                                 jnp.full((N,), tw.BIG_T),
                                 jnp.full((N,), -1, jnp.int32),
                                 occlusion=False)
        return out[0].sum() + out[1].sum()
    return f


for v1, key, force in (("0", "m6d", "1"), ("0", "oct_major", "1"),
                       ("0", "", "1")):
    os.environ["BUAS_PACKET_V1"] = v1
    os.environ["BUAS_COMPACT_KEY"] = key
    os.environ["BUAS_FORCE_COMPACT"] = force
    label = f"v{'1' if v1 == '1' else '2'} key={key or 'morton':9s} f={force}"
    tp = tmin(primary_fn(), wave_args) if force == "0" else float("nan")
    tb = tmin(bounce_fn(), wave_args)
    tsh = tmin(shadow_fn(), wave_args)
    print(f"{label}: primary {tp:7.1f} ms   bounce-1 wave {tb:7.1f} ms   "
          f"shadow wave {tsh:7.1f} ms", flush=True)
print("PROF26 DONE", flush=True)
