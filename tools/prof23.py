# Real NEE shadow wavefront: capture bounce-0 shadow query (origins = hit
# points, directions = sampled light points, facing mask, per-ray light id)
# and A/B natural vs morton vs XLA phased occlusion.
import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from dataclasses import replace

W, H = 1920, 1080
import bench as B
sc = B.build_bench_scene(W, H)
ps = sc.pack()
N = W * H

from buas_pathtracer_tpu.core import sampler as smp
from buas_pathtracer_tpu.core.vec import Vec3, dot, EPSILON
from buas_pathtracer_tpu.models.camera import generate_rays
from buas_pathtracer_tpu.ops import traverse
from buas_pathtracer_tpu.ops import traverse_wide as tw
from buas_pathtracer_tpu.ops import pallas_packet as pp
from buas_pathtracer_tpu.integrators.common import (pick_random_light,
                                                    random_point_on_light)
from buas_pathtracer_tpu.runtime.render import _tiled

settings = sc.settings


@jax.jit
def shadow_wave(r):
    py_, px_ = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32),
                            jnp.arange(W, dtype=jnp.int32), indexing="ij")
    px, py = _tiled(px_), _tiled(py_)
    strategy = int(settings.sampling_strategy)
    s = smp.make_sampler(px, py, r, strategy=strategy)
    s, aa_u, aa_v = smp.sample_2d(s, strategy, smp.SampleDimension.AA, 0)
    rays = generate_rays(sc.camera, px, py, W, H, aa_u, aa_v,
                         aa_u, aa_v, 0.0, 1.0, 6.0, 0.5, 0.0)
    hit = traverse.intersect_scene(ps, rays.o, rays.d)
    s, lp_u = smp.sample_1d(s, strategy, smp.SampleDimension.LIGHT_SELECTION, 0)
    light_idx, _ = pick_random_light(ps, lp_u, hit.p, True)
    s, dl_u, dl_v = smp.sample_2d(s, strategy,
                                  smp.SampleDimension.DIRECT_LIGHTING, 0)
    ls = random_point_on_light(ps, light_idx, dl_u, dl_v, hit.p)
    n_dot_l = dot(hit.n, ls.L)
    nl_dot_l = -dot(ls.Nl, ls.L)
    facing = (n_dot_l > 0.0) & (nl_dot_l > 0.0) & hit.valid
    o = hit.p + ls.L * EPSILON
    maxt = jnp.where(facing, ls.dist - 2.0 * EPSILON, -1.0)
    return (o.x, o.y, o.z, ls.L.x, ls.L.y, ls.L.z, maxt,
            light_idx.astype(jnp.int32))


@jax.jit
def nat(ox, oy, oz, dx, dy, dz, t0, ign):
    out = pp.packet_traverse(ps.wide_rows, Vec3(ox, oy, oz),
                             Vec3(dx, dy, dz), t0, ign, occlusion=True)
    return (out[1] >= 0).sum()


@jax.jit
def disp(ox, oy, oz, dx, dy, dz, t0, ign):
    out = pp.traverse_dispatch(ps.wide_rows, ps.scene_lo, ps.scene_hi,
                               Vec3(ox, oy, oz), Vec3(dx, dy, dz), t0, ign,
                               occlusion=True)
    return (out[1] >= 0).sum()


@jax.jit
def xla(ox, oy, oz, dx, dy, dz, t0, ign):
    out = tw._traverse_xla(ps, ps.wide_rows,
                           int(ps.wide_depth_arr.shape[0]),
                           Vec3(ox, oy, oz), Vec3(dx, dy, dz), t0, ign,
                           occlusion=True)
    return (out[1] >= 0).sum()


def tmin(fn, reps=2):
    a = shadow_wave(jnp.uint32(0))
    jax.block_until_ready(a)
    _ = np.asarray(fn(*a))
    ts = []
    for r in range(1, reps + 1):
        a = shadow_wave(jnp.uint32(r))
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        _ = np.asarray(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts) - 0.028


a = shadow_wave(jnp.uint32(0))
live = np.asarray(a[6]) >= 0
print(f"facing frac: {live.mean():.3f}", flush=True)
print(f"shadow natural packet : {tmin(nat)*1e3:7.1f} ms", flush=True)
print(f"shadow dispatch policy: {tmin(disp)*1e3:7.1f} ms", flush=True)
print(f"shadow XLA phased     : {tmin(xla)*1e3:7.1f} ms", flush=True)
print("PROF23 DONE", flush=True)
