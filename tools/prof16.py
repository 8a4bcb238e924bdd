# Time the NON-traversal part of a frame: monkeypatch intersect_scene /
# intersect_shadow_ray with cheap fakes, then run render_frame at 1080p.
# The difference against the real frame time is the traversal share.
import time, sys, os
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from dataclasses import replace

W, H = 1920, 1080
import bench as B
from buas_pathtracer_tpu.ops import traverse
from buas_pathtracer_tpu.ops.traverse import Hit
from buas_pathtracer_tpu.core.vec import Vec3

sc = B.build_bench_scene(W, H)
ps = sc.pack()
n_prims = int(ps.prim_type.shape[0])


def fake_scene(ps_, o, d, max_t=None, ignored_prim=None):
    n = o.x.shape
    t = jnp.full(n, 5.0) + 0.25 * d.x  # pseudo-varied
    hit_id = (jnp.abs(d.y * 7.0).astype(jnp.int32)) % n_prims
    p = o + d * t
    nrm = Vec3(-d.x, -d.y, -d.z)
    alive = (jnp.full(n, True) if max_t is None else (max_t > 0.0))
    return Hit(t=t, hit_id=jnp.where(alive, hit_id, -1),
               mat_id=ps_.prim_mat[hit_id],
               tri=jnp.full(n, -1, jnp.int32),
               bary_v=jnp.zeros(n), bary_w=jnp.zeros(n), p=p, n=nrm,
               node_visits=jnp.int32(0), tri_tests=jnp.int32(0))


def fake_shadow(ps_, o, d, max_t, ignored_prim):
    return (d.x + d.y) > 0.7


traverse.intersect_scene = fake_scene
traverse.intersect_shadow_ray = fake_shadow

from buas_pathtracer_tpu.runtime import film
from buas_pathtracer_tpu.runtime.render import render_frame

st = replace(sc.settings, max_bounce_count=8)
accum = film.new_accumulation_buffer(H, W)
t0 = time.perf_counter()
accum, stats = render_frame(ps, st, sc.camera, accum, jnp.uint32(0),
                            h=H, w=W, n_lights=sc.n_lights,
                            filter_name="Mitchell Netravali")
_ = np.asarray(stats)
print(f"compile+1st: {time.perf_counter()-t0:.0f}s", flush=True)
ts = []
for r in (1, 2, 3):
    t0 = time.perf_counter()
    accum, stats = render_frame(ps, st, sc.camera, accum, jnp.uint32(r),
                                h=H, w=W, n_lights=sc.n_lights,
                                filter_name="Mitchell Netravali")
    _ = np.asarray(stats)
    ts.append(time.perf_counter() - t0)
print(f"frame w/ stubbed traversal (8 bounces): {min(ts)*1e3:.0f} ms",
      flush=True)
print("PROF16 DONE", flush=True)
