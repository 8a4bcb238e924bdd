# Round-3: isolate NON-TRAVERSAL frame cost by monkeypatching the BVH walk
# with a cheap deterministic stub of the same shapes/liveness statistics
# (65% hit, 70% of hits on mesh tris -> deferred smooth normals still run,
# 30% of shadow queries blocked).  The bench frame then measures raygen +
# integrator shading/sampling + NEE math + film + post with the walk cost
# ~zeroed: frame_fake ~= frame_real - (traversal kernels + compaction).
import os, sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("BENCH_CLOSEST_HIT", "0")
os.environ.setdefault("BENCH_FRAMES", "6")

import jax.numpy as jnp

from buas_pathtracer_tpu.ops import traverse_wide as tw


def fake_traverse(ps, o, d, t0, ignored_prim, occlusion):
    n = int(t0.shape[0])
    live = t0 >= 0.0
    k = int(ps.prim_type.shape[0])
    ntri = int(ps.wtri_has_n.shape[0])
    # cheap per-lane hash mixing direction so bounces decorrelate
    q = (d.x * 127.1 + d.y * 311.7 + d.z * 74.7 + o.x) * 43758.5453
    r = q - jnp.floor(q)
    r2 = (q * 1.61803) - jnp.floor(q * 1.61803)
    idx = (jnp.arange(n) + (r * 4096).astype(jnp.int32))
    z = jnp.zeros((n,))
    zi = jnp.zeros((n,), jnp.int32)
    if occlusion:
        prim = jnp.where(live & (r < 0.3), idx % k, -1)
        return (t0, prim, zi - 1, z, z, jnp.int32(0), jnp.int32(0))
    hit = live & (r < 0.65)
    t = jnp.where(hit, 2.0 + 6.0 * r2, t0)
    prim = jnp.where(hit, idx % k, -1)
    mesh = hit & (r2 < 0.7)
    tri = jnp.where(mesh, idx % ntri, -1)
    bv = jnp.where(mesh, 0.3 * r, z)
    bw = jnp.where(mesh, 0.3 * r2, z)
    return (t, prim, tri, bv, bw, jnp.int32(0), jnp.int32(0))


tw._traverse = fake_traverse

import bench

bench.main()
print("PROF37 DONE", flush=True)
