"""Pallas triangle-stream intersection: dense ray-blocks x tri-blocks.

EXPERIMENTAL (round-2 seed).  The BVH traversal's cost on this stack is the
fixed latency of per-ray row gathers inside loops (docs/PERFORMANCE.md); the
ray-stream alternative ("Minimizing Ray Tracing Memory Traffic...", PAPERS.md)
replaces pointer chasing with DENSE sweeps: blocks of rays are tested against
blocks of triangles streamed through VMEM, no gathers at all.  Pallas
pipelines the (ray_block, tri_block) grid automatically (HBM->VMEM double
buffering), the VPU does Möller–Trumbore for 1024 rays per triangle
broadcast.

This kernel is the leaf-level / small-scene building block: profitable when
most triangles are relevant to most rays (small scenes, or BVH leaves after
a binning pass).  tests/test_pallas_tristream.py validates it against the
batched oracle kernels; `bench_small_scene` compares it with the wide-BVH
traversal.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

RAY_SUB = 8
RAY_LANE = 128
RAY_BLOCK = RAY_SUB * RAY_LANE  # 1024 rays per grid row
TRI_BLOCK = 64  # triangles streamed per grid column
TRI_EPS = 1e-9
BIG_T = 3.0e38


def _kernel(ox, oy, oz, dx, dy, dz, tri_ref, t_ref, id_ref, u_ref, v_ref):
    import jax.experimental.pallas as pl
    jblk = pl.program_id(1)

    @pl.when(jblk == 0)
    def _init():
        t_ref[:] = jnp.full_like(t_ref, BIG_T)
        id_ref[:] = jnp.full_like(id_ref, -1)
        u_ref[:] = jnp.zeros_like(u_ref)
        v_ref[:] = jnp.zeros_like(v_ref)

    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    best_t = t_ref[:]
    best_id = id_ref[:]
    best_u = u_ref[:]
    best_v = v_ref[:]

    for k in range(TRI_BLOCK):
        ax, ay, az = tri_ref[k, 0], tri_ref[k, 1], tri_ref[k, 2]
        e1x, e1y, e1z = tri_ref[k, 3], tri_ref[k, 4], tri_ref[k, 5]
        e2x, e2y, e2z = tri_ref[k, 6], tri_ref[k, 7], tri_ref[k, 8]
        tid = tri_ref[k, 9]  # global triangle id as exact float (-1 = pad)

        px = d_y * e2z - d_z * e2y
        py = d_z * e2x - d_x * e2z
        pz = d_x * e2y - d_y * e2x
        det = e1x * px + e1y * py + e1z * pz
        ok = (det <= -TRI_EPS) | (det >= TRI_EPS)
        inv_det = 1.0 / jnp.where(ok, det, 1.0)
        tx, ty, tz = o_x - ax, o_y - ay, o_z - az
        u = (tx * px + ty * py + tz * pz) * inv_det
        ok = ok & (u >= 0.0) & (u <= 1.0)
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        w = (d_x * qx + d_y * qy + d_z * qz) * inv_det
        ok = ok & (w >= 0.0) & (u + w <= 1.0)
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        ok = ok & (tt >= TRI_EPS) & (tt < best_t) & (tid >= 0.0)
        best_id = jnp.where(ok, tid.astype(jnp.int32), best_id)
        best_u = jnp.where(ok, u, best_u)
        best_v = jnp.where(ok, w, best_v)
        best_t = jnp.where(ok, tt, best_t)

    t_ref[:] = best_t
    id_ref[:] = best_id
    u_ref[:] = best_u
    v_ref[:] = best_v


def intersect_tristream(ray_o, ray_d, tris: jnp.ndarray,
                        interpret: bool = False):
    """Closest-hit of N rays against T triangles, dense.

    ray_o/ray_d: Vec3-like with .x/.y/.z of shape (N,).
    tris: (T, 10) float32 [a.xyz, e1.xyz, e2.xyz, id] (id -1 rows = padding).
    Returns (t, tri_id, u, v) each (N,): misses have t=BIG_T, id=-1."""
    import jax.experimental.pallas as pl

    n = int(ray_o.x.shape[0])
    nb = -(-n // RAY_BLOCK)
    tpad = -(-int(tris.shape[0]) // TRI_BLOCK) * TRI_BLOCK
    tris_p = jnp.pad(tris, ((0, tpad - tris.shape[0]), (0, 0)),
                     constant_values=-1.0)

    def shape_ray(c):
        return jnp.pad(c, (0, nb * RAY_BLOCK - n)).reshape(
            nb * RAY_SUB, RAY_LANE)

    rays = [shape_ray(c) for c in (ray_o.x, ray_o.y, ray_o.z,
                                   ray_d.x, ray_d.y, ray_d.z)]

    ray_spec = pl.BlockSpec((RAY_SUB, RAY_LANE), lambda i, j: (i, 0))
    tri_spec = pl.BlockSpec((TRI_BLOCK, 10), lambda i, j: (j, 0))
    out_specs = [ray_spec] * 4
    out_shape = [
        jax.ShapeDtypeStruct((nb * RAY_SUB, RAY_LANE), jnp.float32),
        jax.ShapeDtypeStruct((nb * RAY_SUB, RAY_LANE), jnp.int32),
        jax.ShapeDtypeStruct((nb * RAY_SUB, RAY_LANE), jnp.float32),
        jax.ShapeDtypeStruct((nb * RAY_SUB, RAY_LANE), jnp.float32),
    ]
    t, tid, u, v = pl.pallas_call(
        _kernel,
        grid=(nb, tpad // TRI_BLOCK),
        in_specs=[ray_spec] * 6 + [tri_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*rays, tris_p)

    flat = lambda a: a.reshape(-1)[:n]
    return flat(t), flat(tid), flat(u), flat(v)


def pack_tris(tri_a: np.ndarray, tri_e1: np.ndarray, tri_e2: np.ndarray
              ) -> np.ndarray:
    """(T,3)x3 world-space triangle arrays -> (T, 10) stream layout."""
    t = tri_a.shape[0]
    out = np.empty((t, 10), np.float32)
    out[:, 0:3] = tri_a
    out[:, 3:6] = tri_e1
    out[:, 6:9] = tri_e2
    out[:, 9] = np.arange(t, dtype=np.float32)
    return out
