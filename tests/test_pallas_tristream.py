"""The Pallas triangle-stream kernel vs the batched oracle kernel."""

import jax
import jax.numpy as jnp
import numpy as np

from buas_pathtracer_tpu.core.vec import Vec3
from buas_pathtracer_tpu.ops import intersect
from buas_pathtracer_tpu.ops.pallas_tristream import (intersect_tristream,
                                                      pack_tris)


def test_tristream_matches_oracle():
    rng = np.random.default_rng(5)
    # 70 random triangles in a shell around the origin (pads to 128)
    t = 70
    a = rng.uniform(-2, 2, (t, 3)).astype(np.float32)
    e1 = rng.uniform(-0.8, 0.8, (t, 3)).astype(np.float32)
    e2 = rng.uniform(-0.8, 0.8, (t, 3)).astype(np.float32)
    tris = pack_tris(a, e1, e2)

    n = 1500  # not a multiple of the 1024-ray block: exercises padding
    o_np = rng.uniform(-4, -3, (n, 3)).astype(np.float32)
    d_np = rng.normal(size=(n, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o = Vec3(*[jnp.asarray(o_np[:, i]) for i in range(3)])
    d = Vec3(*[jnp.asarray(d_np[:, i]) for i in range(3)])

    interpret = jax.devices()[0].platform != "tpu"
    tt, tid, u, v = intersect_tristream(o, d, jnp.asarray(tris),
                                        interpret=interpret)

    # oracle: unrolled batched triangle kernel
    t_ref = jnp.full((n,), 3.0e38)
    id_ref = jnp.full((n,), -1, jnp.int32)
    u_ref = jnp.zeros((n,))
    v_ref = jnp.zeros((n,))
    for k in range(t):
        va = Vec3(*[jnp.float32(a[k, i]) for i in range(3)])
        vb = Vec3(*[jnp.float32(a[k, i] + e1[k, i]) for i in range(3)])
        vc = Vec3(*[jnp.float32(a[k, i] + e2[k, i]) for i in range(3)])
        h, t_ref, _, vv, ww = intersect.triangle(o, d, va, vb, vc, t_ref)
        id_ref = jnp.where(h, k, id_ref)
        u_ref = jnp.where(h, vv, u_ref)
        v_ref = jnp.where(h, ww, v_ref)

    np.testing.assert_array_equal(np.asarray(tid), np.asarray(id_ref))
    m = np.asarray(tid) >= 0
    np.testing.assert_allclose(np.asarray(tt)[m], np.asarray(t_ref)[m],
                               rtol=1e-5, atol=1e-6)
    # oracle returns (u=bary along edge1 = our u) and (w along edge2 = our v)
    np.testing.assert_allclose(np.asarray(u)[m], np.asarray(u_ref)[m],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v)[m], np.asarray(v_ref)[m],
                               rtol=1e-4, atol=1e-5)
