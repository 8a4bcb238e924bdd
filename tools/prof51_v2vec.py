"""prof51: vector-stack v2 (BUAS_V2_VEC) A/B on the real 1080p waves.

Same-session A/B (CLAUDE.md: cross-session tunnel-tax drift), varying args,
scalar sync, K-loop amortization (the round-5 honest-measurement form):
  - primary closest-hit wave (natural tile order, 2.07M rays)
  - bounce-0 NEE shadow wave shape (finite max_t, natural order)
Run: python tools/prof51_v2vec.py
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, _REPO)
from bench import build_bench_scene
from buas_pathtracer_tpu.core.vec import Vec3
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.ops import pallas_packet as pp
from buas_pathtracer_tpu.runtime.render import _tiled

W, H, K = 1920, 1080, 16
sc = build_bench_scene(W, H)
ps = sc.pack()
n = W * H
py_, px_ = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32),
                        jnp.arange(W, dtype=jnp.int32), indexing="ij")
px = _tiled(px_).astype(jnp.float32)
py = _tiled(py_).astype(jnp.float32)
z = jnp.zeros((n,))
pr = cm.generate_rays(sc.camera, px, py, W, H, z + 0.5, z + 0.5,
                      z, z, 0.0, 1.0, 6, 0.0, 0.0)
o0, d0 = pr.o, pr.d
ign = jnp.full((n,), -1, jnp.int32)


def make_fn(occlusion, v2vec):
    os.environ["BUAS_V2_VEC"] = "1" if v2vec else "0"
    t0v = jnp.where(jnp.arange(n) >= 0, 14.0, 14.0) if occlusion \
        else jnp.full((n,), 3.0e38)

    @jax.jit
    def f(r):
        def step(i, acc):
            e = 1e-5 * (i.astype(jnp.float32) + r)
            o = Vec3(o0.x + d0.x * e, o0.y + d0.y * e, o0.z + d0.z * e)
            out = pp.packet_traverse(ps.wide_rows, o, d0, t0v, ign,
                                     occlusion=occlusion)
            return acc + out[0].sum() + out[1].sum()
        return jax.lax.fori_loop(0, K, step, jnp.float32(0.0))
    return f


seed = int(time.time() * 1000) % 997
for occ in (False, True):
    res = {}
    for vv in (False, True):
        f = make_fn(occ, vv)
        np.asarray(f(jnp.float32(0.0)))  # compile+warm
        ts = []
        for r in range(2):
            t0 = time.perf_counter()
            np.asarray(f(jnp.float32(seed + r + 1)))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / K * 1e3
        res[vv] = ms
        print(f"occlusion={occ} v2vec={vv}: {ms:.2f} ms/wave "
              f"({n / (ms / 1e3) / 1e6:.1f} Mrays/s)", flush=True)
    print(f"  -> speedup {res[False] / res[True]:.3f}x", flush=True)
