# Capture REAL bounce wavefronts from the bench scene so traversal configs
# can be tuned against the actual ray distributions (synthetic random rays
# measured 2-3x optimistic).  Saves /tmp/wave_b{K}.npz with the closest-hit
# inputs at the START of bounce K.  Radiometry is approximate (stochastic
# reflect/refract/diffuse advance, crude RR) — what matters for traversal
# tuning is the geometric distribution of origins/directions/liveness.
import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from dataclasses import replace

W, H = 1920, 1080
import bench as B
from buas_pathtracer_tpu.core import sampler as smp
import buas_pathtracer_tpu.core.rng as rng
from buas_pathtracer_tpu.core.vec import Vec3, dot, normalize, reflect
from buas_pathtracer_tpu.models.camera import generate_rays
from buas_pathtracer_tpu.ops import traverse
from buas_pathtracer_tpu.ops.shading import (
    map_to_cosine_weighted_hemisphere, refract, fresnel_dielectric)

sc = B.build_bench_scene(W, H)
ps = sc.pack()
N = W * H
CAPTURE = (1, 2, 4)
settings = replace(sc.settings, max_bounce_count=8)


from buas_pathtracer_tpu.runtime.render import _tiled


@jax.jit
def first_rays():
    py_, px_ = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32),
                            jnp.arange(W, dtype=jnp.int32), indexing="ij")
    px, py = _tiled(px_), _tiled(py_)
    strategy = int(settings.sampling_strategy)
    s = smp.make_sampler(px, py, jnp.uint32(0), strategy=strategy)
    s, aa_u, aa_v = smp.sample_2d(s, strategy, smp.SampleDimension.AA, 0)
    s, dof_u, dof_v = smp.sample_2d(s, strategy, smp.SampleDimension.DOF, 0)
    rays = generate_rays(sc.camera, px, py, W, H, aa_u, aa_v, dof_u, dof_v,
                         settings.lens_distortion, settings.f_factor,
                         settings.diaphragm_edges, settings.phi_shutter_max,
                         settings.vignette_strength)
    return rays.o, rays.d


@jax.jit
def advance(o, d, alive, state):
    hit = traverse.intersect_scene(
        ps, o, d, max_t=jnp.where(alive, traverse.BIG_T, -1.0))
    alive = alive & hit.valid
    cos_i0 = -dot(d, hit.n)
    inside = cos_i0 < 0.0
    Nrm = Vec3(jnp.where(inside, -hit.n.x, hit.n.x),
               jnp.where(inside, -hit.n.y, hit.n.y),
               jnp.where(inside, -hit.n.z, hit.n.z))
    mat = hit.mat_id
    is_med = ps.mat_is_medium[mat]
    eta_i = jnp.where(inside, ps.mat_ior[mat], 1.0)
    eta_t = jnp.where(inside, 1.0, jnp.maximum(ps.mat_ior[mat], 1e-6))
    er = eta_i / eta_t
    R, ctt = fresnel_dielectric(jnp.abs(cos_i0), eta_i, eta_t, er)
    R = R + ps.mat_metallic[mat] * (1.0 - R)
    state, u1 = rng.next_unilateral(state)
    state, u2 = rng.next_unilateral(state)
    state, u3 = rng.next_unilateral(state)
    refl = reflect(d, Nrm)
    refr = refract(d, Nrm, jnp.abs(cos_i0), ctt, er)
    diff = map_to_cosine_weighted_hemisphere(Nrm, u2, u3)
    pick_refl = u1 < R
    nd = Vec3(jnp.where(pick_refl, refl.x, jnp.where(is_med, refr.x, diff.x)),
              jnp.where(pick_refl, refl.y, jnp.where(is_med, refr.y, diff.y)),
              jnp.where(pick_refl, refl.z, jnp.where(is_med, refr.z, diff.z)))
    nd = normalize(nd)
    state, ukill = rng.next_unilateral(state)
    return (hit.p + nd * 1e-4, nd, alive & (ukill > 0.12), state)


t0 = time.time()
o, d = first_rays()
alive = jnp.ones((N,), bool)
state = rng.seed_state(jnp.arange(N, dtype=jnp.uint32))
for b in range(max(CAPTURE) + 1):
    if b in CAPTURE:
        np.savez(f"/tmp/wave_b{b}.npz",
                 ox=np.asarray(o.x), oy=np.asarray(o.y), oz=np.asarray(o.z),
                 dx=np.asarray(d.x), dy=np.asarray(d.y), dz=np.asarray(d.z),
                 alive=np.asarray(alive))
        print(f"saved wave_b{b}: alive={float(np.asarray(alive).mean()):.3f} "
              f"t={time.time()-t0:.0f}s", flush=True)
    o, d, alive, state = advance(o, d, alive, state)
print(f"CAPTURE DONE total {time.time()-t0:.0f}s", flush=True)
