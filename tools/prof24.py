# Shading attribution probe (round 3): where do the ~0.5 s of per-bounce
# integrator math go at 1080p (N=2.07M)?  Times each piece of the advanced
# integrator's bounce body in isolation (traversal excluded), plus candidate
# replacements (one-hot MXU lookups vs row gathers, precomputed first-bounce
# sampler bases).  Methodology per CLAUDE.md 4b: varying real args, scalar
# sync, -28 ms tunnel overhead.
import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

W, H = 1920, 1080
N = W * H
BOUNCES = 8  # multiplier context: each piece runs once per bounce

import bench as B
sc = B.build_bench_scene(W, H)
ps = sc.pack()
M = int(ps.mat16.shape[0])

from buas_pathtracer_tpu.core import rng, sampler as smp
from buas_pathtracer_tpu.core.vec import Vec3, dot, normalize, reflect
from buas_pathtracer_tpu.integrators import advanced as adv
from buas_pathtracer_tpu.integrators.common import (pick_random_light,
                                                    random_point_on_light)
from buas_pathtracer_tpu.ops.shading import (fresnel_dielectric,
                                             map_to_cosine_weighted_hemisphere,
                                             refract, sample_on_unit_sphere,
                                             evaluate_checker)

STACK_DEPTH = adv.STACK_DEPTH


def args_for(r):
    """Fake per-ray state, varying with r so nothing caches."""
    k = jax.random.PRNGKey(r)
    ks = jax.random.split(k, 8)
    p = Vec3(jax.random.uniform(ks[0], (N,), minval=-10, maxval=10),
             jax.random.uniform(ks[1], (N,), minval=0, maxval=8),
             jax.random.uniform(ks[2], (N,), minval=-10, maxval=10))
    d = normalize(Vec3(jax.random.normal(ks[3], (N,)),
                       jax.random.normal(ks[4], (N,)),
                       jax.random.normal(ks[5], (N,))))
    mat = jax.random.randint(ks[6], (N,), 0, M)
    u = jax.random.uniform(ks[7], (N,))
    return p.x, p.y, p.z, d.x, d.y, d.z, mat, u


def tmin(fn, reps=3, label=""):
    a = args_for(0)
    jax.block_until_ready(a)
    _ = np.asarray(fn(*a))
    ts = []
    for r in range(1, reps + 1):
        a = args_for(r)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        _ = np.asarray(fn(*a))
        ts.append(time.perf_counter() - t0)
    ms = (min(ts) - 0.028) * 1e3
    print(f"{label:28s}: {ms:8.2f} ms  (x{BOUNCES} = {ms*BOUNCES:7.1f} ms)",
          flush=True)
    return ms


# ---- 1. material row lookup: current gather+transpose form ----------------
@jax.jit
def mat2_gather(px, py, pz, dx, dy, dz, mat, u):
    miT = adv._mat_rows(ps, mat)
    mtT = adv._mat_rows(ps, jnp.minimum(mat + 1, M - 1))
    return jnp.sum(miT[3] + mtT[12])


# ---- 2. one-hot MXU variant ------------------------------------------------
@jax.jit
def mat2_onehot(px, py, pz, dx, dy, dz, mat, u):
    t16 = ps.mat16.T  # (16, M)
    def look(ids):
        oh = (ids[None, :] == jnp.arange(M, dtype=jnp.int32)[:, None])
        return jax.lax.dot_general(
            t16, oh.astype(jnp.float32), (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # (16, N)
    miT = look(mat)
    mtT = look(jnp.minimum(mat + 1, M - 1))
    return jnp.sum(miT[3] + mtT[12])


# ---- 3. stack machinery ----------------------------------------------------
@jax.jit
def stack_ops(px, py, pz, dx, dy, dz, mat, u):
    lane = jnp.arange(STACK_DEPTH, dtype=jnp.int32)[:, None]
    stack = jnp.zeros((STACK_DEPTH, N), jnp.int32) + mat[None, :]
    stack_at = mat % STACK_DEPTH
    top = jnp.sum(jnp.where(lane == stack_at[None, :], stack, 0), axis=0)
    below = jnp.sum(jnp.where(
        lane == jnp.maximum(stack_at - 1, 0)[None, :], stack, 0), axis=0)
    push = u > 0.5
    new_at = stack_at + push.astype(jnp.int32)
    write = push[None, :] & (lane == new_at[None, :])
    stack = jnp.where(write, top[None, :], stack)
    return jnp.sum(stack[0] + below)


# ---- 4. per-bounce sampler draws (stratified), bounce traced ---------------
def draws(strategy):
    @jax.jit
    def f(px, py, pz, dx, dy, dz, mat, u):
        s = smp.make_sampler(mat.astype(jnp.uint32) * 7,
                             mat.astype(jnp.uint32) * 13,
                             jnp.uint32(3), strategy=strategy)
        bounce = (mat[0] % 4) + 1  # traced, nonzero
        acc = jnp.zeros(())
        s, r1 = smp.sample_1d(s, strategy, smp.SampleDimension.REFLECTANCE, bounce)
        s, l1 = smp.sample_1d(s, strategy, smp.SampleDimension.LIGHT_SELECTION, bounce)
        s, d1, d2 = smp.sample_2d(s, strategy, smp.SampleDimension.DIRECT_LIGHTING, bounce)
        s, i1, i2 = smp.sample_2d(s, strategy, smp.SampleDimension.INDIRECT_LIGHTING, bounce)
        s, rr = smp.sample_1d(s, strategy, smp.SampleDimension.ROULETTE, bounce)
        st, u1 = rng.next_unilateral(s.state)
        st, u2 = rng.next_unilateral(st)
        st, u3 = rng.next_unilateral(st)
        return jnp.sum(r1 + l1 + d1 + d2 + i1 + i2 + rr + u1 + u2 + u3)
    return f


# ---- 5. pure white-noise draws (the bounce>0 ideal) ------------------------
@jax.jit
def draws_white(px, py, pz, dx, dy, dz, mat, u):
    st = rng.seed_state(mat.astype(jnp.uint32))
    acc = jnp.zeros(N)
    for _ in range(10):
        st, x = rng.next_unilateral(st)
        acc = acc + x
    return jnp.sum(acc)


# ---- 6. NEE math (no traversal) --------------------------------------------
@jax.jit
def nee_math(px, py, pz, dx, dy, dz, mat, u):
    p = Vec3(px, py, pz)
    li, rcp = pick_random_light(ps, u, p, True)
    ls = random_point_on_light(ps, li, u, 1.0 - u, p)
    n = Vec3(dx, dy, dz)
    n_dot_l = dot(n, ls.L)
    sa = (-dot(ls.Nl, ls.L) * ls.A) / jnp.maximum(ls.dist_sq, 1e-12)
    pdf = rcp / jnp.maximum(sa, 1e-12) + n_dot_l / np.pi
    lemit = Vec3(ps.mat_emission.x[ps.prim_mat[li]],
                 ps.mat_emission.y[ps.prim_mat[li]],
                 ps.mat_emission.z[ps.prim_mat[li]])
    c = lemit * (n_dot_l / jnp.maximum(pdf, 1e-30))
    return jnp.sum(c.x + c.y + c.z)


# ---- 7. fresnel/branch/rr VPU bundle ---------------------------------------
@jax.jit
def shade_vpu(px, py, pz, dx, dy, dz, mat, u):
    d = Vec3(dx, dy, dz)
    nrm = normalize(Vec3(px, py, pz))
    cos_i = jnp.abs(-dot(d, nrm))
    R, cos_t = fresnel_dielectric(cos_i, jnp.ones(N), 1.5 * jnp.ones(N),
                                  jnp.full(N, 1.0 / 1.5))
    refl = reflect(d, nrm)
    refr = refract(d, nrm, cos_i, cos_t, jnp.full(N, 1.0 / 1.5))
    fuzz = sample_on_unit_sphere(u, 1.0 - u) * jnp.cbrt(u)
    rough = normalize(refl * 1.0001 + fuzz * 0.3)
    alb = evaluate_checker(Vec3(u, u, u), Vec3(1 - u, 1 - u, 1 - u),
                           mat % 2 == 0, Vec3(px, py, pz))
    ind = map_to_cosine_weighted_hemisphere(nrm, u, 1.0 - u)
    pick = u < R
    out = Vec3(jnp.where(pick, refl.x, jnp.where(mat % 3 == 0, refr.x, ind.x)),
               jnp.where(pick, rough.y, ind.y),
               jnp.where(pick, refl.z, alb.z))
    return jnp.sum(out.x + out.y + out.z)


print(f"N = {N}, M = {M} materials, backend = {jax.default_backend()}",
      flush=True)
tmin(mat2_gather, label="mat rows x2 (gather+T)")
tmin(mat2_onehot, label="mat rows x2 (one-hot MXU)")
tmin(stack_ops, label="stack top/below/push")
tmin(draws(int(smp.Strategy.STRATIFIED)), label="bounce draws (stratified)")
tmin(draws(int(smp.Strategy.BLUE_NOISE)), label="bounce draws (blue noise)")
tmin(draws_white, label="10x white-noise draws")
tmin(nee_math, label="NEE math (no traversal)")
tmin(shade_vpu, label="fresnel/branch/checker VPU")
print("PROF24 DONE", flush=True)
