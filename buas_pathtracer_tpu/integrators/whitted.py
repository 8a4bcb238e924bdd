"""Whitted-style integrator (integrators.cpp:311-426), wavefront form.

The reference recurses and SPLITS rays at dielectric surfaces (refract +
reflect).  A wavefront batch cannot fork lanes, so the wavefront carries ONE
queued continuation lane per pixel: the FIRST dielectric split each path
meets runs both branches deterministically — the parent lane continues the
reflection with weight R while the queued lane traces the refraction with
weight (1-R), exactly the reference's ``lerp(refracted, reflected, R)``.
Deeper splits (queue slot taken) fall back to single-sample stochastic
selection — reflect with probability R, refract with 1-R, weight 1 — an
unbiased estimator that converges to the same image as samples accumulate.
The first split dominates a 1-spp preview (primary rays hitting glass), so
the deterministic pass removes most of the stochastic variant's noise
(tests/test_integrators.py::test_whitted_split_reduces_noise).  The
non-medium case needs no split at all: the diffuse term is evaluated locally
with weight (1-R) and the reflected continuation carries weight
R * metallic_color (the reference's ``lerp(diffuse, reflected, R)`` exactly).

Distributed direct lighting over ALL lights with one sample each
(integrators.cpp:348-370), ambient term (:371), Beer's law when exiting a
medium (:341-346), and the "previous material" convention for rays traveling
inside media (:331-338) are preserved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng
from ..core import sampler as smp
from ..core.vec import (EPSILON, PI, Vec3, dot, exp as vexp, full_like, lerp,
                        normalize, reflect, v3, where as vwhere, zeros)
from ..models.scene import PackedScene, SceneSettings
from ..ops import traverse
from ..ops.shading import fresnel_dielectric, refract, sample_on_unit_sphere
from .common import (evaluate_material, random_point_on_light_rows,
                     sample_sky)


def _gv(v: Vec3, i) -> Vec3:
    return Vec3(v.x[i], v.y[i], v.z[i])


def whitted(ps: PackedScene, settings: SceneSettings, sampler: smp.Sampler,
            ray_o: Vec3, ray_d: Vec3, n_lights: int = 0,
            has_medium: bool = True):
    """``has_medium`` is a pack-time static: scenes with no dielectric/medium
    material never split, so the queued-continuation lane (and its doubled
    ray-state memory + traversal lanes) compiles away entirely."""
    n_in = int(ray_o.x.shape[0])
    max_bounces = int(settings.max_bounce_count)
    strategy = int(settings.sampling_strategy)
    L = int(ps.light_prim.shape[0]) if n_lights > 0 else 0
    # Deterministic first-split (the queued continuation lane).  jit-static
    # via SceneSettings, like reference_mis; the stochastic fallback exists
    # as A/B evidence (tests/test_integrators.py variance comparison).
    use_split = (bool(getattr(settings, "whitted_true_split", True))
                 and bool(has_medium))

    if use_split:
        # double the wavefront: lane i+n_in is pixel i's queued refraction
        # continuation (dormant until its path's first dielectric split)
        def dup(x):
            return jnp.concatenate([x, x])

        def dupv(v: Vec3) -> Vec3:
            return Vec3(dup(v.x), dup(v.y), dup(v.z))

        ray_o, ray_d = dupv(ray_o), dupv(ray_d)
        child_state = rng.seed_state(rng.hash_u32(sampler.state,
                                                 jnp.uint32(0x5C0FFEE5)))
        def dup2(m):  # (K, N) row blocks (bn shifts, pre bases)
            return (jnp.concatenate([m, m], axis=-1) if m.size
                    else jnp.zeros((0, 2 * n_in), jnp.float32))

        sampler = smp.Sampler(
            dup(sampler.x), dup(sampler.y), sampler.sample_index,
            jnp.concatenate([sampler.state, child_state]),
            dup2(sampler.bn), dup2(sampler.pre))
        n = (2 * n_in,)
    else:
        n = (n_in,)

    def cond(st):
        bounce, alive = st[0], st[1]
        return (bounce < max_bounces) & jnp.any(alive)

    def body(st):
        (bounce, alive, o, d, throughput, total, s, prev_mat, stats,
         child_used) = st

        hit = traverse.intersect_scene(
            ps, o, d, max_t=jnp.where(alive, traverse.BIG_T, -1.0))
        found = hit.valid & alive
        missed = ~hit.valid & alive
        stats = stats + jnp.array([jnp.sum(alive.astype(jnp.float32)),
                                   hit.node_visits.astype(jnp.float32),
                                   hit.tri_tests.astype(jnp.float32)])

        sky = sample_sky(ps, d)
        total = vwhere(missed, total + throughput * sky, total)

        mat = hit.mat_id
        emissive = (ps.mat_flags[mat] & 0x4) != 0
        emit = _gv(ps.mat_emission, mat)
        total = vwhere(found & emissive, total + throughput * emit, total)

        cos_i0 = -dot(d, hit.n)
        inside = cos_i0 < 0.0
        N = vwhere(inside, -hit.n, hit.n)
        cos_theta_i = jnp.abs(cos_i0)
        eta_i = jnp.where(inside, ps.mat_ior[mat], 1.0)
        eta_t = jnp.where(inside, 1.0, jnp.maximum(ps.mat_ior[mat], 1e-6))
        # inside a medium the surface material is replaced by the medium we
        # entered through (integrators.cpp:336-338)
        mat_eff = jnp.where(inside & (prev_mat >= 0), prev_mat, mat)

        is_medium = ps.mat_is_medium[mat_eff]
        absorb = _gv(ps.mat_absorb, mat_eff)
        beer = vexp(absorb * (-hit.t))
        tp_beer = vwhere(inside & is_medium, beer, v3(1.0))

        # ---- distributed direct lighting over all lights (:348-371) ----
        illum = zeros(n)
        for li in range(L):
            light_idx = jnp.broadcast_to(ps.light_prim[li], n).astype(jnp.int32)
            s, u_, v_ = smp.sample_2d(s, strategy, smp.SampleDimension.DIRECT_LIGHTING, 0)
            # the loop light is STATIC: its packed row reads as (16,1)
            # scalar slices that broadcast — zero per-ray gathers (prof24)
            lT = ps.light16[li][:, None]
            ls = random_point_on_light_rows(lT, u_, v_, hit.p)
            n_dot_l = dot(N, ls.L)
            nl_dot_l = -dot(ls.Nl, ls.L)
            facing = (n_dot_l > 0.0) & (nl_dot_l > 0.0) & found & ~emissive
            occ = traverse.intersect_shadow_ray(
                ps, hit.p + ls.L * EPSILON, ls.L,
                jnp.where(facing, ls.dist - 2.0 * EPSILON, -1.0), light_idx)
            lemit = Vec3(lT[13], lT[14], lT[15])
            c = lemit * (nl_dot_l * ls.A * n_dot_l / jnp.maximum(ls.dist_sq, 1e-12))
            illum = vwhere(facing & ~occ, illum + c, illum)
            stats = stats + jnp.array([1.0, 0.0, 0.0]) * jnp.sum(facing.astype(jnp.float32))
        illum = illum + ps.ambient_light

        albedo = evaluate_material(ps, mat_eff, hit.p)
        brdf = albedo * (1.0 / PI)
        metallic = ps.mat_metallic[mat_eff]
        metallic_color = lerp(v3(1.0), _gv(ps.mat_albedo, mat_eff), metallic)

        eta_ratio = eta_i / eta_t
        reflectance, cos_theta_t = fresnel_dielectric(cos_theta_i, eta_i, eta_t, eta_ratio)
        reflectance = lerp(reflectance, 1.0, metallic)

        # roughness fuzz on the reflected direction (:389-393)
        refl_d = reflect(d, N)
        state, u1 = rng.next_unilateral(s.state)
        state, u2 = rng.next_unilateral(state)
        state, u3 = rng.next_unilateral(state)
        state, branch_u = rng.next_unilateral(state)
        s = s._replace(state=state)
        fuzz = sample_on_unit_sphere(u1, u2) * jnp.cbrt(u3)
        roughness = ps.mat_roughness[mat_eff]
        rough_d = normalize(refl_d * (1.0 + EPSILON) + fuzz * roughness)
        refl_d = vwhere(roughness > 0.0, rough_d, refl_d)
        refr_d = refract(d, N, cos_theta_i, cos_theta_t, eta_ratio)

        live = found & ~emissive
        split_req = live & is_medium

        if use_split:
            # deterministic first split: a first-half lane whose queue slot
            # is still free forks for real — parent keeps the REFLECT branch
            # with weight R, the child lane (activated below) gets the
            # refraction with weight (1-R).  TIR (R ~ 1) doesn't waste the
            # slot.
            act = (split_req[:n_in] & ~child_used & ~alive[n_in:]
                   & (reflectance[:n_in] < 0.999))
            det = jnp.concatenate([act, jnp.zeros_like(act)])

            # child continuation values (from this bounce's INPUT throughput)
            ch_d = Vec3(refr_d.x[:n_in], refr_d.y[:n_in], refr_d.z[:n_in])
            ch_tp_full = throughput * tp_beer * (1.0 - reflectance)
            ch_tp = Vec3(ch_tp_full.x[:n_in], ch_tp_full.y[:n_in],
                         ch_tp_full.z[:n_in])
            ch_o = Vec3(hit.p.x[:n_in] + ch_d.x * EPSILON,
                        hit.p.y[:n_in] + ch_d.y * EPSILON,
                        hit.p.z[:n_in] + ch_d.z * EPSILON)
            ch_prev = mat_eff[:n_in]
        else:
            det = jnp.zeros(n, bool)

        # medium: stochastic branch selection elsewhere (slot taken or
        # second-half lane splitting again)
        pick_reflect = det | (branch_u < reflectance)
        med_tp_refl = vwhere(det, throughput * reflectance, throughput)
        med_d = vwhere(pick_reflect, refl_d, refr_d)
        med_tp = vwhere(pick_reflect, med_tp_refl, throughput * tp_beer)
        med_prev = jnp.where(pick_reflect, -1, mat_eff)

        # non-medium: local diffuse + reflected continuation with weight R
        diffuse_term = throughput * tp_beer * brdf * illum
        significant = reflectance > 0.05
        local_w = jnp.where(significant, 1.0 - reflectance, 1.0)
        total = vwhere(live & ~is_medium, total + diffuse_term * local_w, total)
        nm_tp = throughput * metallic_color * reflectance
        nm_cont = significant

        cont = live & (is_medium | nm_cont)
        new_d = vwhere(is_medium, med_d, refl_d)
        new_o = hit.p + new_d * EPSILON
        throughput = vwhere(cont, vwhere(is_medium, med_tp, nm_tp), throughput)
        prev_mat = jnp.where(cont & is_medium, med_prev, -1)

        o = vwhere(cont, new_o, o)
        d = vwhere(cont, new_d, d)

        if use_split:
            # enqueue the refraction on the child lane (static slice +
            # concat, no gathers: child of lane i is lane i + n_in)
            def enq(x, cv):
                return jnp.concatenate([x[:n_in],
                                        jnp.where(act, cv, x[n_in:])])

            o = Vec3(enq(o.x, ch_o.x), enq(o.y, ch_o.y), enq(o.z, ch_o.z))
            d = Vec3(enq(d.x, ch_d.x), enq(d.y, ch_d.y), enq(d.z, ch_d.z))
            throughput = Vec3(enq(throughput.x, ch_tp.x),
                              enq(throughput.y, ch_tp.y),
                              enq(throughput.z, ch_tp.z))
            cont = enq(cont, jnp.ones_like(act))
            prev_mat = enq(prev_mat, ch_prev)
            child_used = child_used | act

        return (bounce + 1, cont, o, d, throughput, total, s, prev_mat,
                stats, child_used)

    alive0 = (jnp.concatenate([jnp.ones(n_in, bool), jnp.zeros(n_in, bool)])
              if use_split else jnp.ones(n, bool))
    st0 = (jnp.zeros((), jnp.int32),
           alive0,
           ray_o, ray_d,
           full_like(ray_o, 1.0), zeros(n), sampler,
           jnp.full(n, -1, jnp.int32),
           jnp.zeros(3),
           jnp.zeros(n_in, bool))
    out = jax.lax.while_loop(cond, body, st0)
    total2, s2 = out[5], out[6]
    if not use_split:
        return total2, s2, out[8]
    # fold the queued-continuation lanes back onto their pixels
    total = Vec3(total2.x[:n_in] + total2.x[n_in:],
                 total2.y[:n_in] + total2.y[n_in:],
                 total2.z[:n_in] + total2.z[n_in:])
    s_out = smp.Sampler(s2.x[:n_in], s2.y[:n_in], s2.sample_index,
                        s2.state[:n_in], s2.bn[:, :n_in], s2.pre[:, :n_in])
    return total, s_out, out[8]
