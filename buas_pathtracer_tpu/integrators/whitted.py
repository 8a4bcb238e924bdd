"""Whitted-style integrator (integrators.cpp:311-426), wavefront form.

The reference recurses and SPLITS rays at dielectric surfaces (refract +
reflect).  A wavefront batch cannot fork lanes, so the split becomes a
single-sample stochastic selection: reflect with probability R, refract with
probability 1-R, each with weight 1 — an unbiased estimator of the
reference's ``lerp(refracted, reflected, R)`` that converges to the same
image as samples accumulate.  The non-medium case needs no split at all: the
diffuse term is evaluated locally with weight (1-R) and the reflected
continuation carries weight R * metallic_color (the reference's
``lerp(diffuse, reflected, R)`` exactly).

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
from .common import evaluate_material, random_point_on_light, sample_sky


def _gv(v: Vec3, i) -> Vec3:
    return Vec3(v.x[i], v.y[i], v.z[i])


def whitted(ps: PackedScene, settings: SceneSettings, sampler: smp.Sampler,
            ray_o: Vec3, ray_d: Vec3, n_lights: int = 0):
    n = ray_o.shape
    max_bounces = int(settings.max_bounce_count)
    strategy = int(settings.sampling_strategy)
    L = int(ps.light_prim.shape[0]) if n_lights > 0 else 0

    def cond(st):
        bounce, alive = st[0], st[1]
        return (bounce < max_bounces) & jnp.any(alive)

    def body(st):
        bounce, alive, o, d, throughput, total, s, prev_mat, stats = st

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
            ls = random_point_on_light(ps, light_idx, u_, v_, hit.p)
            n_dot_l = dot(N, ls.L)
            nl_dot_l = -dot(ls.Nl, ls.L)
            facing = (n_dot_l > 0.0) & (nl_dot_l > 0.0) & found & ~emissive
            occ = traverse.intersect_shadow_ray(
                ps, hit.p + ls.L * EPSILON, ls.L,
                jnp.where(facing, ls.dist - 2.0 * EPSILON, -1.0), light_idx)
            lemit = _gv(ps.mat_emission, ps.prim_mat[light_idx])
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

        # medium: stochastic branch selection of the reference's ray split
        pick_reflect = branch_u < reflectance
        med_d = vwhere(pick_reflect, refl_d, refr_d)
        med_tp = vwhere(pick_reflect, throughput, throughput * tp_beer)
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
        return bounce + 1, cont, o, d, throughput, total, s, prev_mat, stats

    st0 = (jnp.zeros((), jnp.int32), jnp.ones(n, bool), ray_o, ray_d,
           full_like(ray_o, 1.0), zeros(n), sampler, jnp.full(n, -1, jnp.int32),
           jnp.zeros(3))
    out = jax.lax.while_loop(cond, body, st0)
    return out[5], out[6], out[8]
