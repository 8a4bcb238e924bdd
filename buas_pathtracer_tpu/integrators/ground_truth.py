"""Ground-truth pathtracers (the reference's correctness oracles).

``ground_truth_iterative`` ports integrators.cpp:485-541: the plain
exponential-decay pathtracer — fresnel reflect-or-diffuse, uniform-hemisphere
indirect, no NEE/MIS/RR.  The reference keeps a recursive twin
(integrators.cpp:428-483) purely to validate the iterative one; on the
wavefront core they are the same program, so the registry maps both names to
this implementation (the recursion IS the loop).

Wavefront form: all rays advance one bounce per iteration of a
``lax.while_loop`` with a live mask; terminated rays idle (no compaction at
this level — the Pallas path owns that).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import sampler as smp
from ..core.vec import EPSILON, PI, Vec3, dot, full_like, reflect, v3, where as vwhere, zeros
from ..models.scene import PackedScene, SceneSettings
from ..ops import traverse
from ..ops.shading import fresnel_dielectric, map_to_hemisphere
from .common import evaluate_material, sample_sky


def ground_truth_iterative(ps: PackedScene, settings: SceneSettings,
                           sampler: smp.Sampler, ray_o: Vec3, ray_d: Vec3):
    """Returns (color: Vec3, sampler)."""
    n = ray_o.shape
    max_bounces = int(settings.max_bounce_count)

    def cond(st):
        bounce, alive, *_ = st
        return (bounce < max_bounces) & jnp.any(alive)

    def body(st):
        bounce, alive, o, d, throughput, total, state, stats = st
        hit = traverse.intersect_scene(
            ps, o, d, max_t=jnp.where(alive, traverse.BIG_T, -1.0))
        stats = stats + jnp.array([jnp.sum(alive.astype(jnp.float32)),
                                   hit.node_visits.astype(jnp.float32),
                                   hit.tri_tests.astype(jnp.float32)])

        found = hit.valid & alive
        missed = ~hit.valid & alive

        # miss -> sky, terminate (integrators.cpp:532-535)
        sky = sample_sky(ps, d)
        total = vwhere(missed, total + throughput * sky, total)

        mat = hit.mat_id
        emissive = (ps.mat_flags[mat] & 0x4) != 0

        # emissive hit -> add, terminate (integrators.cpp:505-509)
        emit = Vec3(ps.mat_emission.x[mat], ps.mat_emission.y[mat], ps.mat_emission.z[mat])
        total = vwhere(found & emissive, total + throughput * emit, total)

        # continue: fresnel reflect-or-diffuse (integrators.cpp:511-530)
        state, r1 = smp_next(state)
        state, r2 = smp_next(state)
        state, r3 = smp_next(state)

        eta_t = ps.mat_ior[mat]
        cos_theta_i = -dot(d, hit.n)
        refl, _ = fresnel_dielectric(cos_theta_i, 1.0, eta_t, 1.0 / jnp.maximum(eta_t, 1e-6))
        do_reflect = r1 < refl

        refl_d = reflect(d, hit.n)
        R = map_to_hemisphere(hit.n, r2, r3)

        albedo = evaluate_material(ps, mat, hit.p)
        brdf = albedo * (1.0 / PI)
        cos_out = dot(R, hit.n)
        diff_tp = throughput * brdf * cos_out * (2.0 * PI)

        cont = found & ~emissive
        new_d = vwhere(do_reflect, refl_d, R)
        new_o = vwhere(do_reflect, hit.p + refl_d * EPSILON, hit.p + hit.n * EPSILON)
        throughput = vwhere(cont & ~do_reflect, diff_tp, throughput)

        o = vwhere(cont, new_o, o)
        d = vwhere(cont, new_d, d)
        alive = cont
        return bounce + 1, alive, o, d, throughput, total, state, stats

    st0 = (jnp.zeros((), jnp.int32), jnp.ones(n, bool), ray_o, ray_d,
           full_like(ray_o, 1.0), zeros(n), sampler.state, jnp.zeros(3))
    out = jax.lax.while_loop(cond, body, st0)
    total, state, stats = out[5], out[6], out[7]
    # NOTE: rays still alive after max bounces contribute nothing extra —
    # exactly the reference's loop falling off the end.
    return total, sampler._replace(state=state), stats


def smp_next(state):
    from ..core import rng
    return rng.next_unilateral(state)
