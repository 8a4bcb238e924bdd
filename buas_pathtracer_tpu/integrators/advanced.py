"""Advanced Pathtracer — the flagship integrator, wavefront form.

Port of the reference's advanced_integrator (integrators.cpp:581-821) with
every feature: nested-dielectric material stack with air at the bottom
(:597-613), Beer's-law absorption in participating media (:640-649), Fresnel
dielectric reflect/refract (:672-717), metallic reflectance lerp + tinted
reflection (:680,696), roughness fuzz (:691-693), lambertian BRDF (:732),
NEE with uniform/importance light picking (:738-771), MIS by pdf addition on
both the NEE side (:755-768) and the emissive-hit side (:660-669), caustics
toggle via specular-path acceptance (:651-670), cosine-weighted or uniform
hemisphere indirect sampling (:777-789), and Russian roulette on
clamp(max3(throughput), 0.1, 0.9) skipping specular bounces (:801-811).

Wavefront design: ray state is SoA ``(N,)`` arrays advanced one bounce per
``lax.while_loop`` iteration under a live mask.  The 64-deep pointer stack
becomes a fixed-depth ``(N, STACK_DEPTH)`` array of material indices with a
per-ray top pointer — pushes are masked one-hot writes, pops are pointer
decrements.  Settings booleans are jit-static, so disabled features compile
to nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng
from ..core import sampler as smp
from ..core.vec import (EPSILON, PI, Vec3, dot, exp as vexp, full_like, lerp,
                        max3, normalize, reflect, v3, where as vwhere, zeros)
from ..models.scene import PackedScene, SceneSettings
from ..ops import traverse
from ..ops.shading import (fresnel_dielectric, map_to_cosine_weighted_hemisphere,
                           map_to_hemisphere, refract, sample_on_unit_sphere)
from .common import (evaluate_material, light_pick_pdf, light_radius_of_prim,
                     light_rows, pick_random_light_slot,
                     random_point_on_light_rows, sample_sky, slot_to_prim)

STACK_DEPTH = 8  # reference uses 64 (integrators.cpp:602); 8 covers any sane
                 # nesting at 1/8 the state memory per ray

import os as _os

# Per-bounce Morton ray re-sorting (below) is semantically transparent
# (bit-identical output) but currently a net LOSS on v5e: the ~25 per-ray
# permutation gathers inside the bounce loop cost more than the traversal
# coherence saves (1080p bench 0.9 -> 0.3 Mrays/s).  Off by default; kept
# behind the env flag for future revisits (state packing could make the
# permutation one row-gather).
SORT_RAYS = _os.environ.get("BUAS_SORT_RAYS", "0") == "1"


def _gv(v: Vec3, i) -> Vec3:
    return Vec3(v.x[i], v.y[i], v.z[i])


def _mat_rows(ps: PackedScene, ids):
    """(16, N) material rows of the packed table.

    For the (always small) material table a one-hot MXU contraction
    (16,M)@(M,N) beats the row gather + transpose 9x at 2M rays
    (tools/prof24: 1.3 ms vs 11.7 ms for two lookups): TPU per-index gather
    latency disappears entirely; the one-hot build is M vector compares and
    the contraction is exact (each output element is a single 1.0*x product
    at HIGHEST precision)."""
    M = int(ps.mat16.shape[0])
    if M <= 64:
        oh = (ids[None, :] == jnp.arange(M, dtype=jnp.int32)[:, None]
              ).astype(jnp.float32)
        return jax.lax.dot_general(
            ps.mat16, oh, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # (16, N)
    # huge material sets: one row gather + MXU transpose (sublane reads)
    return jax.lax.dot_general(
        jnp.eye(16, dtype=jnp.float32), ps.mat16[ids],
        (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # (16, N)


def _permute_state(ids, o, d, tp, tot, prev_n, state, stack, stack_at,
                   is_spec, cont, pix):
    """Move the whole per-ray bounce state through ONE packed row gather.

    All 29 per-lane fields ride a (N, 32) f32 matrix (MXU transposes on
    both ends, the movement discipline of traverse_wide._traverse_full);
    SORT_RAYS' original sin was ~25 separate permutation gathers.  The
    RNG state (uint32) crosses as two exact 16-bit halves — NEVER as a
    bitcast pattern (CLAUDE.md pitfall 1).  ``ids`` may be a prefix
    (stage compaction) or a full permutation (in-stage per-bounce sort).
    Returns the fields at ``len(ids)`` lanes."""
    hi = jnp.right_shift(state, jnp.uint32(16)).astype(jnp.float32)
    lo = jnp.bitwise_and(state, jnp.uint32(0xFFFF)).astype(jnp.float32)
    cols = [o.x, o.y, o.z, d.x, d.y, d.z,
            tp.x, tp.y, tp.z, tot.x, tot.y, tot.z,
            prev_n.x, prev_n.y, prev_n.z, hi, lo,
            stack_at.astype(jnp.float32), is_spec.astype(jnp.float32),
            cont.astype(jnp.float32), pix.astype(jnp.float32)]
    cols += [stack[k].astype(jnp.float32) for k in range(STACK_DEPTH)]
    while len(cols) % 8:  # 29 fields -> 32-wide pack matrix
        cols.append(jnp.zeros_like(o.x))
    eye = jnp.eye(len(cols), dtype=jnp.float32)
    big = jax.lax.dot_general(
        jnp.stack(cols), eye, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # (N, C) rows
    bT = jax.lax.dot_general(
        eye, big[ids], (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # (C, len(ids))
    state2 = jnp.bitwise_or(
        jnp.left_shift(bT[15].astype(jnp.uint32), jnp.uint32(16)),
        bT[16].astype(jnp.uint32))
    stack2 = jnp.stack([bT[21 + k] for k in range(STACK_DEPTH)]
                       ).astype(jnp.int32)
    return (Vec3(bT[0], bT[1], bT[2]), Vec3(bT[3], bT[4], bT[5]),
            Vec3(bT[6], bT[7], bT[8]), Vec3(bT[9], bT[10], bT[11]),
            Vec3(bT[12], bT[13], bT[14]), state2, stack2,
            bT[17].astype(jnp.int32), bT[18] > 0.5, bT[19] > 0.5,
            bT[20].astype(jnp.int32))


def _stage_sort_key(ps: PackedScene, o: Vec3, d: Vec3, alive):
    """m6d compact key for live lanes; root-prefiltered lanes (alive but
    provably missing everything — 66% of a real diffuse wave, prof35)
    sort JUST BEFORE the dead tail so live blocks stay dense, while
    remaining in the stage to collect their sky miss next bounce."""
    from ..ops import pallas_packet as _pp
    nn = alive.shape
    big_t = jnp.full(nn, traverse.BIG_T)
    live_r = alive & _pp.root_prefilter(ps.wide_rows, o, d, big_t)
    key = _pp._compact_key(o, d, jnp.full(nn, -1, jnp.int32),
                           ps.scene_lo, ps.scene_hi)
    key = jnp.where(live_r, key, jnp.int32(0x7FFFFFFE))
    return jnp.where(alive, key, jnp.int32(0x7FFFFFFF)), live_r


def advanced(ps: PackedScene, settings: SceneSettings, sampler: smp.Sampler,
             ray_o: Vec3, ray_d: Vec3, n_lights: int = 0):
    """Returns (color: Vec3, sampler)."""
    n = ray_o.shape
    max_bounces = int(settings.max_bounce_count)
    strategy = int(settings.sampling_strategy)
    nee = bool(settings.next_event_estimation) and n_lights > 0
    # env-map NEE: the reference built the env CDF but stubbed the sampler
    # (integrators.cpp:230-233 "NOT YET IMPLEMENTED"); here it is a second
    # direct-light strategy whenever an env map is present.  Without it a
    # small bright sun disk is only ever hit by chance -> fireflies.
    from .common import has_env as _has_env
    env_nee = (bool(settings.next_event_estimation) and _has_env(ps)
               and bool(getattr(settings, "env_nee", True)))
    use_mis = bool(settings.use_mis)
    is_lights = bool(settings.importance_sample_lights)
    is_diffuse = bool(settings.importance_sample_diffuse)
    rr = bool(settings.russian_roulette)
    caustics = bool(settings.caustics)
    ref_mis = bool(getattr(settings, "reference_mis", False))

    # stack layout is (DEPTH, N): rays stay on VPU lanes and level selects
    # are cheap masked sums over the 8 sublane rows.  An (N, DEPTH) layout
    # costs a full cross-lane relayout per take_along_axis (layout
    # discipline, see ops/traverse_wide.py).
    lane = jnp.arange(STACK_DEPTH, dtype=jnp.int32)[:, None]  # (D, 1)

    # Staged wavefront compaction (round-3 lever 4, built round 4; measured
    # -260 ms on the 1080p bench frame at one stage): bounces past the
    # first run mostly-dead wavefronts, yet every bounce pays full-width
    # VPU math for shading, NEE sampling and state merges (~25 ms/bounce at
    # 2.07M lanes, tools/prof37).  As soon as the live count fits the next
    # static stage width (and bounce >= 1), the running loop BREAKS; the
    # survivors are packed to the stage prefix with one row gather and the
    # SAME body finishes the remaining bounces there — recursively down the
    # BUAS_PHASE_BLOCKS ladder (default 512k -> 128k lanes).  Bit-identical
    # to the single loop: per-lane draws (white noise from the carried
    # xorshift state only, bounce >= 1), math and accumulation order are
    # unchanged, and each stage's scatter RESTORES (not adds) lane totals.
    # jit-static gate; env knobs are read at trace time.
    _pb = _os.environ.get("BUAS_PHASE_BLOCKS", "512,128")
    stage_widths = []
    for tok in _pb.split(","):
        tok = tok.strip()
        if not tok:
            continue
        wd = int(tok) * 1024
        if wd < (stage_widths[-1] if stage_widths else n[0]):
            stage_widths.append(wd)
    two_phase = (_os.environ.get("BUAS_TWO_PHASE", "1") == "1"
                 and not SORT_RAYS and max_bounces > 2 and bool(stage_widths)
                 and getattr(sampler.sample_index, "ndim", 0) == 0)

    def make_cond(break_width):
        def cond(st):
            bounce, alive = st[0], st[1]
            more = (bounce < max_bounces) & jnp.any(alive)
            if break_width is not None:
                nlive = jnp.sum(alive.astype(jnp.int32))
                more = more & ~((bounce >= 1) & (nlive <= break_width))
            return more
        return cond

    cond = make_cond(stage_widths[0] if two_phase else None)

    def body_stage(st):
        # stage-width variant: presorted traversal + end-of-bounce re-sort
        return body(st, _in_stage=True)

    def body(st, _in_stage=False):
        (bounce, alive, o, d, throughput, total, s,
         stack, stack_at, is_specular, prev_n, stats, pix) = st
        nn = alive.shape  # body is width-agnostic: the staged compacted
        #                   continuations (below) re-run it at stage widths

        # dead rays get max_t = -1: the root slab test fails and they exit
        # the lockstep traversal in one iteration instead of re-walking the
        # BVH with stale state every remaining bounce
        if _in_stage:
            # stage loops walk PRESORTED: the end-of-bounce sort below
            # ordered the lanes by the m6d compact key, so the grouped
            # packet kernel takes the wave directly — no per-wave gather,
            # no result scatter-back.  The root prefilter folds into
            # max_t: proven misses walk with t0 < 0 (one-iteration exit)
            # and shade as sky misses — the dispatch-prefilter semantics,
            # bit-identically.
            from ..ops import pallas_packet as _pp
            live_r = alive & _pp.root_prefilter(
                ps.wide_rows, o, d, jnp.full(nn, traverse.BIG_T))
            with _pp.presorted_hint():
                hit = traverse.intersect_scene(
                    ps, o, d,
                    max_t=jnp.where(live_r, traverse.BIG_T, -1.0))
        else:
            hit = traverse.intersect_scene(
                ps, o, d, max_t=jnp.where(alive, traverse.BIG_T, -1.0))
        found = hit.valid & alive
        missed = ~hit.valid & alive
        stats = stats + jnp.array([jnp.sum(alive.astype(jnp.float32)),
                                   hit.node_visits.astype(jnp.float32),
                                   hit.tri_tests.astype(jnp.float32)])

        # ---- miss: sky, terminate (integrators.cpp:813-816) ----
        sky = sample_sky(ps, d)
        if env_nee:
            # MIS with the env-NEE strategy below: BRDF-sampled rays that
            # reach the sky are weighted by brdf/(brdf+env) pdfs; specular
            # and primary rays see the env directly (no competing strategy).
            from ..ops import envmap
            brdf_pdf_sky = (jnp.maximum(dot(prev_n, d), 0.0) / PI) \
                if is_diffuse else (1.0 / (2.0 * PI))
            if use_mis:
                he, we, _ = ps.env_pixels.shape
                e_pdf = envmap.env_pdf_table(ps.env_pdf_num, he, we, d)
                w_sky = brdf_pdf_sky / jnp.maximum(brdf_pdf_sky + e_pdf, 1e-30)
                w_sky = jnp.where(is_specular, 1.0, w_sky)
            else:
                w_sky = is_specular.astype(jnp.float32)
            total = vwhere(missed, total + throughput * sky * w_sky, total)
        else:
            total = vwhere(missed, total + throughput * sky, total)

        # ---- orientation + stack-relative materials (:617-638) ----
        cos_i0 = -dot(d, hit.n)
        inside = cos_i0 < 0.0
        N = vwhere(inside, -hit.n, hit.n)
        cos_theta_i = jnp.abs(cos_i0)

        surf_mat = hit.mat_id
        top = jnp.sum(jnp.where(lane == stack_at[None, :], stack, 0), axis=0)
        below = jnp.sum(jnp.where(
            lane == jnp.maximum(stack_at - 1, 0)[None, :], stack, 0), axis=0)
        mat_i = jnp.where(inside, surf_mat, top)
        mat_t = jnp.where(inside, below, surf_mat)
        miT = _mat_rows(ps, mat_i)
        mtT = _mat_rows(ps, mat_t)
        t_code = mtT[15].astype(jnp.int32)  # flags | is_medium<<3

        # ---- Beer's law through the incident medium (:640-649) ----
        absorb = Vec3(miT[6], miT[7], miT[8])
        beer = vexp(absorb * (-hit.t))
        i_is_medium = miT[15].astype(jnp.int32) >= 8
        throughput = vwhere(found & i_is_medium, throughput * beer, throughput)

        # ---- emissive hit: direct or MIS-weighted, then terminate (:651-670)
        t_emissive = (t_code & 0x4) != 0
        emit = Vec3(mtT[3], mtT[4], mtT[5])
        if not nee:
            allow_direct = jnp.ones(nn, bool)
        elif caustics:
            allow_direct = is_specular
        else:
            allow_direct = ((bounce < 2) & is_specular)
        hit_emissive = found & t_emissive
        total = vwhere(hit_emissive & allow_direct,
                       total + throughput * emit, total)
        if nee and use_mis:
            # BRDF-hit side of MIS.  The reference adds
            # (1/(light_pdf+brdf_pdf))*throughput*emission with
            # light_pdf = t^2/cos (integrators.cpp:660-669) — but throughput
            # already carries 1/brdf_pdf from the previous bounce, so that
            # form double-divides and omits the light area: it does NOT
            # converge to its own ground-truth integrators.  The TPU build
            # uses the proper one-sample balance heuristic instead:
            # weight = brdf_pdf / (brdf_pdf + light_pdf_sa), with
            # light_pdf_sa = pick_pdf * t^2 / (cos * A) — the exact pdf NEE
            # would have used for this direction.  Converges to ground truth
            # (tests/test_integrators.py).
            brdf_pdf = (dot(prev_n, d) / PI) if is_diffuse else (1.0 / (2.0 * PI))
            if ref_mis:
                # the reference's exact arithmetic (integrators.cpp:660-669):
                # light_pdf = t^2/cos with NO area or pick-pdf term, and the
                # sum's reciprocal MULTIPLIES throughput (which already
                # carries 1/brdf_pdf) instead of forming a weight in [0,1]
                light_pdf_ref = hit.t * hit.t / jnp.maximum(cos_theta_i, 1e-12)
                w_brdf = 1.0 / jnp.maximum(light_pdf_ref + brdf_pdf, 1e-30)
            else:
                # L where-selects, not a per-ray prim_r gather (prof24)
                light_r = light_radius_of_prim(ps, hit.hit_id)
                area = 2.0 * PI * light_r * light_r
                # shading point of the previous bounce == this ray's origin
                pick_pdf = light_pick_pdf(ps, o, hit.hit_id, is_lights)
                light_pdf_sa = pick_pdf * hit.t * hit.t / jnp.maximum(
                    cos_theta_i * area, 1e-12)
                w_brdf = brdf_pdf / jnp.maximum(brdf_pdf + light_pdf_sa, 1e-30)
            mis_case = hit_emissive & ~allow_direct & (bounce > 0)
            total = vwhere(mis_case, total + throughput * emit * w_brdf, total)

        # ---- fresnel split (:672-684) ----
        eta_i = miT[12]
        eta_t = jnp.maximum(mtT[12], 1e-6)
        eta_ratio = eta_i / eta_t
        reflectance, cos_theta_t = fresnel_dielectric(cos_theta_i, eta_i, eta_t, eta_ratio)
        metallic = mtT[13]
        reflectance = lerp(reflectance, 1.0, metallic)

        s, reflect_test = smp.sample_1d(s, strategy, smp.SampleDimension.REFLECTANCE, bounce)
        do_reflect = reflect_test < reflectance

        # ---- reflect branch (:686-700) ----
        refl_d = reflect(d, N)
        state, u1 = rng.next_unilateral(s.state)
        state, u2 = rng.next_unilateral(state)
        state, u3 = rng.next_unilateral(state)
        s = s._replace(state=state)
        fuzz = sample_on_unit_sphere(u1, u2) * jnp.cbrt(u3)
        roughness = mtT[14]
        rough_d = normalize(refl_d * (1.0 + EPSILON) + fuzz * roughness)
        refl_d = vwhere(roughness > 0.0, rough_d, refl_d)
        refl_o = hit.p + refl_d * EPSILON
        albedo_t = Vec3(mtT[0], mtT[1], mtT[2])
        refl_tint = lerp(v3(1.0), albedo_t, metallic)

        # ---- refract branch (nested dielectrics, :702-723) ----
        t_is_medium = t_code >= 8
        do_refract = ~do_reflect & t_is_medium
        refr_d = refract(d, N, cos_theta_i, cos_theta_t, eta_ratio)
        refr_o = hit.p + refr_d * EPSILON
        # pop when leaving (inside hit), push when entering
        pop = do_refract & found & inside & (stack_at > 0)
        push = do_refract & found & ~inside & (stack_at < STACK_DEPTH - 1)
        new_at = stack_at + push.astype(jnp.int32) - pop.astype(jnp.int32)
        write = push[None, :] & (lane == new_at[None, :])  # (D, N)
        stack = jnp.where(write, mat_t[None, :], stack)
        stack_at = new_at

        # ---- diffuse branch (:725-795) ----
        do_diffuse = ~do_reflect & ~t_is_medium
        from ..ops.shading import evaluate_checker
        albedo = evaluate_checker(albedo_t, Vec3(mtT[9], mtT[10], mtT[11]),
                                  (t_code & 0x2) != 0, hit.p)
        brdf = albedo * (1.0 / PI)

        # ---- next-event estimation: ONE merged shadow wave per bounce ----
        # Light-NEE and env-NEE occlusion queries are CONCATENATED into a
        # single intersect_shadow_ray call: one traversal call site instead
        # of two keeps the frame program under the axon tunnel's
        # per-process executable budget (CLAUDE.md 4b — this is what forced
        # env_nee off in the round-2 hero render) and halves the shadow
        # wave's fixed dispatch cost.  Reference: intersect_shadow_ray
        # intersection.cpp:600-604.
        if nee:
            s, lp_u = smp.sample_1d(s, strategy, smp.SampleDimension.LIGHT_SELECTION, bounce)
            slot, light_rcp_pdf = pick_random_light_slot(ps, lp_u, hit.p, is_lights)
            s, dl_u, dl_v = smp.sample_2d(s, strategy, smp.SampleDimension.DIRECT_LIGHTING, bounce)
            # the whole light read (transform, radius, emission) comes from
            # ONE one-hot MXU contraction — zero per-ray gathers (prof24)
            lT = light_rows(ps, slot)
            ls = random_point_on_light_rows(lT, dl_u, dl_v, hit.p)
            light_idx = slot_to_prim(ps, slot)
            n_dot_l = dot(N, ls.L)
            nl_dot_l = -dot(ls.Nl, ls.L)
            facing = (n_dot_l > 0.0) & (nl_dot_l > 0.0) & do_diffuse & found & ~t_emissive
            shadow_o = hit.p + ls.L * EPSILON
            # non-facing/dead lanes get max_t = -1 (instant exit), so they
            # contribute no iterations to their chunk's lockstep loop
            max_t_l = jnp.where(facing, ls.dist - 2.0 * EPSILON, -1.0)
        if env_nee:
            from ..ops import envmap
            s, e_u, e_v = smp.sample_2d(s, strategy,
                                        smp.SampleDimension.ENV_LIGHTING, bounce)
            # O(1) alias sampling — the inverse-CDF draw cost 399 ms/call
            # at 2M rays (tools/prof39), ~1/3 of the env hero's frame
            d_e, pdf_e, rad_e = envmap.sample_env_alias(
                ps.env_alias_prob, ps.env_alias_idx, ps.env_pdf_num,
                ps.env_pixels, e_u, e_v)
            n_dot_e = dot(N, d_e)
            facing_e = (n_dot_e > 0.0) & do_diffuse & found & ~t_emissive
            shadow_o_e = hit.p + d_e * EPSILON
            max_t_e = jnp.where(facing_e, traverse.BIG_T, -1.0)
            ign_e = jnp.full(nn, -1, jnp.int32)

        # attribution-only knob: BUAS_DEBUG_NO_SHADOW=1 treats every NEE
        # query as unoccluded (WRONG image, same wave shapes) — splits the
        # NEE cost between the occlusion walk and the sampling math in
        # bench A/Bs without a dedicated probe harness
        _no_shadow = _os.environ.get("BUAS_DEBUG_NO_SHADOW", "0") == "1"
        if _no_shadow:
            if nee:
                occluded = jnp.zeros(nn, bool)
            if env_nee:
                occ_e = jnp.zeros(nn, bool)
        elif nee and env_nee:
            cat = jnp.concatenate
            occ2 = traverse.intersect_shadow_ray(
                ps,
                Vec3(cat([shadow_o.x, shadow_o_e.x]),
                     cat([shadow_o.y, shadow_o_e.y]),
                     cat([shadow_o.z, shadow_o_e.z])),
                Vec3(cat([ls.L.x, d_e.x]), cat([ls.L.y, d_e.y]),
                     cat([ls.L.z, d_e.z])),
                cat([max_t_l, max_t_e]), cat([light_idx, ign_e]))
            nray = nn[0]
            occluded, occ_e = occ2[:nray], occ2[nray:]
        elif nee:
            occluded = traverse.intersect_shadow_ray(
                ps, shadow_o, ls.L, max_t_l, light_idx)
        elif env_nee:
            occ_e = traverse.intersect_shadow_ray(
                ps, shadow_o_e, d_e, max_t_e, ign_e)

        if nee:
            visible = facing & ~occluded
            solid_angle = (nl_dot_l * ls.A) / jnp.maximum(ls.dist_sq, 1e-12)
            # light_rcp_pdf is the PICK probability (reference convention,
            # integrators.cpp:163,175); full NEE pdf = pick * 1/solid_angle.
            light_pdf_sa = light_rcp_pdf / jnp.maximum(solid_angle, 1e-12)
            if use_mis and ref_mis:
                # the reference's exact arithmetic (integrators.cpp:757-768):
                # the pick pdf multiplies the SUM of the strategy pdfs, so
                # the brdf term is wrongly scaled by it too (identical only
                # when the pick pdf is 1, i.e. a single light)
                brdf_pdf = (n_dot_l / PI) if is_diffuse else (1.0 / (2.0 * PI))
                pdf = (1.0 / jnp.maximum(solid_angle, 1e-12) + brdf_pdf) \
                    * light_rcp_pdf
            elif use_mis:
                # balance heuristic: divide by the SUM of the strategies'
                # pdfs (converges to ground truth; see the BRDF-hit side
                # note above)
                brdf_pdf = (n_dot_l / PI) if is_diffuse else (1.0 / (2.0 * PI))
                pdf = light_pdf_sa + brdf_pdf
            else:
                pdf = light_pdf_sa
            lemit = Vec3(lT[13], lT[14], lT[15])  # light16 emission lanes
            contrib = throughput * brdf * lemit * (n_dot_l / jnp.maximum(pdf, 1e-30))
            total = vwhere(visible, total + contrib, total)
            stats = stats + jnp.array([1.0, 0.0, 0.0]) * jnp.sum(facing.astype(jnp.float32))

        # ---- env-map NEE shading (implements the reference's stub) ----
        if env_nee:
            visible_e = facing_e & ~occ_e
            if use_mis:
                brdf_pdf_e = (n_dot_e / PI) if is_diffuse else (1.0 / (2.0 * PI))
                pdf_tot = pdf_e + brdf_pdf_e
            else:
                pdf_tot = pdf_e
            contrib_e = throughput * brdf * rad_e * (
                n_dot_e / jnp.maximum(pdf_tot, 1e-30))
            total = vwhere(visible_e, total + contrib_e, total)
            stats = stats + jnp.array([1.0, 0.0, 0.0]) * jnp.sum(
                facing_e.astype(jnp.float32))

        # indirect bounce (:777-795)
        s, il_u, il_v = smp.sample_2d(s, strategy, smp.SampleDimension.INDIRECT_LIGHTING, bounce)
        if is_diffuse:
            R = map_to_cosine_weighted_hemisphere(N, il_u, il_v)
            diff_tp_scale = full_like(throughput, PI)
        else:
            R = map_to_hemisphere(N, il_u, il_v)
            c = 2.0 * PI * dot(N, R)
            diff_tp_scale = Vec3(c, c, c)
        diff_o = hit.p + N * EPSILON

        # ---- merge branches ----
        new_specular = jnp.where(do_diffuse, False, True)
        new_d = vwhere(do_reflect, refl_d, vwhere(do_refract, refr_d, R))
        new_o = vwhere(do_reflect, refl_o, vwhere(do_refract, refr_o, diff_o))
        tp_mult = vwhere(do_reflect, refl_tint,
                         vwhere(do_refract, v3(1.0), diff_tp_scale * brdf))
        cont = found & ~t_emissive
        throughput = vwhere(cont, throughput * tp_mult, throughput)

        # ---- russian roulette (:801-811) ----
        if rr:
            p = jnp.clip(max3(throughput), 0.1, 0.9)
            s, rr_u = smp.sample_1d(s, strategy, smp.SampleDimension.ROULETTE, bounce)
            kill = cont & ~new_specular & (rr_u > p)
            boost = cont & ~new_specular & ~kill
            inv_p = 1.0 / p
            throughput = vwhere(boost, throughput * inv_p, throughput)
            cont = cont & ~kill

        o = vwhere(cont, new_o, o)
        d = vwhere(cont, new_d, d)
        prev_n = vwhere(cont, N, prev_n)
        is_specular = jnp.where(cont, new_specular, is_specular)

        if SORT_RAYS:
            # Re-sort the wavefront each bounce: live rays clustered by a
            # Morton code of the next ray origin (major) + direction octant
            # (minor), dead rays packed last.  The chunked lockstep traversal
            # (ops/traverse_wide.py) pays max-iterations PER CHUNK, so
            # spatially-and-directionally coherent chunks retire fast and
            # whole chunks of dead rays exit in one iteration; `pix` carries
            # the original ray slot so callers can unsort at the end.  Pure
            # permutation of per-ray state — results are bit-identical.
            # (Octant-only keys are a 3x REGRESSION: they shuffle spatially
            # random rays into each chunk and every chunk then walks the
            # whole scene.)
            slo, shi = ps.scene_lo, ps.scene_hi
            ext = jnp.maximum(shi - slo, 1e-6)

            def q6(c, lo_c, ext_c):  # 6-bit quantized axis
                return jnp.clip(((c - lo_c) / ext_c * 64.0), 0.0, 63.0
                                ).astype(jnp.int32)

            def spread3(v):  # interleave 6 bits -> every 3rd bit (Morton)
                v = (v | (v << 8)) & 0x0300F
                v = (v | (v << 4)) & 0x030C3
                v = (v | (v << 2)) & 0x09249
                return v

            mx = spread3(q6(o.x, slo[0], ext[0]))
            my = spread3(q6(o.y, slo[1], ext[1]))
            mz = spread3(q6(o.z, slo[2], ext[2]))
            morton = mx | (my << 1) | (mz << 2)  # 18 bits
            oct_ = ((d.x < 0).astype(jnp.int32) * 4
                    + (d.y < 0).astype(jnp.int32) * 2
                    + (d.z < 0).astype(jnp.int32))
            key = jnp.where(cont, (morton << 3) | oct_, jnp.int32(1 << 22))
            perm = jnp.argsort(key, stable=True)

            def g(a):
                return a[perm]

            cont = g(cont)
            o = Vec3(g(o.x), g(o.y), g(o.z))
            d = Vec3(g(d.x), g(d.y), g(d.z))
            throughput = Vec3(g(throughput.x), g(throughput.y), g(throughput.z))
            total = Vec3(g(total.x), g(total.y), g(total.z))
            # sampler leaves: (N,) arrays permute on axis 0, the blue-noise
            # shift matrix (K, N) on axis 1, scalars pass through
            s = jax.tree.map(
                lambda a: (a[:, perm] if getattr(a, "ndim", 0) == 2
                           else g(a) if getattr(a, "ndim", 0) == 1 else a), s)
            stack = stack[:, perm]  # (D, N): rays are on axis 1
            stack_at = g(stack_at)
            is_specular = g(is_specular)
            prev_n = Vec3(g(prev_n.x), g(prev_n.y), g(prev_n.z))
            pix = g(pix)

        if _in_stage:
            # re-sort the stage for the NEXT bounce's presorted walk: one
            # packed row gather of the whole state (see _permute_state).
            # Pure per-lane permutation — results stay bit-identical; the
            # pix column tracks stage-entry slots for the final unsort.
            key, _ = _stage_sort_key(ps, o, d, cont)
            ids2 = jnp.argsort(key, stable=True)
            (o, d, throughput, total, prev_n, state2, stack, stack_at,
             is_specular, cont, pix) = _permute_state(
                ids2, o, d, throughput, total, prev_n, s.state, stack,
                stack_at, is_specular, cont, pix)
            s = s._replace(state=state2)

        return (bounce + 1, cont, o, d, throughput, total, s,
                stack, stack_at, is_specular, prev_n, stats, pix)

    st0 = (
        jnp.zeros((), jnp.int32),
        jnp.ones(n, bool),
        ray_o, ray_d,
        full_like(ray_o, 1.0),
        zeros(n),
        sampler,
        jnp.zeros((STACK_DEPTH,) + n, jnp.int32),  # material 0 == air
        jnp.zeros(n, jnp.int32),
        jnp.ones(n, bool),  # is_specular_bounce starts true (:615)
        zeros(n),
        jnp.zeros(3),  # stats: [rays, node_visits, tri_tests]
        jnp.arange(n[0] if n else 0, dtype=jnp.int32),  # original ray slot
    )
    out = jax.lax.while_loop(cond, body, st0)
    total = out[5]
    s = out[6]
    stats_out = out[11]

    if two_phase:
        def _passthrough(st):
            return (st[5].x, st[5].y, st[5].z, st[11])

        def _continue_stage(out_prev, stage_i):
            """If the stage-(i-1) loop broke with bounces left, pack the
            survivors into the stage-i prefix (one argsort + one
            (NBL, 32) row gather + MXU transposes on both ends — the
            movement discipline of ops/traverse_wide._traverse_full) and
            finish there, recursing down the remaining stage widths.  The
            RNG state (uint32) crosses the f32 pack as two exact 16-bit
            halves — NEVER as a bitcast pattern (CLAUDE.md pitfall 1).
            Returns (total.x/y/z, stats) at the PREVIOUS stage's width."""
            nbl = stage_widths[stage_i]
            next_w = (stage_widths[stage_i + 1]
                      if stage_i + 1 < len(stage_widths) else None)

            def _compact(st):
                (bounce, alive, o2, d2, tp2, tot2, s2,
                 stack2, stack_at2, is_spec2, prev_n2, stats2, _pix) = st
                # m6d boundary key: the stage's FIRST presorted walk needs
                # block-coherent lanes, not merely alive-first packing
                key, _ = _stage_sort_key(ps, o2, d2, alive)
                ids = jnp.argsort(key, stable=True)[:nbl]
                (o_b, d_b, tp_b, tot_b, pn_b, state_b, stack_b, sat_b,
                 spec_b, alive_b, _) = _permute_state(
                    ids, o2, d2, tp2, tot2, prev_n2, s2.state, stack2,
                    stack_at2, is_spec2, alive, _pix)
                s_b = smp.Sampler(
                    x=jnp.zeros(nbl, jnp.uint32),
                    y=jnp.zeros(nbl, jnp.uint32),
                    sample_index=s2.sample_index, state=state_b,
                    bn=jnp.zeros((0, nbl), jnp.float32),
                    # non-empty zero `pre` keeps sample_1d/2d on the
                    # table-free precomputed path; its values are never
                    # selected at bounce >= 1 (white noise only)
                    pre=jnp.zeros((s2.pre.shape[0], nbl), jnp.float32))
                st_b = (bounce, alive_b, o_b, d_b, tp_b, tot_b, s_b,
                        stack_b, sat_b, spec_b, pn_b, stats2,
                        jnp.arange(nbl, dtype=jnp.int32))

                # trace-time hint: compact-stage traversal call sites emit
                # only the prefilter + one full-width Morton-compact walk
                # (2 extra Mosaic kernels per stage, not 6) — the axon
                # tunnel's per-process executable budget is the constraint
                # (CLAUDE.md 4b)
                from ..ops import pallas_packet as _pp
                with _pp.phase_compact_hint():
                    outb = jax.lax.while_loop(make_cond(next_w), body_stage,
                                              st_b)
                if next_w is not None:
                    tbx, tby, tbz, stats_b = _continue_stage(
                        outb, stage_i + 1)
                else:
                    tb = outb[5]
                    tbx, tby, tbz, stats_b = tb.x, tb.y, tb.z, outb[11]
                # RESTORE (not add): the stage totals already accumulated
                # on top of each lane's gathered total, preserving the
                # single-loop float accumulation order exactly; untouched
                # (dead) gathered lanes write their own value back.  The
                # in-stage per-bounce sorts permuted the lanes, so the
                # scatter targets compose through the stage's pix column
                # (lane j sits at stage-entry slot pix[j] -> parent slot
                # ids[pix[j]]).
                tgt = ids[outb[12]]
                return (tot2.x.at[tgt].set(tbx, unique_indices=True),
                        tot2.y.at[tgt].set(tby, unique_indices=True),
                        tot2.z.at[tgt].set(tbz, unique_indices=True),
                        stats_b)

            pending = (out_prev[0] < max_bounces) & jnp.any(out_prev[1])
            return jax.lax.cond(pending, _compact, _passthrough, out_prev)

        tx, ty, tz, stats_out = _continue_stage(out, 0)
        total = Vec3(tx, ty, tz)

    if SORT_RAYS:
        # undo the per-bounce permutations: ray at slot i carries pix[i]
        inv = jnp.argsort(out[12])
        total = Vec3(total.x[inv], total.y[inv], total.z[inv])
        # rays live on axis 1 of 2-d sampler leaves (bn shifts, pre bases)
        s = jax.tree.map(
            lambda a: (a[:, inv] if getattr(a, "ndim", 0) == 2
                       else a[inv] if getattr(a, "ndim", 0) == 1 else a), s)
    return total, s, stats_out
