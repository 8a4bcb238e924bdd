"""Shared integrator pieces: sky, material evaluation, light sampling, NEE.

Ports the reference helpers that every integrator shares:
  sample_sky           integrators.cpp:272-295
  evaluate_material    integrators.cpp:297-308
  pick_random_light    integrators.cpp:135-192 (uniform + importance by
                       max3(emission) * projected solid angle with an
                       on-the-fly CDF; vectorized over rays x lights)
  random_point_on_light integrators.cpp:199-228 (visible-hemisphere point on
                       a sphere light, area 2*pi*r^2)
All functions are batched over rays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.vec import PI, Vec3, dot, length_sq, max3, normalize, v3, where as vwhere
from ..models.scene import PackedScene, PRIM_SPHERE
from ..ops import envmap
from ..ops.shading import evaluate_checker, map_to_hemisphere, sample_sky_gradient


def has_env(ps: PackedScene) -> bool:
    """Static: was an environment map packed? (1x1 placeholder = no)."""
    return ps.env_pixels.shape[0] > 1 or ps.env_pixels.shape[1] > 1


def sample_sky(ps: PackedScene, ray_d: Vec3) -> Vec3:
    """integrators.cpp:272-295: equirect skydome lookup, else gradient."""
    if has_env(ps):
        return envmap.lookup_env(ps.env_pixels, ray_d)
    return sample_sky_gradient(ray_d, ps.sky_bot, ps.sky_top)


def evaluate_material(ps: PackedScene, mat_id, hit_p: Vec3) -> Vec3:
    """Albedo with the 4x4 world-XZ checker (integrators.cpp:297-308)."""
    albedo = _gmat(ps.mat_albedo, mat_id)
    checker = _gmat(ps.mat_checker, mat_id)
    use_checker = (ps.mat_flags[mat_id] & 0x2) != 0
    return evaluate_checker(albedo, checker, use_checker, hit_p)


def _gmat(v: Vec3, i) -> Vec3:
    return Vec3(v.x[i], v.y[i], v.z[i])


def light_translation(ps: PackedScene, prim_idx) -> Vec3:
    """translation(transform->forward): column 3 of the gathered (3,4)."""
    m = ps.prim_fwd[prim_idx]
    return Vec3(m[..., 3], m[..., 7], m[..., 11])


def projected_solid_angle_sphere(r, distance_sq):
    """integrators.cpp:124-133 (sphere case; other types contribute 0)."""
    return PI * r * r / distance_sq


def pick_random_light(ps: PackedScene, u, I: Vec3, importance: bool):
    """Returns (light_prim_idx (N,), rcp_pdf (N,)).

    Uniform: rcp_pdf = 1/L, index = floor(u * L - eps)
    Importance: CDF of max3(emission) * projected solid angle per light;
    rcp_pdf = pdf_i / sum (the reference's exact convention,
    integrators.cpp:150-177)."""
    lp = ps.light_prim  # (L,)
    L = int(lp.shape[0])
    if not importance or L == 1:
        idx = jnp.clip((u * L - 1e-3).astype(jnp.int32), 0, L - 1)
        return lp[idx], jnp.full_like(u, 1.0 / L)

    # (N, L): vector from shade point to each light center
    cx = ps.prim_fwd[lp, 3]
    cy = ps.prim_fwd[lp, 7]
    cz = ps.prim_fwd[lp, 11]
    vx = cx[None, :] - I.x[..., None]
    vy = cy[None, :] - I.y[..., None]
    vz = cz[None, :] - I.z[..., None]
    dist_sq = vx * vx + vy * vy + vz * vz
    emis = ps.mat_emission
    lmat = ps.prim_mat[lp]
    lmax = jnp.maximum(emis.x[lmat], jnp.maximum(emis.y[lmat], emis.z[lmat]))
    r = ps.prim_r[lp]
    is_sph = (ps.prim_type[lp] == PRIM_SPHERE).astype(jnp.float32)
    pdfs = lmax[None, :] * is_sph[None, :] * PI * r[None, :] ** 2 / jnp.maximum(dist_sq, 1e-12)
    cdf = jnp.cumsum(pdfs, axis=-1)
    total = cdf[..., -1]
    e = total * u
    idx = jnp.clip(jnp.sum((cdf < e[..., None]).astype(jnp.int32), axis=-1), 0, L - 1)
    pdf_sel = jnp.take_along_axis(pdfs, idx[..., None], axis=-1)[..., 0]
    rcp_pdf = pdf_sel / jnp.maximum(total, 1e-30)
    return lp[idx], rcp_pdf


def light_pick_pdf(ps: PackedScene, I: Vec3, hit_prim, importance: bool):
    """Probability that ``pick_random_light`` at shading point ``I`` would
    pick the light primitive ``hit_prim`` — needed for the BRDF-hit side of
    MIS.  Uniform: 1/L.  Importance: pdfs[i]/sum with the same projected-
    solid-angle weights as pick_random_light."""
    lp = ps.light_prim
    L = int(lp.shape[0])
    if not importance or L == 1:
        return jnp.full_like(I.x, 1.0 / L)
    cx = ps.prim_fwd[lp, 3]
    cy = ps.prim_fwd[lp, 7]
    cz = ps.prim_fwd[lp, 11]
    vx = cx[None, :] - I.x[..., None]
    vy = cy[None, :] - I.y[..., None]
    vz = cz[None, :] - I.z[..., None]
    dist_sq = vx * vx + vy * vy + vz * vz
    emis = ps.mat_emission
    lmat = ps.prim_mat[lp]
    lmax = jnp.maximum(emis.x[lmat], jnp.maximum(emis.y[lmat], emis.z[lmat]))
    r = ps.prim_r[lp]
    is_sph = (ps.prim_type[lp] == PRIM_SPHERE).astype(jnp.float32)
    pdfs = lmax[None, :] * is_sph[None, :] * PI * r[None, :] ** 2 / jnp.maximum(dist_sq, 1e-12)
    total = jnp.sum(pdfs, axis=-1)
    sel = (lp[None, :] == hit_prim[..., None]).astype(jnp.float32)
    pdf_hit = jnp.sum(pdfs * sel, axis=-1)
    return pdf_hit / jnp.maximum(total, 1e-30)


def pick_random_light_slot(ps: PackedScene, u, I: Vec3, importance: bool):
    """``pick_random_light`` returning the light SLOT (index into the light
    list, [0, L)) instead of the primitive index — the slot drives the
    one-hot light-row contraction (``light_rows``) so the whole NEE path
    runs without per-ray gathers (tools/prof24: the gathers were ~61
    ms/bounce at 2M rays).  Same math as pick_random_light
    (integrators.cpp:135-192)."""
    lp = ps.light_prim  # (L,)
    L = int(lp.shape[0])
    if not importance or L == 1:
        slot = jnp.clip((u * L - 1e-3).astype(jnp.int32), 0, L - 1)
        return slot, jnp.full_like(u, 1.0 / L)
    cx = ps.prim_fwd[lp, 3]
    cy = ps.prim_fwd[lp, 7]
    cz = ps.prim_fwd[lp, 11]
    vx = cx[None, :] - I.x[..., None]
    vy = cy[None, :] - I.y[..., None]
    vz = cz[None, :] - I.z[..., None]
    dist_sq = vx * vx + vy * vy + vz * vz
    emis = ps.mat_emission
    lmat = ps.prim_mat[lp]
    lmax = jnp.maximum(emis.x[lmat], jnp.maximum(emis.y[lmat], emis.z[lmat]))
    r = ps.prim_r[lp]
    is_sph = (ps.prim_type[lp] == PRIM_SPHERE).astype(jnp.float32)
    pdfs = lmax[None, :] * is_sph[None, :] * PI * r[None, :] ** 2 \
        / jnp.maximum(dist_sq, 1e-12)
    cdf = jnp.cumsum(pdfs, axis=-1)
    total = cdf[..., -1]
    e = total * u
    slot = jnp.clip(jnp.sum((cdf < e[..., None]).astype(jnp.int32), axis=-1),
                    0, L - 1)
    # one-hot select instead of take_along_axis (per-ray gather)
    oh = (slot[..., None] == jnp.arange(L, dtype=jnp.int32)).astype(jnp.float32)
    pdf_sel = jnp.sum(pdfs * oh, axis=-1)
    rcp_pdf = pdf_sel / jnp.maximum(total, 1e-30)
    return slot, rcp_pdf


def light_rows(ps: PackedScene, slot):
    """(16, N) picked-light rows [fwd12 | r | emission3] via a one-hot MXU
    contraction (16,L)@(L,N) — zero per-ray gathers, exact (each output is
    one 1.0*x product at HIGHEST precision)."""
    import jax
    L = int(ps.light16.shape[0])
    oh = (slot[None, :] == jnp.arange(L, dtype=jnp.int32)[:, None]
          ).astype(jnp.float32)
    return jax.lax.dot_general(
        ps.light16, oh, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # (16, N)


def slot_to_prim(ps: PackedScene, slot):
    """Light slot -> primitive index, as L static where-selects (no per-ray
    gather).  Used for shadow-ray light exclusion (intersection.cpp:416)."""
    L = int(ps.light_prim.shape[0])
    out = jnp.zeros_like(slot)
    for l in range(L):
        out = jnp.where(slot == l, ps.light_prim[l], out)
    return out


def light_radius_of_prim(ps: PackedScene, hit_prim):
    """Radius of the LIGHT primitive ``hit_prim`` hit by a BRDF ray (0 if the
    hit is not a light) — L where-selects replace the prim_r per-ray gather
    on the MIS emissive-hit side."""
    L = int(ps.light_prim.shape[0])
    out = jnp.zeros(hit_prim.shape, jnp.float32)
    for l in range(L):
        out = jnp.where(hit_prim == ps.light_prim[l], ps.light16[l, 12], out)
    return out


def random_point_on_light_rows(lT, u, v, I: Vec3) -> "LightSample":
    """``random_point_on_light`` reading the picked light from its one-hot
    (16, N) row block (``light_rows``) instead of per-ray gathers.
    integrators.cpp:199-228 (sphere lights)."""
    light_p = Vec3(lT[3], lT[7], lT[11])
    towards_light = normalize(light_p - I)
    r = lT[12]

    nl = map_to_hemisphere(-towards_light, u, v)
    p_local = nl * r
    p_world = Vec3(
        lT[0] * p_local.x + lT[1] * p_local.y + lT[2] * p_local.z + lT[3],
        lT[4] * p_local.x + lT[5] * p_local.y + lT[6] * p_local.z + lT[7],
        lT[8] * p_local.x + lT[9] * p_local.y + lT[10] * p_local.z + lT[11],
    )
    Lv = p_world - I
    dist_sq = length_sq(Lv)
    dist = jnp.sqrt(dist_sq)
    Ldir = Lv / jnp.maximum(dist, 1e-30)
    A = 2.0 * PI * r * r
    return LightSample(Ldir, nl, dist, dist_sq, A)


class LightSample(NamedTuple):
    L: Vec3  # unit direction to the sampled point
    Nl: Vec3  # light-surface normal at the point
    dist: jnp.ndarray
    dist_sq: jnp.ndarray
    A: jnp.ndarray  # sampled area (2 pi r^2, visible hemisphere)


def random_point_on_light(ps: PackedScene, light_idx, u, v, I: Vec3) -> LightSample:
    """integrators.cpp:199-228 (sphere lights)."""
    light_p = light_translation(ps, light_idx)
    towards_light = normalize(light_p - I)
    r = ps.prim_r[light_idx]

    nl = map_to_hemisphere(-towards_light, u, v)
    p_local = nl * r
    # p_world = forward * p_local (gathered affine rows)
    m = ps.prim_fwd[light_idx]
    p_world = Vec3(
        m[..., 0] * p_local.x + m[..., 1] * p_local.y + m[..., 2] * p_local.z + m[..., 3],
        m[..., 4] * p_local.x + m[..., 5] * p_local.y + m[..., 6] * p_local.z + m[..., 7],
        m[..., 8] * p_local.x + m[..., 9] * p_local.y + m[..., 10] * p_local.z + m[..., 11],
    )
    Lv = p_world - I
    dist_sq = length_sq(Lv)
    dist = jnp.sqrt(dist_sq)
    Ldir = Lv / jnp.maximum(dist, 1e-30)
    A = 2.0 * PI * r * r
    return LightSample(Ldir, nl, dist, dist_sq, A)
