# Round-3: attribute the HERO frame (env-mapped, DOF, 12-instance TLAS,
# env-NEE merged shadow wave).  The hero runs 6.4 s/frame while the
# env-free bench runs 0.92 s — this times the suspect pieces one by one
# on the real chip: env sampling ops at 2M lanes, the DOF primary wave,
# and the 2N merged shadow wave.
import os, sys, time

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

W, H = 1920, 1080
N = W * H

sys.path.insert(0, "/root/repo/tools")
from hero_render import hero_scene

from buas_pathtracer_tpu.core import rng
from buas_pathtracer_tpu.core.vec import Vec3, dot, normalize
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.ops import envmap
from buas_pathtracer_tpu.ops import traverse_wide as tw
from buas_pathtracer_tpu.ops.shading import map_to_cosine_weighted_hemisphere
from buas_pathtracer_tpu.runtime.render import _tiled

sc = hero_scene(W, H)
ps = sc.pack()
print(f"env {ps.env_pixels.shape}  cond {ps.env_cdf_conditional.shape}  "
      f"rows {ps.wide_rows.shape[0]} "
      f"({ps.wide_rows.shape[0]*256/2**20:.1f} MB)  "
      f"depth {ps.wide_depth_arr.shape[0]}", flush=True)

py_, px_ = jnp.meshgrid(jnp.arange(H, dtype=jnp.int32),
                        jnp.arange(W, dtype=jnp.int32), indexing="ij")
PX = _tiled(px_).astype(jnp.float32)
PY = _tiled(py_).astype(jnp.float32)


def tmin(f, reps=3):
    _ = np.asarray(f(jnp.float32(0.0)))
    ts = []
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        _ = np.asarray(f(jnp.float32(r)))
        ts.append(time.perf_counter() - t0)
    return (min(ts) - 0.028) * 1e3


def uni(r, salt):
    st = rng.seed_state((PX * 7 + PY * 13).astype(jnp.uint32)
                        + jnp.uint32(salt) * (r * 1e3).astype(jnp.uint32))
    st, u = rng.next_unilateral(st)
    st, v = rng.next_unilateral(st)
    return u, v


@jax.jit
def f_envpdf(r):
    u, v = uni(r, 3)
    th = (u - 0.5) * np.pi
    ph = v * 2 * np.pi
    d = Vec3(jnp.cos(th) * jnp.cos(ph), jnp.sin(th), jnp.cos(th) * jnp.sin(ph))
    p = envmap.env_pdf(ps.env_cdf_marginal, ps.env_cdf_conditional,
                       ps.env_pixels, d)
    return p.sum()


@jax.jit
def f_envsample(r):
    u, v = uni(r, 5)
    d, pdf, rad = envmap.sample_env_direction(
        ps.env_cdf_marginal, ps.env_cdf_conditional, ps.env_pixels, u, v)
    return d.x.sum() + pdf.sum() + rad.x.sum()


def primary(r, dof):
    z = jnp.zeros((N,)) + r * 1e-7
    u1, u2 = uni(r, 7)
    lr = sc.camera.lens_radius if dof else 0.0
    pr = cm.generate_rays(sc.camera._replace(lens_radius=lr),
                          PX, PY, W, H, z + 0.5, z + 0.5, u1, u2,
                          0.0, 1.0, 6, 0.0, 0.0)
    return pr


def f_primary(dof):
    @jax.jit
    def f(r):
        pr = primary(r, dof)
        out = tw._traverse(ps, pr.o, pr.d, jnp.full((N,), tw.BIG_T),
                           jnp.full((N,), -1, jnp.int32), occlusion=False)
        return out[0].sum() + out[1].sum()
    return f


@jax.jit
def f_merged_shadow(r):
    # approximate the integrator's merged wave: light-NEE rays from
    # primary hits (facing ~50%) + env-NEE rays in env-sampled directions
    pr = primary(r, True)
    hit = tw.intersect_scene(ps, pr.o, pr.d)
    live = hit.valid
    Nrm = Vec3(jnp.where(dot(pr.d, hit.n) < 0, hit.n.x, -hit.n.x),
               jnp.where(dot(pr.d, hit.n) < 0, hit.n.y, -hit.n.y),
               jnp.where(dot(pr.d, hit.n) < 0, hit.n.z, -hit.n.z))
    from buas_pathtracer_tpu.integrators.common import (
        light_rows, pick_random_light_slot, random_point_on_light_rows,
        slot_to_prim)
    u1, u2 = uni(r, 11)
    u3, _ = uni(r, 13)
    slot, _ = pick_random_light_slot(ps, u3, hit.p, True)
    lT = light_rows(ps, slot)
    ls = random_point_on_light_rows(lT, u1, u2, hit.p)
    lprim = slot_to_prim(ps, slot)
    facing = (dot(Nrm, ls.L) > 0) & (-dot(ls.Nl, ls.L) > 0) & live
    so = hit.p + ls.L * 1e-3
    stt = jnp.where(facing, ls.dist - 2e-3, -1.0)
    ue, ve = uni(r, 17)
    d_e, pdf_e, rad_e = envmap.sample_env_direction(
        ps.env_cdf_marginal, ps.env_cdf_conditional, ps.env_pixels, ue, ve)
    facing_e = (dot(Nrm, d_e) > 0) & live
    so_e = hit.p + d_e * 1e-3
    stt_e = jnp.where(facing_e, tw.BIG_T, -1.0)
    cat = jnp.concatenate
    occ = tw.intersect_shadow_ray(
        ps,
        Vec3(cat([so.x, so_e.x]), cat([so.y, so_e.y]), cat([so.z, so_e.z])),
        Vec3(cat([ls.L.x, d_e.x]), cat([ls.L.y, d_e.y]),
             cat([ls.L.z, d_e.z])),
        cat([stt, stt_e]),
        cat([lprim, jnp.full((N,), -1, jnp.int32)]))
    return occ.sum()


for name, f in (("env_pdf @2M      ", f_envpdf),
                ("env_sample @2M   ", f_envsample),
                ("primary no-DOF   ", f_primary(False)),
                ("primary DOF      ", f_primary(True)),
                ("merged shadow 2N ", f_merged_shadow)):
    print(f"{name}: {tmin(f):8.1f} ms", flush=True)
print("PROF39 DONE", flush=True)
