"""Lockstep scene traversal over the unified threaded BVH.

TPU-native replacement for the reference's stack-based TLAS + mesh-BVH
traversal (intersection.cpp:243-401 ``intersect_mesh``, :403-611
``intersect_scene_internal``).  Per-ray stacks and nested traversals are
hostile to lockstep SIMD, so the whole scene (TLAS + every mesh-instance
subtree) is ONE threaded node array (ops/bvh.py): each ray carries a single
node pointer; a hit on an internal node advances to ``i+1``, anything else
jumps the precomputed ``miss`` link.  The batch runs a ``lax.while_loop``
whose body is pure gathers + VPU math — no scatters, no data-dependent
shapes.

Semantics carried from the reference:
  * planes live outside the BVH and are tested linearly first
    (intersection.cpp:424-433),
  * rays are transformed to object space by the primitive's stored inverse
    with an UNNORMALIZED direction so ``t`` stays world-parameterized
    (intersection.cpp:403-409, 472),
  * shadow rays exclude the sampled light primitive by index
    (intersection.cpp:416, 468-470) and early-out on any hit,
  * normals are computed once, after traversal, from the winning hit
    (":NormalCalculation", intersection.cpp:526-591), transformed to world
    space by the inverse-transpose and renormalized (noz).

Traversal stats (TraversalStats, intersection.h:33-40) are carried as summed
scalars in the loop state.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.vec import Vec3, cross, dot, noz, normalize, where as vwhere
from ..models.scene import PackedScene, PRIM_SPHERE, PRIM_BOX
from . import intersect
from .bvh import KIND_INTERNAL, KIND_PRIM, KIND_TRIS, MAX_LEAF_SIZE

BIG_T = 3.0e38


class Hit(NamedTuple):
    """Result of a full intersection query (one entry per ray)."""

    t: jnp.ndarray
    hit_id: jnp.ndarray  # -1 = miss, [0,K) = primitive, K+i = plane i
    mat_id: jnp.ndarray  # material index of the winning hit (0 if miss)
    tri: jnp.ndarray  # triangle index for mesh hits, else -1
    bary_v: jnp.ndarray
    bary_w: jnp.ndarray
    p: Vec3  # world hit point
    n: Vec3  # world shading normal
    # traversal stats (scalars, summed over the batch)
    node_visits: jnp.ndarray
    tri_tests: jnp.ndarray

    @property
    def valid(self):
        return self.hit_id >= 0


def _gather_v3(v: Vec3, i) -> Vec3:
    return Vec3(v.x[i], v.y[i], v.z[i])


def _xform_point_rows(m, p: Vec3) -> Vec3:
    """m: (..., 12) gathered row-major (3,4) affines, batched over rays."""
    return Vec3(
        m[..., 0] * p.x + m[..., 1] * p.y + m[..., 2] * p.z + m[..., 3],
        m[..., 4] * p.x + m[..., 5] * p.y + m[..., 6] * p.z + m[..., 7],
        m[..., 8] * p.x + m[..., 9] * p.y + m[..., 10] * p.z + m[..., 11],
    )


def _xform_vector_rows(m, v: Vec3) -> Vec3:
    return Vec3(
        m[..., 0] * v.x + m[..., 1] * v.y + m[..., 2] * v.z,
        m[..., 4] * v.x + m[..., 5] * v.y + m[..., 6] * v.z,
        m[..., 8] * v.x + m[..., 9] * v.y + m[..., 10] * v.z,
    )


def _xform_normal_rows(inv, n: Vec3) -> Vec3:
    """Inverse-transpose: apply the transpose of the gathered INVERSE 3x3."""
    return Vec3(
        inv[..., 0] * n.x + inv[..., 4] * n.y + inv[..., 8] * n.z,
        inv[..., 1] * n.x + inv[..., 5] * n.y + inv[..., 9] * n.z,
        inv[..., 2] * n.x + inv[..., 6] * n.y + inv[..., 10] * n.z,
    )


def _intersect_planes(ps: PackedScene, ray_o: Vec3, ray_d: Vec3, t0):
    """Linear plane loop (intersection.cpp:424-433). Returns (t, plane_idx)."""
    t = t0
    idx = jnp.full_like(t0, -1.0).astype(jnp.int32)
    n_planes = ps.plane_d.shape[0]
    for p in range(n_planes):  # P is tiny and static; unrolled
        pn = Vec3(ps.plane_n.x[p], ps.plane_n.y[p], ps.plane_n.z[p])
        hit, t = intersect.plane(ray_o, ray_d, pn, ps.plane_d[p], t)
        idx = jnp.where(hit, p, idx)
    return t, idx


def _traverse_bvh(ps: PackedScene, ray_o: Vec3, ray_d: Vec3, t0,
                  ignored_prim, occlusion: bool):
    """Threaded-BVH lockstep loop. Returns (t, prim, tri, bv, bw, stats)."""
    n_nodes = int(ps.node_miss.shape[0])
    n_rays_shape = t0.shape
    i32 = lambda v: jnp.full(n_rays_shape, v, jnp.int32)

    inv_d_world = intersect.safe_inv_dir(ray_d)

    def cond(st):
        ptr = st[0]
        return jnp.any(ptr < n_nodes)

    def body(st):
        ptr, t, prim, tri, bv, bw, nv, tt = st
        i = jnp.minimum(ptr, n_nodes - 1)
        active = ptr < n_nodes

        lo = _gather_v3(ps.node_lo, i)
        hi = _gather_v3(ps.node_hi, i)
        bv_hit = intersect.aabb_minmax(ray_o, inv_d_world, lo, hi, t) & active

        kind = ps.node_kind[i]
        first = ps.node_first[i]
        count = ps.node_count[i]
        inst = jnp.maximum(ps.node_inst[i], 0)

        internal = kind == KIND_INTERNAL
        do_leaf = bv_hit & ~internal
        not_ignored = ps.node_inst[i] != ignored_prim

        # object-space ray for this node's instance (identity rows for TLAS
        # internals are never used: leaf kinds gate the results)
        m_inv = ps.prim_inv[inst]
        os_o = _xform_point_rows(m_inv, ray_o)
        os_d = _xform_vector_rows(m_inv, ray_d)

        # ---- analytic primitive leaf ----
        is_prim = do_leaf & (kind == KIND_PRIM) & not_ignored
        ptypes = ps.prim_type[inst]
        hs, ts_ = intersect.sphere(os_o, os_d, ps.prim_r[inst], t)
        hb, tb_ = intersect.box(os_o, os_d, _gather_v3(ps.prim_box_r, inst), t)
        sph = ptypes == PRIM_SPHERE
        prim_hit = is_prim & jnp.where(sph, hs, hb)
        t = jnp.where(prim_hit, jnp.where(sph, ts_, tb_), t)
        prim = jnp.where(prim_hit, first, prim)
        tri = jnp.where(prim_hit, -1, tri)

        # ---- triangle leaf (<= MAX_LEAF_SIZE consecutive, leaf-ordered) ----
        is_tri = do_leaf & (kind == KIND_TRIS) & not_ignored
        n_tris = int(ps.tri_has_n.shape[0])
        any_tri_hit = jnp.zeros_like(is_tri)
        for lane in range(MAX_LEAF_SIZE):
            valid = is_tri & (lane < count)
            ti = jnp.minimum(first + lane, n_tris - 1)
            a = _gather_v3(ps.tri_a, ti)
            b = _gather_v3(ps.tri_b, ti)
            c = _gather_v3(ps.tri_c, ti)
            h, t_new, _, v_, w_ = intersect.triangle(os_o, os_d, a, b, c, t)
            h = h & valid
            t = jnp.where(h, t_new, t)
            prim = jnp.where(h, inst, prim)
            tri = jnp.where(h, ti, tri)
            bv = jnp.where(h, v_, bv)
            bw = jnp.where(h, w_, bw)
            any_tri_hit = any_tri_hit | h

        hit_now = prim_hit | any_tri_hit

        # stats
        nv = nv + jnp.sum(active.astype(jnp.int32))
        tt = tt + jnp.sum(jnp.where(is_tri, jnp.minimum(count, MAX_LEAF_SIZE), 0))

        # advance: internal hit -> i+1, else miss link; finished rays stay put
        nxt = jnp.where(bv_hit & internal, i + 1, ps.node_miss[i])
        nxt = jnp.where(active, nxt, ptr)
        if occlusion:
            nxt = jnp.where(hit_now, n_nodes, nxt)  # early-out on any hit
        return nxt, t, prim, tri, bv, bw, nv, tt

    z32 = jnp.zeros((), jnp.int32)
    st0 = (i32(0), t0, i32(-1), i32(-1),
           jnp.zeros(n_rays_shape), jnp.zeros(n_rays_shape), z32, z32)
    ptr, t, prim, tri, bv, bw, nv, tt = jax.lax.while_loop(cond, body, st0)
    return t, prim, tri, bv, bw, nv, tt


def _use_wide() -> bool:
    import os
    return os.environ.get("BUAS_TRAVERSAL", "wide") == "wide"


def intersect_shadow_ray(ps: PackedScene, ray_o: Vec3, ray_d: Vec3, max_t,
                         ignored_prim) -> jnp.ndarray:
    """Occlusion query (intersection.cpp:600-604). True if anything blocks.

    Dispatches to the 8-wide row-BVH traversal (ops/traverse_wide.py) unless
    BUAS_TRAVERSAL=threaded forces this module's skip-link walk."""
    if _use_wide():
        from . import traverse_wide
        return traverse_wide.intersect_shadow_ray(ps, ray_o, ray_d, max_t,
                                                  ignored_prim)
    return intersect_shadow_ray_threaded(ps, ray_o, ray_d, max_t, ignored_prim)


def intersect_scene(ps: PackedScene, ray_o: Vec3, ray_d: Vec3,
                    max_t=None, ignored_prim=None) -> Hit:
    """Full closest-hit query + deferred normal (intersection.cpp:606-610)."""
    if _use_wide():
        from . import traverse_wide
        return traverse_wide.intersect_scene(ps, ray_o, ray_d, max_t,
                                             ignored_prim)
    return intersect_scene_threaded(ps, ray_o, ray_d, max_t, ignored_prim)


def intersect_shadow_ray_threaded(ps: PackedScene, ray_o: Vec3, ray_d: Vec3,
                                  max_t, ignored_prim) -> jnp.ndarray:
    t_pl, plane_idx = _intersect_planes(ps, ray_o, ray_d, max_t)
    t, prim, *_ = _traverse_bvh(ps, ray_o, ray_d, t_pl, ignored_prim,
                                occlusion=True)
    return (prim >= 0) | (plane_idx >= 0)


def intersect_scene_threaded(ps: PackedScene, ray_o: Vec3, ray_d: Vec3,
                             max_t=None, ignored_prim=None) -> Hit:
    """Threaded skip-link walk (kept as oracle/fallback)."""
    t0 = jnp.full_like(ray_o.x, BIG_T) if max_t is None else max_t
    if ignored_prim is None:
        ignored_prim = jnp.full_like(t0, -1).astype(jnp.int32)

    t_pl, plane_idx = _intersect_planes(ps, ray_o, ray_d, t0)
    t, prim, tri, bv, bw, nv, tt = _traverse_bvh(
        ps, ray_o, ray_d, t_pl, ignored_prim, occlusion=False)

    n_prims = int(ps.prim_type.shape[0])
    # a BVH hit strictly lowered t below the winning plane's t
    plane_won = (plane_idx >= 0) & (prim < 0)
    hit_id = jnp.where(prim >= 0, prim,
                       jnp.where(plane_won, n_prims + plane_idx, -1))

    # ---- deferred normal (":NormalCalculation") ----
    primc = jnp.maximum(prim, 0)
    m_inv = ps.prim_inv[primc]
    os_o = _xform_point_rows(m_inv, ray_o)
    os_d = _xform_vector_rows(m_inv, ray_d)
    os_hit_p = os_o + os_d * t
    hit_p = ray_o + ray_d * t

    ptypes = ps.prim_type[primc]

    # sphere: object-space hit point IS the normal direction
    n_sphere = os_hit_p

    # box: sign of the largest |component| of os_hit_p / box_r
    box_r = _gather_v3(ps.prim_box_r, primc)
    rel = Vec3(os_hit_p.x / jnp.maximum(box_r.x, 1e-30),
               os_hit_p.y / jnp.maximum(box_r.y, 1e-30),
               os_hit_p.z / jnp.maximum(box_r.z, 1e-30))
    ax_, ay_, az_ = jnp.abs(rel.x), jnp.abs(rel.y), jnp.abs(rel.z)
    x_big = (ax_ >= ay_) & (ax_ >= az_)
    y_big = ~x_big & (ay_ >= az_)
    n_box = Vec3(
        jnp.where(x_big, jnp.sign(rel.x), 0.0),
        jnp.where(y_big, jnp.sign(rel.y), 0.0),
        jnp.where(x_big | y_big, 0.0, jnp.sign(rel.z)),
    )

    # mesh: smooth normal via barycentrics if present, else geometric
    tric = jnp.maximum(tri, 0)
    bu = 1.0 - bv - bw
    na = _gather_v3(ps.tri_na, tric)
    nb = _gather_v3(ps.tri_nb, tric)
    nc = _gather_v3(ps.tri_nc, tric)
    n_smooth = na * bu + nb * bv + nc * bw
    a = _gather_v3(ps.tri_a, tric)
    b = _gather_v3(ps.tri_b, tric)
    c = _gather_v3(ps.tri_c, tric)
    n_geom = cross(normalize(b - a), normalize(c - a))
    n_mesh = vwhere(ps.tri_has_n[tric] & (tri >= 0), n_smooth, n_geom)

    n_obj = vwhere(ptypes == PRIM_SPHERE, n_sphere,
                   vwhere(ptypes == PRIM_BOX, n_box, n_mesh))
    n_world = noz(_xform_normal_rows(m_inv, n_obj))

    # planes: world-space normal directly
    plc = jnp.maximum(plane_idx, 0)
    n_plane = _gather_v3(ps.plane_n, plc)
    n_world = vwhere(plane_won, n_plane, n_world)

    mat_id = jnp.where(prim >= 0, ps.prim_mat[primc],
                       jnp.where(plane_won, ps.plane_mat[plc], 0))

    return Hit(t=t, hit_id=hit_id, mat_id=mat_id,
               tri=jnp.where(prim >= 0, tri, -1),
               bary_v=bv, bary_w=bw, p=hit_p, n=n_world,
               node_visits=nv, tri_tests=tt)
