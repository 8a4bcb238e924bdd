"""Batched ray-primitive intersection kernels.

TPU-native ports of intersection.cpp:12-241.  Each kernel maps elementwise
over broadcast-compatible batches of rays and primitive parameters and
returns ``(hit, t_new)`` against a running closest-``t`` (the reference
mutates ``*out_t``; here the caller threads ``t`` functionally).

Acceptance rules follow the reference exactly:
  plane:    denom < -EPS, t in [EPS, t_cur)            (intersection.cpp:12-42)
  sphere:   object-space quadratic, near-else-far root (intersection.cpp:44-74)
  box:      iq slab method                             (intersection.cpp:76-105)
  aabb BV:  boolean only, far-clip pruned              (intersection.cpp:107-133)
  triangle: Moller-Trumbore, eps=1e-9                  (intersection.cpp:135-182)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.vec import EPSILON, Vec3, cross, dot

TRI_EPS = 1e-9

# The reference relies on IEEE inf/NaN ordering quirks of C's `(a>b)?a:b`
# in the slab tests (intersection.cpp:85-105).  jnp.min/max propagate NaN, so
# the TPU build uses a sign-preserving clamped reciprocal: |inv_d| <= 1e18
# keeps every product finite while behaving identically for all practical rays.
_INV_DIR_EPS = 1e-18


def safe_inv_dir(ray_d: Vec3) -> Vec3:
    def inv(c):
        s = jnp.where(c >= 0.0, 1.0, -1.0)
        return s / jnp.maximum(jnp.abs(c), _INV_DIR_EPS)

    return Vec3(inv(ray_d.x), inv(ray_d.y), inv(ray_d.z))


def plane(ray_o: Vec3, ray_d: Vec3, plane_n: Vec3, plane_d, t_cur):
    denom = dot(plane_n, ray_d)
    safe = jnp.where(denom == 0.0, -1.0, denom)
    t = (plane_d - dot(plane_n, ray_o)) / safe
    hit = (denom < -EPSILON) & (t >= EPSILON) & (t < t_cur)
    return hit, jnp.where(hit, t, t_cur)


def sphere(ray_o: Vec3, ray_d: Vec3, radius, t_cur):
    """Ray in object space.  The reference quadratic assumes |d| == 1
    (intersection.cpp:44-74) which silently mis-parameterizes t under scaled
    instance transforms; the general form (a = dot(d, d)) is identical for
    unit-length rays and correct for scaled ones."""
    a = dot(ray_d, ray_d)
    b = dot(ray_d, ray_o)
    c = dot(ray_o, ray_o) - radius * radius
    discr = b * b - a * c
    root = jnp.sqrt(jnp.maximum(discr, 0.0))
    inv_a = 1.0 / jnp.maximum(a, 1e-30)
    tn = (-b - root) * inv_a
    tf = (-b + root) * inv_a
    t = jnp.where(tn >= 0.0, tn, tf)
    hit = (discr >= 0.0) & (t >= EPSILON) & (t_cur > t)
    return hit, jnp.where(hit, t, t_cur)


def box(ray_o: Vec3, ray_d: Vec3, box_r: Vec3, t_cur):
    inv_d = safe_inv_dir(ray_d)
    n = inv_d * ray_o
    k = Vec3(jnp.abs(inv_d.x), jnp.abs(inv_d.y), jnp.abs(inv_d.z)) * box_r
    t1 = -n - k
    t2 = -n + k
    tn = jnp.maximum(jnp.maximum(t1.x, t1.y), t1.z)
    tf = jnp.minimum(jnp.minimum(t2.x, t2.y), t2.z)
    t = jnp.where(tn >= 0.0, tn, tf)
    hit = (tn < tf) & (t_cur > t) & (t >= EPSILON)
    return hit, jnp.where(hit, t, t_cur)


def aabb(ray_o: Vec3, inv_d: Vec3, box_p: Vec3, box_r: Vec3, far_clip):
    """Bounding-volume test (boolean), center/half-extent form."""
    rel = ray_o - box_p
    n = inv_d * rel
    k = Vec3(jnp.abs(inv_d.x), jnp.abs(inv_d.y), jnp.abs(inv_d.z)) * box_r
    t1 = -n - k
    t2 = -n + k
    tn = jnp.maximum(jnp.maximum(t1.x, t1.y), t1.z)
    tf = jnp.minimum(jnp.minimum(t2.x, t2.y), t2.z)
    return (tn < tf) & (tf > 0.0) & (tn < far_clip)


def aabb_minmax(ray_o: Vec3, inv_d: Vec3, lo: Vec3, hi: Vec3, far_clip):
    """Bounding-volume test, min/max corner form (for flattened BVH nodes)."""
    t1 = (lo - ray_o) * inv_d
    t2 = (hi - ray_o) * inv_d
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t1.x, t2.x), jnp.minimum(t1.y, t2.y)),
        jnp.minimum(t1.z, t2.z),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t1.x, t2.x), jnp.maximum(t1.y, t2.y)),
        jnp.maximum(t1.z, t2.z),
    )
    return (tn < tf) & (tf > 0.0) & (tn < far_clip)


def triangle(ray_o: Vec3, ray_d: Vec3, a: Vec3, b: Vec3, c: Vec3, t_cur):
    """Returns (hit, t_new, u, v, w) with uvw barycentrics (u = 1-v-w)."""
    edge1 = b - a
    edge2 = c - a
    pvec = cross(ray_d, edge2)
    det = dot(edge1, pvec)
    ok = (det <= -TRI_EPS) | (det >= TRI_EPS)
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    tvec = ray_o - a
    v = dot(tvec, pvec) * inv_det
    ok = ok & (v >= 0.0) & (v <= 1.0)
    qvec = cross(tvec, edge1)
    w = dot(ray_d, qvec) * inv_det
    ok = ok & (w >= 0.0) & (v + w <= 1.0)
    t = dot(edge2, qvec) * inv_det
    ok = ok & (t >= TRI_EPS) & (t_cur >= t)
    return ok, jnp.where(ok, t, t_cur), 1.0 - v - w, v, w
