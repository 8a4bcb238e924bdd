"""Batched sampling-theory and shading helpers.

TPU-native ports of the reference's sampling helpers (integrators.cpp:11-119)
and shading primitives (fresnel/refract/sky/checker,
integrators.cpp:235-308).  Every function maps over ray batches with no
data-dependent control flow; rejection sampling is replaced by closed-form
equivalents with identical distributions.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import rng
from ..core.vec import (
    PI,
    TAU,
    Vec3,
    dot,
    lerp,
    normalize,
    oriented_around_normal,
    v3,
)


def sample_in_unit_disk(u: jnp.ndarray, v: jnp.ndarray):
    """Concentric disk map (integrators.cpp:30-46). Returns (x, y)."""
    ox = 2.0 * u - 1.0
    oy = 2.0 * v - 1.0
    use_x = jnp.abs(ox) > jnp.abs(oy)
    # guard 0/0: where both are 0 the result is forced to (0,0) below
    safe_ox = jnp.where(ox == 0.0, 1.0, ox)
    safe_oy = jnp.where(oy == 0.0, 1.0, oy)
    r = jnp.where(use_x, ox, oy)
    theta = jnp.where(
        use_x,
        0.25 * PI * (oy / safe_ox),
        0.5 * PI - 0.25 * PI * (ox / safe_oy),
    )
    degenerate = (ox == 0.0) & (oy == 0.0)
    x = jnp.where(degenerate, 0.0, r * jnp.cos(theta))
    y = jnp.where(degenerate, 0.0, r * jnp.sin(theta))
    return x, y


def sample_on_unit_sphere(u: jnp.ndarray, v: jnp.ndarray) -> Vec3:
    """integrators.cpp:48-55."""
    z = 1.0 - 2.0 * u
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TAU * v
    return Vec3(r * jnp.cos(phi), r * jnp.sin(phi), z)


def random_in_unit_sphere(state):
    """Uniform point in the unit ball.

    The reference rejection-samples (integrators.cpp:11-19); the TPU version
    uses the closed form direction * cbrt(u) — identical distribution, no
    data-dependent looping.  Returns (state, Vec3).
    """
    state, u1 = rng.next_unilateral(state)
    state, u2 = rng.next_unilateral(state)
    state, u3 = rng.next_unilateral(state)
    d = sample_on_unit_sphere(u1, u2)
    r = jnp.cbrt(u3)
    return state, d * r


def map_to_hemisphere(n: Vec3, u, v) -> Vec3:
    """Uniform hemisphere around n (integrators.cpp:93-104); pdf = 1/(2pi)."""
    azimuth = TAU * u
    y = v
    s = jnp.sqrt(jnp.maximum(0.0, 1.0 - y * y))
    hemi = Vec3(jnp.cos(azimuth) * s, y, jnp.sin(azimuth) * s)
    return oriented_around_normal(hemi, n)


def map_to_cosine_weighted_hemisphere(n: Vec3, u, v) -> Vec3:
    """Cosine-weighted hemisphere (integrators.cpp:106-118); pdf = cos/pi."""
    azimuth = TAU * u
    y = v
    s = jnp.sqrt(jnp.maximum(0.0, 1.0 - y))
    hemi = Vec3(jnp.cos(azimuth) * s, jnp.sqrt(y), jnp.sin(azimuth) * s)
    return oriented_around_normal(hemi, n)


def random_in_cone(n: Vec3, angle, u, v) -> Vec3:
    """integrators.cpp:77-90."""
    cos_angle = jnp.cos(angle)
    azimuth = TAU * u
    y = cos_angle + (1.0 - cos_angle) * v
    s = jnp.sqrt(jnp.maximum(0.0, 1.0 - y * y))
    hemi = Vec3(jnp.cos(azimuth) * s, y, jnp.sin(azimuth) * s)
    return oriented_around_normal(hemi, n)


# ---------------------------------------------------------------------------
# Fresnel / refraction (integrators.cpp:235-263, PBRT 3ed recipe)
# ---------------------------------------------------------------------------

def fresnel_dielectric(cos_theta_i, eta_i, eta_t, eta_i_over_eta_t):
    """Returns (reflectance, cos_theta_t).  Total internal reflection -> 1."""
    sin_theta_i = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta_i * cos_theta_i))
    sin_theta_t = eta_i_over_eta_t * sin_theta_i
    cos_theta_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_theta_t * sin_theta_t))

    r_par = ((eta_t * cos_theta_i) - (eta_i * cos_theta_t)) / (
        (eta_t * cos_theta_i) + (eta_i * cos_theta_t)
    )
    r_perp = ((eta_i * cos_theta_i) - (eta_t * cos_theta_t)) / (
        (eta_i * cos_theta_i) + (eta_t * cos_theta_t)
    )
    f = 0.5 * (r_par * r_par + r_perp * r_perp)
    f = jnp.where(sin_theta_t >= 1.0, 1.0, f)
    return f, cos_theta_t


def refract(d: Vec3, n: Vec3, cos_theta_i, cos_theta_t, eta_i_over_eta_t) -> Vec3:
    """integrators.cpp:260-263."""
    return d * eta_i_over_eta_t + n * (eta_i_over_eta_t * cos_theta_i - cos_theta_t)


# ---------------------------------------------------------------------------
# Sky + procedural material evaluation
# ---------------------------------------------------------------------------

def sample_sky_gradient(d: Vec3, bot: Vec3, top: Vec3) -> Vec3:
    """Gradient sky fallback (integrators.cpp:289-293): lerp by |d.y|."""
    t = jnp.abs(d.y)
    return lerp(bot, top, t)


def evaluate_checker(albedo: Vec3, checker_color: Vec3, use_checker, hit_p: Vec3) -> Vec3:
    """4x4 world-space XZ checker (integrators.cpp:297-308)."""
    cx = jnp.floor(0.25 * hit_p.x).astype(jnp.int32)
    cz = jnp.floor(0.25 * hit_p.z).astype(jnp.int32)
    checker = ((cx ^ cz) & 1) != 0
    pick = checker & use_checker
    return Vec3(
        jnp.where(pick, checker_color.x, albedo.x),
        jnp.where(pick, checker_color.y, albedo.y),
        jnp.where(pick, checker_color.z, albedo.z),
    )
