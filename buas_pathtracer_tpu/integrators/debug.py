"""Debug integrators: Normals + Distances (integrators.cpp:543-579).

Visual oracles — the reference's renderer-as-test-harness strategy
(about_strings.h) keeps these runtime-switchable for sanity checking
geometry, normals, and BVH traversal.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import sampler as smp
from ..core.vec import Vec3, full_like, saturate, v3, where as vwhere
from ..models.scene import PackedScene, SceneSettings
from ..ops import traverse
from .common import sample_sky


def _stats(ray_o, hit):
    n_rays = 1.0
    for s in ray_o.shape:
        n_rays *= s
    return jnp.array([n_rays, 0.0, 0.0]) + jnp.stack(
        [jnp.zeros(()), hit.node_visits.astype(jnp.float32),
         hit.tri_tests.astype(jnp.float32)])


def normals(ps: PackedScene, settings: SceneSettings, sampler: smp.Sampler,
            ray_o: Vec3, ray_d: Vec3):
    hit = traverse.intersect_scene(ps, ray_o, ray_d)
    shaded = (hit.n + 1.0) * 0.5
    sky = sample_sky(ps, ray_d)
    return vwhere(hit.valid, shaded, sky), sampler, _stats(ray_o, hit)


def distances(ps: PackedScene, settings: SceneSettings, sampler: smp.Sampler,
              ray_o: Vec3, ray_d: Vec3):
    hit = traverse.intersect_scene(ps, ray_o, ray_d)
    g = 1.0 - saturate(hit.t / 15.0)
    shaded = Vec3(g, g, g)
    sky = sample_sky(ps, ray_d)
    return vwhere(hit.valid, shaded, sky), sampler, _stats(ray_o, hit)
