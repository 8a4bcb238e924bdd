"""Frame renderer: full-frame wavefront passes, jit-compiled.

Replaces the reference's tile scheduler (WorkQueue, raytracer.cpp:551-762):
one "pass" renders ONE sample for EVERY pixel as a single batched wavefront
(the tile decomposition disappears — the whole frame is the batch, XLA tiles
it onto the VPU).  ``samples_per_pixel`` passes make a frame; frames
accumulate progressively exactly like the reference's AccumulationBuffer
(frame_count == accumulated spp, raytracer.cpp:429-439 canonical sample
index).

The integrator registry mirrors g_integrators (integrators.cpp:823-845):
name-keyed, falling back to the Advanced Pathtracer.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..core import sampler as smp
from ..core.jitfix import distinct_scalar_leaves, safe_jit
from ..core.vec import Vec3
from ..integrators import advanced as adv
from ..integrators import debug as dbg
from ..integrators import ground_truth as gt
from ..integrators import whitted as wht
from ..models.camera import Camera, generate_rays
from ..models.scene import PackedScene, Scene, SceneSettings
from ..ops.filters import find_filter
from . import film

INTEGRATORS: Dict[str, Callable] = {
    "Advanced Pathtracer": adv.advanced,
    "Whitted": wht.whitted,
    "Ground Truth Recursive": gt.ground_truth_iterative,  # same program on the
    "Ground Truth Iterative": gt.ground_truth_iterative,  # wavefront core
    "Normals": dbg.normals,
    "Distances": dbg.distances,
}


def find_integrator(name: str) -> Callable:
    """integrators.cpp:834-845: default integrator if not found."""
    return INTEGRATORS.get(name, adv.advanced)


# Pixel-tile ray ordering: a flat ray batch in 32x32-tile-major order makes
# every 1024-ray packet (ops/pallas_packet.py) a compact screen tile —
# measured 63.8 vs 11.6 Mrays/s against scanline order.  The permutation is
# a pure reshape+transpose (bandwidth-speed layout copy, NOT a gather), and
# the frame output is bit-identical: every per-ray computation keys off the
# pixel coordinates carried with the ray, never the batch position.
# Candidate tile shapes, squarest first; a packet block is 1024 consecutive
# rays, so a (th, tw) with th*tw == 1024 that divides the image makes every
# block exactly one screen tile.  1080p lands on (8, 128): 1080 is not
# divisible by 32 or 16.
_TILE_SHAPES = ((32, 32), (16, 64), (8, 128), (4, 256))


def _tile_shape(h, w):
    for th, tw in _TILE_SHAPES:
        if h % th == 0 and w % tw == 0:
            return th, tw
    return None


def _tiled(x2d):
    h, w = x2d.shape
    shape = _tile_shape(h, w)
    if shape is None:
        return x2d.reshape(-1)  # odd sizes: scanline order
    th, tw = shape
    return (x2d.reshape(h // th, th, w // tw, tw)
            .transpose(0, 2, 1, 3).reshape(-1))


def _untiled(flat, h, w):
    shape = _tile_shape(h, w)
    if shape is None:
        return flat.reshape(h, w)
    th, tw = shape
    return (flat.reshape(h // th, w // tw, th, tw)
            .transpose(0, 2, 1, 3).reshape(h, w))


def render_frame_impl(ps: PackedScene, settings: SceneSettings, cam: Camera,
                      accum: jnp.ndarray, frame_index, *, h: int, w: int,
                      n_lights: int, filter_name: str = "Mitchell Netravali",
                      has_medium: bool = True):
    """Accumulate ``settings.samples_per_pixel`` full-frame sample passes.

    frame_index: accumulated-samples-so-far (traced; no recompile per frame).
    Returns the new accumulation buffer (donated input, updated in place).
    """
    integrator = find_integrator(settings.integrator)
    filt = find_filter(filter_name)
    strategy = int(settings.sampling_strategy)

    py_, px_ = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32),
                            jnp.arange(w, dtype=jnp.int32), indexing="ij")
    px = _tiled(px_)
    py = _tiled(py_)

    # Anchor EVERY input leaf into the jaxpr (multiplied by zero, so XLA DCEs
    # the arithmetic but keeps the parameters).  jax 0.9.0's dead-argument
    # pruning sporadically disagrees with the lowered executable's parameter
    # list for this program ("Execution supplied N buffers but compiled
    # program expected M"); with no prunable args the counts always match.
    anchor = jnp.float32(0.0)
    for leaf in jax.tree.leaves((ps, cam, frame_index)):
        if getattr(leaf, "size", 1) == 0:  # prim-less scenes: empty arrays
            continue
        anchor = anchor + 0.0 * jnp.asarray(leaf, jnp.float32).reshape(-1)[0]

    stats = jnp.zeros(3) + anchor  # [rays, BVH node visits, triangle tests]
    for s_i in range(int(settings.samples_per_pixel)):
        sample_index = frame_index + s_i
        sampler = smp.make_sampler(px, py, sample_index, strategy=strategy)

        sampler, aa_u, aa_v = smp.sample_2d(sampler, strategy,
                                            smp.SampleDimension.AA, 0)
        sampler, dof_u, dof_v = smp.sample_2d(sampler, strategy,
                                              smp.SampleDimension.DOF, 0)

        rays = generate_rays(
            cam, px, py, w, h, aa_u, aa_v, dof_u, dof_v,
            settings.lens_distortion, settings.f_factor,
            settings.diaphragm_edges, settings.phi_shutter_max,
            settings.vignette_strength)

        if integrator is wht.whitted:
            color, sampler, st_ = integrator(ps, settings, sampler, rays.o,
                                             rays.d, n_lights=n_lights,
                                             has_medium=has_medium)
        elif integrator is adv.advanced:
            color, sampler, st_ = integrator(ps, settings, sampler, rays.o, rays.d,
                                             n_lights=n_lights)
        else:
            color, sampler, st_ = integrator(ps, settings, sampler, rays.o, rays.d)
        stats = stats + st_
        color = color * rays.vignette

        color_img = Vec3(_untiled(color.x, h, w), _untiled(color.y, h, w),
                         _untiled(color.z, h, w))
        jx = _untiled(aa_u - 0.5, h, w)
        jy = _untiled(aa_v - 0.5, h, w)
        accum = film.accumulate(accum, film.splat_pass(color_img, jx, jy, filt))

    return accum, stats


_render_frame_jit = safe_jit(render_frame_impl,
                             static_argnames=("settings", "h", "w",
                                              "n_lights", "filter_name",
                                              "has_medium"),
                             donate_argnames=("accum",))


def render_frame(ps, settings, cam, accum, frame_index, *, h, w, n_lights,
                 filter_name="Mitchell Netravali", has_medium=True):
    """Jitted frame step with the jax-0.9.0 dispatch defenses (core/jitfix):
    camera python-scalar leaves become distinct 0-d arrays, and the call goes
    through safe_jit's recovery ladder."""
    cam = distinct_scalar_leaves(cam)
    return _render_frame_jit(ps, settings, cam, accum, frame_index,
                             h=h, w=w, n_lights=n_lights,
                             filter_name=filter_name, has_medium=has_medium)


def render(scene: Scene, w: int, h: int, frames: int = 1,
           filter_name: str = "Mitchell Netravali"):
    """Convenience host loop: pack, render ``frames`` frames, resolve.

    Returns (hdr (H, W, 3) float32, accum (H, W, 4), stats (3,))."""
    ps = scene.pack()
    accum = film.new_accumulation_buffer(h, w)
    spp = int(scene.settings.samples_per_pixel)
    stats = jnp.zeros(3)
    for f_i in range(frames):
        accum, st_ = render_frame(ps, scene.settings, scene.camera, accum,
                                  jnp.uint32(f_i * spp), h=h, w=w,
                                  n_lights=scene.n_lights, filter_name=filter_name,
                                  has_medium=scene.has_medium)
        stats = stats + st_
    hdr = film.resolve(accum)
    return jax.device_get(hdr), accum, stats
