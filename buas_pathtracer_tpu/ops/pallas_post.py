"""Pallas TPU kernel for the post-processing stage.

The fused exposure → tonemap → sRGB → sigmoidal-contrast → TPDF-dither →
u8-pack pipeline (runtime/post.py, reference raytracer.cpp:2103-2173) is a
pure elementwise pass over the frame — a textbook VPU kernel.  This Pallas
version processes the accumulation buffer in channel-planar (8k, 128)-lane
VMEM tiles with the dither plane pre-tiled to frame size, producing
bit-identical output to the jnp path (tests/test_pallas_post.py).

Why only this stage is Pallas: the hot BVH traversal needs per-ray gathers
from a multi-megabyte node table, and Mosaic's in-kernel gather support is a
single (8,128) vreg (probed; see docs/PERFORMANCE.md) — the traversal stays
on XLA's gather path while dense stages can go through Pallas.  On TPU the
kernel runs compiled; everywhere else it falls back to interpret mode or the
jnp implementation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scene import PostProcessSettings

BLK_H = 8
BLK_W = 128


def _post_kernel(r_ref, g_ref, b_ref, w_ref, dr_ref, dg_ref, db_ref,
                 out_r, out_g, out_b, *, exposure, tonemapping, srgb,
                 contrast, midpoint, dither):
    wgt = w_ref[:]
    has_weight = wgt > 0.001
    neg_weight = wgt < -0.01
    safe_w = jnp.where(has_weight, wgt, 1.0)
    nan_any = (jnp.isnan(r_ref[:]) | jnp.isnan(g_ref[:]) | jnp.isnan(b_ref[:])
               | jnp.isnan(wgt))

    def channel(c_ref, d_ref, nan_val, mag_on):
        c = jnp.maximum(c_ref[:] / safe_w, 0.0)
        if exposure != 0.0:
            c = c * (2.0 ** exposure)
        if tonemapping:
            c = 1.0 - jnp.exp(-c)
        if srgb:
            c = jnp.power(jnp.maximum(c, 0.0), 1.0 / 2.23333)
        if contrast != 0.0:
            lo = midpoint * (c / max(midpoint, 1e-6)) ** 2
            y = 1.0 / max(1.0 - midpoint, 1e-6)
            sh = y - y * c
            hi = 1.0 - (1.0 - midpoint) * sh * sh
            c = c + (jnp.where(c < midpoint, lo, hi) - c) * contrast
        c = c * 255.0
        if dither:
            orig = 2.0 * d_ref[:] - 1.0
            v = orig * jax.lax.rsqrt(jnp.maximum(jnp.abs(orig), 1e-30))
            v = jnp.maximum(-1.0, v)
            c = c + 0.5 + (v - jnp.sign(v))
        c = jnp.where(has_weight, c, 0.0)
        c = jnp.where(nan_any, nan_val, c)
        mag = -255.0 * wgt
        c = jnp.where(neg_weight & ~nan_any,
                      mag if mag_on else jnp.zeros_like(c), c)
        # Mosaic has no f32->u8 cast; emit int32 and narrow outside
        return jnp.clip(c, 0.0, 255.0).astype(jnp.int32)

    out_r[:] = channel(r_ref, dr_ref, 0.0, True)
    out_g[:] = channel(g_ref, dg_ref, 255.0, False)
    out_b[:] = channel(b_ref, db_ref, 255.0, True)


_dither_plane_cache = {}


def _dither_planes(h: int, w: int) -> np.ndarray:
    """(3, H, W) dither values: the 64x64 tile repeated to frame size."""
    key = (h, w)
    if key not in _dither_plane_cache:
        from ..runtime.post import _dither_tile
        tile = _dither_tile(64)
        reps = (-(-h // 64), -(-w // 64))
        big = np.tile(tile, (reps[0], reps[1], 1))[:h, :w]
        _dither_plane_cache[key] = np.ascontiguousarray(
            big.transpose(2, 0, 1)).astype(np.float32)
    return _dither_plane_cache[key]


def post_process_pallas(accum: jnp.ndarray, settings: PostProcessSettings,
                        frame_index=0, interpret: bool = False) -> jnp.ndarray:
    """(H, W, 4) accumulation -> (H, W, 4) uint8 RGBA via a Pallas kernel.

    Pads the frame to (8, 128) tile multiples, runs the fused kernel over a
    2-D grid, and crops.  Matches runtime/post.post_process bit-for-bit."""
    from jax.experimental import pallas as pl

    h, w, _ = accum.shape
    ph = -(-h // BLK_H) * BLK_H
    pw = -(-w // BLK_W) * BLK_W
    planes = jnp.pad(accum, ((0, ph - h), (0, pw - w), (0, 0))
                     ).transpose(2, 0, 1)  # (4, PH, PW)
    dither = jnp.asarray(np.pad(_dither_planes(h, w),
                                ((0, 0), (0, ph - h), (0, pw - w))))

    kernel = partial(_post_kernel,
                     exposure=float(settings.exposure),
                     tonemapping=bool(settings.tonemapping),
                     srgb=bool(settings.srgb_transform),
                     contrast=float(settings.contrast),
                     midpoint=float(settings.midpoint),
                     dither=bool(settings.dither))

    blk = pl.BlockSpec((BLK_H, BLK_W), lambda i, j: (i, j))
    out_shape = [jax.ShapeDtypeStruct((ph, pw), jnp.int32)] * 3
    r8, g8, b8 = pl.pallas_call(
        kernel,
        grid=(ph // BLK_H, pw // BLK_W),
        in_specs=[blk] * 7,
        out_specs=[blk] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(planes[0], planes[1], planes[2], planes[3],
      dither[0], dither[1], dither[2])

    rgb8 = jnp.stack([r8[:h, :w], g8[:h, :w], b8[:h, :w]],
                     axis=-1).astype(jnp.uint8)
    a = jnp.full((h, w, 1), 255, jnp.uint8)
    return jnp.concatenate([rgb8, a], axis=-1)
