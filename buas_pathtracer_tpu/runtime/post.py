"""Post-processing: exposure, tonemap, sRGB, sigmoidal contrast, TPDF dither,
NaN/negative-weight debug colors, RGBA8 packing.

Exact port of the reference post loop (raytracer.cpp:2103-2173) and
``sigmoidal_contrast`` (raytracer.cpp:69-84) / ``remap_tpdf``
(raytracer.cpp:125-132), vectorized over the whole frame.  The reference
dithers with shipped blue-noise PNGs; the TPU build generates its own
void-and-cluster blue-noise tile (utils/bluenoise.py) — same triangular-PDF
remap, our own data.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.scene import PostProcessSettings


def sigmoidal_contrast(x, contrast, midpoint):
    scale_lo = x / jnp.maximum(midpoint, 1e-6)
    lo = midpoint * scale_lo * scale_lo
    y = 1.0 / jnp.maximum(1.0 - midpoint, 1e-6)
    scale_hi = y - y * x
    hi = 1.0 - (1.0 - midpoint) * scale_hi * scale_hi
    curve = jnp.where(x < midpoint, lo, hi)
    return x + (curve - x) * contrast


def remap_tpdf(x):
    """Uniform [0,1] -> triangular-PDF [-1,1] (raytracer.cpp:125-132)."""
    orig = 2.0 * x - 1.0
    v = orig * jax_rsqrt(jnp.abs(orig))
    v = jnp.maximum(-1.0, v)
    return v - jnp.sign(v)


def jax_rsqrt(x):
    import jax
    return jax.lax.rsqrt(jnp.maximum(x, 1e-30))


_dither_tile_cache = {}


def _dither_tile(size: int = 64) -> np.ndarray:
    """(size, size, 3) blue-noise-ish dither values in [0,1]."""
    if size not in _dither_tile_cache:
        from ..utils.bluenoise import blue_noise_texture
        _dither_tile_cache[size] = blue_noise_texture(size, channels=3)
    return _dither_tile_cache[size]


def post_process(accum: jnp.ndarray, settings: PostProcessSettings,
                 frame_index=0) -> jnp.ndarray:
    """(H, W, 4) accumulation -> (H, W, 4) uint8 RGBA.

    Debug visualization parity: NaN pixels cyan, negative-weight magenta
    (raytracer.cpp:2116-2122, 2163-2165).

    On TPU this dispatches to the fused Pallas kernel (ops/pallas_post.py —
    bit-identical, 6x faster at 1080p); BUAS_PALLAS_POST=0 forces the jnp
    path."""
    import os
    import jax
    if (os.environ.get("BUAS_PALLAS_POST", "1") == "1"
            and jax.devices()[0].platform == "tpu"):
        from ..ops.pallas_post import post_process_pallas
        return post_process_pallas(accum, settings, frame_index)
    return _post_process_jnp(accum, settings, frame_index)


def _post_process_jnp(accum: jnp.ndarray, settings: PostProcessSettings,
                      frame_index=0) -> jnp.ndarray:
    h, w, _ = accum.shape
    sample = accum
    wgt = sample[..., 3]
    rgb = sample[..., :3]

    is_nan = jnp.any(jnp.isnan(sample), axis=-1)
    has_weight = wgt > 0.001
    neg_weight = wgt < -0.01

    color = jnp.maximum(rgb / jnp.where(has_weight, wgt, 1.0)[..., None], 0.0)

    if settings.exposure != 0.0:
        color = color * (2.0 ** settings.exposure)
    if settings.tonemapping:
        color = 1.0 - jnp.exp(-color)
    if settings.srgb_transform:
        color = jnp.power(jnp.maximum(color, 0.0), 1.0 / 2.23333)
    if settings.contrast != 0.0:
        color = sigmoidal_contrast(color, settings.contrast, settings.midpoint)

    color = color * 255.0

    if settings.dither:
        tile = jnp.asarray(_dither_tile(64).copy())  # (64, 64, 3); .copy(): keep it an embedded literal (see core/sampler.py)
        ty = jnp.arange(h) % 64
        tx = jnp.arange(w) % 64
        d = tile[ty[:, None], tx[None, :]]  # (H, W, 3)
        color = color + 0.5 + remap_tpdf(d)

    color = jnp.where(has_weight[..., None], color, 0.0)
    # NaN -> cyan (0, 255, 255); negative weight -> magenta scaled by |w|
    color = jnp.where(is_nan[..., None],
                      jnp.array([0.0, 255.0, 255.0]), color)
    mag = -255.0 * wgt
    color = jnp.where((neg_weight & ~is_nan)[..., None],
                      jnp.stack([mag, jnp.zeros_like(mag), mag], -1), color)

    rgb8 = jnp.clip(color, 0.0, 255.0).astype(jnp.uint8)
    a = jnp.full((h, w, 1), 255, jnp.uint8)
    return jnp.concatenate([rgb8, a], axis=-1)
