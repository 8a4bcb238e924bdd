"""Sampler debug visualizations — parity with the reference's UI panel
(raytracer.cpp:2199-2290): a 2-D scatter plot of a pixel's sample stream, a
1-D projection histogram, and a per-pixel first-sample noise image.  These
are the reference's visual correctness oracles for the sampler framework
(SURVEY §4c); here they render to small numpy images for the HTTP viewer.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import sampler as smp


def _collect_samples(strategy: int, dim: int, px: int, py: int,
                     n: int = 256) -> np.ndarray:
    """(n, 2) samples of one (pixel, dimension) stream across sample indices."""
    xs = jnp.full((n,), px, jnp.uint32)
    ys = jnp.full((n,), py, jnp.uint32)
    idx = jnp.arange(n, dtype=jnp.uint32)
    s = smp.make_sampler(xs, ys, idx, strategy=strategy)
    s, u, v = smp.sample_2d(s, strategy, dim, 0)
    return np.stack([np.asarray(u), np.asarray(v)], axis=1)


def scatter_plot(strategy: int, dim: int = smp.SampleDimension.AA,
                 px: int = 7, py: int = 11, n: int = 256,
                 size: int = 256) -> np.ndarray:
    """(size, size, 3) uint8 scatter of the first n samples (noise plot,
    raytracer.cpp:2199-2238)."""
    pts = _collect_samples(strategy, dim, px, py, n)
    img = np.full((size, size, 3), 24, np.uint8)
    # 8x8 stratum grid guides (the stratified layout, samplers.cpp:48-80)
    for g in range(0, size, size // 8):
        img[g, :] = 48
        img[:, g] = 48
    xi = np.clip((pts[:, 0] * size).astype(int), 0, size - 1)
    yi = np.clip((pts[:, 1] * size).astype(int), 0, size - 1)
    for x, y in zip(xi, yi):
        img[max(y - 1, 0):y + 2, max(x - 1, 0):x + 2] = (90, 200, 255)
    return img


def projection_histogram(strategy: int, dim: int = smp.SampleDimension.AA,
                         px: int = 7, py: int = 11, n: int = 4096,
                         bins: int = 64, size: int = 256) -> np.ndarray:
    """(size//2, size, 3) uint8 histogram of the 1-D projection
    (raytracer.cpp:2258-2290): flat == well-distributed."""
    pts = _collect_samples(strategy, dim, px, py, n)
    counts, _ = np.histogram(pts[:, 0], bins=bins, range=(0.0, 1.0))
    h = size // 2
    img = np.full((h, size, 3), 24, np.uint8)
    peak = max(counts.max(), 1)
    bw = size // bins
    for b, c in enumerate(counts):
        bh = int(h * c / peak)
        img[h - bh:, b * bw:(b + 1) * bw] = (255, 180, 80)
    # expected-uniform line
    exp_h = h - int(h * (n / bins) / peak)
    img[max(exp_h - 1, 0):exp_h + 1, :] = (120, 255, 120)
    return img


def noise_image(strategy: int, dim: int = smp.SampleDimension.AA,
                size: int = 128) -> np.ndarray:
    """(size, size, 3) uint8 image of each pixel's FIRST sample value —
    the reference's per-pixel noise visualization (raytracer.cpp:2240-2256);
    blue-noise strategies look visually even, white noise clumpy."""
    ys, xs = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    s = smp.make_sampler(jnp.asarray(xs.reshape(-1), jnp.uint32),
                         jnp.asarray(ys.reshape(-1), jnp.uint32),
                         jnp.zeros(size * size, jnp.uint32),
                         strategy=strategy)
    s, u, v = smp.sample_2d(s, strategy, dim, 0)
    img = np.zeros((size, size, 3), np.uint8)
    img[..., 0] = (np.asarray(u).reshape(size, size) * 255).astype(np.uint8)
    img[..., 1] = (np.asarray(v).reshape(size, size) * 255).astype(np.uint8)
    return img
