"""Per-(pixel, sample, dimension, bounce) decorrelated sample streams.

Reproduces the reference sampler framework's *contract*
(samplers.h:110-150, samplers.cpp:18-138): every ray draws named sample
dimensions (AA, DOF, light selection, ...) per bounce; the first bounce gets
low-discrepancy treatment, deeper bounces get white noise; streams are
decorrelated across pixels by coordinate hashing.

Strategies:
  - ``UNIFORM``       white noise (per-ray xorshift chain).
  - ``STRATIFIED``    8x8=64 strata with per-pixel-hash-selected permutation
                      from 256 precomputed permutation tables and jitter
                      within the stratum (samplers.cpp:48-80, 119-135).  The
                      permutation tables are generated locally (seeded numpy
                      shuffles) — same construction, our own data.
  - ``BLUE_NOISE``    screen-space blue-noise error distribution.  The
                      reference ships Heitz/Belcour rank-xor/scramble-xor
                      Owen-Sobol *tables* (blue_noise_samplers/*.cpp,
                      samplers.cpp:27-28,101-102) whose point is that the MC
                      error image's power spectrum is pushed to high
                      frequencies.  The TPU build reaches the same property
                      by a different published route (Georgiev & Fajardo
                      2016, "Blue-noise Dithered Sampling"): ONE shared
                      Owen-scrambled Sobol' sequence (Burley 2020 hash-based
                      scrambling) toroidally shifted per pixel by
                      void-and-cluster blue-noise masks (utils/bluenoise.py,
                      own data), one mask channel per sample dimension.
                      Neighboring pixels get maximally-separated shifts, so
                      at low spp their estimator errors anti-correlate —
                      measured as a high-frequency-biased error spectrum in
                      tests/test_sampler.py.  The shifts are gathered ONCE
                      per frame in ``make_sampler`` (outside the bounce
                      loop) and carried in the Sampler state: zero in-loop
                      gathers (CLAUDE.md pitfall 4).

All functions are batched over rays and jit-safe; ``strategy`` and
``dimension`` are static, ``bounce`` may be traced.
"""

from __future__ import annotations

from enum import IntEnum
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import rng

U32 = jnp.uint32


class SampleDimension(IntEnum):  # samplers.h:129-138
    DIRECT_LIGHTING = 0
    INDIRECT_LIGHTING = 1
    LIGHT_SELECTION = 2
    REFLECTANCE = 3
    DOF = 4
    AA = 5
    ROULETTE = 6
    # TPU-build addition: env-map NEE draws (the reference stubbed env-map
    # importance sampling, assets.cpp:630-661 / integrators.cpp:230-233)
    ENV_LIGHTING = 7


class Strategy(IntEnum):  # samplers.h:110-115
    UNIFORM = 0
    BLUE_NOISE = 1
    STRATIFIED = 2


STRATEGY_NAMES = {
    Strategy.UNIFORM: "Uniform",
    Strategy.BLUE_NOISE: "Optimized Blue Noise",
    Strategy.STRATIFIED: "Stratified",
}

STRATA_X = 8
STRATA_Y = 8
STRATA_COUNT = STRATA_X * STRATA_Y


def _make_permutation_sets() -> np.ndarray:
    """256 random permutations of 0..63 (our own data; same construction as
    the reference's g_strata_permutation_sets table, samplers.cpp:140+)."""
    r = np.random.RandomState(0x5EED5)
    perms = np.stack([r.permutation(STRATA_COUNT) for _ in range(256)])
    return perms.astype(np.uint8)


_PERM_SETS = _make_permutation_sets()  # (256, 64) uint8


# ---------------------------------------------------------------------------
# Hash-based Owen-scrambled Sobol (Burley 2020) — public recipe
# ---------------------------------------------------------------------------

def _reverse_bits32(x):
    x = jnp.asarray(x, U32)
    x = ((x >> 16) | (x << 16)).astype(U32)
    x = (((x & jnp.uint32(0x00FF00FF)) << 8) | ((x & jnp.uint32(0xFF00FF00)) >> 8)).astype(U32)
    x = (((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x & jnp.uint32(0xF0F0F0F0)) >> 4)).astype(U32)
    x = (((x & jnp.uint32(0x33333333)) << 2) | ((x & jnp.uint32(0xCCCCCCCC)) >> 2)).astype(U32)
    x = (((x & jnp.uint32(0x55555555)) << 1) | ((x & jnp.uint32(0xAAAAAAAA)) >> 1)).astype(U32)
    return x


def _laine_karras_permutation(x, seed):
    x = jnp.asarray(x, U32) + jnp.asarray(seed, U32)
    x = x ^ (x * jnp.uint32(0x6C50B47C))
    x = x ^ (x * jnp.uint32(0xB82F1E52))
    x = x ^ (x * jnp.uint32(0xC7AFE638))
    x = x ^ (x * jnp.uint32(0x8D22F6E6))
    return x


def _nested_uniform_scramble(x, seed):
    """Owen scramble of a radical-inverse value (bits reversed in/out)."""
    x = _reverse_bits32(x)
    x = _laine_karras_permutation(x, seed)
    return _reverse_bits32(x)


# Direction numbers for the second Sobol dimension (primitive poly x+1):
# v[0] = 1<<31, v[i] = v[i-1] ^ (v[i-1] >> 1).
def _sobol_dim1_directions() -> np.ndarray:
    v = np.zeros(32, np.uint32)
    v[0] = np.uint32(1 << 31)
    for i in range(1, 32):
        v[i] = v[i - 1] ^ (v[i - 1] >> np.uint32(1))
    return v


_SOBOL_V1 = _sobol_dim1_directions()


def _sobol_2d(index):
    """(x, y) uint32 Sobol' points: dim0 = van der Corput, dim1 = poly x+1."""
    index = jnp.asarray(index, U32)
    x = _reverse_bits32(index)
    y = jnp.zeros_like(index)
    for i in range(32):
        bit = (index >> jnp.uint32(i)) & jnp.uint32(1)
        y = y ^ (bit * jnp.uint32(int(_SOBOL_V1[i])))
    return x, y


def _u32_to_unit_float(x):
    # top 24 bits -> [0,1)
    return (jnp.asarray(x, U32) >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def sobol_owen_2d(sample_index, pixel_hash, dimension: int):
    """Owen-scrambled, Owen-shuffled 2-D Sobol' point for a pixel/dim pair."""
    dim_key = jnp.uint32((0x9E3779B9 * (2 * dimension + 1)) & 0xFFFFFFFF)
    seed = rng.hash_u32(pixel_hash, dim_key)
    shuffled = _nested_uniform_scramble(jnp.asarray(sample_index, U32), rng.hash_u32(seed, jnp.uint32(0xA511E9B3)))
    sx, sy = _sobol_2d(shuffled)
    sx = _nested_uniform_scramble(sx, rng.hash_u32(seed, jnp.uint32(0x63D83595)))
    sy = _nested_uniform_scramble(sy, rng.hash_u32(seed, jnp.uint32(0x9C8FB2A7)))
    return _u32_to_unit_float(sx), _u32_to_unit_float(sy)


def _sobol_base_2d(sample_index, dimension: int):
    """The SHARED (pixel-independent) Owen-Sobol' point for a dimension —
    the base sequence that per-pixel blue-noise shifts rotate."""
    dk = jnp.uint32((0x9E3779B9 * (2 * dimension + 1)) & 0xFFFFFFFF)
    shuffled = _nested_uniform_scramble(
        jnp.asarray(sample_index, U32), rng.hash_u32(dk, jnp.uint32(0xA511E9B3)))
    sx, sy = _sobol_2d(shuffled)
    sx = _nested_uniform_scramble(sx, rng.hash_u32(dk, jnp.uint32(0x63D83595)))
    sy = _nested_uniform_scramble(sy, rng.hash_u32(dk, jnp.uint32(0x9C8FB2A7)))
    return _u32_to_unit_float(sx), _u32_to_unit_float(sy)


# ---------------------------------------------------------------------------
# Blue-noise shift masks (Georgiev & Fajardo 2016 toroidal dithering)
# ---------------------------------------------------------------------------

BN_TILE = 64
N_BN_CHANNELS = 2 * len(SampleDimension)  # (u, v) per sample dimension

_bn_masks_cache: np.ndarray | None = None


def _bn_masks() -> np.ndarray:
    """(BN_TILE, BN_TILE, N_BN_CHANNELS) float32 shifts in [0,1): one
    void-and-cluster blue-noise threshold matrix per (dimension, axis), own
    seeds/data (utils/bluenoise.py).  Generated once per process (~0.5 s per
    channel) and cached."""
    global _bn_masks_cache
    if _bn_masks_cache is None:
        from ..utils.bluenoise import void_and_cluster
        chans = [
            void_and_cluster(BN_TILE, seed=0xB1E + 7919 * k).astype(np.float32)
            / (BN_TILE * BN_TILE)
            for k in range(N_BN_CHANNELS)
        ]
        _bn_masks_cache = np.stack(chans, axis=-1)
    return _bn_masks_cache


# ---------------------------------------------------------------------------
# Sampler context
# ---------------------------------------------------------------------------


class Sampler(NamedTuple):
    """Batched sampler state (one per ray).

    ``x``/``y`` pixel coords, ``sample_index`` the canonical accumulated
    sample index (frame_count + s, raytracer.cpp:429-439), a carried
    xorshift ``state`` for the white-noise draws, and ``bn`` the per-pixel
    blue-noise shifts, (N_BN_CHANNELS, N) when the strategy is BLUE_NOISE
    (gathered ONCE at construction, outside any bounce loop) and (0, N)
    otherwise.
    """

    x: jnp.ndarray  # (N,) uint32
    y: jnp.ndarray  # (N,) uint32
    sample_index: jnp.ndarray  # (N,) or scalar uint32
    state: jnp.ndarray  # (N,) uint32 xorshift chain
    bn: jnp.ndarray  # (N_BN_CHANNELS, N) float32 shifts, or (0, N)


def make_sampler(x, y, sample_index, frame_entropy=0,
                 strategy: int = -1) -> Sampler:
    """Pass ``strategy`` so the BLUE_NOISE shift table is gathered here —
    once per frame pass, at standalone speed — instead of inside the
    integrator's bounce loop (in-loop gathers are the measured perf wall,
    CLAUDE.md pitfall 4)."""
    x = jnp.asarray(x, U32)
    y = jnp.asarray(y, U32)
    sample_index = jnp.asarray(sample_index, U32)
    seed = rng.hash_u32(rng.hash_coordinate_2d(x, y), sample_index, jnp.uint32(frame_entropy))
    if strategy == Strategy.BLUE_NOISE:
        # .copy(): fresh numpy object per trace -> embedded HLO literal
        # (see _stratified_2d for the jax-0.9.0 rationale)
        masks = jnp.asarray(_bn_masks().copy())  # (T, T, K)
        tx = (x & jnp.uint32(BN_TILE - 1)).astype(jnp.int32)
        ty = (y & jnp.uint32(BN_TILE - 1)).astype(jnp.int32)
        bn = masks[ty, tx, :].T  # (K, N): channel reads are sublane slices
    else:
        bn = jnp.zeros((0,) + x.shape, jnp.float32)
    return Sampler(x, y, sample_index, rng.seed_state(seed), bn)


def _stratified_2d(s: Sampler, dim: int, u_jit, v_jit):
    """samplers.cpp:48-80: permuted stratum + jitter inside it."""
    index_offset = (jnp.uint32(73856093 * int(dim))) ^ rng.hash_coordinate_2d(s.x, s.y)
    # .copy(): a FRESH numpy object per trace keeps the table an embedded HLO
    # literal.  Re-converting the same cached object returns a device array
    # that jax 0.9.0 lifts into an executable const-ARG whose bookkeeping is
    # inconsistent ("Execution supplied N buffers but compiled program
    # expected M" / corrupt Lowered.in_avals).
    perm_table = jnp.asarray(_PERM_SETS.copy())  # (256, 64)
    row = (index_offset & jnp.uint32(255)).astype(jnp.int32)
    col = (s.sample_index % jnp.uint32(STRATA_COUNT)).astype(jnp.int32)
    # stratum coords (samplers.cpp:70-74): index % 8 -> x, index / 8 -> y
    si = perm_table[row, col].astype(jnp.uint32)
    strata_x = (si % jnp.uint32(STRATA_X)).astype(jnp.float32) * (1.0 / STRATA_X)
    strata_y = (si // jnp.uint32(STRATA_X)).astype(jnp.float32) * (1.0 / STRATA_Y)
    return strata_x + u_jit * (1.0 / STRATA_X), strata_y + v_jit * (1.0 / STRATA_Y)


def _stratified_1d(s: Sampler, dim: int, u_jit):
    """samplers.cpp:119-135: 1-D uses the flat 64-stratum index."""
    index_offset = (jnp.uint32(73856093 * int(dim))) ^ rng.hash_coordinate_2d(s.x, s.y)
    perm_table = jnp.asarray(_PERM_SETS.copy())
    row = (index_offset & jnp.uint32(255)).astype(jnp.int32)
    col = (s.sample_index % jnp.uint32(STRATA_COUNT)).astype(jnp.int32)
    si = perm_table[row, col].astype(jnp.float32)
    return si * (1.0 / STRATA_COUNT) + u_jit * (1.0 / STRATA_COUNT)


def sample_2d(s: Sampler, strategy: int, dim: int, bounce) -> tuple:
    """Returns (sampler, u, v).  ``strategy``/``dim`` static, ``bounce`` traced."""
    state, ju, jv = rng.next_unilateral_2(s.state)
    s = s._replace(state=state)

    if strategy == Strategy.UNIFORM:
        return s, ju, jv

    if strategy == Strategy.STRATIFIED:
        u0, v0 = _stratified_2d(s, dim, ju, jv)
    else:  # BLUE_NOISE: shared Owen-Sobol + per-pixel blue-noise rotation
        u0, v0 = _blue_noise_2d(s, int(dim))

    # Only the first bounce is low-discrepancy (samplers.cpp:31, 86-88).
    first = jnp.asarray(bounce) == 0
    return s, jnp.where(first, u0, ju), jnp.where(first, v0, jv)


def _blue_noise_2d(s: Sampler, dim: int):
    """Cranley-Patterson rotation of the shared sequence by the pixel's
    blue-noise shift (Georgiev & Fajardo 2016).  Falls back to hash-based
    per-pixel Owen-Sobol for dimensions beyond the mask channels or when the
    sampler was built without BLUE_NOISE shifts (make_sampler strategy arg)."""
    if 2 * dim + 1 < s.bn.shape[0]:
        bu, bv = _sobol_base_2d(s.sample_index, dim)
        return (jnp.mod(bu + s.bn[2 * dim], 1.0),
                jnp.mod(bv + s.bn[2 * dim + 1], 1.0))
    pixel_hash = rng.hash_coordinate_2d(s.x, s.y)
    return sobol_owen_2d(s.sample_index, pixel_hash, dim)


def sample_1d(s: Sampler, strategy: int, dim: int, bounce) -> tuple:
    state, ju = rng.next_unilateral(s.state)
    s = s._replace(state=state)

    if strategy == Strategy.UNIFORM:
        return s, ju

    if strategy == Strategy.STRATIFIED:
        u0 = _stratified_1d(s, dim, ju)
    else:
        u0, _ = _blue_noise_2d(s, int(dim))

    first = jnp.asarray(bounce) == 0
    return s, jnp.where(first, u0, ju)
