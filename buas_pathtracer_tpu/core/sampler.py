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
  - ``BLUE_NOISE``    the reference ships Heitz/Belcour Owen-scrambled-Sobol
                      *tables* (blue_noise_samplers/); the TPU-native
                      equivalent is computed hash-based Owen-scrambled Sobol
                      (Burley 2020, "Practical Hash-based Owen Scrambling"):
                      pure uint32 VPU math, no table gathers, no 256-sample /
                      4-dimension limits.

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


# ---------------------------------------------------------------------------
# Sampler context
# ---------------------------------------------------------------------------


class Sampler(NamedTuple):
    """Batched sampler state (one per ray).

    ``x``/``y`` pixel coords, ``sample_index`` the canonical accumulated
    sample index (frame_count + s, raytracer.cpp:429-439), and a carried
    xorshift ``state`` for the white-noise draws.
    """

    x: jnp.ndarray  # (N,) uint32
    y: jnp.ndarray  # (N,) uint32
    sample_index: jnp.ndarray  # (N,) or scalar uint32
    state: jnp.ndarray  # (N,) uint32 xorshift chain


def make_sampler(x, y, sample_index, frame_entropy=0) -> Sampler:
    x = jnp.asarray(x, U32)
    y = jnp.asarray(y, U32)
    sample_index = jnp.asarray(sample_index, U32)
    seed = rng.hash_u32(rng.hash_coordinate_2d(x, y), sample_index, jnp.uint32(frame_entropy))
    return Sampler(x, y, sample_index, rng.seed_state(seed))


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
    else:  # BLUE_NOISE -> computed Owen-Sobol
        pixel_hash = rng.hash_coordinate_2d(s.x, s.y)
        u0, v0 = sobol_owen_2d(s.sample_index, pixel_hash, int(dim))

    # Only the first bounce is low-discrepancy (samplers.cpp:31, 86-88).
    first = jnp.asarray(bounce) == 0
    return s, jnp.where(first, u0, ju), jnp.where(first, v0, jv)


def sample_1d(s: Sampler, strategy: int, dim: int, bounce) -> tuple:
    state, ju = rng.next_unilateral(s.state)
    s = s._replace(state=state)

    if strategy == Strategy.UNIFORM:
        return s, ju

    if strategy == Strategy.STRATIFIED:
        u0 = _stratified_1d(s, dim, ju)
    else:
        pixel_hash = rng.hash_coordinate_2d(s.x, s.y)
        u0, _ = sobol_owen_2d(s.sample_index, pixel_hash, int(dim))

    first = jnp.asarray(bounce) == 0
    return s, jnp.where(first, u0, ju)
