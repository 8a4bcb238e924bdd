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

# Merged per-dimension permutation tables for the ONE-gather-per-pass
# stratified fast path (see make_sampler): the row a pixel reads for
# dimension d is (73856093*d ^ pixel_hash) & 255 == K_d ^ (pixel_hash & 255)
# because XOR is bitwise — so one (256, 64, D) table indexed by the PLAIN
# hash byte serves every dimension at once.
_N_DIMS = len(SampleDimension)
_DIM_ROW_KEYS = [(73856093 * d) & 255 for d in range(_N_DIMS)]
_MERGED_PERMS = np.stack(
    [_PERM_SETS[np.arange(256) ^ k] for k in _DIM_ROW_KEYS],
    axis=-1).astype(np.float32)  # (256, 64, D)


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


def _bn_cache_paths():
    """Disk cache next to the package (like native/'s .so fingerprint):
    the ~8 s of per-process void-and-cluster generation happens once per
    machine, not once per process (round-2 verdict item 9)."""
    import os
    d = os.path.dirname(os.path.abspath(__file__))
    base = os.path.join(d, f"_bn_masks_{BN_TILE}x{N_BN_CHANNELS}.npy")
    return base, base + ".fp"


def _bn_fingerprint() -> str:
    """Content fingerprint: the generator source + parameters.  A cached
    file built from a different construction is never loaded."""
    import hashlib
    from ..utils import bluenoise
    h = hashlib.sha256()
    with open(bluenoise.__file__, "rb") as f:
        h.update(f.read())
    h.update(f"{BN_TILE}|{N_BN_CHANNELS}|0xB1E|7919".encode())
    return h.hexdigest()


def _bn_masks() -> np.ndarray:
    """(BN_TILE, BN_TILE, N_BN_CHANNELS) float32 shifts in [0,1): one
    void-and-cluster blue-noise threshold matrix per (dimension, axis), own
    seeds/data (utils/bluenoise.py).  Generated once per MACHINE (disk
    cache) and once per process (memory cache)."""
    global _bn_masks_cache
    if _bn_masks_cache is not None:
        return _bn_masks_cache
    import os
    path, fp_path = _bn_cache_paths()
    fp = _bn_fingerprint()
    if os.path.exists(path) and os.path.exists(fp_path):
        try:
            with open(fp_path) as f:
                if f.read().strip() == fp:
                    m = np.load(path)
                    if m.shape == (BN_TILE, BN_TILE, N_BN_CHANNELS):
                        _bn_masks_cache = np.ascontiguousarray(
                            m.astype(np.float32))
                        return _bn_masks_cache
        except (OSError, ValueError):
            pass
    from ..utils.bluenoise import void_and_cluster
    chans = [
        void_and_cluster(BN_TILE, seed=0xB1E + 7919 * k).astype(np.float32)
        / (BN_TILE * BN_TILE)
        for k in range(N_BN_CHANNELS)
    ]
    _bn_masks_cache = np.stack(chans, axis=-1)
    try:
        np.save(path, _bn_masks_cache)
        with open(fp_path, "w") as f:
            f.write(fp)
    except OSError:
        pass  # read-only install: regenerate per process
    return _bn_masks_cache


# ---------------------------------------------------------------------------
# Sampler context
# ---------------------------------------------------------------------------


class Sampler(NamedTuple):
    """Batched sampler state (one per ray).

    ``x``/``y`` pixel coords, ``sample_index`` the canonical accumulated
    sample index (frame_count + s, raytracer.cpp:429-439), a carried
    xorshift ``state`` for the white-noise draws, ``bn`` the per-pixel
    blue-noise shifts ((N_BN_CHANNELS, N) when the strategy is BLUE_NOISE,
    (0, N) otherwise), and ``pre`` the PRECOMPUTED first-bounce
    low-discrepancy bases, (2*D, N) rows [strata_x_d, strata_y_d] (or the
    full rotated Sobol' value for BLUE_NOISE), or (0, N).

    ``pre`` is the round-3 perf fix: sample_1d/2d select the low-discrepancy
    value only at bounce 0 but used to EVALUATE its table lookups at every
    bounce — measured 124 ms/bounce at 2M rays, ~1 s of the 2 s frame
    (tools/prof24).  Bases depend only on (pixel, sample_index, dim), so
    make_sampler computes all dimensions once per pass with ONE row gather;
    the loop-carried rows are unmodified, so XLA aliases them move-free.
    Bit-identical to the per-bounce evaluation (exact dyadic arithmetic).

    NOTE: ``pre`` is keyed to ``sample_index`` — do not ``_replace`` the
    sample index on a strategy!=UNIFORM sampler; build a fresh one.
    """

    x: jnp.ndarray  # (N,) uint32
    y: jnp.ndarray  # (N,) uint32
    sample_index: jnp.ndarray  # (N,) or scalar uint32
    state: jnp.ndarray  # (N,) uint32 xorshift chain
    bn: jnp.ndarray  # (N_BN_CHANNELS, N) float32 shifts, or (0, N)
    pre: jnp.ndarray  # (2*_N_DIMS, N) first-bounce bases, or (0, N)


def make_sampler(x, y, sample_index, *, strategy: int,
                 frame_entropy=0) -> Sampler:
    """``strategy`` is REQUIRED (keyword-only): the BLUE_NOISE shift table
    must be gathered here — once per frame pass, at standalone speed —
    instead of inside the integrator's bounce loop (in-loop gathers are the
    measured perf wall, CLAUDE.md pitfall 4).  A defaulted strategy let call
    sites silently build blue-noise samplers without shift masks, degrading
    sample_2d to the hash-Sobol fallback with no signal (round-2 advisor)."""
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
    pre = _first_bounce_bases(x, y, sample_index, strategy, bn)
    return Sampler(x, y, sample_index, rng.seed_state(seed), bn, pre)


def _first_bounce_bases(x, y, sample_index, strategy: int, bn) -> jnp.ndarray:
    """(2*D, N) first-bounce low-discrepancy bases for every dimension, or
    (0, N) when not applicable (UNIFORM, or a per-ray sample_index where the
    one-per-pass precompute doesn't hold).  See Sampler.pre.

    STRATIFIED: rows 2d/2d+1 hold the stratum corner (qx/8, qy/8) for dim d.
    All dimensions come from ONE (N, D) row gather of the merged permutation
    table (the per-dim row indices are K_d ^ hash_byte, and the pass's
    column is a scalar slice) — replacing 7-9 per-bounce scalar gathers.
    BLUE_NOISE: rows hold the final Cranley-Patterson-rotated value; the
    shared Owen-Sobol' base point is SCALAR math for a scalar sample_index.
    """
    n = x.shape
    if (strategy not in (Strategy.STRATIFIED, Strategy.BLUE_NOISE)
            or getattr(sample_index, "ndim", 0) != 0):
        return jnp.zeros((0,) + n, jnp.float32)

    if strategy == Strategy.BLUE_NOISE:
        rows = []
        for d in range(_N_DIMS):
            bu, bv = _sobol_base_2d(sample_index, d)  # scalar u32 math
            rows.append(jnp.mod(bu + bn[2 * d], 1.0))
            rows.append(jnp.mod(bv + bn[2 * d + 1], 1.0))
        return jnp.stack(rows)

    # STRATIFIED
    merged = jnp.asarray(_MERGED_PERMS.copy())  # (256, 64, D); fresh per
    # trace -> embedded literal (jax-0.9.0, see _stratified_2d)
    col = (sample_index % jnp.uint32(STRATA_COUNT)).astype(jnp.int32)
    t_pass = jax.lax.dynamic_slice_in_dim(merged, col, 1, axis=1)[:, 0, :]
    r = (rng.hash_coordinate_2d(x, y) & jnp.uint32(255)).astype(jnp.int32)
    g = t_pass[r]  # (N, D): the ONE row gather of the pass
    # MXU-materialized transpose -> (D, N) sublane-sliced field reads
    gT = jax.lax.dot_general(
        jnp.eye(_N_DIMS, dtype=jnp.float32), g, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    rows = []
    for d in range(_N_DIMS):
        si = gT[d]  # exact small-int float values in [0, 64)
        rows.append(jnp.mod(si, float(STRATA_X)) * (1.0 / STRATA_X))
        rows.append(jnp.floor(si * (1.0 / STRATA_X)) * (1.0 / STRATA_Y))
    return jnp.stack(rows)


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

    if s.pre.shape[0]:  # precomputed bases: zero in-loop table work
        if strategy == Strategy.STRATIFIED:
            u0 = s.pre[2 * int(dim)] + ju * (1.0 / STRATA_X)
            v0 = s.pre[2 * int(dim) + 1] + jv * (1.0 / STRATA_Y)
        else:
            u0, v0 = s.pre[2 * int(dim)], s.pre[2 * int(dim) + 1]
    elif strategy == Strategy.STRATIFIED:
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

    if s.pre.shape[0]:
        if strategy == Strategy.STRATIFIED:
            # flat 64-stratum base si/64 == qx/64 + qy/8, reconstructed
            # exactly from the stratum-corner rows (dyadic arithmetic)
            u0 = (s.pre[2 * int(dim)] * (1.0 / STRATA_X)
                  + s.pre[2 * int(dim) + 1]) + ju * (1.0 / STRATA_COUNT)
        else:
            u0 = s.pre[2 * int(dim)]
    elif strategy == Strategy.STRATIFIED:
        u0 = _stratified_1d(s, dim, ju)
    else:
        u0, _ = _blue_noise_2d(s, int(dim))

    first = jnp.asarray(bounce) == 0
    return s, jnp.where(first, u0, ju)
