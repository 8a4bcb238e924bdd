"""Counter-/state-based uniform RNG for the wavefront renderer.

The reference uses a 4-lane xorshift128 (samplers.h:29-66) with wang-hash
seeding and the exponent-trick bit cast to build uniform floats
(samplers.h:68-90).  On TPU every ray is a lane, so the TPU-native equivalent
is a per-ray uint32 xorshift state advanced in place, plus stateless hash
functions for decorrelated seeding.  All ops are uint32 VPU arithmetic — no
tables, no gathers.

Reference: samplers.h:3-108.
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32


def wang_hash(key):
    """samplers.h:4-12 (identical integer recipe; public-domain Wang hash)."""
    key = jnp.asarray(key, U32)
    key = (key + ~(key << 15)).astype(U32)
    key = key ^ (key >> 10)
    key = (key + (key << 3)).astype(U32)
    key = key ^ (key >> 6)
    key = (key + ~(key << 11)).astype(U32)
    key = key ^ (key >> 16)
    return key


def hash_coordinate_2d(x, y):
    """samplers.h:20-27 — 2-D coordinate hash (shadertoy 4tXyWN recipe)."""
    x = jnp.asarray(x, U32)
    y = jnp.asarray(y, U32)
    m = jnp.uint32(1103515245)
    qx = m * ((x >> 1) ^ y)
    qy = m * ((y >> 1) ^ x)
    return m * (qx ^ (qy >> 3))


def hash_coordinate_3d(x, y, z):
    """samplers.h:14-18."""
    return (
        jnp.asarray(x, U32) * jnp.uint32(73856093)
        ^ jnp.asarray(y, U32) * jnp.uint32(83492791)
        ^ jnp.asarray(z, U32) * jnp.uint32(871603259)
    )


def xorshift32(state):
    """One xorshift step (13,17,5) — the per-lane core of samplers.h:36-45."""
    state = jnp.asarray(state, U32)
    state = state ^ (state << 13)
    state = state ^ (state >> 17)
    state = state ^ (state << 5)
    return state


def bits_to_unilateral(bits):
    """uint32 -> [0,1) float via the exponent trick (samplers.h:68-76):
    mantissa = bits>>9 or'd with exponent 127, minus 1.0."""
    bits = jnp.asarray(bits, U32)
    f = ((jnp.uint32(127) << 23) | (bits >> 9)).view(jnp.float32)
    return f - 1.0


def seed_state(seed):
    """Build a well-mixed per-lane state from any uint32 seed array.

    Mirrors the intent of random_seed (samplers.h:94-108): hash the seed,
    run a few warmup steps, hash again.  seed==0 is remapped (xorshift fixed
    point at 0).
    """
    s = wang_hash(jnp.asarray(seed, U32))
    s = jnp.where(s == 0, jnp.uint32(0x9E3779B9), s)
    s = xorshift32(xorshift32(s))
    s = wang_hash(s)
    s = jnp.where(s == 0, jnp.uint32(0x85EBCA6B), s)
    return s


def next_unilateral(state):
    """Advance state, return (new_state, uniform in [0,1))."""
    state = xorshift32(state)
    return state, bits_to_unilateral(state)


def next_unilateral_2(state):
    state, a = next_unilateral(state)
    state, b = next_unilateral(state)
    return state, a, b


def next_bilateral(state):
    state, u = next_unilateral(state)
    return state, 2.0 * u - 1.0


# ---------------------------------------------------------------------------
# Stateless counter hash draws (for decorrelated sampler streams)
# ---------------------------------------------------------------------------

def hash_u32(*keys):
    """Combine any number of uint32 key arrays into one well-mixed uint32.

    Stateless: u = hash(k0, k1, ...).  Used to key per-(pixel, sample,
    dimension, bounce) draws, reproducing the reference sampler's
    decorrelated-stream contract (samplers.h:129-150) without carried state.
    """
    acc = jnp.uint32(0x9E3779B9)
    for k in keys:
        k = jnp.asarray(k, U32)
        acc = wang_hash(acc ^ (k + jnp.uint32(0x9E3779B9) + (acc << 6) + (acc >> 2)))
    return acc


def uniform_from_keys(*keys):
    """Stateless uniform [0,1) from integer keys."""
    return bits_to_unilateral(hash_u32(*keys))
