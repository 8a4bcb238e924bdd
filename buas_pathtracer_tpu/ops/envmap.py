"""Environment map: equirect lookup + luminance-CDF importance sampling.

The reference parses Radiance .HDR files into an Image_V3 and looks them up
equirect in ``sample_sky`` (integrators.cpp:274-288).  It also builds a
tiled luma CDF for importance sampling (assets.cpp:630-661) but the consumer
was never implemented (integrators.cpp:230-233 "NOT YET IMPLEMENTED").  The
TPU build implements both: exact per-texel marginal/conditional CDFs with
inverse-CDF sampling (binary search as a fixed-depth lax loop — fully
vectorized, no data-dependent shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.vec import PI, TAU, Vec3


def build_env_cdf(env: np.ndarray):
    """Host-side: per-row marginal CDF over sin-weighted luminance and
    per-row conditional CDFs.  Returns (marginal (H+1,), conditional (H, W+1))
    both normalized to [0, 1]."""
    h, w, _ = env.shape
    luma = (0.2126 * env[..., 0] + 0.7152 * env[..., 1] + 0.0722 * env[..., 2])
    # sin(theta) weight: rows map v in [0,1) -> theta in [-pi/2, pi/2)
    theta = (np.arange(h) + 0.5) / h * np.pi  # [0, pi): standard lat band
    sin_w = np.sin(theta)
    weighted = np.maximum(luma, 0.0) * sin_w[:, None]

    row_sums = weighted.sum(axis=1)
    total = row_sums.sum()
    if total <= 0.0:
        marg = np.linspace(0.0, 1.0, h + 1, dtype=np.float32)
        cond = np.tile(np.linspace(0.0, 1.0, w + 1, dtype=np.float32), (h, 1))
        return marg, cond

    marg = np.zeros(h + 1, np.float32)
    marg[1:] = np.cumsum(row_sums / total)
    marg[-1] = 1.0

    cond = np.zeros((h, w + 1), np.float32)
    safe = np.where(row_sums > 0.0, row_sums, 1.0)
    cond[:, 1:] = np.cumsum(weighted / safe[:, None], axis=1)
    cond[:, -1] = 1.0
    return marg, cond


def build_env_alias(env: np.ndarray):
    """Host-side Walker alias table over the sin-weighted texel luminance,
    plus the per-texel solid-angle pdf NUMERATOR table.

    Sampling through the inverse-CDF tables costs ~25 sequential scalar
    gathers at wavefront width (399 ms/call at 2M rays on v5e,
    tools/prof39 — the env hero's single largest cost); the alias method
    is O(1): two gathers to pick the texel, one for its pdf, three for
    radiance.  Returns (prob_keep (K,), alias (K,) exact-float ints,
    pdf_num (K,)) with K = H*W and
        pdf_solid_angle(d) = pdf_num[texel] / cos(latitude(d)),
    the same value the CDF formulation computes (pm*pc/(2 pi^2 cos))."""
    h, w, _ = env.shape
    luma = (0.2126 * env[..., 0] + 0.7152 * env[..., 1]
            + 0.0722 * env[..., 2])
    theta = (np.arange(h) + 0.5) / h * np.pi
    weighted = (np.maximum(luma, 0.0) * np.sin(theta)[:, None]).reshape(-1)
    k = weighted.size
    total = weighted.sum()
    if total <= 0.0:
        p = np.full(k, 1.0 / k, np.float64)
    else:
        p = weighted.astype(np.float64) / total
    scaled = p * k
    prob = np.ones(k, np.float32)
    alias = np.arange(k, dtype=np.int64)
    small = [i for i in range(k) if scaled[i] < 1.0]
    large = [i for i in range(k) if scaled[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] = (scaled[l] + scaled[s]) - 1.0
        (small if scaled[l] < 1.0 else large).append(l)
    pdf_num = (p * k / (TAU * PI)).astype(np.float32)
    assert k < (1 << 24), "alias indices stored as exact float values"
    return prob, alias.astype(np.float32), pdf_num


def _hash01(x: jnp.ndarray) -> jnp.ndarray:
    """Cheap white-noise uniform from float bits (intra-texel jitter only;
    texel choice carries all the importance information)."""
    b = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    b = (b ^ (b >> 16)) * jnp.uint32(0x7FEB352D)
    b = (b ^ (b >> 15)) * jnp.uint32(0x846CA68B)
    b = b ^ (b >> 16)
    return b.astype(jnp.float32) * (1.0 / 4294967296.0)


def sample_env_alias(prob: jnp.ndarray, alias_f: jnp.ndarray,
                     pdf_num: jnp.ndarray, env: jnp.ndarray, u, v):
    """O(1) env importance sample (alias method).  Exactly the texel
    distribution of the CDF tables; intra-texel offsets are hashed white
    noise (the texel is piecewise-constant in radiance and pdf, so only
    the direction inside it varies).  Returns (dir, pdf_sa, radiance)."""
    h, w, _ = env.shape
    k = h * w
    idx0 = jnp.clip((u * k).astype(jnp.int32), 0, k - 1)
    keep = v < prob[idx0]
    idx = jnp.where(keep, idx0, alias_f[idx0].astype(jnp.int32))
    row = idx // w
    col = idx - row * w

    du_ = _hash01(u * 7193.17 + v)
    dv_ = _hash01(v * 4021.73 - u)
    vv = (row.astype(jnp.float32) + dv_) / h
    uu = (col.astype(jnp.float32) + du_) / w
    phi = (uu - 0.5) * TAU
    theta = (vv - 0.5) * PI
    cos_t = jnp.cos(theta)
    d = Vec3(cos_t * jnp.cos(phi), jnp.sin(theta), cos_t * jnp.sin(phi))

    pdf = pdf_num[idx] / jnp.maximum(cos_t, 1e-8)
    flat_px = env.reshape(-1, 3)
    return d, pdf, Vec3(flat_px[idx, 0], flat_px[idx, 1], flat_px[idx, 2])


def env_pdf_table(pdf_num: jnp.ndarray, h: int, w: int, d: Vec3):
    """Solid-angle pdf of direction ``d`` under the alias sampler: one
    flat gather from the per-texel numerator table (the CDF version did
    4+ gathers — 77 ms/call at 2M rays, tools/prof39)."""
    phi = jnp.arctan2(d.z, d.x)
    theta = jnp.arcsin(jnp.clip(d.y, -1.0, 1.0))
    u = 0.5 + 0.5 / PI * phi
    v = 0.5 + 1.0 / PI * theta
    row = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    col = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    cos_t = jnp.cos(theta)
    return pdf_num[row * w + col] / jnp.maximum(cos_t, 1e-8)


def _searchsorted_cdf(cdf: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Vectorized inverse-CDF: index i with cdf[i] <= u < cdf[i+1]."""
    return jnp.clip(jnp.searchsorted(cdf, u, side="right") - 1,
                    0, cdf.shape[0] - 2)


def _search_cond(cond: jnp.ndarray, row: jnp.ndarray, v: jnp.ndarray):
    """Per-ray inverse-CDF within cond[row]: rightmost col with
    cond[row, col] <= v (== sum(cond[row] <= v) - 1 for a sorted row).

    Fixed-depth bisection with FLAT scalar gathers: the obvious
    ``cond[row]`` row gather materializes an (N, W+1) block — 16 GB of
    traffic per call at 2M rays on a 2k-wide map, which made env-NEE
    frames ~5x slower than light-NEE ones.  log2(W) scalar gathers from
    the VMEM-resident CDF table cost ~nothing in comparison, and the
    result is bit-identical."""
    w1 = int(cond.shape[1])
    flat = cond.reshape(-1)
    base = row * w1
    lo = jnp.zeros_like(row)
    hi = jnp.full_like(row, w1 - 1)
    steps = int(np.ceil(np.log2(max(w1, 2))))
    for _ in range(steps):
        mid = (lo + hi) // 2
        go = flat[base + mid] <= v
        lo = jnp.where(go, mid, lo)
        hi = jnp.where(go, hi, mid)
    col = jnp.clip(lo, 0, w1 - 2)
    c_lo = flat[base + col]
    c_hi = flat[base + col + 1]
    return col, c_lo, c_hi


def sample_env_direction(marg: jnp.ndarray, cond: jnp.ndarray,
                         env: jnp.ndarray, u, v):
    """Importance-sample a direction from the env map.

    Returns (dir: Vec3, pdf (solid-angle), radiance: Vec3)."""
    h, w, _ = env.shape
    row = _searchsorted_cdf(marg, u)  # (N,)
    col, c_lo, c_hi = _search_cond(cond, row, v)

    # continuous offsets inside the texel
    m_lo = marg[row]
    m_hi = marg[row + 1]
    dv_ = (u - m_lo) / jnp.maximum(m_hi - m_lo, 1e-12)
    du_ = (v - c_lo) / jnp.maximum(c_hi - c_lo, 1e-12)

    vv = (row.astype(jnp.float32) + dv_) / h  # [0,1): latitude coordinate
    uu = (col.astype(jnp.float32) + du_) / w

    # match sample_sky's mapping (integrators.cpp:277-283):
    #   u = 0.5 + phi/(2pi), v = 0.5 + theta/pi  with theta = asin(d.y)
    phi = (uu - 0.5) * TAU
    theta = (vv - 0.5) * PI
    cos_t = jnp.cos(theta)
    d = Vec3(cos_t * jnp.cos(phi), jnp.sin(theta), cos_t * jnp.sin(phi))

    # pdf over solid angle: p(u,v) / (2 pi^2 cos(theta));  rows were built with
    # sin(standard-theta) = cos(latitude) weights, consistent with this.
    pm = (m_hi - m_lo) * h
    pc = (c_hi - c_lo) * w
    pdf = (pm * pc) / jnp.maximum(TAU * PI * cos_t, 1e-8)

    # flat one-index gather (a 2-index gather lowers to a general scatter
    # -gather; flat per-channel gathers stay in the cheap per-index form)
    flat_px = env.reshape(-1, 3)
    pix = row * w + col
    return d, pdf, Vec3(flat_px[pix, 0], flat_px[pix, 1], flat_px[pix, 2])


def lookup_env(env: jnp.ndarray, d: Vec3) -> Vec3:
    """Equirect nearest lookup — exact port of sample_sky's skydome branch
    (integrators.cpp:274-288) including its int truncation + modulo."""
    h, w, _ = env.shape
    rcp_pi = 1.0 / PI
    rcp_2pi = 0.5 / PI
    phi = jnp.arctan2(d.z, d.x)
    theta = jnp.arcsin(jnp.clip(d.y, -1.0, 1.0))
    u = 0.5 + rcp_2pi * phi
    v = 0.5 + rcp_pi * theta
    x = (u * w).astype(jnp.int32) % w
    y = (v * h).astype(jnp.int32) % h
    px = env[y, x]
    return Vec3(px[..., 0], px[..., 1], px[..., 2])


def env_pdf(marg: jnp.ndarray, cond: jnp.ndarray, env: jnp.ndarray, d: Vec3):
    """Solid-angle pdf of sampling direction ``d`` (for MIS)."""
    h, w, _ = env.shape
    phi = jnp.arctan2(d.z, d.x)
    theta = jnp.arcsin(jnp.clip(d.y, -1.0, 1.0))
    u = 0.5 + 0.5 / PI * phi
    v = 0.5 + 1.0 / PI * theta
    row = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    col = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    pm = (marg[row + 1] - marg[row]) * h
    # flat scalar gathers — the (N, W+1) row gather `cond[row]` was the
    # single biggest cost of env-MIS frames (see _search_cond)
    flat = cond.reshape(-1)
    base = row * int(cond.shape[1])
    c_lo = flat[base + col]
    c_hi = flat[base + col + 1]
    pc = (c_hi - c_lo) * w
    cos_t = jnp.cos(theta)
    return (pm * pc) / jnp.maximum(TAU * PI * cos_t, 1e-8)
