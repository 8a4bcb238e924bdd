"""Film: accumulation buffer + race-free reconstruction splat.

The reference accumulates V4 pixels (xyz = filter-weighted color sum,
w = filter-weight sum) into a double-buffered AccumulationBuffer
(Raytracer.h:44-55) and splats each sample into a (2r+1)^2 neighborhood
(splat_filter, raytracer.cpp:187-259).  Cross-tile splats race in the
reference (unsynchronized float adds at tile borders); the TPU build inverts
the splat into a GATHER: every output pixel sums the contributions of the
samples in its (2r+1)^2 neighborhood via statically-shifted array windows —
deterministic, race-free, and XLA-fusable (no scatter at all).

Weight convention matches the reference exactly: the sample at pixel q with
AA jitter j in [-0.5, 0.5]^2 contributes f(dx - j.x) * f(dy - j.y) to pixel
q + (dx, dy)  =>  pixel p gathers f(-dx - j.x(q)) * f(-dy - j.y(q)) from each
neighbor q = p + (dx, dy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.vec import Vec3
from ..ops.filters import FilterOption

# Stencils up to this radius are fully unrolled at trace time (25-81 taps:
# XLA fuses the whole splat into one kernel).  Beyond it the (2r+1)^2 tap
# count makes COMPILE time explode (Lanczos 12 = 625 taps took >8 min to
# compile), so wide filters scan over dy with an unrolled dx row instead —
# same math, trace size linear in r.
_UNROLL_RADIUS = 4


def new_accumulation_buffer(h: int, w: int) -> jnp.ndarray:
    """(H, W, 4) zeros; .w counts accumulated filter weight
    (allocate_accumulation_buffer / reset, raytracer.cpp:501-522)."""
    return jnp.zeros((h, w, 4), jnp.float32)


def splat_pass(color: Vec3, jitter_x, jitter_y, filt: FilterOption) -> jnp.ndarray:
    """One full-frame sample pass -> (H, W, 4) contribution image.

    color:    Vec3 of (H, W) arrays (one sample per pixel, vignetted)
    jitter_x: (H, W) AA jitter in [-0.5, 0.5] used for those samples
    """
    sample = jnp.stack([color.x, color.y, color.z,
                        jnp.ones_like(color.x)], axis=-1)  # (H, W, 4)

    if filt.f is None:  # Box: null kernel, sample -> own pixel, weight 1
        return sample

    r = int(filt.radius)
    # zero pad: out-of-frame neighbors contribute 0
    return splat_pass_prepadded(
        jnp.pad(sample, [(r, r), (0, 0), (0, 0)]),
        jnp.pad(jitter_x, [(r, r), (0, 0)]),
        jnp.pad(jitter_y, [(r, r), (0, 0)]), filt)


def splat_pass_prepadded(sample_ext, jx_ext, jy_ext,
                         filt: FilterOption) -> jnp.ndarray:
    """Splat core over a VERTICALLY pre-padded sample block.

    ``sample_ext`` is (H + 2r, W, 4): H owned rows plus r context rows above
    and below — zeros at the frame edge, or REAL neighbor-shard samples under
    manual SPMD (parallel/mesh.py exchanges them with ppermute, replacing the
    halo GSPMD used to infer).  Identical arithmetic to the single-device
    splat: bit-equal output for equal context rows.
    """
    if filt.f is None:
        return sample_ext
    r = int(filt.radius)
    h = int(sample_ext.shape[0]) - 2 * r
    w = int(sample_ext.shape[1])
    sp = jnp.pad(sample_ext, [(0, 0), (r, r), (0, 0)])
    jx = jnp.pad(jx_ext, [(0, 0), (r, r)])
    jy = jnp.pad(jy_ext, [(0, 0), (r, r)])

    out = jnp.zeros((h, w, 4), jnp.float32)

    def row(out, dy, win, wjx, wjy):
        """Accumulate one dy row of the stencil (dx unrolled)."""
        fy = filt.f(-dy - wjy)
        for dx in range(-r, r + 1):
            wgt = filt.f(-dx - wjx[:, r + dx:r + dx + w]) \
                * fy[:, r + dx:r + dx + w]
            out = out + win[:, r + dx:r + dx + w] * wgt[..., None]
        return out

    if r <= _UNROLL_RADIUS:
        for dy in range(-r, r + 1):
            out = row(out, float(dy), sp[r + dy:r + dy + h],
                      jx[r + dy:r + dy + h], jy[r + dy:r + dy + h])
        return out

    def dy_step(out, dy):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, r + dy, h, axis=0)
        return row(out, dy.astype(jnp.float32), sl(sp), sl(jx), sl(jy)), None

    out, _ = jax.lax.scan(dy_step, out, jnp.arange(-r, r + 1, dtype=jnp.int32))
    return out


def accumulate(accum: jnp.ndarray, contribution: jnp.ndarray) -> jnp.ndarray:
    return accum + contribution


def resolve(accum: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 4) -> (H, W, 3) HDR color: xyz / w (post loop,
    raytracer.cpp:2126-2128); zero-weight pixels resolve to 0."""
    wgt = accum[..., 3:4]
    safe = jnp.where(jnp.abs(wgt) > 1e-3, wgt, 1.0)
    return jnp.where(jnp.abs(wgt) > 1e-3, accum[..., :3] / safe, 0.0)
