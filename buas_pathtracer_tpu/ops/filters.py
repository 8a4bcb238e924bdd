"""Reconstruction filters — the reference registry (reconstruction_filters.cpp)
as vectorized jnp kernels.

The reference evaluates kernels through a 256-entry LUT built at select time
(load_reconstruction_kernel, raytracer.cpp:164-185).  On the VPU direct
evaluation is as cheap as a gather and exact, so the TPU build evaluates the
closed forms; registry names and radii match the reference table
(reconstruction_filters.cpp:101-111).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp

from ..core.vec import PI


def _sinc(x):
    px = PI * x
    return jnp.sin(px) / px


def lanczos(radius: float):
    def f(x):
        ax = jnp.abs(x)
        safe = jnp.maximum(ax, 1e-4)
        val = _sinc(safe) * _sinc(safe / radius)
        val = jnp.where(ax < 1e-4, 1.0, val)
        return jnp.where(ax <= radius, val, 0.0)
    return f


def gaussian(alpha: float, radius: float):
    # math.exp, not jnp: module import must not initialize a jax backend
    # (the FILTERS table below is built at import time).
    edge = math.exp(-alpha * radius * radius)

    def f(x):
        return jnp.maximum(0.0, jnp.exp(-alpha * x * x) - edge)
    return f


def mitchell_netravali(x, B: float = 1.0 / 3.0, C: float = 1.0 / 3.0):
    x = jnp.abs(x)
    outer = ((-B - 6 * C) * x ** 3 + (6 * B + 30 * C) * x ** 2 +
             (-12 * B - 48 * C) * x + (8 * B + 24 * C)) / 6.0
    inner = ((12 - 9 * B - 6 * C) * x ** 3 +
             (-18 + 12 * B + 6 * C) * x ** 2 + (6 - 2 * B)) / 6.0
    val = jnp.where(x > 1.0, outer, inner)
    return jnp.where(x > 2.0, 0.0, val)


class FilterOption(NamedTuple):
    name: str
    f: Optional[Callable]  # None => box (null kernel, direct accumulate)
    radius: int


FILTERS = [
    FilterOption("Box", None, 0),
    FilterOption("Gaussian 3", gaussian(3.0, 3.0), 3),
    FilterOption("Gaussian 12", gaussian(0.03, 12.0), 12),
    FilterOption("Mitchell Netravali", mitchell_netravali, 2),
    FilterOption("Lanczos 3", lanczos(3.0), 3),
    FilterOption("Lanczos 4", lanczos(4.0), 4),
    FilterOption("Lanczos 6", lanczos(6.0), 6),
    FilterOption("Lanczos 12", lanczos(12.0), 12),
]


def find_filter(name: str) -> FilterOption:
    """Box if not found (reconstruction_filters.cpp:113-124 returns g_filters[0])."""
    for opt in FILTERS:
        if opt.name == name:
            return opt
    return FILTERS[0]
