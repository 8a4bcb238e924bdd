"""Regression tests for the consolidated jax-0.9.0 dispatch defenses.

The upstream bug ("Execution supplied N buffers but compiled program expected
M") cannot be reproduced deterministically, so these tests pin the DEFENSES:
the consts-as-args fallback must compute identical results to the fast path,
and scalar-leaf conversion must produce distinct, type-preserving leaves.
"""

import jax
import jax.numpy as jnp
import numpy as np

from buas_pathtracer_tpu.core.jitfix import (
    distinct_scalar_leaves,
    is_dispatch_cache_error,
    safe_jit,
)


def test_error_signature_matching():
    assert is_dispatch_cache_error(
        ValueError("Execution supplied 8 buffers but compiled program "
                   "expected 15 buffers"))
    assert is_dispatch_cache_error(
        TypeError("function compiled for 3 inputs but called with 2"))
    assert not is_dispatch_cache_error(ValueError("shapes do not match"))


def test_distinct_scalar_leaves():
    tree = {"a": 0.0, "b": 0.0, "c": 3, "d": True, "e": jnp.zeros(2)}
    out = distinct_scalar_leaves(tree)
    assert out["a"] is not out["b"]  # no aliasing of equal values
    assert out["a"].dtype == np.float32
    assert out["c"].dtype == np.int32 and int(out["c"]) == 3
    assert out["d"] is True  # bools pass through (static-ish flags)
    assert out["e"] is tree["e"]


def test_safe_jit_fast_path_matches_jit():
    table = np.arange(12, dtype=np.float32).reshape(3, 4)  # captured const

    def fn(x, y, *, scale):
        return jnp.dot(jnp.asarray(table.copy()), x) * scale + y

    f_safe = safe_jit(fn, static_argnames=("scale",))
    x = jnp.arange(4, dtype=jnp.float32)
    y = jnp.ones(3)
    expected = jax.jit(fn, static_argnames=("scale",))(x, y, scale=2.0)
    np.testing.assert_allclose(np.asarray(f_safe(x, y, scale=2.0)),
                               np.asarray(expected))


def test_safe_jit_fallback_matches_fast_path():
    """The eval_jaxpr consts-as-args path (recovery step c) must be exact."""
    table = np.linspace(0, 1, 8).astype(np.float32)  # captured constant

    def fn(x, offset, *, k):
        return jnp.asarray(table) * x + offset + k

    x = jnp.arange(8, dtype=jnp.float32)
    off = jnp.float32(0.5)
    fast = safe_jit(fn, static_argnames=("k",))(x, off, k=3)
    slow = safe_jit(fn, static_argnames=("k",),
                    _force_fallback=True)(x, off, k=3)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


def test_safe_jit_fallback_pytree_output():
    def fn(d):
        return {"sum": d["a"] + d["b"], "prod": d["a"] * d["b"]}

    d = {"a": jnp.arange(3.0), "b": jnp.ones(3)}
    fast = safe_jit(fn)(d)
    slow = safe_jit(fn, _force_fallback=True)(d)
    for kk in fast:
        np.testing.assert_array_equal(np.asarray(fast[kk]),
                                      np.asarray(slow[kk]))


def test_safe_jit_positional_static():
    """static_argnames bound positionally (render.py passes settings as a
    positional arg) must resolve through the signature."""
    def fn(x, mode):
        return x * 2 if mode == "double" else x

    f = safe_jit(fn, static_argnames=("mode",), _force_fallback=True)
    x = jnp.arange(4.0)
    np.testing.assert_array_equal(np.asarray(f(x, "double")),
                                  np.asarray(x) * 2)
