"""Consolidated defenses for the jax 0.9.0 dispatch-cache constant bug.

Symptom: with several warm dispatch-cache entries, executing a jitted program
fails with ``Execution supplied N buffers but compiled program expected M``.
Root cause (observed, upstream): constants captured by the trace are lifted
into executable *parameters* during lowering, and the fast dispatch path
sporadically loses that bookkeeping.  Two aggravators feed it:

  1. equal-valued python-float scalars hit jax's weak-type conversion cache
     and alias ONE device buffer across many pytree leaves, so executables
     compiled with donation see fewer runtime buffers than parameters;
  2. re-converting the SAME cached numpy object (module-level tables) yields
     a device array that lowering lifts into a const-arg with inconsistent
     bookkeeping (fresh ``.copy()`` objects stay embedded HLO literals).

This module is the one place that knows the recovery protocol; callers
(runtime/render.py, parallel/mesh.py, tests) use :func:`safe_jit` /
:func:`distinct_scalar_leaves` instead of hand-rolling retries.

Recovery ladder inside :func:`safe_jit`:
  a. call the jitted function (fast path — almost always fine);
  b. on the signature error, drop the poisoned cache entry
     (``jitted.clear_cache()``) and retry once — a FRESH compile of the same
     program dispatches correctly;
  c. if it recurs, re-trace to a jaxpr and run ``eval_jaxpr`` with the
     captured constants passed as EXPLICIT arguments — a program with no
     captured constants cannot lose them.  Cached per argument signature.
"""

from __future__ import annotations

import functools
import inspect

import jax
import numpy as np

_SIGNATURES = (
    "buffers but compiled program expected",
    "inputs but called with",
)


def is_dispatch_cache_error(e: Exception) -> bool:
    s = str(e)
    return any(sig in s for sig in _SIGNATURES)


def distinct_scalar_leaves(tree):
    """Replace python float/int leaves with DISTINCT 0-d numpy arrays.

    Defeats aggravator (1): each leaf becomes its own device buffer instead
    of aliasing the scalar-conversion cache.  bools and non-scalars pass
    through; ints stay integral (int32), floats become float32.
    """
    def conv(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, int):
            return np.array(v, np.int32)
        if isinstance(v, float):
            return np.array(v, np.float32)
        return v
    return jax.tree.map(conv, tree)


def safe_jit(fn, *, _force_fallback: bool = False, **jit_kwargs):
    """``jax.jit`` with the dispatch-cache recovery ladder.

    Supports the jit kwargs used in this codebase (``static_argnames``,
    ``donate_argnames``/``donate_argnums``, ``out_shardings``).  The fallback
    path ignores donation and output shardings (it is a correctness escape
    hatch, not a fast path).

    ``_force_fallback`` exists for the regression test: it skips straight to
    the consts-as-args eval_jaxpr path so the fallback's correctness is
    exercised without needing to reproduce the upstream bug.
    """
    jitted = jax.jit(fn, **jit_kwargs)
    static_names = set(jit_kwargs.get("static_argnames", ()) or ())
    sig = inspect.signature(fn)
    aot_cache = {}

    def run_fallback(args, kwargs):
        bound = sig.bind(*args, **kwargs)
        static = {k: v for k, v in bound.arguments.items()
                  if k in static_names}
        dynamic = {k: v for k, v in bound.arguments.items()
                   if k not in static_names}
        key = (
            tuple(sorted(static.items(), key=lambda kv: kv[0])),
            tuple((tuple(getattr(l, "shape", ())),
                   str(getattr(l, "dtype", type(l).__name__)))
                  for l in jax.tree.leaves(dynamic)),
            jax.tree.structure(dynamic),
        )
        if key not in aot_cache:
            def dyn_fn(dyn):
                return fn(**dyn, **static)

            closed = jax.make_jaxpr(dyn_fn)(dynamic)
            jaxpr = closed.jaxpr

            @jax.jit
            def runner(consts_, flat_):
                return jax.core.eval_jaxpr(jaxpr, consts_, *flat_)

            out_tree = jax.tree.structure(jax.eval_shape(dyn_fn, dynamic))
            aot_cache[key] = (runner, list(closed.consts), out_tree)
        runner, consts, out_tree = aot_cache[key]
        flat_in = jax.tree.leaves(dynamic)
        return jax.tree.unflatten(out_tree, runner(consts, flat_in))

    # number of dispatch-cache errors seen; once the bug RECURS the fast
    # path is considered poisoned for good and calls go straight to the
    # cached consts-as-args runner.  (clear_cache+retry fixes a one-off,
    # but when the poisoned state re-forms on every call the retry turns
    # into a full recompile per call — measured ~13 s/frame on CPU.)
    state = {"errors": 0}

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if _force_fallback or state["errors"] >= 2:
            return run_fallback(args, kwargs)
        try:
            return jitted(*args, **kwargs)
        except (ValueError, TypeError) as e:
            if not is_dispatch_cache_error(e):
                raise
            state["errors"] += 1
            import sys as _sys
            print(f"[jitfix] dispatch-cache error #{state['errors']} in "
                  f"{getattr(fn, '__name__', fn)}: recovering "
                  f"({'fallback' if state['errors'] >= 2 else 'recompile'})",
                  file=_sys.stderr, flush=True)
        try:
            jitted.clear_cache()
            return jitted(*args, **kwargs)
        except (ValueError, TypeError) as e:
            if not is_dispatch_cache_error(e):
                raise
            state["errors"] += 1
        return run_fallback(args, kwargs)

    wrapper.clear_cache = jitted.clear_cache  # pass-through for callers
    return wrapper
