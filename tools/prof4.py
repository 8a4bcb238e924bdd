# Clean microbench: device-only timing (block_until_ready, no host transfer),
# varying args (axon dedupes identical executions), per-iter cost by
# differencing two trip counts (removes dispatch/sync fixed cost).
import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from functools import partial


@partial(jax.jit, static_argnames=("t_iters", "w"))
def loop_gather(table, idx0, t_iters, w):
    n_rows = table.shape[0]

    def body(st):
        i, idx, acc = st
        g = table[idx]  # (n, w) gather
        s = jnp.sum(g, axis=1)
        acc = acc + s
        idx = (idx + s.astype(jnp.int32) % 7 + 1) % n_rows
        return i + 1, idx, acc

    _, idx, acc = jax.lax.while_loop(lambda st: st[0] < t_iters, body,
                                     (0, idx0, jnp.zeros(idx0.shape)))
    return acc


def tmin(fn, argmaker, reps=4):
    o = fn(*argmaker(0)); jax.block_until_ready(o)
    ts = []
    for r in range(1, reps + 1):
        a = argmaker(r); jax.block_until_ready(a)
        t0 = time.perf_counter()
        o = fn(*a); jax.block_until_ready(o)
        ts.append(time.perf_counter() - t0)
    return min(ts)


k = jax.random.PRNGKey(0)
print("== in-loop gather: per-iter by differencing T=8 vs T=40 ==", flush=True)
print(f"{'rows':>7} {'w':>4} {'n':>8} {'ms/iter':>8} {'ns/ray':>7} {'GB/s':>6} "
      f"{'fixed_ms':>8}", flush=True)
for n_rows in (16384,):
    for w in (16, 64, 128):
        table = jax.random.normal(k, (n_rows, w), jnp.float32)
        for n in (32768, 262144, 1048576, 4194304):
            mk8 = lambda r: (table, jax.random.randint(
                jax.random.fold_in(k, 7 * n + r), (n,), 0, n_rows), 8, w)
            mk40 = lambda r: (table, jax.random.randint(
                jax.random.fold_in(k, 13 * n + r), (n,), 0, n_rows), 40, w)
            t8, t40 = tmin(loop_gather, mk8), tmin(loop_gather, mk40)
            per = (t40 - t8) / 32
            fixed = t8 - 8 * per
            print(f"{n_rows:>7} {w:>4} {n:>8} {per*1e3:>8.3f} "
                  f"{per/n*1e9:>7.1f} {n*w*4/per/1e9:>6.1f} {fixed*1e3:>8.2f}",
                  flush=True)

print("== standalone ops (device time, one call) ==", flush=True)


@jax.jit
def asort(key):
    return jnp.argsort(key)


@jax.jit
def compact34(mask, stacked):
    n = mask.shape[0]
    live = jnp.cumsum(mask.astype(jnp.int32))
    n_live = live[-1]
    dead = jnp.cumsum((~mask).astype(jnp.int32))
    pos = jnp.where(mask, live - 1, n_live + dead - 1)
    perm = jnp.zeros((n,), jnp.int32).at[pos].set(jnp.arange(n, dtype=jnp.int32))
    return stacked[perm], n_live


@jax.jit
def compact_list(mask, arrs):
    n = mask.shape[0]
    live = jnp.cumsum(mask.astype(jnp.int32))
    n_live = live[-1]
    dead = jnp.cumsum((~mask).astype(jnp.int32))
    pos = jnp.where(mask, live - 1, n_live + dead - 1)
    perm = jnp.zeros((n,), jnp.int32).at[pos].set(jnp.arange(n, dtype=jnp.int32))
    return [a[perm] for a in arrs], n_live


for n in (524288, 2097152):
    mk = lambda r: (jax.random.randint(jax.random.fold_in(k, r), (n,), 0, 1 << 21),)
    print(f"argsort n={n}: {tmin(asort, mk)*1e3:.2f} ms", flush=True)
    stacked = jax.random.normal(k, (n, 34), jnp.float32)
    mk2 = lambda r: (jax.random.uniform(jax.random.fold_in(k, 50 + r), (n,)) < 0.5,
                     stacked)
    print(f"compact (n,34) stacked n={n}: {tmin(compact34, mk2)*1e3:.2f} ms",
          flush=True)
    arrs = [jax.random.normal(jax.random.fold_in(k, 100 + i), (n,))
            for i in range(34)]
    mk3 = lambda r: (jax.random.uniform(jax.random.fold_in(k, 80 + r), (n,)) < 0.5,
                     arrs)
    print(f"compact 34 arrays n={n}: {tmin(compact_list, mk3)*1e3:.2f} ms",
          flush=True)

print("PROF4 DONE", flush=True)
