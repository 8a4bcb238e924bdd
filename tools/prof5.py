# Decisive microbench: scalar outputs + np.asarray (forces true completion;
# 4-byte transfer), varying args, per-iter via trip-count differencing.
import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from functools import partial


@partial(jax.jit, static_argnames=("t_iters",))
def loop_gather(table, idx0, t_iters):
    n_rows = table.shape[0]

    def body(st):
        i, idx, acc = st
        g = table[idx]
        s = jnp.sum(g, axis=1)
        acc = acc + s
        idx = (idx + s.astype(jnp.int32) % 7 + 1) % n_rows
        return i + 1, idx, acc

    _, idx, acc = jax.lax.while_loop(lambda st: st[0] < t_iters, body,
                                     (0, idx0, jnp.zeros(idx0.shape)))
    return jnp.sum(acc)  # scalar: forces the whole chain, tiny transfer


def tmin(fn, argmaker, reps=3):
    o = fn(*argmaker(0)); _ = np.asarray(o)
    ts = []
    for r in range(1, reps + 1):
        a = argmaker(r); jax.block_until_ready(a)
        t0 = time.perf_counter()
        o = fn(*a); _ = np.asarray(o)
        ts.append(time.perf_counter() - t0)
    return min(ts)


k = jax.random.PRNGKey(0)
print("== in-loop gather per-iter (T=8 vs T=40 differencing) ==", flush=True)
print(f"{'rows':>7} {'w':>4} {'n':>8} {'ms/iter':>8} {'ns/ray':>7} {'GB/s':>7} "
      f"{'t8_ms':>7}", flush=True)
for n_rows, w in ((16384, 16), (16384, 64), (16384, 128), (262144, 64)):
    table = jax.random.normal(k, (n_rows, w), jnp.float32)
    for n in (32768, 262144, 2097152):
        mk = lambda r, T: (table, jax.random.randint(
            jax.random.fold_in(k, 997 * T + r), (n,), 0, n_rows), T)
        t8 = tmin(loop_gather, lambda r: mk(r, 8))
        t40 = tmin(loop_gather, lambda r: mk(r, 40))
        per = (t40 - t8) / 32
        print(f"{n_rows:>7} {w:>4} {n:>8} {per*1e3:>8.3f} {per/n*1e9:>7.1f} "
              f"{n*w*4/max(per,1e-9)/1e9:>7.1f} {t8*1e3:>7.1f}", flush=True)

print("== standalone: argsort / compact-stacked / compact-34 (scalarized) ==",
      flush=True)


@jax.jit
def asort_s(key):
    return jnp.sum(jnp.argsort(key))


@jax.jit
def compact34_s(mask, stacked):
    n = mask.shape[0]
    live = jnp.cumsum(mask.astype(jnp.int32))
    n_live = live[-1]
    dead = jnp.cumsum((~mask).astype(jnp.int32))
    pos = jnp.where(mask, live - 1, n_live + dead - 1)
    perm = jnp.zeros((n,), jnp.int32).at[pos].set(jnp.arange(n, dtype=jnp.int32))
    return jnp.sum(stacked[perm]) + n_live


@jax.jit
def compact_list_s(mask, arrs):
    n = mask.shape[0]
    live = jnp.cumsum(mask.astype(jnp.int32))
    n_live = live[-1]
    dead = jnp.cumsum((~mask).astype(jnp.int32))
    pos = jnp.where(mask, live - 1, n_live + dead - 1)
    perm = jnp.zeros((n,), jnp.int32).at[pos].set(jnp.arange(n, dtype=jnp.int32))
    acc = 0.0
    for a in arrs:
        acc = acc + jnp.sum(a[perm])
    return acc + n_live


for n in (524288, 2097152):
    mk = lambda r: (jax.random.randint(jax.random.fold_in(k, r), (n,), 0, 1 << 21),)
    print(f"argsort n={n}: {tmin(asort_s, mk)*1e3:.2f} ms", flush=True)
    stacked = jax.random.normal(k, (n, 34), jnp.float32)
    mk2 = lambda r: (jax.random.uniform(jax.random.fold_in(k, 50 + r), (n,)) < 0.5,
                     stacked)
    print(f"compact (n,34) stacked n={n}: {tmin(compact34_s, mk2)*1e3:.2f} ms",
          flush=True)
    arrs = [jax.random.normal(jax.random.fold_in(k, 100 + i), (n,))
            for i in range(34)]
    mk3 = lambda r: (jax.random.uniform(jax.random.fold_in(k, 80 + r), (n,)) < 0.5,
                     arrs)
    print(f"compact 34 arrays n={n}: {tmin(compact_list_s, mk3)*1e3:.2f} ms",
          flush=True)

print("PROF5 DONE", flush=True)
