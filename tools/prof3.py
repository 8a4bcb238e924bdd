# Microbench: in-loop gather cost model on the real TPU.
#   cost(iter) = f(n_rays, row_width, table_size)?
# Also: standalone compaction-permutation cost, argsort cost.
import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from functools import partial

T_ITERS = 32


@partial(jax.jit, static_argnames=("t_iters",))
def loop_gather(table, idx0, t_iters):
    n_rows = table.shape[0]

    def body(st):
        i, idx, acc = st
        g = table[idx]  # (n, w) gather
        s = jnp.sum(g, axis=1)  # consume every lane
        acc = acc + s
        # serialized, data-dependent next index
        idx = (idx + s.astype(jnp.int32) % 7 + 1) % n_rows
        return i + 1, idx, acc

    def cond(st):
        return st[0] < t_iters

    _, idx, acc = jax.lax.while_loop(cond, body, (0, idx0, jnp.zeros(idx0.shape)))
    return acc


def run(tag, fn, argmaker, iters=1):
    # axon dedupes repeated executions with identical args: vary args per call
    # and force a host round-trip of the result.
    o = fn(*argmaker(0))
    _ = np.asarray(jax.tree.leaves(o)[0])
    ts = []
    for r in range(1, 4):
        a = argmaker(r)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        o = fn(*a)
        _ = np.asarray(jax.tree.leaves(o)[0])
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / iters
    return dt, o


def main():
    k = jax.random.PRNGKey(0)
    print("== in-loop gather cost (ms/iter) ==", flush=True)
    print(f"{'rows':>8} {'width':>6} {'n':>8} {'ms/iter':>9} {'GB/s':>7}",
          flush=True)
    for n_rows in (16384,):
        for w in (16, 32, 64, 128):
            table = jax.random.normal(k, (n_rows, w), jnp.float32)
            for n in (32768, 262144, 1048576):
                mk = lambda r: (table, jax.random.randint(
                    jax.random.fold_in(k, n + r), (n,), 0, n_rows), T_ITERS)
                dt, _ = run("g", loop_gather, mk, iters=T_ITERS)
                gbs = n * w * 4 / dt / 1e9
                print(f"{n_rows:>8} {w:>6} {n:>8} {dt*1e3:>9.3f} {gbs:>7.1f}",
                      flush=True)

    print("== standalone compaction: partition-perm + gather 34 arrays ==",
          flush=True)

    @jax.jit
    def compact(mask, arrs):
        n = mask.shape[0]
        live = jnp.cumsum(mask.astype(jnp.int32))
        n_live = live[-1]
        dead = jnp.cumsum((~mask).astype(jnp.int32))
        pos = jnp.where(mask, live - 1, n_live + dead - 1)
        perm = jnp.zeros((n,), jnp.int32).at[pos].set(
            jnp.arange(n, dtype=jnp.int32))
        return [a[perm] for a in arrs], n_live

    for n in (524288, 2 * 1024 * 1024):
        arrs = [jax.random.normal(jax.random.fold_in(k, i), (n,))
                for i in range(34)]
        mk = lambda r: (jax.random.uniform(jax.random.fold_in(k, 99 + r),
                                           (n,)) < 0.5, arrs)
        dt, _ = run("c", compact, mk)
        print(f"n={n}: {dt*1e3:.2f} ms  ({n*34*4/dt/1e9:.0f} GB/s)", flush=True)

    print("== standalone argsort (morton-style key) ==", flush=True)

    @jax.jit
    def asort(key):
        return jnp.argsort(key)

    for n in (524288, 2 * 1024 * 1024):
        mk = lambda r: (jax.random.randint(jax.random.fold_in(k, r), (n,),
                                           0, 1 << 21),)
        dt, _ = run("s", asort, mk)
        print(f"n={n}: {dt*1e3:.2f} ms", flush=True)

    print("PROF3 DONE", flush=True)


main()
