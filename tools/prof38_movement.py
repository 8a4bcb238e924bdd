# Round-3: price the compaction DATA MOVEMENT alone on the real chip.
# The fake-walk probe (prof37) showed the frame is ~790 ms traversal
# dispatch vs ~180 ms everything-else, while the lockstep sim says the
# kernels account for only ~150-250 ms — so the argsort + gather +
# scatter machinery around them is suspect.  Times, at 2.07M lanes:
#   * key construction + jnp.argsort(int32)
#   * the (m*1024, 8) row gather + MXU transposes for each ladder rung
#   * 5 scalar scatters back
import os, sys, time

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)
N = 1920 * 1080


def tmin(f, *args, reps=3):
    _ = np.asarray(f(jnp.float32(0.0), *args))
    ts = []
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        _ = np.asarray(f(jnp.float32(r), *args))
        ts.append(time.perf_counter() - t0)
    return (min(ts) - 0.028) * 1e3


k = jax.random.PRNGKey(0)
keys32 = jax.random.randint(k, (N,), 0, 1 << 28, jnp.int32)
f8 = jax.random.uniform(jax.random.fold_in(k, 1), (8, N), jnp.float32)


@jax.jit
def just_argsort(r, keys):
    ids = jnp.argsort(keys ^ (r * 0).astype(jnp.int32), stable=True)
    return ids[::65536].sum()


@jax.jit
def argsort_take(r, keys):
    ids = jnp.argsort(keys ^ (r * 0).astype(jnp.int32), stable=True)
    return ids.astype(jnp.float32).sum() * 1e-9 + r


def gather_mxu(m):
    @jax.jit
    def f(r, keys, cols):
        ids = jnp.argsort(keys, stable=True)[:m * 1024]
        eye8 = jnp.eye(8, dtype=jnp.float32)
        big = jax.lax.dot_general(cols + r * 1e-9, eye8,
                                  (((0,), (0,)), ((), ())),
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
        blk = big[ids]
        bT = jax.lax.dot_general(eye8, blk, (((1,), (1,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
        return bT[0].sum() + bT[7].sum()
    return f


def scatters(m):
    @jax.jit
    def f(r, keys, cols):
        ids = jnp.argsort(keys, stable=True)[:m * 1024]
        vals = cols[0, :m * 1024] + r * 1e-9
        outs = []
        for j in range(5):
            outs.append(jnp.zeros((N,)).at[ids].set(vals + j,
                                                    unique_indices=True))
        return sum(o[::65536].sum() for o in outs)
    return f


print(f"argsort(int32, {N}) only      : "
      f"{tmin(just_argsort, keys32):7.1f} ms", flush=True)
print(f"argsort + materialize ids     : "
      f"{tmin(argsort_take, keys32):7.1f} ms", flush=True)
for m in (256, 1024, 1408, 2047):
    t_g = tmin(gather_mxu(m), keys32, f8)
    t_s = tmin(scatters(m), keys32, f8)
    print(f"rung {m:5d}: argsort+gather+2xMXU {t_g:7.1f} ms   "
          f"argsort+5 scatters {t_s:7.1f} ms", flush=True)
print("PROF38 DONE", flush=True)
