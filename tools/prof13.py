# Primitive costs for the phase-boundary machinery at npad=2M, NCOL=16.
import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

npad, NCOL = 2097152, 16
eye = jnp.eye(NCOL, dtype=jnp.float32)


def mk(r):
    k = jax.random.PRNGKey(r)
    big = jax.random.uniform(k, (npad, NCOL))
    done = jax.random.uniform(jax.random.fold_in(k, 1), (npad,)) < 0.5
    perm = jax.random.permutation(jax.random.fold_in(k, 2), npad)
    return big, done, perm.astype(jnp.int32)


@jax.jit
def f_argsort(big, done, perm):
    return jnp.argsort(done.astype(jnp.float32), stable=True).sum()


@jax.jit
def f_rowgather(big, done, perm):
    return big[perm].sum()


@jax.jit
def f_rowscatter(big, done, perm):
    return jnp.zeros_like(big).at[perm].set(big, unique_indices=True).sum()


@jax.jit
def f_cumsum_pos(big, done, perm):
    live = ~done
    kl = jnp.cumsum(live.astype(jnp.int32))
    kd = jnp.cumsum(done.astype(jnp.int32))
    pos = jnp.where(live, kl - 1, kl[-1] + kd - 1)
    return pos.sum()


@jax.jit
def f_boundary_gatherform(big, done, perm):
    # cumsum dests + scalar scatter of iota -> gather indices -> row gather
    live = ~done
    kl = jnp.cumsum(live.astype(jnp.int32))
    kd = jnp.cumsum(done.astype(jnp.int32))
    pos = jnp.where(live, kl - 1, kl[-1] + kd - 1)
    g = jnp.zeros((npad,), jnp.int32).at[pos].set(
        jnp.arange(npad, dtype=jnp.int32), unique_indices=True)
    return big[g].sum()


@jax.jit
def f_transpose(big, done, perm):
    bT = jax.lax.dot_general(eye, big, (((1,), (1,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
    return bT.sum()


@jax.jit
def f_restore5(big, done, perm):
    # final restore: transpose once, 5 scalar scatters
    bT = jax.lax.dot_general(eye, big, (((1,), (1,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)
    z = jnp.zeros((npad,), jnp.float32)
    outs = [z.at[perm].set(bT[i], unique_indices=True) for i in range(5)]
    return sum(o.sum() for o in outs)


@jax.jit
def f_gather12_full(big, done, perm):
    cols = [big[:, 0] + i for i in range(12)]
    return sum(cc[perm].sum() for cc in cols)


FNS = [("argsort f32 2M", f_argsort), ("row gather (2M,16)", f_rowgather),
       ("row scatter (2M,16)", f_rowscatter), ("cumsum pos", f_cumsum_pos),
       ("boundary gather-form", f_boundary_gatherform),
       ("MXU transpose 2Mx16", f_transpose),
       ("restore5 (T + 5 scatters)", f_restore5),
       ("12 scalar 2M gathers", f_gather12_full)]

for name, fn in FNS:
    a = mk(0)
    jax.block_until_ready(a)
    _ = np.asarray(fn(*a))
    ts = []
    for r in (1, 2, 3):
        a = mk(r)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        _ = np.asarray(fn(*a))
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s}: {min(ts)*1e3:7.1f} ms", flush=True)
print("PROF13 DONE", flush=True)
