# Round-3: does the <8 MB small-table gather advantage (CLAUDE.md pitfall
# 4, measured standalone in prof13) hold INSIDE a lockstep while_loop body
# — the XLA phased traversal's per-iteration wall?  If in-loop row gathers
# from a ~4 MB table are much cheaper than from the bench scene's 8.3 MB
# one, a 32-lane packed traversal table would transform the XLA path's
# cost on dense incoherent waves.
import sys, time

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

CHUNK = 262144
ITERS = 48


def loop_fn(rows_r, width):
    @jax.jit
    def f(tab, idx0, salt):
        def body(st):
            i, idx, acc = st
            rowT = jax.lax.dot_general(
                jnp.eye(width, dtype=jnp.float32), tab[idx],
                (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)  # (width, CHUNK)
            nxt = rowT[0].astype(jnp.int32)
            acc = acc + rowT[1] * rowT[2] + rowT[width - 1]
            idx = (nxt + idx + i) % rows_r
            return i + 1, idx, acc

        _, _, acc = jax.lax.while_loop(lambda st: st[0] < ITERS, body,
                                       (jnp.int32(0), idx0, salt))
        return acc.sum()
    return f


k = jax.random.PRNGKey(0)
for rows in (16384, 32768, 65536, 131072):
    for width in (16, 32, 64):
        mb = rows * width * 4 / 2**20
        tab = jax.random.uniform(k, (rows, width), jnp.float32)
        tab = tab.at[:, 0].set(
            jax.random.randint(jax.random.fold_in(k, 1), (rows,), 0,
                               rows).astype(jnp.float32))
        f = loop_fn(rows, width)
        idx0 = jax.random.randint(jax.random.fold_in(k, 2), (CHUNK,), 0, rows)
        _ = np.asarray(f(tab, idx0, jnp.zeros((CHUNK,))))
        ts = []
        for r in range(3):
            salt = jnp.full((CHUNK,), r * 1e-3, jnp.float32)
            t0 = time.perf_counter()
            _ = np.asarray(f(tab, idx0, salt))
            ts.append(time.perf_counter() - t0)
        dt = (min(ts) - 0.028) * 1e3
        print(f"rows {rows:7d} width {width:3d} ({mb:5.1f} MB): "
              f"{dt:7.1f} ms  {dt/ITERS*1000:6.0f} us/iter  "
              f"{dt/ITERS/CHUNK*1e6:5.2f} ns/ray/iter", flush=True)
print("PROF33 DONE", flush=True)
