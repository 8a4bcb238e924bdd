# Round-4: is a complex64 scalar scatter priced per-INDEX (like f32) or
# per-BYTE?  If per-index, the compaction restore's 5 f32/i32 scatters
# (4.3 ms each at rung 1024, prof38 — the movement wall) can be packed as
# 2 complex64 + 1 int32 = 3 scatters.  Also prices int64 (likely 2x: TPU
# emulates 64-bit as lane pairs) and a bf16 pair baseline.
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
f1 = jax.random.uniform(jax.random.fold_in(k, 1), (N,), jnp.float32)
f2 = jax.random.uniform(jax.random.fold_in(k, 2), (N,), jnp.float32)


def scat(dtype, m):
    @jax.jit
    def f(r, keys, a, b):
        ids = jnp.argsort(keys, stable=True)[:m * 1024]
        va = a[:m * 1024] + r * 1e-9
        vb = b[:m * 1024]
        if dtype == "f32":
            out = jnp.zeros((N,)).at[ids].set(va, unique_indices=True)
            return out[::65536].sum()
        if dtype == "f32x2":
            o1 = jnp.zeros((N,)).at[ids].set(va, unique_indices=True)
            o2 = jnp.zeros((N,)).at[ids].set(vb, unique_indices=True)
            return o1[::65536].sum() + o2[::65536].sum()
        if dtype == "c64":
            v = jax.lax.complex(va, vb)
            out = jnp.zeros((N,), jnp.complex64).at[ids].set(
                v, unique_indices=True)
            s = out[::65536]
            return jnp.real(s).sum() + jnp.imag(s).sum()
        if dtype == "i64":
            v = va.astype(jnp.int32).astype(jnp.int64) + (
                vb.astype(jnp.int32).astype(jnp.int64) << 32)
            out = jnp.zeros((N,), jnp.int64).at[ids].set(
                v, unique_indices=True)
            return out[::65536].sum().astype(jnp.float32)
        raise ValueError(dtype)
    return f


for m in (256, 1024):
    row = [f"rung {m:4d}:"]
    for dt in ("f32", "f32x2", "c64", "i64"):
        try:
            t = tmin(scat(dt, m), keys32, f1, f2)
            row.append(f"{dt} {t:6.1f} ms")
        except Exception as e:  # dtype unsupported on backend
            row.append(f"{dt} FAIL({type(e).__name__})")
    print("  ".join(row), flush=True)
print("PROF46 DONE", flush=True)
