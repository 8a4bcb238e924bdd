# Round-3 retest: does the remote tpu_compile_helper now accept
# make_async_copy (explicit row DMA from an ANY-space table into VMEM
# scratch inside a fori_loop)?  Round 2 got an HTTP 500 with no diagnostics
# — if this now compiles, the ray-stream queue kernel (docs/PERFORMANCE.md
# roadmap) is unblocked for incoherent waves and >VMEM tables.
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, CW = 4096, 128


def kernel(tab_any, x_ref, o_ref, row_vmem, sem):
    def body(i, carry):
        idx, acc = carry
        cp = pltpu.make_async_copy(tab_any.at[idx], row_vmem, sem)
        cp.start()
        cp.wait()
        row = row_vmem[:]
        nidx = row[0].astype(jnp.int32)
        acc = acc + jnp.maximum(x_ref[:] * row[2], row[3])
        return nidx, acc

    _, acc = jax.lax.fori_loop(0, 24, body, (jnp.int32(0),
                                             jnp.zeros_like(x_ref)))
    o_ref[:] = acc


def run(interpret):
    k = jax.random.PRNGKey(0)
    tab = jax.random.uniform(k, (R, CW), jnp.float32)
    nxt = jax.random.randint(jax.random.fold_in(k, 1), (R,), 0, R)
    tab = tab.at[:, 0].set(nxt.astype(jnp.float32))
    x = jax.random.uniform(jax.random.fold_in(k, 2), (8, 128), jnp.float32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((CW,), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )
    t0 = time.perf_counter()
    out = np.asarray(f(tab, x))
    print(f"ok in {time.perf_counter()-t0:.1f}s; out[0,0]={out[0,0]:.4f}",
          flush=True)


if __name__ == "__main__":
    interpret = len(sys.argv) > 1 and sys.argv[1] == "interpret"
    if interpret:
        jax.config.update("jax_platforms", "cpu")
    print("backend:", jax.default_backend(), "interpret:", interpret,
          flush=True)
    run(interpret)
    print("PROF27 DMA OK", flush=True)
