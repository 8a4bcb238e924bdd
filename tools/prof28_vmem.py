# Round-3 probe: how big can the VMEM-resident BVH table actually get on
# this v5e chip?  The packet kernel's VMEM_TABLE_LIMIT_BYTES (= 45k rows,
# 11.5 MB) came from OOMs at the default 16 MB scoped-vmem cap; if the chip
# really has 128 MB of VMEM, raising vmem_limit_bytes may fit the 655k-tri
# stress scene's ~32 MB table with NO quantization at all.  Probe with the
# same structure as the real kernel: one resident table + an (8,128) block
# in/out per grid step, scalar-indexed row reads inside a loop.
import os, sys, time
sys.path.insert(0, "/root/repo")
import functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)


def kernel(tab_ref, x_ref, o_ref):
    def body(i, acc):
        row = tab_ref[(i * 9973) % tab_ref.shape[0]]
        return acc + row[0] + row[63]
    acc = jax.lax.fori_loop(0, 64, body, jnp.float32(0))
    o_ref[:] = x_ref[:] + acc


def run(rows_mb, limit_mb):
    rows = int(rows_mb * 1024 * 1024 / 256)
    tab = jnp.ones((rows, 64), jnp.float32)
    x = jnp.ones((4, 8, 128), jnp.float32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, 8, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(4,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec((None, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((None, 8, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=limit_mb * 1024 * 1024),
    )
    t0 = time.perf_counter()
    try:
        out = np.asarray(jax.jit(f)(tab, x))
        dt = time.perf_counter() - t0
        print(f"table {rows_mb:5.1f} MB (limit {limit_mb}): OK "
              f"sum0={out[0,0,0]:.0f} ({dt:.0f}s)", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"table {rows_mb:5.1f} MB (limit {limit_mb}): FAIL {msg}",
              flush=True)
        return False


for mb, lim in ((16, 32), (32, 48), (48, 64), (64, 96), (96, 120), (110, 128)):
    if not run(mb, lim):
        break
print("PROF28 DONE", flush=True)
