# Feasibility probe for the packet-traversal kernel mechanics on this
# image's Mosaic/tpu_compile_helper:
#   P1: scalar-indexed ROW read from a VMEM-resident table (dynamic idx)
#   P2: data-dependent while_loop with an SMEM scalar stack
#   P3: broadcasting dynamically-sliced row elements against an (8,128) block
# Usage: python tools/pallas_probe.py [interpret]
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = len(sys.argv) > 1 and sys.argv[1] == "interpret"
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

R, CW = 512, 64  # table rows x width


def kernel(tab_ref, x_ref, o_ref, *, depth):
    # walk: idx = int(x mean) chain through the table, block-uniform
    def body(i, carry):
        idx, acc = carry
        row = tab_ref[idx]  # (64,) dynamic scalar-indexed row read
        # next index: element 0 of the row (block-uniform scalar)
        nidx = row[0].astype(jnp.int32)
        # broadcast elements 2..7 against the ray block
        lo = row[2]
        hi = row[3]
        acc = acc + jnp.maximum(x_ref[:] * lo, hi)
        return nidx, acc

    idx0 = jnp.int32(0)
    acc0 = jnp.zeros_like(x_ref)
    _, acc = jax.lax.fori_loop(0, depth, body, (idx0, acc0))
    o_ref[:] = acc


def run():
    k = jax.random.PRNGKey(0)
    tab = jax.random.uniform(k, (R, CW), jnp.float32)
    # element 0 encodes "next row" as float value
    nxt = jax.random.randint(jax.random.fold_in(k, 1), (R,), 0, R)
    tab = tab.at[:, 0].set(nxt.astype(jnp.float32))
    x = jax.random.uniform(jax.random.fold_in(k, 2), (8, 128), jnp.float32)

    f = pl.pallas_call(
        lambda t, xr, orf: kernel(t, xr, orf, depth=20),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )
    out = f(tab, x)
    out = np.asarray(out)
    print("P1-P3 OK:", out.shape, float(out.sum()), flush=True)

    # oracle
    idx = 0
    acc = np.zeros((8, 128), np.float32)
    tn = np.asarray(tab)
    xn = np.asarray(x)
    for i in range(20):
        row = tn[idx]
        acc = acc + np.maximum(xn * row[2], row[3])
        idx = int(row[0])
    err = np.abs(acc - out).max()
    print("oracle max err:", err, flush=True)
    assert err < 1e-4


run()
print("PROBE DONE", flush=True)
