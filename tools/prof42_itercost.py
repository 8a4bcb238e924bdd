# Round-4 on-chip microprobe: decompose the packet kernel's ~0.9 us/
# iteration cost (prof41 found the primary wave is per-iteration-cost
# bound: 13.7 iters/block x 2025 blocks x ~0.9 us ~= the measured 25.5 ms
# closest-hit, while the VPU work alone accounts for ~0.35 us).
#
# Method: standalone pallas kernels over one (8,128) ray block per grid
# step, looping a FIXED K iterations over a synthetic resident row table
# with a chosen body; the slope of time vs K is the per-iteration cost of
# that body.  Bodies:
#   fetch      pop a precomputed node id, read row[0] only (loop + scalar
#              stack + row-fetch dependency stall)
#   fetch2     same but TWO independent row fetches per iteration (tests
#              whether the fetch latency pipelines)
#   internal   full 8-child slab test + reductions (no sort, no push)
#   sort       internal + Batcher sort + 8 conditional pushes (sp reset
#              each iter) == the real internal body
#   leaf2/leaf6/leaf12  Moller-Trumbore tests on 2/6/12 triangles + state
#              updates (12 == a candidate two-leaf iteration)
#
# Run on the real chip: python tools/prof42_itercost.py
import functools
import os, sys, time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from buas_pathtracer_tpu.ops.pallas_packet import (BS, BL, _SORT_PAIRS, BIG_T)

INTERP = os.environ.get("PROF42_INTERPRET", "0") == "1"  # CPU smoke
NB = 2 if INTERP else 64     # blocks per launch (grid steps)
ROWS = 4096                  # synthetic table rows
ROW_W = 64


def make_kernel(body: str, K: int):
    def kernel(rows_ref, ox, oy, oz, dx, dy, dz, out, stack):
        o = (ox[:], oy[:], oz[:])
        d = (dx[:], dy[:], dz[:])
        inv = tuple(1.0 / jnp.where(jnp.abs(c) > 1e-12, c, 1e12) for c in d)
        acc0 = jnp.zeros((BS, BL), jnp.float32)

        # preload a fake stack of node ids (block-varying, data-dependent)
        base = pl.program_id(0) * 7

        def loop(i, carry):
            acc, t, sp = carry
            cur = stack[jnp.bitwise_and(sp, 63)]
            sp = sp + 1
            row = rows_ref[(cur + base + i) % ROWS]
            if body == "fetch":
                acc = acc + row[0]
                return acc, t, sp
            if body == "fetch2":
                row2 = rows_ref[(cur + base + i + 17) % ROWS]
                acc = acc + row[0] + row2[0]
                return acc, t, sp
            if body == "sort2":
                # TWO independent internal+sort+push chains per iteration
                # (different rows, disjoint stack regions): measures how
                # much ILP the ~8 ns/op serialized body recovers when two
                # dependency chains interleave.  Per-NODE cost = slope/2.
                cur2 = stack[jnp.bitwise_and(sp, 63) + 64]
                row2 = rows_ref[(cur2 + base + i + 31) % ROWS]
                accs = []
                for (rw, lo) in ((row, 32), (row2, 80)):
                    keys = []
                    for c in range(8):
                        s = 2 + 6 * c
                        t1x = (rw[s + 0] - o[0]) * inv[0]
                        t2x = (rw[s + 3] - o[0]) * inv[0]
                        t1y = (rw[s + 1] - o[1]) * inv[1]
                        t2y = (rw[s + 4] - o[1]) * inv[1]
                        t1z = (rw[s + 2] - o[2]) * inv[2]
                        t2z = (rw[s + 5] - o[2]) * inv[2]
                        tn = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                                     jnp.minimum(t1y, t2y)),
                                         jnp.minimum(t1z, t2z))
                        tf = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                                     jnp.maximum(t1y, t2y)),
                                         jnp.maximum(t1z, t2z))
                        hit = (tn < tf) & (tf > 0.0) & (tn < t)
                        tmin = jnp.min(jnp.where(hit, jnp.maximum(tn, 0.0),
                                                 BIG_T))
                        keys.append(jnp.where(tmin < BIG_T, tmin,
                                              jnp.float32(BIG_T * 2.0)))
                    pays = [jnp.int32(c) for c in range(8)]
                    for (a, b) in _SORT_PAIRS:
                        swap = keys[a] > keys[b]
                        ka = jnp.where(swap, keys[b], keys[a])
                        kb = jnp.where(swap, keys[a], keys[b])
                        pa = jnp.where(swap, pays[b], pays[a])
                        pb = jnp.where(swap, pays[a], pays[b])
                        keys[a], keys[b], pays[a], pays[b] = ka, kb, pa, pb
                    spw = jnp.bitwise_and(sp, 31) + lo
                    for j in range(7, -1, -1):
                        ok = keys[j] < BIG_T * 2.0
                        idx = jnp.where(ok, spw, jnp.int32(127))
                        stack[idx] = jnp.where(ok, pays[j] + 1, stack[idx])
                        spw = spw + ok.astype(jnp.int32)
                    accs.append(keys[0])
                acc = acc + accs[0] + accs[1]
                return acc, t, sp
            if body in ("internal", "sort", "rank", "stores8", "sortnc",
                        "sortst", "push1", "omask", "sortpk"):
                keys = []
                vkeys = []
                for c in range(8):
                    s = 2 + 6 * c
                    t1x = (row[s + 0] - o[0]) * inv[0]
                    t2x = (row[s + 3] - o[0]) * inv[0]
                    t1y = (row[s + 1] - o[1]) * inv[1]
                    t2y = (row[s + 4] - o[1]) * inv[1]
                    t1z = (row[s + 2] - o[2]) * inv[2]
                    t2z = (row[s + 5] - o[2]) * inv[2]
                    tn = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                                 jnp.minimum(t1y, t2y)),
                                     jnp.minimum(t1z, t2z))
                    tf = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                                 jnp.maximum(t1y, t2y)),
                                     jnp.maximum(t1z, t2z))
                    hit = (tn < tf) & (tf > 0.0) & (tn < t)
                    vkeys.append(jnp.where(hit, jnp.maximum(tn, 0.0),
                                           jnp.float32(BIG_T * 2.0)))
                    tmin = jnp.min(jnp.where(hit, jnp.maximum(tn, 0.0),
                                             BIG_T))
                    keys.append(jnp.where(tmin < BIG_T, tmin,
                                          jnp.float32(BIG_T * 2.0)))
                if body == "rank":
                    # rank-based ordered push: slot = sp + (# hit children
                    # with strictly greater key, ties by index).  Nearest
                    # child gets the top slot (popped first) — same order
                    # as the Batcher network, but the 28 pairwise compares
                    # are dependency-FREE (the 19-stage select chain is
                    # serial), so the scalar unit can pipeline them.
                    hits = [k < BIG_T * 2.0 for k in keys]
                    spw = jnp.bitwise_and(sp, 31) + 32
                    for c in range(8):
                        r = jnp.int32(0)
                        for c2 in range(8):
                            if c2 == c:
                                continue
                            gt = ((keys[c2] > keys[c])
                                  | ((keys[c2] == keys[c]) & (c2 > c)))
                            r = r + (gt & hits[c2]).astype(jnp.int32)
                        ok = hits[c]
                        idx = jnp.where(ok, spw + r, jnp.int32(127))
                        stack[idx] = jnp.where(ok, jnp.int32(c + 1),
                                               stack[idx])
                if body == "sortpk":
                    # packed-key network: fold the 3-bit child payload into
                    # the key's low mantissa bits (keys are >= 0 so float
                    # order == int order of the bit patterns) and sort ONE
                    # int array with min/max — no 4-way select swaps.
                    # Mosaic can't bitcast scalars, so bitcast the (8,128)
                    # VECTOR and min-reduce in the int domain (identical
                    # order for non-negative floats).
                    iks = []
                    for c in range(8):
                        ik = jnp.min(jax.lax.bitcast_convert_type(
                            vkeys[c], jnp.int32))
                        iks.append(jnp.bitwise_or(
                            jnp.bitwise_and(ik, jnp.int32(~7)),
                            jnp.int32(c)))
                    for (a, b) in _SORT_PAIRS:
                        lo_ = jnp.minimum(iks[a], iks[b])
                        hi_ = jnp.maximum(iks[a], iks[b])
                        iks[a], iks[b] = lo_, hi_
                    big = jnp.int32(int(np.float32(BIG_T * 2.0)
                                        .view(np.int32)))
                    spw = jnp.bitwise_and(sp, 31) + 32
                    for j in range(7, -1, -1):
                        ok = iks[j] < big
                        idx = jnp.where(ok, spw, jnp.int32(127))
                        stack[idx] = jnp.bitwise_and(iks[j], 7) + 1
                        spw = spw + ok.astype(jnp.int32)
                    acc = acc + keys[0]
                    return acc, t, sp
                if body == "omask":
                    # CANDIDATE internal step without the per-iteration
                    # sort: pack the 8 hit bits into one int (vector 0-d
                    # chain), bounce it through SMEM to force ONE
                    # vector->scalar boundary, then push in the order of a
                    # BUILD-TIME octant perm (row lane 58 stands in
                    # cost-wise) with pure scalar-side bit tests.  The
                    # octant/reverse flag is loop-invariant in the real
                    # kernel; modeled by an SMEM read here.
                    m = jnp.int32(0)
                    for c in range(8):
                        ok = keys[c] < BIG_T * 2.0
                        m = m + jnp.where(ok, jnp.int32(1 << c),
                                          jnp.int32(0))
                    stack[125] = m
                    ms = stack[125]
                    perm = row[58].astype(jnp.int32)
                    base_c = row[1].astype(jnp.int32)
                    rev = stack[126] > 0
                    spw = jnp.bitwise_and(sp, 31) + 32
                    for j in range(8):
                        pa = jnp.bitwise_and(
                            jax.lax.shift_right_logical(perm, 3 * j), 7)
                        pb = jnp.bitwise_and(
                            jax.lax.shift_right_logical(perm, 3 * (7 - j)),
                            7)
                        cj = jnp.where(rev, pb, pa)
                        okb = jnp.bitwise_and(
                            jax.lax.shift_right_logical(ms, cj), 1)
                        idx = jnp.where(okb > 0, spw, jnp.int32(127))
                        stack[idx] = base_c + cj
                        spw = spw + okb
                if body == "stores8":
                    # 8 unconditional dynamic stores, NO ordering network:
                    # isolates raw store cost from the sort.
                    spw = jnp.bitwise_and(sp, 31) + 32
                    for j in range(8):
                        stack[spw + j] = jnp.int32(j + 1)
                if body in ("sort", "sortnc", "sortst", "push1"):
                    pays = [jnp.int32(c) for c in range(8)]
                    for (a, b) in _SORT_PAIRS:
                        swap = keys[a] > keys[b]
                        ka = jnp.where(swap, keys[b], keys[a])
                        kb = jnp.where(swap, keys[a], keys[b])
                        pa = jnp.where(swap, pays[b], pays[a])
                        pb = jnp.where(swap, pays[a], pays[b])
                        keys[a], keys[b], pays[a], pays[b] = ka, kb, pa, pb
                    spw = jnp.bitwise_and(sp, 31) + 32
                    if body == "sort":
                        for j in range(7, -1, -1):
                            ok = keys[j] < BIG_T * 2.0
                            idx = jnp.where(ok, spw, jnp.int32(127))
                            stack[idx] = jnp.where(ok, pays[j] + 1,
                                                   stack[idx])
                            spw = spw + ok.astype(jnp.int32)
                    if body == "sortnc":
                        # same sorted conditional-slot push but the VALUE is
                        # stored unconditionally (junk slot 127 swallows
                        # non-hits) — no read-modify-write per store.
                        for j in range(7, -1, -1):
                            ok = keys[j] < BIG_T * 2.0
                            idx = jnp.where(ok, spw, jnp.int32(127))
                            stack[idx] = pays[j] + 1
                            spw = spw + ok.astype(jnp.int32)
                    if body == "sortst":
                        # static store indices: bounds the cost of index
                        # DYNAMISM (compact-on-pop would allow this form).
                        for j in range(8):
                            stack[32 + j] = pays[j] + 1
                    if body == "push1":
                        # pack the sorted hit-children order into ONE int32
                        # (4 bits per child: index+1, 0 = end) and store a
                        # single stack entry — the packed-push candidate.
                        packed = jnp.int32(0)
                        for j in range(8):
                            ok = keys[j] < BIG_T * 2.0
                            packed = jnp.where(
                                ok, packed * 16 + (pays[j] + 1), packed)
                        stack[spw] = packed
                acc = acc + keys[0]
                return acc, t, sp
            # leaf bodies: leafN = N Moller-Trumbore tests + state updates
            ntri = int(body[4:])
            t_l = t
            for k in range(ntri):
                s = 8 + 9 * (k % 6)
                ax_, ay_, az_ = row[s], row[s + 1], row[s + 2]
                e1x, e1y, e1z = row[s + 3], row[s + 4], row[s + 5]
                e2x, e2y, e2z = row[s + 6], row[s + 7], row[s + 8]
                pvx = d[1] * e2z - d[2] * e2y
                pvy = d[2] * e2x - d[0] * e2z
                pvz = d[0] * e2y - d[1] * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                ok = (det <= -1e-9) | (det >= 1e-9)
                inv_det = 1.0 / jnp.where(ok, det, 1.0)
                tvx, tvy, tvz = o[0] - ax_, o[1] - ay_, o[2] - az_
                v_ = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                ok = ok & (v_ >= 0.0) & (v_ <= 1.0)
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                w_ = (d[0] * qvx + d[1] * qvy + d[2] * qvz) * inv_det
                ok = ok & (w_ >= 0.0) & (v_ + w_ <= 1.0)
                t_new = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                ok = ok & (t_new >= 1e-9) & (t_l >= t_new)
                t_l = jnp.where(ok, t_new, t_l)
            acc = acc + t_l
            return acc, t_l, sp

        t0v = jnp.full((BS, BL), BIG_T)
        for i in range(8):
            stack[i] = jnp.int32(i + 1)
        acc, _, _ = jax.lax.fori_loop(
            0, K, loop, (acc0, t0v, jnp.int32(0)))
        out[:] = acc

    return kernel


def run(body, K, rows, rays):
    blk = lambda: pl.BlockSpec((None, BS, BL), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        make_kernel(body, K),
        out_shape=jax.ShapeDtypeStruct((NB, BS, BL), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(NB,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            + [blk() for _ in range(6)],
            out_specs=blk(),
            scratch_shapes=[pltpu.SMEM((128,), jnp.int32)],
        ),
        interpret=INTERP,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )
    g = jax.jit(lambda rw, *rs: f(rw, *rs).sum())
    _ = np.asarray(g(rows, *rays))  # compile+warm
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(g(rows + jnp.float32(r) * 1e-9, *rays))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.RandomState(0)
    rows = jnp.asarray(rng.rand(ROWS, ROW_W).astype(np.float32) * 4.0)
    rays = tuple(jnp.asarray(rng.rand(NB, BS, BL).astype(np.float32) - 0.5)
                 for _ in range(6))
    print(f"devices: {jax.devices()}", flush=True)
    K1, K2 = (2, 8) if INTERP else (64, 512)
    import sys as _s
    sel = _s.argv[1:] or ["fetch", "fetch2", "internal", "sort", "rank",
                          "stores8", "sortnc", "sortst", "push1",
                          "leaf2", "leaf6", "leaf12"]
    for body in sel:
        tA = run(body, K1, rows, rays)
        tB = run(body, K2, rows, rays)
        per = (tB - tA) / (K2 - K1) / NB * 1e9
        print(f"{body:9s}: K{K1} {tA*1e3:7.2f} ms  K{K2} {tB*1e3:7.2f} ms"
              f"  -> {per:7.1f} ns/iter/block", flush=True)
    print("PROF42 DONE", flush=True)


if __name__ == "__main__":
    main()
