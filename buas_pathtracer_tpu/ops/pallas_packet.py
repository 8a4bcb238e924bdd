"""Packet traversal: a Pallas TPU kernel walking the wide row BVH with one
(8,128) ray block per grid step.

Why this shape: every XLA formulation of per-ray traversal pays per-index
random-access latency for the node fetch (measured ~4 ns/ray/iteration at
best, plus whole-batch compaction passes, docs/PERFORMANCE.md round 2).  A
BLOCK-COHERENT walk (classic wide-SIMD "packet tracing", cf. the reference's
4-wide SSE packets, intersection.cpp:243-401) needs NO gathers at all: the
1024 rays of a block visit the union of their node sets in lockstep, the
current node index is a block-uniform SCALAR, and the row data loads as a
scalar-indexed VMEM row — supported directly by Mosaic.  Coherent blocks
(primary/shadow rays from neighboring pixels) visit ~2-4x the nodes of one
ray; fully-dead blocks skip the walk entirely, so late mostly-dead bounces
cost nothing without any compaction machinery.

The BVH table must fit VMEM (30 MB budget => ~120k 256-byte rows, measured
tools/prof28); larger scenes fall back to the XLA phased path
(ops/traverse_wide).  Tables, row layout, and hit
semantics are IDENTICAL to ops/wide_bvh.py / traverse_wide.py; parity is
enforced by tests/test_pallas_packet.py against the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.vec import Vec3
from ..models.scene import PRIM_SPHERE
from . import intersect
from .wide_bvh import (DMA_LEAF_K, KIND_EMPTY, KIND_INTERNAL, KIND_PRIM,
                       KIND_TRIS, WIDE, WIDE_LEAF)

BS, BL = 8, 128                 # ray block shape (sublanes, lanes)
BLOCK = BS * BL                 # 1024 rays per grid step
STACK = 192                     # block-shared stack bound (depth*W margin)
BIG_T = 1e30

_SORT_PAIRS = []                # Batcher network over the 8 child slots


def _batcher(n):
    pairs = []
    t = 1
    while t < n:
        t <<= 1
    p = t >> 1
    while p > 0:
        q, r, d = t >> 1, 0, p
        while True:
            for i in range(n - d):
                if (i & p) == r:
                    pairs.append((i, i + d))
            if q == p:
                break
            d, q, r = q - p, q >> 1, p
        p >>= 1
    return pairs


_SORT_PAIRS = _batcher(WIDE)
KEY_MISS = 0x7FFFFFFF  # python int: a module-level jnp scalar would be
                       # captured as a constant by pallas_call (rejected)


def _kernel(rows_ref, ox, oy, oz, dx, dy, dz, t0r, ignr,
            *out_refs, occlusion: bool):
    # stats ride out as TWO SMEM scalars per block [node_visits, tri_tests]
    # — always on.  (Round 2 gated stats behind with_stats because the
    # original stats output was an 8 KB double-buffered VMEM block per grid
    # step, which pushed 1080p frames over the scoped-vmem cap; two SMEM
    # words cost nothing, so the reference's live stats panel
    # (intersection.h:33-40, raytracer.cpp:2050-2057) works on the TPU
    # default path again — round-2 verdict item 6.)
    to, po, tro, bvo, bwo, so, stack = out_refs
    o = Vec3(ox[:], oy[:], oz[:])
    d = Vec3(dx[:], dy[:], dz[:])
    t_in = t0r[:]
    ign = ignr[:].astype(jnp.int32)  # exact float values < 2^24
    inv_d = intersect.safe_inv_dir(d)

    live0 = t_in >= 0.0
    any_live = jnp.any(live0)

    def walk(_):
        def cond(st):
            return st[0] > 0

        def body(st):
            sp, t, prim, tri, bv, bw, nv, tt, blocked_i = st
            blocked = blocked_i > 0  # carried as i32: Mosaic cannot yield
            # vector<i1> from a while loop
            sp = sp - 1
            cur = stack[sp]
            row = rows_ref[cur]  # (64,) block-uniform scalar-indexed read
            kind = row[0].astype(jnp.int32)
            # per-ray active = can still be improved (occlusion: not yet hit)
            active = live0 & ~blocked if occlusion else live0

            # ---------------- internal: push children any-hit-first --------
            child_base = row[1].astype(jnp.int32)
            keys = []
            for c in range(WIDE):
                s = 2 + 6 * c
                t1x = (row[s + 0] - o.x) * inv_d.x
                t2x = (row[s + 3] - o.x) * inv_d.x
                t1y = (row[s + 1] - o.y) * inv_d.y
                t2y = (row[s + 4] - o.y) * inv_d.y
                t1z = (row[s + 2] - o.z) * inv_d.z
                t2z = (row[s + 5] - o.z) * inv_d.z
                tn = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                             jnp.minimum(t1y, t2y)),
                                 jnp.minimum(t1z, t2z))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                             jnp.maximum(t1y, t2y)),
                                 jnp.maximum(t1z, t2z))
                hit_c = (tn < tf) & (tf > 0.0) & (tn < t) & active
                anyh = jnp.any(hit_c)
                # block-nearest key: min tn over hitting rays (scalar
                # bitcast is unsupported in Mosaic, so sort float keys with
                # an int payload swapped in parallel)
                tmin = jnp.min(jnp.where(hit_c, jnp.maximum(tn, 0.0), BIG_T))
                keys.append(jnp.where(anyh, tmin, jnp.float32(BIG_T * 2.0)))
            pays = [jnp.int32(c) for c in range(WIDE)]
            for (i, j) in _SORT_PAIRS:
                swap = keys[i] > keys[j]
                ki = jnp.where(swap, keys[j], keys[i])
                kj = jnp.where(swap, keys[i], keys[j])
                pi = jnp.where(swap, pays[j], pays[i])
                pj = jnp.where(swap, pays[i], pays[j])
                keys[i], keys[j], pays[i], pays[j] = ki, kj, pi, pj
            # push FARTHEST first so the nearest pops first (LIFO)
            is_int = kind == KIND_INTERNAL
            for j in range(WIDE - 1, -1, -1):
                ok = is_int & (keys[j] < BIG_T * 2.0) & (sp < STACK)
                slot = child_base + pays[j]
                # conditional scalar push (slot STACK is a scratch pad)
                idx = jnp.where(ok, sp, jnp.int32(STACK))
                stack[idx] = jnp.where(ok, slot, stack[idx])
                sp = sp + ok.astype(jnp.int32)

            # ---------------- triangle leaf --------------------------------
            is_tri = kind == KIND_TRIS
            count = row[1].astype(jnp.int32)
            tri_base = row[2].astype(jnp.int32)
            inst_t = row[3].astype(jnp.int32)
            not_ign = inst_t != ign
            hit_any_tri = jnp.zeros_like(active)
            for k in range(WIDE_LEAF):
                s = 8 + 9 * k
                ax_, ay_, az_ = row[s], row[s + 1], row[s + 2]
                e1x, e1y, e1z = row[s + 3], row[s + 4], row[s + 5]
                e2x, e2y, e2z = row[s + 6], row[s + 7], row[s + 8]
                pvx = d.y * e2z - d.z * e2y
                pvy = d.z * e2x - d.x * e2z
                pvz = d.x * e2y - d.y * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                ok = (det <= -intersect.TRI_EPS) | (det >= intersect.TRI_EPS)
                inv_det = 1.0 / jnp.where(ok, det, 1.0)
                tvx, tvy, tvz = o.x - ax_, o.y - ay_, o.z - az_
                v_ = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                ok = ok & (v_ >= 0.0) & (v_ <= 1.0)
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                w_ = (d.x * qvx + d.y * qvy + d.z * qvz) * inv_det
                ok = ok & (w_ >= 0.0) & (v_ + w_ <= 1.0)
                t_new = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                ok = ok & (t_new >= intersect.TRI_EPS) & (t >= t_new)
                h = ok & is_tri & not_ign & active & (k < count)
                t = jnp.where(h, t_new, t)
                prim = jnp.where(h, inst_t, prim)
                tri = jnp.where(h, tri_base + k, tri)
                bv = jnp.where(h, v_, bv)
                bw = jnp.where(h, w_, bw)
                hit_any_tri = hit_any_tri | h

            # ---------------- analytic prim row ----------------------------
            is_prim = (~is_int) & (~is_tri)
            prim_id = row[1].astype(jnp.int32)
            ptype = row[2].astype(jnp.int32)
            m = [row[4 + i] for i in range(12)]
            os_ox = m[0] * o.x + m[1] * o.y + m[2] * o.z + m[3]
            os_oy = m[4] * o.x + m[5] * o.y + m[6] * o.z + m[7]
            os_oz = m[8] * o.x + m[9] * o.y + m[10] * o.z + m[11]
            os_dx = m[0] * d.x + m[1] * d.y + m[2] * d.z
            os_dy = m[4] * d.x + m[5] * d.y + m[6] * d.z
            os_dz = m[8] * d.x + m[9] * d.y + m[10] * d.z
            os_o = Vec3(os_ox, os_oy, os_oz)
            os_d = Vec3(os_dx, os_dy, os_dz)
            hs, ts_ = intersect.sphere(os_o, os_d, row[16], t)
            hb, tb_ = intersect.box(os_o, os_d,
                                    Vec3(row[17], row[18], row[19]), t)
            sph = ptype == PRIM_SPHERE
            # NOTE: jnp.where on i1 vectors fails Mosaic legalization
            # ('arith.select' of vector<i1>); use boolean algebra instead
            ph = is_prim & (prim_id != ign) & active \
                & ((hs & sph) | (hb & ~sph))
            t = jnp.where(ph, jnp.where(sph, ts_, tb_), t)
            prim = jnp.where(ph, prim_id, prim)
            tri = jnp.where(ph, -1, tri)

            if occlusion:
                blocked = blocked | hit_any_tri | ph
                # all live rays blocked -> drain the stack (early exit)
                done = ~jnp.any(live0 & ~blocked)
                sp = jnp.where(done, 0, sp)

            nv = nv + jnp.sum(active.astype(jnp.int32))
            tt = tt + jnp.where(is_tri, count, 0) \
                * jnp.sum(active.astype(jnp.int32))
            return sp, t, prim, tri, bv, bw, nv, tt, blocked.astype(jnp.int32)

        stack[0] = jnp.int32(0)  # root
        st0 = (jnp.int32(1),
               jnp.where(live0, t_in, -1.0),
               jnp.full((BS, BL), -1, jnp.int32),
               jnp.full((BS, BL), -1, jnp.int32),
               jnp.zeros((BS, BL), jnp.float32),
               jnp.zeros((BS, BL), jnp.float32),
               jnp.int32(0),
               jnp.int32(0),
               jnp.zeros((BS, BL), jnp.int32))
        out = jax.lax.while_loop(cond, body, st0)
        return out

    def skip(_):
        return (jnp.int32(0),
                jnp.where(live0, t_in, -1.0),
                jnp.full((BS, BL), -1, jnp.int32),
                jnp.full((BS, BL), -1, jnp.int32),
                jnp.zeros((BS, BL), jnp.float32),
                jnp.zeros((BS, BL), jnp.float32),
                jnp.int32(0),
                jnp.int32(0),
                jnp.zeros((BS, BL), jnp.int32))

    _, t, prim, tri, bv, bw, nv, tt, _ = jax.lax.cond(any_live, walk, skip,
                                                      operand=None)
    to[:] = jnp.where(live0, t, t_in)
    po[:] = prim
    tro[:] = tri
    bvo[:] = bv
    bwo[:] = bw

    # stats accumulate into ONE (1, 2) SMEM block revisited by every grid
    # step (TPU grid steps are sequential, so += is race-free).  A per-step
    # (nb, 2) output is rejected by Mosaic's block-shape rule (last two dims
    # must divide (8, 128) or equal the array's) — observed on the real
    # chip; interpret mode accepted it.
    @pl.when(pl.program_id(0) == 0)
    def _init():
        so[0, 0] = jnp.int32(0)
        so[0, 1] = jnp.int32(0)

    so[0, 0] = so[0, 0] + nv
    so[0, 1] = so[0, 1] + tt


def _child_keys(row, o, inv_d, t, active, occlusion: bool):
    """Per-child block keys for an internal row: occlusion mode returns
    any-hit booleans (order-free), closest-hit returns block-nearest float
    keys (BIG_T*2 = no ray hits the child).  Shared by kernels v2/v4."""
    keys = []
    for c in range(WIDE):
        s = 2 + 6 * c
        t1x = (row[s + 0] - o.x) * inv_d.x
        t2x = (row[s + 3] - o.x) * inv_d.x
        t1y = (row[s + 1] - o.y) * inv_d.y
        t2y = (row[s + 4] - o.y) * inv_d.y
        t1z = (row[s + 2] - o.z) * inv_d.z
        t2z = (row[s + 5] - o.z) * inv_d.z
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                     jnp.minimum(t1y, t2y)),
                         jnp.minimum(t1z, t2z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                     jnp.maximum(t1y, t2y)),
                         jnp.maximum(t1z, t2z))
        hit_c = (tn < tf) & (tf > 0.0) & (tn < t) & active
        if occlusion:
            keys.append(jnp.any(hit_c))
        else:
            # ONE reduction per child: tmin == BIG_T iff no ray hit (tn < t
            # <= BIG_T is strict), so the separate any() reduction — 8 more
            # cross-lane reductions per iteration — is recomputed from it
            tmin = jnp.min(jnp.where(hit_c, jnp.maximum(tn, 0.0), BIG_T))
            keys.append(jnp.where(tmin < BIG_T, tmin,
                                  jnp.float32(BIG_T * 2.0)))
    return keys


# Packed-key ordered push (round 4, tools/prof42 on chip): the Batcher
# network on (key, payload) scalar pairs costs ~1030 ns/iteration on top of
# the slab math — and the cost is the op COUNT of the serialized 0-d
# compare/select chain itself (rank/omask/sortnc/sortst/push1 variants all
# measured ~equal; two interleaved chains recover only 8% ILP).  Folding
# the child index into the low mantissa bits of the non-negative float key
# and sorting ONE int array with min/max (no selects) measured 599 ns vs
# 1350 for the whole internal body — 2.26x.  Int order == float order for
# non-negative floats; masking the low bits perturbs keys by <= _PK_MASK
# ulps, which only permutes near-ties (traversal order never changes
# results, parity-tested).  Mosaic can't bitcast scalars, so the bitcast
# happens on the (8,128) vector BEFORE the min-reduction.
_PK_BITS = (WIDE - 1).bit_length()
_PK_MASK = (1 << _PK_BITS) - 1
_PK_SENT = int(np.float32(BIG_T * 2.0).view(np.int32)) & ~_PK_MASK
# v5 packs [child:_PK_BITS | kind:2] into the low bits
_PK5_MASK = (1 << (_PK_BITS + 2)) - 1
_PK5_SENT = int(np.float32(BIG_T * 2.0).view(np.int32)) & ~_PK5_MASK


def _child_keys_packed(row, o, inv_d, t, active):
    """Closest-hit per-child keys as packed int32s: bits [31:_PK_BITS] are
    the bit pattern of the block-nearest entry distance (BIG_T*2 = no ray
    hits the child), bits [_PK_BITS:0] the child index.  Sorting these with
    min/max yields the same nearest-first order as the float network."""
    iks = []
    for c in range(WIDE):
        s = 2 + 6 * c
        t1x = (row[s + 0] - o.x) * inv_d.x
        t2x = (row[s + 3] - o.x) * inv_d.x
        t1y = (row[s + 1] - o.y) * inv_d.y
        t2y = (row[s + 4] - o.y) * inv_d.y
        t1z = (row[s + 2] - o.z) * inv_d.z
        t2z = (row[s + 5] - o.z) * inv_d.z
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                     jnp.minimum(t1y, t2y)),
                         jnp.minimum(t1z, t2z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                     jnp.maximum(t1y, t2y)),
                         jnp.maximum(t1z, t2z))
        hit_c = (tn < tf) & (tf > 0.0) & (tn < t) & active
        vk = jnp.where(hit_c, jnp.maximum(tn, 0.0),
                       jnp.float32(BIG_T * 2.0))
        ik = jnp.min(jax.lax.bitcast_convert_type(vk, jnp.int32))
        iks.append(jnp.bitwise_or(jnp.bitwise_and(ik, jnp.int32(~_PK_MASK)),
                                  jnp.int32(c)))
    return iks


def _tri_updates(row, o, d, ign, active, t_l, prim_l, tri_l, bv_l, bw_l,
                 occlusion: bool, leaf_k: int = WIDE_LEAF):
    """Apply one triangle-leaf row to the per-ray best-hit state; returns
    the updated state + the leaf's triangle count.  Shared by v2/v4;
    ``leaf_k`` is the row's static tri-slot count (WIDE_LEAF for unified
    64-float rows, DMA_LEAF_K for the merged 128-float split-table rows)."""
    count = row[1].astype(jnp.int32)
    tri_base = row[2].astype(jnp.int32)
    inst_t = row[3].astype(jnp.int32)
    not_ign = inst_t != ign
    for k in range(leaf_k):
        s = 8 + 9 * k
        ax_, ay_, az_ = row[s], row[s + 1], row[s + 2]
        e1x, e1y, e1z = row[s + 3], row[s + 4], row[s + 5]
        e2x, e2y, e2z = row[s + 6], row[s + 7], row[s + 8]
        pvx = d.y * e2z - d.z * e2y
        pvy = d.z * e2x - d.x * e2z
        pvz = d.x * e2y - d.y * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        ok = (det <= -intersect.TRI_EPS) | (det >= intersect.TRI_EPS)
        inv_det = 1.0 / jnp.where(ok, det, 1.0)
        tvx, tvy, tvz = o.x - ax_, o.y - ay_, o.z - az_
        v_ = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        ok = ok & (v_ >= 0.0) & (v_ <= 1.0)
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        w_ = (d.x * qvx + d.y * qvy + d.z * qvz) * inv_det
        ok = ok & (w_ >= 0.0) & (v_ + w_ <= 1.0)
        t_new = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        ok = ok & (t_new >= intersect.TRI_EPS) & (t_l >= t_new)
        h = ok & not_ign & active & (k < count)
        t_l = jnp.where(h, t_new, t_l)
        prim_l = jnp.where(h, inst_t, prim_l)
        if not occlusion:
            tri_l = jnp.where(h, tri_base + k, tri_l)
            bv_l = jnp.where(h, v_, bv_l)
            bw_l = jnp.where(h, w_, bw_l)
    return t_l, prim_l, tri_l, bv_l, bw_l, count


def _prim_updates(row, o, d, ign, active, t):
    """Analytic prim row (sphere/box via inline inverse transform); returns
    (hit mask, new t where hit, prim id).  Shared by v2/v4."""
    prim_id = row[1].astype(jnp.int32)
    ptype = row[2].astype(jnp.int32)
    m = [row[4 + i] for i in range(12)]
    os_o = Vec3(m[0] * o.x + m[1] * o.y + m[2] * o.z + m[3],
                m[4] * o.x + m[5] * o.y + m[6] * o.z + m[7],
                m[8] * o.x + m[9] * o.y + m[10] * o.z + m[11])
    os_d = Vec3(m[0] * d.x + m[1] * d.y + m[2] * d.z,
                m[4] * d.x + m[5] * d.y + m[6] * d.z,
                m[8] * d.x + m[9] * d.y + m[10] * d.z)
    sph = ptype == PRIM_SPHERE
    hs, ts_ = intersect.sphere(os_o, os_d, row[16], t)
    hb, tb_ = intersect.box(os_o, os_d, Vec3(row[17], row[18], row[19]), t)
    ph = (prim_id != ign) & active & ((hs & sph) | (hb & ~sph))
    return ph, jnp.where(sph, ts_, tb_), prim_id


def _kernel_v2(rows_ref, ox, oy, oz, dx, dy, dz, t0r, ignr,
               *refs, occlusion: bool, VSTACK: bool = False):
    """Uniform-branch packet walk (v2).

    v1 evaluates ALL THREE node-type bodies (8 AABB slabs + sort network,
    WIDE_LEAF triangle tests, analytic prim) every iteration because the
    lax.while_loop carry forces every carried value to be produced
    unconditionally.  The node kind is BLOCK-UNIFORM (a scalar), so v2 keeps
    the per-ray state in the output refs themselves (read/write within the
    grid step) and guards each body with ``pl.when(kind == ...)`` — each
    iteration pays only its own node type's VPU work.  Occlusion mode also
    drops the nearest-first sort network (any hit order works) and tracks
    blockedness as ``po >= 0`` (a hit always records the prim id).

    ``VSTACK`` (BUAS_V2_VEC): the stack lives in VMEM as an (8, VEC_STACK)
    vector instead of SMEM scalars — pushes become masked iota-compare
    vector selects and the pop a masked lane-reduce + ONE scalar extract,
    v6's routing trick applied to the block-lockstep walk.  Motivation:
    prof42 priced the 8 conditional dynamic-index SMEM RMW stores at
    ~1030 ns of the 1347 ns internal iteration; the two earlier "cheaper
    push" forms (round 4c) kept the scalar stores and lost — this one
    removes them."""
    if occlusion:
        # occlusion-only scratch: vector stats accumulators + a blockedness
        # flag, so the loop body pays ZERO cross-lane reduces on internal
        # iterations (round 4d; see the stats-hoist note below)
        (to, po, tro, bvo, bwo, so, stack, sp_ref,
         nv_acc, tt_acc, blk_ref) = refs
    else:
        to, po, tro, bvo, bwo, so, stack, sp_ref = refs
    if VSTACK:
        lane_v = jax.lax.broadcasted_iota(jnp.int32, (BS, VEC_STACK), 1)
    o = Vec3(ox[:], oy[:], oz[:])
    d = Vec3(dx[:], dy[:], dz[:])
    t_in = t0r[:]
    ign = ignr[:].astype(jnp.int32)
    inv_d = intersect.safe_inv_dir(d)

    live0 = t_in >= 0.0
    any_live = jnp.any(live0)
    nlive_s = jnp.sum(live0.astype(jnp.int32))  # loop-invariant stats base

    @pl.when(pl.program_id(0) == 0)
    def _init_stats():
        so[0, 0] = jnp.int32(0)
        so[0, 1] = jnp.int32(0)

    to[:] = t_in
    po[:] = jnp.full((BS, BL), -1, jnp.int32)
    tro[:] = jnp.full((BS, BL), -1, jnp.int32)
    bvo[:] = jnp.zeros((BS, BL), jnp.float32)
    bwo[:] = jnp.zeros((BS, BL), jnp.float32)

    @pl.when(any_live)
    def _walk():
        def cond(sp):
            return sp > 0

        def body(sp):
            sp = sp - 1
            if VSTACK:
                # masked lane-reduce + ONE extract (the v6 pop pattern);
                # every sublane row carries the same broadcast value
                cur = jnp.sum(jnp.where(lane_v == sp, stack[:], 0),
                              axis=1, keepdims=True)[0, 0]
            else:
                cur = stack[sp]
            row = rows_ref[cur]
            kind = row[0].astype(jnp.int32)
            sp_ref[0] = sp
            t = to[:]
            if occlusion:
                active = live0 & (po[:] < 0)
                # node-visit stats as a VECTOR accumulator: one cross-lane
                # reduce at walk end, not one per iteration (the closest-hit
                # kernels hoisted theirs in round 4c; occlusion's `active`
                # varies per iteration so it accumulates instead)
                nv_acc[:] = nv_acc[:] + active.astype(jnp.int32)
            else:
                active = live0

            @pl.when(kind == KIND_INTERNAL)
            def _internal():
                child_base = row[1].astype(jnp.int32)
                sp_i = sp_ref[0]
                # NOTE (round 4c, prof43 on the real primary wave): both
                # "cheaper push" forms that win STANDALONE (prof42) LOSE
                # in-kernel — packed-key int network 22.9 -> 30.2 ms,
                # unconditional store values 22.9 -> 27.2 ms.  Keep the RMW
                # conditional store + float network here; v5 keeps the
                # packed form (its 3-array network was heavier; 120.1 ->
                # 116.0 ms measured win).
                keys = _child_keys(row, o, inv_d, t, active, occlusion)
                if occlusion:
                    # any order: push every hit child as-is
                    if VSTACK:
                        stk = stack[:]
                        for c in range(WIDE):
                            ok = keys[c]
                            stk = jnp.where(ok & (lane_v == sp_i),
                                            child_base + c, stk)
                            sp_i = sp_i + ok.astype(jnp.int32)
                        stack[:] = stk
                    else:
                        for c in range(WIDE):
                            ok = keys[c]
                            idx = jnp.where(ok, sp_i, jnp.int32(STACK))
                            stack[idx] = jnp.where(ok, child_base + c,
                                                   stack[idx])
                            sp_i = sp_i + ok.astype(jnp.int32)
                else:
                    pays = [jnp.int32(c) for c in range(WIDE)]
                    for (i, j) in _SORT_PAIRS:
                        swap = keys[i] > keys[j]
                        ki = jnp.where(swap, keys[j], keys[i])
                        kj = jnp.where(swap, keys[i], keys[j])
                        pi = jnp.where(swap, pays[j], pays[i])
                        pj = jnp.where(swap, pays[i], pays[j])
                        keys[i], keys[j], pays[i], pays[j] = ki, kj, pi, pj
                    if VSTACK:
                        stk = stack[:]
                        for j in range(WIDE - 1, -1, -1):
                            ok = keys[j] < BIG_T * 2.0
                            stk = jnp.where(ok & (lane_v == sp_i),
                                            child_base + pays[j], stk)
                            sp_i = sp_i + ok.astype(jnp.int32)
                        stack[:] = stk
                    else:
                        for j in range(WIDE - 1, -1, -1):
                            ok = keys[j] < BIG_T * 2.0
                            slot = child_base + pays[j]
                            idx = jnp.where(ok, sp_i, jnp.int32(STACK))
                            stack[idx] = jnp.where(ok, slot, stack[idx])
                            sp_i = sp_i + ok.astype(jnp.int32)
                sp_ref[0] = sp_i

            @pl.when(kind == KIND_TRIS)
            def _tris():
                t_l, prim_l, tri_l, bv_l, bw_l, count = _tri_updates(
                    row, o, d, ign, active, to[:], po[:], tro[:], bvo[:],
                    bwo[:], occlusion)
                if occlusion:
                    po[:] = prim_l
                    # tri-test stats vectorized like nv_acc above; the
                    # blockedness flag is refreshed HERE because po only
                    # changes in the leaf/prim bodies — internal iterations
                    # read the SMEM scalar instead of re-reducing (8,128)
                    tt_acc[:] = tt_acc[:] + jnp.where(active, count, 0)
                    blk_ref[0] = (~jnp.any(live0 & (prim_l < 0))
                                  ).astype(jnp.int32)
                else:
                    to[:] = t_l
                    po[:] = prim_l
                    tro[:] = tri_l
                    bvo[:] = bv_l
                    bwo[:] = bw_l
                    so[0, 1] = so[0, 1] + count * nlive_s

            @pl.when(kind == KIND_PRIM)
            def _prim():
                ph, tval, prim_id = _prim_updates(row, o, d, ign, active, t)
                to[:] = jnp.where(ph, tval, t)
                new_po = jnp.where(ph, prim_id, po[:])
                po[:] = new_po
                if not occlusion:
                    tro[:] = jnp.where(ph, -1, tro[:])
                else:
                    blk_ref[0] = (~jnp.any(live0 & (new_po < 0))
                                  ).astype(jnp.int32)

            # closest-hit `active` is loop-invariant (= live0), so the
            # per-iteration (8,128) stats reduce hoists to one scalar;
            # occlusion accumulates vectors (nv_acc/tt_acc above)
            if not occlusion:
                so[0, 0] = so[0, 0] + nlive_s
            sp_o = sp_ref[0]
            if occlusion:
                # early exit the moment every live ray is blocked; the flag
                # is an SMEM scalar maintained by the leaf/prim bodies (the
                # only writers of po), so internal iterations pay no reduce
                sp_o = jnp.where(blk_ref[0] != 0, 0, sp_o)
            return sp_o

        if VSTACK:
            stack[:] = jnp.zeros((BS, VEC_STACK), jnp.int32)  # root = row 0
        else:
            stack[0] = jnp.int32(0)
        if occlusion:
            nv_acc[:] = jnp.zeros((BS, BL), jnp.int32)
            tt_acc[:] = jnp.zeros((BS, BL), jnp.int32)
            blk_ref[0] = jnp.int32(0)
        jax.lax.while_loop(cond, body, jnp.int32(1))
        if occlusion:
            so[0, 0] = so[0, 0] + jnp.sum(nv_acc[:])
            so[0, 1] = so[0, 1] + jnp.sum(tt_acc[:])

    # match v1's output convention for dead lanes: t_in passes through (it
    # already does — dead lanes are never written)


# ---------------------------------------------------------------------------
# v5: grouped kind-uniform walks + multi-leaf iterations
# ---------------------------------------------------------------------------

LQ_CAP = 96  # per-group leaf/prim queue slots (force-drain keeps it < cap)


VEC_STACK = 256  # v6 per-group stack capacity (2 lane-tiles; >= v5's 192)


def _kernel_v7(res_ref, leaf_ref, *args, occlusion: bool, LPI: int,
               UNROLL: int = 1):
    """Grouped leaf-DMA walk (v7): the v6 vectorized grouped form of
    :func:`_kernel_v5` over the v4 SPLIT tables — internal tree + prims
    resident in VMEM, triangle-leaf rows streamed from HBM.

    v4's block-lockstep walk makes 1024 scattered rays pay the UNION of
    their visit sets (the same wall v5 removed on the resident path: 2.0x
    measured on the real bounce wave, docs/PERFORMANCE.md round 4b), so
    big-scene incoherent waves barely beat the XLA path (341.5 vs 466.4 ms,
    round-3 Scale table).  v7 gives every sublane row its own walk like
    v6; the only structural delta is the leaf fetch: a queue entry is the
    SIGNED enc link from the split table (tri leaf -(l+1) -> async-copied
    HBM row, prim res-index >= 0 -> resident fetch inside the guarded prim
    body).  Each leaf step issues all G x LPI copies before the first
    wait, so the copies overlap; there is no cross-iteration ring (v4's
    LAG machinery) to reason about.  Child kinds come packed 2 bits each
    from lane 58 (wide_bvh.split_for_dma) since lanes 50..57 hold the enc
    links here."""
    _kernel_v5(res_ref, *args, occlusion=occlusion, G=8, LPI=LPI,
               UNROLL=UNROLL, VEC=True, DMA=True, leaf_ref=leaf_ref)


def _kernel_v5(rows_ref, ox, oy, oz, dx, dy, dz, t0r, ignr, *refs,
               occlusion: bool, G: int, LPI: int, UNROLL: int = 1,
               VEC: bool = False, PAIR: bool = False, DMA: bool = False,
               leaf_ref=None):
    """Grouped walk kernel (v5): G independent walks per (8,128) block,
    each owning 8/G sublane rows, with KIND-UNIFORM iterations and up to
    LPI leaf rows consumed per leaf iteration.

    Why (offline evidence, tools/prof40/41 — exact lockstep simulators on
    the REAL 1080p waves):
      * v2's single block-shared stack makes 1024 scattered rays walk the
        UNION of their visit sets; giving every sublane row its own stack
        cuts lockstep iterations x2.2 on the real bounce-1 wave;
      * one leaf row per iteration leaves the ~0.5 us fixed per-iteration
        cost (row-fetch dependency stall + loop overhead, prof42)
        unamortized: LPI=4 cuts bounce iterations a further x1.9
        (707 -> 167 total) and the PRIMARY wave x1.5 (13.7 -> 9.0) — the
        closest-hit headline is per-iteration-cost bound, not
        iteration bound.
    Iterations stay kind-uniform (the pl.when trick needs one node type
    per step): internal children push onto the group's stack, leaf/prim
    children onto its queue (prims sign-encoded), and each iteration is
    either an INTERNAL step (one stack pop per group, vectorized (8,64)
    row fetch + per-group slab keys + per-group Batcher sort on (8,1)
    vectors) or a LEAF step (up to LPI queue pops per group, with the
    Moller-Trumbore and analytic-prim bodies masked per group).  Policy:
    leaf step when ready leaves outnumber ready stacks, a queue nears
    capacity, or every stack is empty.

    Requires child-kind codes in row lanes 50..57
    (wide_bvh.annotate_child_kinds) and G in (1, 8).

    ``VEC`` (v6, round 4): all per-group walk state lives in VMEM VECTORS —
    stack (8, VEC_STACK), leaf queue (8, BL), and sps/lqs as
    broadcast-uniform (8, BL) rows — so the ROUTING loop (v5's hot spot:
    8 slots x 8 groups = 64 vector->scalar extracts + 64 conditional scalar
    RMW SMEM stores per internal step, ~1 us of the measured ~2 us/iter)
    becomes 8 slots of pure (8,1)/(8,256) vector ops with NO group loop.
    Pops become one masked lane-reduce + 8 scalar extracts (the row fetch
    addresses must be scalars).  Policy/exit decisions reduce the (8,1)
    uniform columns.  Iteration sequence and hit results are BIT-IDENTICAL
    to VEC=False (parity-tested)."""
    assert G in (1, 8) and LPI >= 1
    assert not (DMA and (PAIR or not VEC))
    if DMA:
        (to, po, tro, bvo, bwo, so, stackv, leafqv, sps_v, lqs_v, tt_acc,
         slots, sems) = refs
        lane_s = jax.lax.broadcasted_iota(jnp.int32, (BS, VEC_STACK), 1)
        lane_q = jax.lax.broadcasted_iota(jnp.int32, (BS, BL), 1)
    elif VEC:
        assert G == 8
        to, po, tro, bvo, bwo, so, stackv, leafqv, sps_v, lqs_v, tt_acc = refs
        lane_s = jax.lax.broadcasted_iota(jnp.int32, (BS, VEC_STACK), 1)
        lane_q = jax.lax.broadcasted_iota(jnp.int32, (BS, BL), 1)
    else:
        to, po, tro, bvo, bwo, so, stacks, leafq, sps, lqs, tt_acc = refs
    o = Vec3(ox[:], oy[:], oz[:])
    d = Vec3(dx[:], dy[:], dz[:])
    t_in = t0r[:]
    ign = ignr[:].astype(jnp.int32)
    inv_d = intersect.safe_inv_dir(d)
    live0 = t_in >= 0.0
    any_live = jnp.any(live0)
    nlive_s = jnp.sum(live0.astype(jnp.int32))  # loop-invariant stats base

    @pl.when(pl.program_id(0) == 0)
    def _init_stats():
        so[0, 0] = jnp.int32(0)
        so[0, 1] = jnp.int32(0)

    to[:] = t_in
    po[:] = jnp.full((BS, BL), -1, jnp.int32)
    tro[:] = jnp.full((BS, BL), -1, jnp.int32)
    bvo[:] = jnp.zeros((BS, BL), jnp.float32)
    bwo[:] = jnp.zeros((BS, BL), jnp.float32)

    def active_now():
        return live0 & (po[:] < 0) if occlusion else live0

    def fetch_rows(idxs):
        """One (64,) scalar-indexed row read per group; (8, 64) for G=8."""
        if G == 8:
            return jnp.stack([rows_ref[idxs[g]] for g in range(8)])
        return rows_ref[idxs[0]]

    def col(nodes, k):
        """Lane k of each group's row, shaped to broadcast over (8,128):
        (8,1) for G=8, a scalar for G=1 (the v2 form)."""
        return nodes[:, k][:, None] if G == 8 else nodes[k]

    def coli(nodes, k):
        c = col(nodes, k)
        return c.astype(jnp.int32)

    def gvec(scalars):
        """G group booleans -> a mask broadcastable over (8,128).

        Mosaic can't insert a minor dim on vector<8xi1> ("Insertion of
        minor dim that is not a no-op only supported for 32-bit types"),
        so stack through int32 and compare back to bool."""
        if G == 8:
            i = jnp.stack([s.astype(jnp.int32) for s in scalars])
            return i.reshape(8, 1) != 0
        return scalars[0]

    def gred_min(x, fill):
        """Per-group min over the group's rays (axis-1 keepdims for G=8)."""
        if G == 8:
            return jnp.min(x, axis=1, keepdims=True)
        return jnp.min(x)

    @pl.when(any_live)
    def _walk():
        def cond(pending):
            return pending > 0

        def body(_):
            def micro(_u):
                if VEC:
                    # uniform rows: column 0 carries each group's count
                    sc0 = sps_v[:][:, :1]   # (8, 1)
                    qc0 = lqs_v[:][:, :1]
                    n_int = jnp.sum((sc0 > 0).astype(jnp.int32))
                    n_leaf = jnp.sum((qc0 > 0).astype(jnp.int32))
                    max_lq = jnp.max(qc0)
                else:
                    n_int = jnp.int32(0)
                    n_leaf = jnp.int32(0)
                    max_lq = jnp.int32(0)
                    for g in range(G):
                        n_int = n_int + (sps[g] > 0).astype(jnp.int32)
                        n_leaf = n_leaf + (lqs[g] > 0).astype(jnp.int32)
                        max_lq = jnp.maximum(max_lq, lqs[g])
                do_leaf = ((n_leaf > n_int) | (n_int == 0)
                           | (max_lq >= LQ_CAP - 8 * LPI))
                active = active_now()
                # closest-hit active == live0: hoisted scalar (the per-
                # iteration (8,128) reduce cost v2 ~17% of the primary
                # wave; same fix here)
                so[0, 0] = so[0, 0] + (
                    jnp.sum(active.astype(jnp.int32)) if occlusion
                    else nlive_s)

                @pl.when(~do_leaf)
                def _internal():
                    t = to[:]
                    if VEC:
                        sp_r = sps_v[:][:, :1]            # (8, 1)
                        ready_r = sp_r > 0
                        stk = stackv[:]                   # (8, VEC_STACK)
                        cur_v = jnp.sum(jnp.where(lane_s == sp_r - 1, stk, 0),
                                        axis=1, keepdims=True)  # (8, 1)
                        sp_r = sp_r - ready_r.astype(jnp.int32)
                        curs = [cur_v[g, 0] for g in range(G)]
                        nodes = fetch_rows(curs)
                        afull = active & ready_r
                    else:
                        readys = [sps[g] > 0 for g in range(G)]
                        curs = [stacks[g, jnp.maximum(sps[g] - 1, 0)]
                                for g in range(G)]
                        for g in range(G):
                            sps[g] = sps[g] - readys[g].astype(jnp.int32)
                        nodes = fetch_rows(curs)
                        afull = active & gvec(readys)

                    # packed per-child keys (round 4, prof42: the 3-array
                    # select-swap network costs ~1030 ns/iter; a single
                    # int min/max network is 2.26x cheaper): bits
                    # [31:5] = nearest entry-distance bit pattern (int
                    # order == float order for non-negative floats),
                    # bits [4:2] = child index, bits [1:0] = kind code.
                    iks = []
                    # DMA (v7): lanes 50..57 hold the split-table enc links,
                    # so the child kinds ride the lane-58 packed bitfield
                    k58 = coli(nodes, 58) if DMA else None
                    for c in range(WIDE):
                        s = 2 + 6 * c
                        t1x = (col(nodes, s + 0) - o.x) * inv_d.x
                        t2x = (col(nodes, s + 3) - o.x) * inv_d.x
                        t1y = (col(nodes, s + 1) - o.y) * inv_d.y
                        t2y = (col(nodes, s + 4) - o.y) * inv_d.y
                        t1z = (col(nodes, s + 2) - o.z) * inv_d.z
                        t2z = (col(nodes, s + 5) - o.z) * inv_d.z
                        tn = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                                     jnp.minimum(t1y, t2y)),
                                         jnp.minimum(t1z, t2z))
                        tf = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                                     jnp.maximum(t1y, t2y)),
                                         jnp.maximum(t1z, t2z))
                        hit_c = (tn < tf) & (tf > 0.0) & (tn < t) & afull
                        vk = jnp.where(hit_c, jnp.maximum(tn, 0.0),
                                       jnp.float32(BIG_T * 2.0))
                        ik = gred_min(jax.lax.bitcast_convert_type(
                            vk, jnp.int32), None)
                        kd_c = (jnp.bitwise_and(
                            jax.lax.shift_right_logical(k58, 2 * c), 3)
                            if DMA else coli(nodes, 50 + c))
                        iks.append(jnp.bitwise_or(
                            jnp.bitwise_and(ik, jnp.int32(~_PK5_MASK)),
                            jnp.int32(c << 2) + kd_c))
                    if not occlusion:
                        # nearest-first per group: min/max network
                        for (i, j) in _SORT_PAIRS:
                            lo_ = jnp.minimum(iks[i], iks[j])
                            hi_ = jnp.maximum(iks[i], iks[j])
                            iks[i], iks[j] = lo_, hi_
                    # route each (group, sorted slot): internal children onto
                    # the group's stack farthest-first (nearest pops first),
                    # leaf/prim children onto its queue (prim sign-encoded).
                    # A group with no ready node has afull=0 rows -> no hits
                    # -> nothing routed, so no extra ready guard is needed.
                    base = coli(nodes, 1)
                    order = range(WIDE - 1, -1, -1) if not occlusion \
                        else range(WIDE)
                    if VEC:
                        # pure vector routing: no group loop, no extracts.
                        # sp_r/stk carried in registers across the 8 slots,
                        # stored once below.
                        q_r = lqs_v[:][:, :1]             # (8, 1)
                        lq = leafqv[:]                    # (8, BL)
                        for j in order:
                            ikj = iks[j]                  # (8, 1)
                            okv = ikj < _PK5_SENT
                            kd = jnp.bitwise_and(ikj, 3)
                            cidx = jnp.bitwise_and(
                                jax.lax.shift_right_logical(ikj, 2), 7)
                            if DMA:
                                # recover the split-table enc link of the
                                # sorted child by a vectorized one-hot
                                # select over lanes 50..57 (8 (8,1) selects
                                # per slot; no extracts).  The link IS the
                                # queue entry: tri leaf -(l+1), prim res
                                # index >= 0 — sign conventions inverted
                                # vs the resident kernel's queue.
                                slot = jnp.zeros_like(cidx)
                                for c in range(WIDE):
                                    slot = slot + jnp.where(
                                        cidx == c, coli(nodes, 50 + c), 0)
                                enc = slot
                            else:
                                slot = base + cidx
                                enc = jnp.where(kd == KIND_TRIS, slot,
                                                -slot - 1)
                            is_int = okv & (kd == KIND_INTERNAL)
                            stk = jnp.where((lane_s == sp_r) & is_int,
                                            slot, stk)
                            sp_r = sp_r + is_int.astype(jnp.int32)
                            is_lp = okv & ((kd == KIND_TRIS)
                                           | (kd == KIND_PRIM))
                            lq = jnp.where((lane_q == q_r) & is_lp, enc, lq)
                            q_r = q_r + is_lp.astype(jnp.int32)
                        stackv[:] = stk
                        leafqv[:] = lq
                        sps_v[:] = jnp.broadcast_to(sp_r, (BS, BL))
                        lqs_v[:] = jnp.broadcast_to(q_r, (BS, BL))
                    else:
                        for j in order:
                            for g in range(G):
                                if G == 8:
                                    ikj = iks[j][g, 0]
                                    bj = base[g, 0]
                                else:
                                    ikj = iks[j]
                                    bj = base
                                ok = ikj < _PK5_SENT
                                kd = jnp.bitwise_and(ikj, 3)
                                slot = bj + jnp.bitwise_and(
                                    jax.lax.shift_right_logical(ikj, 2), 7)
                                is_int = ok & (kd == KIND_INTERNAL)
                                spg = sps[g]
                                idx = jnp.where(is_int, spg, jnp.int32(STACK))
                                stacks[g, idx] = jnp.where(is_int, slot,
                                                           stacks[g, idx])
                                sps[g] = spg + is_int.astype(jnp.int32)
                                is_lp = ok & ((kd == KIND_TRIS)
                                              | (kd == KIND_PRIM))
                                enc = jnp.where(kd == KIND_TRIS, slot,
                                                -slot - 1)
                                lqg = lqs[g]
                                idx2 = jnp.where(is_lp, lqg, jnp.int32(LQ_CAP))
                                leafq[g, idx2] = jnp.where(is_lp, enc,
                                                           leafq[g, idx2])
                                lqs[g] = lqg + is_lp.astype(jnp.int32)

                @pl.when(do_leaf)
                def _leaf():
                    # pop ALL LPI entries and issue every row fetch before
                    # any vector processing: the scalar queue pops are the
                    # only cross-rep dependency, so the (latency-bound)
                    # fetches overlap instead of serializing behind each
                    # rep's Moller-Trumbore math
                    reps = []
                    if VEC and PAIR:
                        # PACKED-PAIR pops: vector->scalar extracts cost
                        # ~50 ns each and the LPI=8 leaf step made 64 of
                        # them (8 groups x 8 reps) — ~30% of the whole
                        # bounce-wave kernel.  Pack TWO consecutive queue
                        # entries into one int32 (bias +32768 into 16-bit
                        # halves; needs row indices < 32767, gated at trace
                        # time) so each group extracts ONCE per pair.
                        # Iteration sequence and results are BIT-IDENTICAL
                        # to the unpaired form: same entries, same order.
                        q_r = lqs_v[:][:, :1]             # (8, 1)
                        lq = leafqv[:]
                        for _pair in range(LPI // 2):
                            ready1 = q_r > 0
                            ready2 = q_r > 1
                            enc1 = jnp.sum(
                                jnp.where(lane_q == q_r - 1, lq, 0),
                                axis=1, keepdims=True)    # (8, 1)
                            enc2 = jnp.sum(
                                jnp.where(lane_q == q_r - 2, lq, 0),
                                axis=1, keepdims=True)
                            q_r = q_r - ready1.astype(jnp.int32) \
                                - ready2.astype(jnp.int32)
                            packed = jnp.bitwise_or(
                                jnp.left_shift(enc1 + 32768, 16),
                                enc2 + 32768)             # (8, 1)
                            i1, i2 = [], []
                            for g in range(G):
                                p = packed[g, 0]
                                e1 = jax.lax.shift_right_logical(
                                    p, 16) - 32768
                                e2 = jnp.bitwise_and(
                                    p, jnp.int32(0xFFFF)) - 32768
                                i1.append(jnp.where(e1 >= 0, e1, -e1 - 1))
                                i2.append(jnp.where(e2 >= 0, e2, -e2 - 1))
                            reps.append((ready1, enc1, fetch_rows(i1)))
                            reps.append((ready2, enc2, fetch_rows(i2)))
                        lqs_v[:] = jnp.broadcast_to(q_r, (BS, BL))
                    elif VEC and DMA:
                        # v7: pop ALL LPI entries and START every leaf-row
                        # copy before the first wait — the G x LPI copies
                        # overlap in flight instead of serializing behind
                        # each rep's triangle math.  A not-ready group pops
                        # enc 0 (>= 0, classified prim) and a prim entry
                        # needs no HBM row, so both copy row 0 harmlessly;
                        # processing is masked by tri_rows either way.
                        q_r = lqs_v[:][:, :1]             # (8, 1)
                        lq = leafqv[:]
                        for _rep in range(LPI):
                            ready_r = q_r > 0
                            enc_v = jnp.sum(
                                jnp.where(lane_q == q_r - 1, lq, 0),
                                axis=1, keepdims=True)    # (8, 1)
                            q_r = q_r - ready_r.astype(jnp.int32)
                            lidx, pidx = [], []
                            for g in range(G):
                                e = enc_v[g, 0]
                                li = jnp.where(e < 0, -e - 1, 0)
                                pltpu.make_async_copy(
                                    leaf_ref.at[li],
                                    slots.at[_rep * G + g],
                                    sems.at[_rep * G + g]).start()
                                lidx.append(li)
                                pidx.append(jnp.where(e >= 0, e, 0))
                            reps.append((ready_r, enc_v,
                                         (_rep, lidx, pidx)))
                        lqs_v[:] = jnp.broadcast_to(q_r, (BS, BL))
                    elif VEC:
                        q_r = lqs_v[:][:, :1]             # (8, 1)
                        lq = leafqv[:]
                        for _rep in range(LPI):
                            ready_r = q_r > 0
                            enc_v = jnp.sum(
                                jnp.where(lane_q == q_r - 1, lq, 0),
                                axis=1, keepdims=True)    # (8, 1)
                            q_r = q_r - ready_r.astype(jnp.int32)
                            ridx = jnp.where(enc_v >= 0, enc_v, -enc_v - 1)
                            idxs = [ridx[g, 0] for g in range(G)]
                            reps.append((ready_r, enc_v, fetch_rows(idxs)))
                        lqs_v[:] = jnp.broadcast_to(q_r, (BS, BL))
                    else:
                        for _rep in range(LPI):
                            readys = [lqs[g] > 0 for g in range(G)]
                            encs = [leafq[g, jnp.maximum(lqs[g] - 1, 0)]
                                    for g in range(G)]
                            for g in range(G):
                                lqs[g] = lqs[g] - readys[g].astype(jnp.int32)
                            rowidx = [jnp.where(encs[g] >= 0, encs[g],
                                                -encs[g] - 1)
                                      for g in range(G)]
                            reps.append((readys, encs, fetch_rows(rowidx)))
                    for readys, encs, nodes in reps:
                        pidx = None
                        if DMA:
                            # wait the rep's G copies (started above, in
                            # flight since) and read the landed rows; the
                            # enc sign conventions are inverted vs the
                            # resident queue (tri < 0, prim >= 0)
                            rep_i, lidx, pidx = nodes
                            rows_l = []
                            for g in range(G):
                                pltpu.make_async_copy(
                                    leaf_ref.at[lidx[g]],
                                    slots.at[rep_i * G + g],
                                    sems.at[rep_i * G + g]).wait()
                                rows_l.append(slots[rep_i * G + g])
                            nodes = jnp.stack(rows_l)
                            tri_rows = readys & (encs < 0)    # (8, 1)
                            prim_rows = readys & (encs >= 0)
                        elif VEC:
                            tri_rows = readys & (encs >= 0)   # (8, 1)
                            prim_rows = readys & (encs < 0)
                        else:
                            tri_rows = gvec([readys[g] & (encs[g] >= 0)
                                             for g in range(G)])
                            prim_rows = gvec([readys[g] & (encs[g] < 0)
                                              for g in range(G)])
                        act = active_now()
                        t_l = to[:]

                        # --- triangle body, masked to tri-entry groups ------
                        count = coli(nodes, 1)
                        tri_base = coli(nodes, 2)
                        inst_t = coli(nodes, 3)
                        not_ign = inst_t != ign
                        # split-table rows are merged DENSE (up to
                        # DMA_LEAF_K tris, wide_bvh.split_for_dma);
                        # resident rows keep the unified WIDE_LEAF layout
                        for k in range(DMA_LEAF_K if DMA else WIDE_LEAF):
                            s = 8 + 9 * k
                            ax_, ay_, az_ = (col(nodes, s + 0),
                                             col(nodes, s + 1),
                                             col(nodes, s + 2))
                            e1x, e1y, e1z = (col(nodes, s + 3),
                                             col(nodes, s + 4),
                                             col(nodes, s + 5))
                            e2x, e2y, e2z = (col(nodes, s + 6),
                                             col(nodes, s + 7),
                                             col(nodes, s + 8))
                            pvx = d.y * e2z - d.z * e2y
                            pvy = d.z * e2x - d.x * e2z
                            pvz = d.x * e2y - d.y * e2x
                            det = e1x * pvx + e1y * pvy + e1z * pvz
                            ok = (det <= -intersect.TRI_EPS) \
                                | (det >= intersect.TRI_EPS)
                            inv_det = 1.0 / jnp.where(ok, det, 1.0)
                            tvx, tvy, tvz = o.x - ax_, o.y - ay_, o.z - az_
                            v_ = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                            ok = ok & (v_ >= 0.0) & (v_ <= 1.0)
                            qvx = tvy * e1z - tvz * e1y
                            qvy = tvz * e1x - tvx * e1z
                            qvz = tvx * e1y - tvy * e1x
                            w_ = (d.x * qvx + d.y * qvy + d.z * qvz) * inv_det
                            ok = ok & (w_ >= 0.0) & (v_ + w_ <= 1.0)
                            t_new = (e2x * qvx + e2y * qvy + e2z * qvz) \
                                * inv_det
                            ok = ok & (t_new >= intersect.TRI_EPS) \
                                & (t_l >= t_new)
                            h = ok & not_ign & act & tri_rows & (k < count)
                            t_l = jnp.where(h, t_new, t_l)
                            po[:] = jnp.where(h, inst_t, po[:])
                            if not occlusion:
                                tro[:] = jnp.where(h, tri_base + k, tro[:])
                                bvo[:] = jnp.where(h, v_, bvo[:])
                                bwo[:] = jnp.where(h, w_, bwo[:])
                        # accumulate the masked tri count as a VECTOR (one
                        # cross-lane reduce at walk end, not one per rep —
                        # LPI reps per leaf step made this reduce hot)
                        tt_acc[:] = tt_acc[:] + jnp.where(
                            act & tri_rows,
                            jnp.broadcast_to(count, (BS, BL)), 0)
                        if not occlusion:
                            to[:] = t_l  # commit tri results; the prim
                            #              body below may be skipped

                        # --- analytic prim body, masked to prim-entry
                        # groups AND guarded: mesh-scene leaf steps almost
                        # never pop a prim row, so pl.when skips the
                        # 12-lane transform + sphere + box intersectors
                        # for the common all-tri rep (round 4f)
                        @pl.when(jnp.any(prim_rows))
                        def _prims(nodes=nodes, prim_rows=prim_rows,
                                   act=act, t_l=t_l, pidx=pidx):
                            if DMA:
                                # prim rows live in the RESIDENT table (the
                                # DMA'd row above is leaf garbage for prim
                                # entries); fetch inside the guard so the
                                # common all-tri rep skips it
                                nodes = fetch_rows(pidx)
                            prim_id = coli(nodes, 1)
                            ptype = coli(nodes, 2)
                            m = [col(nodes, 4 + i) for i in range(12)]
                            os_o = Vec3(
                                m[0] * o.x + m[1] * o.y + m[2] * o.z + m[3],
                                m[4] * o.x + m[5] * o.y + m[6] * o.z + m[7],
                                m[8] * o.x + m[9] * o.y + m[10] * o.z
                                + m[11])
                            os_d = Vec3(m[0] * d.x + m[1] * d.y + m[2] * d.z,
                                        m[4] * d.x + m[5] * d.y + m[6] * d.z,
                                        m[8] * d.x + m[9] * d.y
                                        + m[10] * d.z)
                            sph = ptype == PRIM_SPHERE
                            hs, ts_ = intersect.sphere(os_o, os_d,
                                                       col(nodes, 16), t_l)
                            hb, tb_ = intersect.box(os_o, os_d,
                                                    Vec3(col(nodes, 17),
                                                         col(nodes, 18),
                                                         col(nodes, 19)),
                                                    t_l)
                            ph = (prim_id != ign) & act & prim_rows \
                                & ((hs & sph) | (hb & ~sph))
                            po[:] = jnp.where(ph, prim_id, po[:])
                            if not occlusion:
                                tro[:] = jnp.where(ph, -1, tro[:])
                                to[:] = jnp.where(
                                    ph, jnp.where(sph, ts_, tb_), t_l)
                            # occlusion mode never tightens t: blockedness
                            # (po >= 0) is the only state that advances

                if occlusion:
                    # per-GROUP early exit: a group whose live rays are all
                    # blocked drains its own stack+queue (finer than v2's
                    # whole-block exit)
                    open_ = live0 & (po[:] < 0)
                    if VEC:
                        keep = jnp.any(open_, axis=1,
                                       keepdims=True).astype(jnp.int32)
                        sps_v[:] = sps_v[:] * keep
                        lqs_v[:] = lqs_v[:] * keep
                    elif G == 8:
                        # int32 because Mosaic can only squeeze 32-bit
                        # scalars out of a vector
                        open_g = jnp.any(open_, axis=1,
                                         keepdims=True).astype(jnp.int32)
                        for g in range(G):
                            keep = open_g[g, 0] != 0
                            sps[g] = jnp.where(keep, sps[g], 0)
                            lqs[g] = jnp.where(keep, lqs[g], 0)
                    else:
                        keep = jnp.any(open_)
                        sps[0] = jnp.where(keep, sps[0], 0)
                        lqs[0] = jnp.where(keep, lqs[0], 0)

            for _u in range(UNROLL):
                micro(_u)

            if VEC:
                pending = jnp.sum(sps_v[:][:, :1] + lqs_v[:][:, :1])
            else:
                pending = jnp.int32(0)
                for g in range(G):
                    pending = pending + sps[g] + lqs[g]
            return pending

        root_kind = rows_ref[0][0].astype(jnp.int32)
        root_is_int = root_kind == KIND_INTERNAL
        if DMA:
            # split tables have an internal/prim root (split_for_dma
            # asserts); a prim root queues as res index 0 (enc >= 0)
            root_enc = jnp.int32(0)
        else:
            root_enc = jnp.where(root_kind == KIND_TRIS, 0, -1)
        if VEC:
            stackv[:] = jnp.zeros((BS, VEC_STACK), jnp.int32)
            leafqv[:] = jnp.zeros((BS, BL), jnp.int32) + root_enc
            sps_v[:] = jnp.zeros((BS, BL), jnp.int32) \
                + root_is_int.astype(jnp.int32)
            lqs_v[:] = jnp.zeros((BS, BL), jnp.int32) + jnp.where(
                root_is_int | (root_kind == KIND_EMPTY), 0, 1)
        else:
            for g in range(G):
                stacks[g, 0] = jnp.int32(0)
                leafq[g, 0] = root_enc
                sps[g] = root_is_int.astype(jnp.int32)
                lqs[g] = jnp.where(root_is_int | (root_kind == KIND_EMPTY),
                                   0, 1)
        tt_acc[:] = jnp.zeros((BS, BL), jnp.int32)
        jax.lax.while_loop(cond, body, jnp.int32(1))
        so[0, 1] = so[0, 1] + jnp.sum(tt_acc[:])


QS = 16   # v4 leaf DMA ring slots (power of two, >= 2 * WIDE)
LAG = 4   # iterations a leaf copy stays in flight before its wait


def _kernel_v4(res_ref, leaf_ref, ox, oy, oz, dx, dy, dz, t0r, ignr,
               *refs, occlusion: bool, V4_LPI: int = 2):
    """Leaf-DMA packet walk (v4) for tables too big to stay VMEM-resident.

    The internal tree + analytic prims (wide_bvh.split_for_dma) stay
    resident like v2 (~15% of the bytes); triangle-leaf rows live in HBM
    and are DMA'd into a QS-slot VMEM ring when their parent's slab test
    passes, nearest-first.  A queued leaf is consumed once its copy has
    had >= LAG pop-iterations to land — or the stack is empty, or the
    ring nears capacity (an internal node can enqueue up to WIDE more) —
    so internal-node VPU work hides the copy latency.  Consuming leaves
    between node pops only helps closest-hit pruning (their hits tighten
    t early).  All control state (stack, ring head/tail, pending leaf
    ids) is block-uniform SMEM scalars, the only control flow Mosaic
    runs well; per-ray state lives in the output refs as in v2.

    This is the explicit-DMA ray-stream design from docs/PERFORMANCE.md's
    roadmap, unblocked when the remote compiler started accepting
    ``make_async_copy`` (tools/prof27_dma.py).  It replaces the planned
    bf16-quantized rows (round-2 verdict item 5): instead of halving the
    resident table at some precision cost, the resident set shrinks ~7x
    with hit results BIT-identical to v2/XLA.
    """
    to, po, tro, bvo, bwo, so, stack, st_ref, lq, slots, sems = refs
    o = Vec3(ox[:], oy[:], oz[:])
    d = Vec3(dx[:], dy[:], dz[:])
    t_in = t0r[:]
    ign = ignr[:].astype(jnp.int32)
    inv_d = intersect.safe_inv_dir(d)
    live0 = t_in >= 0.0
    any_live = jnp.any(live0)
    nlive_s = jnp.sum(live0.astype(jnp.int32))  # loop-invariant stats base

    @pl.when(pl.program_id(0) == 0)
    def _init_stats():
        so[0, 0] = jnp.int32(0)
        so[0, 1] = jnp.int32(0)

    to[:] = t_in
    po[:] = jnp.full((BS, BL), -1, jnp.int32)
    tro[:] = jnp.full((BS, BL), -1, jnp.int32)
    bvo[:] = jnp.zeros((BS, BL), jnp.float32)
    bwo[:] = jnp.zeros((BS, BL), jnp.float32)

    @pl.when(any_live)
    def _walk():
        def cond(pending):
            return pending > 0

        def body(_):
            sp = st_ref[0]
            qh = st_ref[1]
            qt = st_ref[2]
            inflight = qt - qh
            do_leaf = (inflight > 0) & ((inflight >= LAG) | (sp <= 0)
                                        | (inflight > QS - WIDE))
            t = to[:]
            if occlusion:
                active = live0 & (po[:] < 0)
                so[0, 0] = so[0, 0] + jnp.sum(active.astype(jnp.int32))
            else:
                active = live0
                so[0, 0] = so[0, 0] + nlive_s  # hoisted (loop-invariant)

            @pl.when(do_leaf)
            def _leaf():
                # consume up to V4_LPI ring entries per leaf step: one leaf
                # row per iteration leaves the fixed per-iteration cost
                # (loop + wait + dependency stall) unamortized — same
                # finding as v5's multi-leaf iterations (tools/prof41);
                # adjacent entries were started together by their parent's
                # internal step, so the second wait rarely stalls
                for rep in range(V4_LPI):
                    @pl.when((st_ref[2] - st_ref[1]) > 0 if rep
                             else jnp.bool_(True))
                    def _one():
                        qh_i = st_ref[1]
                        slot = jnp.bitwise_and(qh_i, QS - 1)
                        lidx = lq[slot]
                        pltpu.make_async_copy(leaf_ref.at[lidx],
                                              slots.at[slot],
                                              sems.at[slot]).wait()
                        row = slots[slot]
                        t_l, prim_l, tri_l, bv_l, bw_l, count = _tri_updates(
                            row, o, d, ign, active, to[:], po[:], tro[:],
                            bvo[:], bwo[:], occlusion, leaf_k=DMA_LEAF_K)
                        if occlusion:
                            po[:] = prim_l
                        else:
                            to[:] = t_l
                            po[:] = prim_l
                            tro[:] = tri_l
                            bvo[:] = bv_l
                            bwo[:] = bw_l
                        so[0, 1] = so[0, 1] + count * (
                            jnp.sum(active.astype(jnp.int32)) if occlusion
                            else nlive_s)
                        st_ref[1] = qh_i + 1

            @pl.when(~do_leaf)
            def _node():
                sp_i = sp - 1
                cur = stack[sp_i]
                row = res_ref[cur]
                kind = row[0].astype(jnp.int32)
                st_ref[0] = sp_i

                @pl.when(kind == KIND_INTERNAL)
                def _internal():
                    keys = _child_keys(row, o, inv_d, t, active, occlusion)
                    pays = [row[50 + c].astype(jnp.int32)
                            for c in range(WIDE)]
                    if occlusion:
                        valid = keys
                    else:
                        for (i, j) in _SORT_PAIRS:
                            swap = keys[i] > keys[j]
                            ki = jnp.where(swap, keys[j], keys[i])
                            kj = jnp.where(swap, keys[i], keys[j])
                            pi = jnp.where(swap, pays[j], pays[i])
                            pj = jnp.where(swap, pays[i], pays[j])
                            keys[i], keys[j], pays[i], pays[j] = ki, kj, pi, pj
                        valid = [k < BIG_T * 2.0 for k in keys]
                    # enqueue leaf children nearest-FIRST (FIFO ring)
                    for j in range(WIDE):
                        okq = valid[j] & (pays[j] < 0)

                        @pl.when(okq)
                        def _start(enc=pays[j]):
                            qt_i = st_ref[2]
                            slot = jnp.bitwise_and(qt_i, QS - 1)
                            lidx = -enc - 1
                            lq[slot] = lidx
                            pltpu.make_async_copy(
                                leaf_ref.at[lidx], slots.at[slot],
                                sems.at[slot]).start()
                            st_ref[2] = qt_i + 1
                    # push resident children farthest-first (LIFO stack)
                    sp_w = st_ref[0]
                    for j in range(WIDE - 1, -1, -1):
                        okp = valid[j] & (pays[j] >= 0)
                        idx = jnp.where(okp, sp_w, jnp.int32(STACK))
                        stack[idx] = jnp.where(okp, pays[j], stack[idx])
                        sp_w = sp_w + okp.astype(jnp.int32)
                    st_ref[0] = sp_w

                @pl.when(kind == KIND_PRIM)
                def _prim():
                    ph, tval, prim_id = _prim_updates(row, o, d, ign,
                                                      active, t)
                    to[:] = jnp.where(ph, tval, t)
                    po[:] = jnp.where(ph, prim_id, po[:])
                    if not occlusion:
                        tro[:] = jnp.where(ph, -1, tro[:])

            if occlusion:
                # all live rays blocked: drop the stack; the ring still
                # drains through do_leaf (waits are mandatory, the tri
                # body is masked dead by then)
                done = ~jnp.any(live0 & (po[:] < 0))

                @pl.when(done)
                def _cut():
                    st_ref[0] = jnp.int32(0)

            return st_ref[0] + (st_ref[2] - st_ref[1])

        stack[0] = jnp.int32(0)
        st_ref[0] = jnp.int32(1)  # sp
        st_ref[1] = jnp.int32(0)  # ring head (next leaf to consume)
        st_ref[2] = jnp.int32(0)  # ring tail (next free slot)
        jax.lax.while_loop(cond, body, jnp.int32(1))


def packet_traverse(rows, o: Vec3, d: Vec3, t0, ignored_prim,
                    occlusion: bool = False, interpret: bool = False,
                    v4_tables=None, groups: int = 1,
                    shadow_grouped: bool = False):
    """Block-coherent traversal over the whole flat ray batch.

    The kernel version is resolved from ``BUAS_PACKET_V1``/``BUAS_PACKET_V5``
    HERE, at trace time, and forwarded as a jit-STATIC argument: reading the
    env inside the traced body would be frozen into the first-traced jaxpr
    and silently ignored on later flips (the inner jit cache keys on avals,
    not env).  ``BUAS_PACKET_V5`` defaults to ``auto``: the grouped v5
    kernel for compacted (groups=8) closest-hit waves, v2 for coherent and
    occlusion walks — the measured winner per wave shape (prof43).  ``v4_tables=(res_rows, leaf_rows)`` selects the leaf-DMA
    kernel for tables too big to keep VMEM-resident (the structure
    difference keys the jit cache).  ``groups`` is the v5 walk-group count
    the caller picks per wave shape (1 = coherent/natural order, 8 =
    compacted incoherent); ignored by v1/v2/v4."""
    v2 = _os.environ.get("BUAS_PACKET_V1", "0") != "1"
    v5_env = _os.environ.get("BUAS_PACKET_V5", "auto")
    if v5_env == "auto":
        # Measured on the real 1080p waves (tools/prof43, on chip,
        # docs/PERFORMANCE.md round 4b): v5 G=8 wins the compacted
        # incoherent closest-hit wave 1.95x (123.2 ms vs v2's 240.5), but
        # LOSES natural-order coherent walks (32.3 vs 22.9 ms primary) and
        # LADDER-compacted occlusion (39.1 vs 26.6 ms raw, light-major
        # order) — route v5 only to grouped non-occlusion waves there.
        # Exception: occlusion waves whose DISPATCHER asked for grouped
        # walks (shadow_grouped — natural-order since round 4o, ladder-
        # compacted since 4p) DO take the grouped kernel: light-mixed
        # blocks pay the union of both occluder cones under lockstep,
        # which is exactly what independent per-group walks cut
        # (in-frame 406.5 -> 389.5 ms).  The decision is owned entirely
        # by traverse_dispatch's shadow_grouped argument — no second env
        # read here (two sources of truth drift).
        v5 = groups == 8 and v4_tables is None and (
            not occlusion or shadow_grouped)
    else:
        v5 = v5_env == "1" and v4_tables is None
    lpi = int(_os.environ.get("BUAS_V5_LPI", "8"))
    unroll = int(_os.environ.get("BUAS_V5_UNROLL", "2"))
    v4_lpi = int(_os.environ.get("BUAS_V4_LPI", "2"))
    # v6 = v5 with VECTORIZED per-group state (see _kernel_v5 VEC docstring);
    # requires G=8.  Default ON: the prof43 A/B on the real 1080p bounce
    # wave measured v6 at 100.6-111.3 ms vs v5's 105.0-115.9 across
    # sessions — a consistent ~5-10% win (docs/PERFORMANCE.md round 4f).
    vec = v5 and groups == 8 \
        and _os.environ.get("BUAS_V5_VEC", "1") == "1"
    # packed-pair leaf pops (halve the vector->scalar extracts by packing
    # two biased 16-bit queue entries per int32) MEASURED A 2.3x REGRESSION
    # on chip (248 vs 106 ms on the real bounce wave, 2026-08-19): the
    # scalar-side decode chain costs far more than the extracts it saves.
    # Kept behind the flag as a recorded dead-end; default OFF.
    pair = vec and lpi % 2 == 0 and int(rows.shape[0]) <= 32000 \
        and _os.environ.get("BUAS_V5_PAIR", "0") == "1"
    # v7 = grouped leaf-DMA walks (v6's vectorized grouped form over the
    # v4 split tables) for ALL grouped waves, occlusion included: the
    # real stress shadow wave measured v4 108.6 -> v7 55.8 ms (prof48)
    # and the in-frame stress capture 1220.9 -> 1161.7 ms (round 4o).
    # v4's block-lockstep walk keeps coherent/natural-order waves.
    v7_env = _os.environ.get("BUAS_PACKET_V7", "auto")
    v7 = v4_tables is not None and groups == 8 and v7_env in ("1", "auto")
    # BUAS_V2_VEC: vector-stack variant of the block-lockstep walk (see
    # _kernel_v2 VSTACK docstring) — opt-in pending on-chip measurement
    v2vec = (v2 and not v5 and v4_tables is None
             and _os.environ.get("BUAS_V2_VEC", "0") == "1")
    return _packet_traverse(rows, v4_tables, o, d, t0, ignored_prim,
                            occlusion=occlusion, interpret=interpret, v2=v2,
                            v5=v5, groups=groups if v5 else 1,
                            lpi=lpi if (v5 or v7) else 1,
                            unroll=unroll if (v5 or v7) else 1,
                            v4_lpi=v4_lpi, vec=vec, pair=pair, v7=v7,
                            v2vec=v2vec)


@functools.partial(jax.jit,
                   static_argnames=("occlusion", "interpret", "v2", "v5",
                                    "groups", "lpi", "unroll", "v4_lpi",
                                    "vec", "pair", "v7", "v2vec"))
def _packet_traverse(rows, v4_tables, o: Vec3, d: Vec3, t0, ignored_prim,
                     occlusion: bool = False, interpret: bool = False,
                     v2: bool = True, v5: bool = False, groups: int = 1,
                     lpi: int = 1, unroll: int = 1, v4_lpi: int = 2,
                     vec: bool = False, pair: bool = False,
                     v7: bool = False, v2vec: bool = False):
    """Jitted body of :func:`packet_traverse`.

    Returns (t, prim, tri, bv, bw, node_visits, tri_tests) like
    traverse_wide._traverse.  Stats are ALWAYS on: they leave the kernel as
    two SMEM scalars per block (node visits under the union-of-members
    semantics; triangle tests = active rays x leaf count), costing nothing —
    unlike round 2's 8 KB VMEM stats block that broke the 1080p vmem budget
    and forced stats off on the production path."""
    n = int(t0.shape[0])
    nb = -(-n // BLOCK)
    npad = nb * BLOCK

    def pad(x, fill):
        return jnp.pad(x, (0, npad - n), constant_values=fill
                       ).reshape(nb, BS, BL)

    args = (pad(o.x, 0.0), pad(o.y, 0.0), pad(o.z, 0.0),
            pad(d.x, 0.0), pad(d.y, 1.0), pad(d.z, 0.0),
            pad(t0, -1.0),
            pad(ignored_prim.astype(jnp.float32), -1.0))

    blk = lambda: pl.BlockSpec((None, BS, BL), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((nb, BS, BL), dt)
        for dt in (jnp.float32, jnp.int32, jnp.int32, jnp.float32,
                   jnp.float32)) + (jax.ShapeDtypeStruct((1, 2), jnp.int32),)
    if v4_tables is not None and v7:
        res_rows, leaf_rows = v4_tables
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nb,),
            # resident internal tree + prims in VMEM; leaf rows in HBM,
            # async-copied per pop into the per-(rep, group) slot buffers
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)]
            + [blk() for _ in range(8)],
            out_specs=[blk() for _ in range(5)]
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            scratch_shapes=[
                pltpu.VMEM((BS, VEC_STACK), jnp.int32),  # vector stacks
                pltpu.VMEM((BS, BL), jnp.int32),         # vector leaf queues
                pltpu.VMEM((BS, BL), jnp.int32),         # sps (uniform rows)
                pltpu.VMEM((BS, BL), jnp.int32),         # lqs (uniform rows)
                pltpu.VMEM((BS, BL), jnp.int32),  # tri-test vector accum
                pltpu.VMEM((lpi * 8, int(leaf_rows.shape[1])),
                           jnp.float32),                 # leaf-row slots
                pltpu.SemaphoreType.DMA((lpi * 8,)),
            ],
        )
        outs = pl.pallas_call(
            functools.partial(_kernel_v7, occlusion=occlusion,
                              LPI=lpi, UNROLL=unroll),
            out_shape=out_shapes,
            grid_spec=grid_spec,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024),
        )(res_rows, leaf_rows, *args)
        t, prim, tri, bv, bw = (x.reshape(-1)[:n] for x in outs[:5])
        return t, prim, tri, bv, bw, outs[5][0, 0], outs[5][0, 1]

    if v4_tables is not None:
        res_rows, leaf_rows = v4_tables
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nb,),
            # resident internal tree in VMEM; leaf rows stay in HBM and
            # are DMA'd on demand by the kernel
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)]
            + [blk() for _ in range(8)],
            out_specs=[blk() for _ in range(5)]
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            scratch_shapes=[
                pltpu.SMEM((STACK + 1,), jnp.int32),   # node stack
                pltpu.SMEM((4,), jnp.int32),           # sp, qh, qt
                pltpu.SMEM((QS,), jnp.int32),          # pending leaf ids
                pltpu.VMEM((QS, int(leaf_rows.shape[1])), jnp.float32),
                pltpu.SemaphoreType.DMA((QS,)),
            ],
        )
        outs = pl.pallas_call(
            functools.partial(_kernel_v4, occlusion=occlusion,
                              V4_LPI=v4_lpi),
            out_shape=out_shapes,
            grid_spec=grid_spec,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024),
        )(res_rows, leaf_rows, *args)
        t, prim, tri, bv, bw = (x.reshape(-1)[:n] for x in outs[:5])
        return t, prim, tri, bv, bw, outs[5][0, 0], outs[5][0, 1]

    if v5:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            + [blk() for _ in range(8)],
            out_specs=[blk() for _ in range(5)]
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            scratch_shapes=([
                pltpu.VMEM((BS, VEC_STACK), jnp.int32),  # vector stacks
                pltpu.VMEM((BS, BL), jnp.int32),         # vector leaf queues
                pltpu.VMEM((BS, BL), jnp.int32),         # sps (uniform rows)
                pltpu.VMEM((BS, BL), jnp.int32),         # lqs (uniform rows)
                pltpu.VMEM((BS, BL), jnp.int32),  # tri-test vector accum
            ] if vec else [
                pltpu.SMEM((groups, STACK + 1), jnp.int32),   # stacks
                pltpu.SMEM((groups, LQ_CAP + 1), jnp.int32),  # leaf queues
                pltpu.SMEM((groups,), jnp.int32),             # sp per group
                pltpu.SMEM((groups,), jnp.int32),             # lq per group
                pltpu.VMEM((BS, BL), jnp.int32),  # tri-test vector accum
            ]),
        )
        kernel = functools.partial(_kernel_v5, occlusion=occlusion,
                                   G=groups, LPI=lpi, UNROLL=unroll,
                                   VEC=vec, PAIR=pair)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nb,),
            # rows: the WHOLE table resident in VMEM across all grid steps
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            + [blk() for _ in range(8)],
            out_specs=[blk() for _ in range(5)]
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            scratch_shapes=[pltpu.VMEM((BS, VEC_STACK), jnp.int32)
                            if v2vec else
                            pltpu.SMEM((STACK + 1,), jnp.int32)]
            + ([pltpu.SMEM((1,), jnp.int32)] if v2 else [])
            + ([pltpu.VMEM((BS, BL), jnp.int32),   # nv accumulator
                pltpu.VMEM((BS, BL), jnp.int32),   # tri-test accumulator
                pltpu.SMEM((1,), jnp.int32)]       # all-blocked flag
               if (v2 and occlusion) else []),
        )
        kernel = (functools.partial(_kernel_v2, occlusion=occlusion,
                                    VSTACK=True) if v2vec
                  else functools.partial(_kernel_v2 if v2 else _kernel,
                                         occlusion=occlusion))
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=grid_spec,
        interpret=interpret,
        # the resident table + staging sits right at the default 16 MB
        # scoped-vmem cap (observed 16.01/16.00 OOMs); grant enough for the
        # 30 MB table budget + staging (48 MB validated, tools/prof28)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )(rows, *args)

    t, prim, tri, bv, bw = (x.reshape(-1)[:n] for x in outs[:5])
    nv = outs[5][0, 0]
    tt = outs[5][0, 1]
    return t, prim, tri, bv, bw, nv, tt


# ---------------------------------------------------------------------------
# Dispatch policy: natural order for live wavefronts, Morton-compacted
# prefix for sparse ones
# ---------------------------------------------------------------------------

import os as _os

COMPACT_BLOCKS = 256            # compact path capacity: 256 blocks = 262144


def _mode() -> str:
    """Read BUAS_TRAVERSAL at call (trace) time, not import time, so tests
    can monkeypatch the routing (e.g. force the packet path in interpret
    mode under a virtual CPU mesh, tests/test_scenes_sharded.py)."""
    return _os.environ.get("BUAS_TRAVERSAL", "")


def interpret_mode() -> bool:
    """BUAS_PACKET_INTERPRET=1 runs the packet kernel through the Pallas
    interpreter — the only way to execute the production kernel on a CPU
    backend (sharding tests; Mosaic compiles only for real TPUs)."""
    return _os.environ.get("BUAS_PACKET_INTERPRET", "0") == "1"


def stack_fits(depth: int) -> bool:
    """Worst-case block-shared stack occupancy: one path from the root can
    hold (WIDE-1) deferred children per level plus the current node.  The
    kernel's push is silently masked at ``sp < STACK`` and children are
    pushed farthest-first, so an overflow would drop the NEAREST children —
    missed closest hits with no error signal.  Gate instead of overflowing
    (round-2 advisor finding)."""
    return depth * (WIDE - 1) + 1 <= STACK


# Measured fit on v5e (tools/prof28): a 32 MB resident table + block staging
# compiles and runs under a 48 MB scoped-vmem grant; 48 MB tables fail the
# remote compile.  30 MB keeps headroom for the staging blocks.  Expressed
# in BYTES so wider rows (BUAS_WIDE=16 -> 128 floats) shrink the row budget
# instead of silently doubling the footprint (round-2 advisor finding).
VMEM_TABLE_LIMIT_BYTES = 30 * 1024 * 1024


def enabled_for(rows, depth: int) -> bool:
    """Packet kernel is the TPU default whenever the table fits VMEM and the
    tree depth fits the block-shared stack; the XLA phased path stays the
    fallback (and the CPU/interpret default)."""
    if not stack_fits(depth):
        return False  # silent wrong renders beat any forced mode
    mode = _mode()
    if mode == "packet":
        return True
    if mode in ("wide", "threaded", "packet4"):
        return False
    # the axon tunnel reports backend "axon" for the real TPU chip
    return (jax.default_backend() in ("tpu", "axon")
            and int(rows.shape[0]) * int(rows.shape[1]) * 4
            <= VMEM_TABLE_LIMIT_BYTES)


def v4_tables_for(ps, depth: int):
    """Returns ``(res_rows, leaf_rows)`` when the leaf-DMA kernel should
    take this scene — the unified table is too big for residence but the
    split internal tree fits — else None.  The resident v2 kernel wins
    when the whole table fits, so it takes priority (enabled_for).
    ``BUAS_TRAVERSAL=packet4`` forces this path (tests, interpret mode)."""
    v4 = getattr(ps, "v4_res", None)
    if v4 is None or not stack_fits(depth):
        return None
    tables = (ps.v4_res, ps.v4_leaf)
    mode = _mode()
    if mode == "packet4":
        return tables
    if mode in ("wide", "threaded", "packet"):
        return None
    if jax.default_backend() not in ("tpu", "axon"):
        return None
    rows = ps.wide_rows
    if (int(rows.shape[0]) * int(rows.shape[1]) * 4
            <= VMEM_TABLE_LIMIT_BYTES):
        return None  # fully-resident kernel is faster
    if (int(ps.v4_res.shape[0]) * int(ps.v4_res.shape[1]) * 4
            > VMEM_TABLE_LIMIT_BYTES):
        return None  # even the internal tree alone will not fit
    return tables


def _morton_key(o: Vec3, d: Vec3, lo, hi):
    """Spatial+direction coherence key (8 bits/axis Morton of the origin,
    direction octant minor — 27 bits total) for packing bounce rays into
    coherent blocks.  lo/hi are traced (3,) scene-bound arrays."""
    ext = jnp.maximum(jnp.asarray(hi, jnp.float32)
                      - jnp.asarray(lo, jnp.float32), 1e-6)

    def q8(c, l, e):
        return jnp.clip((c - l) / e * 256.0, 0.0, 255.0).astype(jnp.int32)

    def spread3(v):  # 8 bits -> every 3rd bit
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    m = (spread3(q8(o.x, lo[0], ext[0]))
         | (spread3(q8(o.y, lo[1], ext[1])) << 1)
         | (spread3(q8(o.z, lo[2], ext[2])) << 2))
    oct_ = ((d.x < 0).astype(jnp.int32) * 4 + (d.y < 0).astype(jnp.int32) * 2
            + (d.z < 0).astype(jnp.int32))
    return (m << 3) | oct_


def _key6d(o: Vec3, d: Vec3, lo, hi):
    """6D Morton: 6 bits/axis position + 2 bits/axis direction, interleaved
    with the direction bits riding at the FINE end (inside a fine spatial
    cell, rays split by direction halves).  Offline replay of the real
    60%-live bounce-1 wave (tools/prof31) measured mean per-block
    visited-row unions of 204 under this key vs 391 for oct_major and 293
    for plain Morton — direction-aware binning halves the union a packet
    block walks.  24 bits total, so the 4 ignored-prim bits still fit
    above (bit 24..27)."""
    ext = jnp.maximum(jnp.asarray(hi, jnp.float32)
                      - jnp.asarray(lo, jnp.float32), 1e-6)

    def q(c, l, e, bits):
        return jnp.clip((c - l) / e * float(1 << bits),
                        0.0, float((1 << bits) - 1)).astype(jnp.int32)

    p = [q(o.x, lo[0], ext[0], 6), q(o.y, lo[1], ext[1], 6),
         q(o.z, lo[2], ext[2], 6)]
    dq = [jnp.clip((d.x * 0.5 + 0.5) * 4.0, 0.0, 3.0).astype(jnp.int32),
          jnp.clip((d.y * 0.5 + 0.5) * 4.0, 0.0, 3.0).astype(jnp.int32),
          jnp.clip((d.z * 0.5 + 0.5) * 4.0, 0.0, 3.0).astype(jnp.int32)]
    out = jnp.zeros_like(p[0])
    shift = 0
    for b in range(6):
        if b < 2:
            for i in range(3):
                out = out | (((dq[i] >> b) & 1) << shift)
                shift += 1
        for i in range(3):
            out = out | (((p[i] >> b) & 1) << shift)
            shift += 1
    return out


def _compact_key(o: Vec3, d: Vec3, ign, lo, hi, occlusion: bool = False):
    """Sort key for Morton compaction.  The ignored-prim id rides as the
    MAJOR bits: for NEE shadow queries it is the sampled light, so blocks
    separate perfectly into per-light clusters (a mixed block pays the
    union of both lights' occluder sets); for closest-hit calls it is
    constant (-1) and changes nothing.

    Key layouts (BUAS_COMPACT_KEY; the default is per wave type, measured
    on the real bounce-1 + NEE waves, tools/prof26: closest-hit 370 ms
    m6d vs 483 oct_major vs 530 morton; occlusion 105 oct_major vs 113
    m6d):
      * ``m6d`` (closest-hit default) — 6D Morton, position+direction
        interleaved (:func:`_key6d`): the per-block visited-row union is
        HALVED vs the round-3a keys on the real bounce-1 wave
        (tools/prof31 offline replay), worth 23% on-chip.
      * ``oct_major`` (occlusion default) — direction octant above the
        origin-Morton bits.  NOTE kept bit-exact to its round-3a form for
        comparability: the octant lands on bits 18-20 and ORs into the
        Morton's top bits (a 24-bit code), so it is really a hash of both.
      * ``morton`` — origin Morton major, octant minor."""
    mode = _os.environ.get("BUAS_COMPACT_KEY",
                           "oct_major" if occlusion else "m6d")
    if mode == "m6d":
        mk = _key6d(o, d, lo, hi)
    else:
        mk = _morton_key(o, d, lo, hi)  # (morton24 << 3) | octant
        if mode == "oct_major":
            mk = ((jnp.bitwise_and(mk, 7) << 18) | (mk >> 3))
    return ((jnp.bitwise_and(ign.astype(jnp.int32) + 1, 0xF) << 27) | mk)


def root_prefilter(rows, o: Vec3, d: Vec3, t0):
    """Vectorized any-root-child slab test: rays that hit NO child of the
    root are proven misses before compaction (identical test to the
    kernel's first pop, so dropping them is EXACT).  On the real bounce-1
    diffuse wave this kills 66% of the live rays (tools/prof35 — half the
    wave's rays only ever touch the root, prof31 p50=1), which shrinks the
    compacted prefix ~3x.  The iteration count barely moves (sky rays
    never drove the block unions) — the win is the compaction DATA
    MOVEMENT, which prof34 showed dominates mid-liveness waves.  ~160
    vector ops per ray, trivially fused by XLA."""
    row = rows[0]
    kind = row[0].astype(jnp.int32)
    inv_d = intersect.safe_inv_dir(d)
    any_hit = jnp.zeros_like(t0, jnp.bool_)
    for c in range(WIDE):
        s = 2 + 6 * c
        t1x = (row[s + 0] - o.x) * inv_d.x
        t2x = (row[s + 3] - o.x) * inv_d.x
        t1y = (row[s + 1] - o.y) * inv_d.y
        t2y = (row[s + 4] - o.y) * inv_d.y
        t1z = (row[s + 2] - o.z) * inv_d.z
        t2z = (row[s + 5] - o.z) * inv_d.z
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                     jnp.minimum(t1y, t2y)),
                         jnp.minimum(t1z, t2z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                     jnp.maximum(t1y, t2y)),
                         jnp.maximum(t1z, t2z))
        any_hit = any_hit | ((tn < tf) & (tf > 0.0) & (tn < t0))
    # non-internal roots (single-prim scenes) can't be prefiltered
    return jnp.where(kind == KIND_INTERNAL, any_hit, True)


def block_coherence(d: Vec3, t0):
    """Mean resultant length of the live directions within (8,128) blocks —
    ~1.0 for primary/shadow fans, ~0.3 for diffuse bounce fans.  One cheap
    reduce; a partial tail block is ignored."""
    n = int(t0.shape[0])
    live = t0 >= 0.0
    nfull = (n // BLOCK) * BLOCK
    lf = live[:nfull].astype(jnp.float32).reshape(-1, BLOCK)
    sx = jnp.sum((d.x[:nfull] * lf.reshape(-1)).reshape(-1, BLOCK), axis=1)
    sy = jnp.sum((d.y[:nfull] * lf.reshape(-1)).reshape(-1, BLOCK), axis=1)
    sz = jnp.sum((d.z[:nfull] * lf.reshape(-1)).reshape(-1, BLOCK), axis=1)
    cnt = jnp.sum(lf, axis=1)
    rlen = jnp.sqrt(sx * sx + sy * sy + sz * sz) / jnp.maximum(cnt, 1.0)
    return jnp.sum(rlen * cnt) / jnp.maximum(jnp.sum(cnt), 1.0)


_PHASE_HINT = []  # trace-time stack (single-threaded tracing): while
# non-empty, traverse_dispatch emits ONLY the prefilter + one full-width
# Morton-compact walk — no natural branch, no ladder sub-rungs.  The
# two-phase integrator wraps its compacted continuation in this hint so
# the extra call sites stay within the axon tunnel's per-process
# executable budget (CLAUDE.md 4b): +2 Mosaic kernels instead of +6.


class phase_compact_hint:
    def __enter__(self):
        _PHASE_HINT.append(True)

    def __exit__(self, *exc):
        _PHASE_HINT.pop()


_PRESORT_HINT = []  # trace-time stack: while non-empty, traverse_dispatch
# trusts the caller's lane order (the staged integrator keeps its state
# m6d-sorted per bounce and folds the root prefilter into max_t) and runs
# the grouped packet kernel DIRECTLY — no key, no argsort, no per-wave
# row gather, no scatter-back.  Same kernel instantiation as the hinted
# Morton walk, so zero extra executables.


class presorted_hint:
    def __enter__(self):
        _PRESORT_HINT.append(True)

    def __exit__(self, *exc):
        _PRESORT_HINT.pop()


def traverse_dispatch(rows, scene_lo, scene_hi, o: Vec3, d: Vec3, t0,
                      ignored_prim, occlusion: bool, interpret: bool = False,
                      v4_tables=None):
    """packet_traverse with a runtime coherence/liveness policy.

    The caller generates rays in pixel-tile order, so COHERENT wavefronts
    (primary rays, shadow rays toward a light) run in NATURAL order — no
    data movement at all.  Incoherent wavefronts (post-bounce directions)
    would make every block walk the union of scattered members (measured
    953 ms vs 276 for a 60%-live bounce wave, tools/prof20), so they
    compact live rays into a Morton-sorted prefix first — the full batch
    when needed, a COMPACT_BLOCKS prefix when the live set fits (saves the
    full-batch gather).  Coherence is measured per call with one cheap
    reduce: mean resultant length of the live directions within blocks."""
    n = int(t0.shape[0])
    compact_n = COMPACT_BLOCKS * BLOCK
    if _PRESORT_HINT and not occlusion:
        return packet_traverse(rows, o, d, t0, ignored_prim,
                               occlusion=False, interpret=interpret,
                               v4_tables=v4_tables, groups=8)
    if n <= compact_n and not _PHASE_HINT:
        return packet_traverse(rows, o, d, t0, ignored_prim,
                               occlusion=occlusion, interpret=interpret,
                               v4_tables=v4_tables)
    # under the phase hint, small stage widths keep the per-bounce
    # prefilter + Morton re-sort (the wave scatters again every bounce;
    # natural order would grow every block's visit union)

    coh = block_coherence(d, t0)

    args = (o.x, o.y, o.z, d.x, d.y, d.z, t0,
            ignored_prim.astype(jnp.float32))

    def natural(args, groups: int = 1):
        ox, oy, oz, dx, dy, dz, t0, ign = args
        return packet_traverse(rows, Vec3(ox, oy, oz), Vec3(dx, dy, dz),
                               t0, _i32e(ign), occlusion=occlusion,
                               interpret=interpret, v4_tables=v4_tables,
                               groups=groups,
                               shadow_grouped=occlusion and groups == 8)

    def morton(args, m, live_mask):
        """Morton-compact the masked-live rays to the first m blocks, walk,
        and scatter the results back.  Rays outside ``live_mask`` (dead
        lanes AND prefilter-proven misses) sort last and keep the default
        miss outputs."""
        ox, oy, oz, dx, dy, dz, t0, ign = args
        key = jnp.where(live_mask,
                        _compact_key(Vec3(ox, oy, oz), Vec3(dx, dy, dz),
                                     ign, scene_lo, scene_hi,
                                     occlusion=occlusion),
                        jnp.int32(0x7FFFFFFF))
        ids = jnp.argsort(key, stable=True)[:m * BLOCK]
        # pack -> one row gather (per-index latency dominates; 8 scalar
        # gathers would cost ~4x, docs/PERFORMANCE.md)
        eye8 = jnp.eye(8, dtype=jnp.float32)
        big = jax.lax.dot_general(
            jnp.stack([ox, oy, oz, dx, dy, dz, t0, ign]), eye8,
            (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # (n, 8)
        blk = big[ids]
        bT = jax.lax.dot_general(
            eye8, blk, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # (8, m*BLOCK)
        # BUAS_OCC_LADDER_GROUPED=1 routes ladder-compacted occlusion
        # waves to the GROUPED kernel too.  Motivation (tools/prof50, on
        # chip, real bounce-0 NEE wave): light-SORTED grouped walks run
        # 18.4 ms vs 27.7 mixed — the ladder's light-major key plus
        # live-prefix compaction should stack both wins.
        out = packet_traverse(rows, Vec3(bT[0], bT[1], bT[2]),
                              Vec3(bT[3], bT[4], bT[5]), bT[6],
                              _i32e(bT[7]), occlusion=occlusion,
                              interpret=interpret, v4_tables=v4_tables,
                              groups=8,
                              shadow_grouped=occlusion and _os.environ.get(
                                  "BUAS_OCC_LADDER_GROUPED", "1") == "1")

        def back(col, default):
            return default.at[ids].set(col, unique_indices=True)

        prim = back(out[1], jnp.full((n,), -1, jnp.int32))
        if occlusion:
            z = jnp.zeros((n,))
            return (t0, prim, jnp.full((n,), -1, jnp.int32), z, z,
                    out[5], out[6])
        t = back(out[0], t0)
        tri = back(out[2], jnp.full((n,), -1, jnp.int32))
        bv = back(out[3], jnp.zeros((n,)))
        bw = back(out[4], jnp.zeros((n,)))
        return t, prim, tri, bv, bw, out[5], out[6]

    n_blocks = n // BLOCK + (1 if n % BLOCK else 0)

    def incoherent(args):
        # Root prefilter: prove the hit-nothing rays (66% of a real diffuse
        # bounce wave, tools/prof35) missed BEFORE moving any data; they
        # keep the default miss outputs.  Identical slab test to the
        # kernel's first pop — exact.
        ox, oy, oz, dx, dy, dz, t0a, _ = args
        live_r = (t0a >= 0.0) & root_prefilter(
            rows, Vec3(ox, oy, oz), Vec3(dx, dy, dz), t0a)
        if _PHASE_HINT:
            # executable-budget mode: ONE full-width compact walk.  Dead
            # and prefiltered lanes sort last, so all-dead trailing blocks
            # exit in one kernel iteration — the rung's walk saving is
            # near-zero here; only its (small at this width) gather
            # saving is given up.
            return morton(args, n_blocks, live_r)
        nl = jnp.sum(live_r.astype(jnp.int32))
        # Ladder of STATIC compact sizes.  The compaction's data movement
        # (argsort + (m,8) row gather + MXU transposes + scalar scatters)
        # scales with the gathered prefix m, and it DOMINATES mid-liveness
        # occlusion waves: the real bounce-0 NEE wave walks only ~70k
        # block-iterations (~24 ms kernel, tools/prof34 offline replay) of
        # its measured ~96 ms — the rest was moving all 2047 blocks when
        # only ~1000 were live.  Pick the smallest rung that holds the
        # (prefiltered) live count; the full batch stays as the fallback.
        # top rungs only materialize for batches bigger than a 1080p frame
        # (the 2N merged light+env shadow wave: 4054 blocks, ~2M live)
        rungs = [m for m in (COMPACT_BLOCKS, 2 * COMPACT_BLOCKS,
                             4 * COMPACT_BLOCKS, (11 * COMPACT_BLOCKS) // 2,
                             8 * COMPACT_BLOCKS, 11 * COMPACT_BLOCKS)
                 if m < n_blocks]
        branches = [(lambda a, m=m: morton(a, m, live_r)) for m in rungs]
        branches.append(lambda a: morton(a, n_blocks, live_r))
        if len(branches) == 1:
            return branches[0](args)
        idx = sum((nl > m * BLOCK).astype(jnp.int32) for m in rungs)
        return jax.lax.switch(idx, branches, args)

    # Occlusion default (round 4o): resident scenes run shadow waves in
    # NATURAL order through the GROUPED kernel — zero compaction movement.
    # Rationale: the round-4m NO_SHADOW attribution put the 8 shadow waves
    # at ~117 ms of the 406 ms frame while their KERNELS are ~free; the
    # cost is the ladder's argsort + row gather + scatter per wave.  Shadow
    # origins are already block-coherent in every wave (pixel tiles at
    # bounce 0/1, integrator-held m6d order in the stages).  Mode "1"
    # (block-lockstep natural) measured a DEAD-END (447 vs 406 ms — the
    # light-mixed blocks pay both occluder cones in lockstep); mode "2"
    # (grouped: 16-lane groups bound each union tighter and exit per
    # group) measured 406.5 -> 389.5 ms in-frame on the resident bench
    # scene and 1161.7 -> 866.3 ms on the 1080p stress scene (natural
    # grouped walks route to v7 on split tables) — the default for both.
    # Round 4p amends the RESIDENT-scene default to "0" + grouped ladder
    # (BUAS_OCC_LADDER_GROUPED): prof50 measured light-SORTED grouped
    # walks 1.5x over light-mixed natural ones on the real bounce-0 NEE
    # wave, and the in-frame A/B landed 386.0 ms / 10.07 Mrays/s vs the
    # 4o natural-grouped default's 389.5-397.8 — the ladder's light-major
    # key + live-prefix compaction beat zero-movement mixed walks.
    # Split-table scenes KEEP natural grouped ("2"): there the ladder
    # measured 1161.7 vs natural's 866.3 ms (stress 1080p, round 4o).
    shadow_natural = _os.environ.get(
        "BUAS_SHADOW_NATURAL", "2" if v4_tables is not None else "0")
    if occlusion and shadow_natural in ("1", "2"):
        return natural(args, groups=8 if shadow_natural == "2" else 1)
    # Side paths under the ladder default ("0"): phase-hinted occlusion
    # waves take the full-width Morton walk (executable-budget mode) and
    # coherent (coh>0.9) occlusion waves fall through to natural — both
    # now grouped (groups=8) so the per-group early-exit win is kept on
    # every occlusion route, not only the ladder rungs (ADVICE r4).
    if _PHASE_HINT or _os.environ.get("BUAS_FORCE_COMPACT", "") == "1":
        return incoherent(args)
    if occlusion:
        return jax.lax.cond(coh > 0.9, lambda a: natural(a, groups=8),
                            incoherent, args)
    return jax.lax.cond(coh > 0.9, natural, incoherent, args)


def _i32e(x):
    """Exact-float-value int decode (CLAUDE.md pitfall 1)."""
    return x.astype(jnp.int32)
