"""Lockstep traversal of the wide row BVH (ops/wide_bvh.py; 8- or 16-wide).

Replaces ops/traverse.py's threaded binary walk on the hot path.  Per
``while_loop`` iteration each ray gathers exactly ONE 64-float row and
does dense VPU work on it; descent is nearest-first via a Batcher
sorting network, and backtracking resolves in the same iteration by scanning
the per-level nibble stack for the deepest unexhausted entry — there are no
wasted pop-only iterations.  Long batches are processed in chunks
(``lax.map``) so coherent chunks retire at their own pace instead of the
whole frame waiting for its single worst ray.

Semantics preserved from the reference (intersection.cpp:403-611): planes
tested linearly outside the BVH, shadow rays exclude the sampled light
primitive and early-out, normals computed once from the winning hit.  Mesh
triangles are world-space (pre-transformed at pack), so barycentrics and t
match the reference's object-space test by affine invariance.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from ..core.vec import Vec3, dot, noz, where as vwhere
from ..models.scene import PackedScene, PRIM_SPHERE, PRIM_BOX
from . import intersect
from .traverse import (BIG_T, Hit, _gather_v3, _intersect_planes,
                       _xform_point_rows, _xform_vector_rows,
                       _xform_normal_rows)
from .wide_bvh import (KIND_INTERNAL, KIND_TRIS, KIND_PRIM, WIDE, WIDE_LEAF)

DONE = jnp.int32(-2)
KEY_MISS = jnp.int32(0x7FFFFFFF)



# remaining-children nibbles per stack entry, packed 8 per int32 word
SEQ_WORDS = max(1, -(-(WIDE - 1) // 8))


def _batcher_network(n: int):
    """Batcher merge-exchange sorting network (Knuth TAOCP 5.2.2 Alg M)."""
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


_SORT_NET = _batcher_network(WIDE)

# Lockstep batch width.  262144 measured optimal on v5e round 2: the real
# loop body costs ~4.0 ns/ray/iter at 262k lanes vs ~17 ns/ray at 32k (a
# ~0.5 ms fixed per-iteration floor dominates small batches) and ~7.6 ns/ray
# at 2M (state/index traffic falls out of cache).
CHUNK = int(os.environ.get("BUAS_TRAVERSE_CHUNK", 262144))

# Iteration caps for the phased restart traversal (final phase is uncapped).
# The lockstep loop pays its WORST lane every iteration: the bench scene
# measures mean 3.0 row visits/ray but ~62 iterations to retire the worst
# primary ray — a 20x tail tax.  Phases bound it: run `cap` iterations for
# everyone, then re-pack the unfinished rays (argsort, standalone-fast) into
# a minimal number of chunks and RESTART them from the root with their
# carried best-hit t, which prunes every subtree already resolved.  Restart
# (vs resuming) means no per-level stack state survives a phase, so the
# inter-phase compaction moves only the 11-word ray/hit tuple.
PHASE_CAPS = tuple(
    int(x) for x in os.environ.get("BUAS_PHASE_CAPS", "8").split(",")
    if x.strip())


def _i32(x):
    """Decode an integer metadata lane stored as an exact float32 VALUE
    (wide_bvh._f).  A bitcast encoding would be a denormal for small ints and
    get flushed to zero by XLA CPU (DAZ/FTZ) and by TPU hardware."""
    return x.astype(jnp.int32)


def _key_bits(x):
    """Bitcast of a NON-NEGATIVE float for distance-ordered sort keys (bit
    patterns of non-negative f32 are monotone as int32)."""
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _traverse_chunk(rows, depth: int, o: Vec3, d: Vec3, t0, ignored_prim,
                    occlusion: bool, cap: int | None = None,
                    full_state: bool = False, carry=None, start_done=None):
    """Core loop over one chunk of rays. Returns (t, prim, tri, bv, bw, nv, tt).

    TPU layout discipline: ray-state vectors are (nc,) arrays — XLA lays the
    ray index along VPU lanes.  The gathered (nc, 128) rows put FIELDS on
    lanes instead, so every per-field column extraction would force a full
    cross-lane relayout (~140 of them per iteration = the whole runtime,
    measured 5 ms/iter at 147k rays).  Transposing the gathered block ONCE to
    (128, nc) makes every field read a cheap sublane slice already in
    rays-on-lanes layout — 3.6x faster end to end.  The nibble stacks are
    kept (D, nc) for the same reason."""
    n = t0.shape
    n_rows = rows.shape[0]
    inv_d = intersect.safe_inv_dir(d)
    lanes = jnp.arange(depth, dtype=jnp.int32)[:, None]  # (D, 1)

    def cond(st):
        alive = jnp.any(st[0] != DONE)
        if cap is not None:
            return alive & (st[12] < cap)
        return alive

    row_w = rows.shape[1]
    eye = jnp.eye(row_w, dtype=jnp.float32)

    def body(st):
        (cur, level, seqs, bases, rems, t, prim, tri, bv, bw, nv, tt, it) = st
        seqs = list(seqs)
        active = cur != DONE
        g = rows[jnp.clip(cur, 0, n_rows - 1)]  # (nc, row_w) gather
        # Materialize the transpose through the MXU (identity matmul at
        # HIGHEST precision = exact f32).  A plain .T gets folded into a
        # layout annotation and every per-field sublane read then lowers to
        # a full-array lane extraction (slice_reduce fusions = 93% of the
        # loop's cycles in the profile).  The dot is ~128*128*nc MACs and
        # forces a physically rays-on-lanes result, making all ~100 field
        # reads free sublane slices.
        rowT = jax.lax.dot_general(
            eye, g, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # (row_w, nc)
        kind = jnp.where(active, _i32(rowT[0]), KIND_PRIM + 99)

        # ------- internal: test WIDE child slabs, sort, descend ------------
        slot_mask = jnp.int32(WIDE - 1)  # WIDE is a power of two
        child_base = _i32(rowT[1])
        keys = []
        n_hits = jnp.zeros_like(child_base)
        for c in range(WIDE):
            s = 2 + 6 * c
            lo = Vec3(rowT[s], rowT[s + 1], rowT[s + 2])
            hi = Vec3(rowT[s + 3], rowT[s + 4], rowT[s + 5])
            t1 = (lo - o) * inv_d
            t2 = (hi - o) * inv_d
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t1.x, t2.x),
                                         jnp.minimum(t1.y, t2.y)),
                             jnp.minimum(t1.z, t2.z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t1.x, t2.x),
                                         jnp.maximum(t1.y, t2.y)),
                             jnp.maximum(t1.z, t2.z))
            hit_c = (tn < tf) & (tf > 0.0) & (tn < t)
            # distance-ordered sort key: non-negative f32 bits are monotone
            # as int32; the low log2(WIDE) bits carry the slot
            bits = _key_bits(jnp.maximum(tn, 0.0))
            key = jnp.bitwise_or(jnp.bitwise_and(bits, ~slot_mask),
                                 jnp.int32(c))
            keys.append(jnp.where(hit_c, key, KEY_MISS))
            n_hits = n_hits + hit_c.astype(jnp.int32)
        for (i, j) in _SORT_NET:
            ki, kj = keys[i], keys[j]
            keys[i] = jnp.minimum(ki, kj)
            keys[j] = jnp.maximum(ki, kj)
        any_hit = n_hits > 0
        slot0 = jnp.bitwise_and(keys[0], slot_mask)
        # pack the sorted REST slots (keys[1:]) as nibbles, 8 per word; the
        # per-level remaining-count (rems) says how many are valid, so slot
        # value 15 never collides with a sentinel
        seq_rest = []
        for wd in range(SEQ_WORDS):
            word = jnp.zeros_like(child_base)
            for jn in range(8):
                j = 1 + wd * 8 + jn
                if j >= WIDE:
                    break
                nib = jnp.bitwise_and(keys[j], slot_mask)
                word = jnp.bitwise_or(word, nib << (4 * jn))
            seq_rest.append(word)

        is_int = active & (kind == KIND_INTERNAL)
        descend = is_int & any_hit
        push = descend & (n_hits > 1)
        new_level = level + 1
        wmask = push[None, :] & (lanes == new_level[None, :])  # (D, nc)
        for wd in range(SEQ_WORDS):
            seqs[wd] = jnp.where(wmask, seq_rest[wd][None, :], seqs[wd])
        bases = jnp.where(wmask, child_base[None, :], bases)
        rems = jnp.where(wmask, (n_hits - 1)[None, :], rems)
        level = jnp.where(push, new_level, level)
        cur_desc = child_base + slot0

        # ---------------- tri leaf: 8 inline world-space triangles ---------
        is_tri = active & (kind == KIND_TRIS)
        count = _i32(rowT[1])
        tri_base = _i32(rowT[2])
        inst_t = _i32(rowT[3])
        not_ign = inst_t != ignored_prim
        tri_ok = is_tri & not_ign
        any_leaf_hit = jnp.zeros_like(is_tri)
        for k in range(WIDE_LEAF):
            s = 8 + 9 * k
            a = Vec3(rowT[s], rowT[s + 1], rowT[s + 2])
            e1 = Vec3(rowT[s + 3], rowT[s + 4], rowT[s + 5])
            e2 = Vec3(rowT[s + 6], rowT[s + 7], rowT[s + 8])
            pvec = Vec3(d.y * e2.z - d.z * e2.y,
                        d.z * e2.x - d.x * e2.z,
                        d.x * e2.y - d.y * e2.x)
            det = dot(e1, pvec)
            ok = (det <= -intersect.TRI_EPS) | (det >= intersect.TRI_EPS)
            inv_det = 1.0 / jnp.where(ok, det, 1.0)
            tvec = o - a
            v_ = dot(tvec, pvec) * inv_det
            ok = ok & (v_ >= 0.0) & (v_ <= 1.0)
            qvec = Vec3(tvec.y * e1.z - tvec.z * e1.y,
                        tvec.z * e1.x - tvec.x * e1.z,
                        tvec.x * e1.y - tvec.y * e1.x)
            w_ = dot(d, qvec) * inv_det
            ok = ok & (w_ >= 0.0) & (v_ + w_ <= 1.0)
            t_new = dot(e2, qvec) * inv_det
            ok = ok & (t_new >= intersect.TRI_EPS) & (t >= t_new)
            h = ok & tri_ok & (k < count)
            t = jnp.where(h, t_new, t)
            prim = jnp.where(h, inst_t, prim)
            tri = jnp.where(h, tri_base + k, tri)
            bv = jnp.where(h, v_, bv)
            bw = jnp.where(h, w_, bw)
            any_leaf_hit = any_leaf_hit | h

        # ---------------- analytic prim row --------------------------------
        is_prim = active & (kind == KIND_PRIM)
        prim_id = _i32(rowT[1])
        ptype = _i32(rowT[2])
        mi = [rowT[4 + i] for i in range(12)]  # inline (3,4) inverse rows
        os_o = Vec3(mi[0] * o.x + mi[1] * o.y + mi[2] * o.z + mi[3],
                    mi[4] * o.x + mi[5] * o.y + mi[6] * o.z + mi[7],
                    mi[8] * o.x + mi[9] * o.y + mi[10] * o.z + mi[11])
        os_d = Vec3(mi[0] * d.x + mi[1] * d.y + mi[2] * d.z,
                    mi[4] * d.x + mi[5] * d.y + mi[6] * d.z,
                    mi[8] * d.x + mi[9] * d.y + mi[10] * d.z)
        hs, ts_ = intersect.sphere(os_o, os_d, rowT[16], t)
        hb, tb_ = intersect.box(os_o, os_d,
                                Vec3(rowT[17], rowT[18], rowT[19]), t)
        sph = ptype == PRIM_SPHERE
        prim_hit = is_prim & (prim_id != ignored_prim) & jnp.where(sph, hs, hb)
        t = jnp.where(prim_hit, jnp.where(sph, ts_, tb_), t)
        prim = jnp.where(prim_hit, prim_id, prim)
        tri = jnp.where(prim_hit, -1, tri)
        hit_now = any_leaf_hit | prim_hit

        # ---------------- pop: deepest unexhausted stack level -------------
        has = rems > 0  # (D, nc)
        eligible = has & (lanes <= level[None, :])
        l_star = jnp.max(jnp.where(eligible, lanes, -1), axis=0)  # (nc,)
        found = l_star >= 0
        oh = lanes == l_star[None, :]
        base_l = jnp.sum(jnp.where(oh, bases, 0), axis=0)
        c_pop = jnp.bitwise_and(
            jnp.sum(jnp.where(oh, seqs[0], 0), axis=0), 0xF)
        need_pop = active & ~descend
        wpop = need_pop[None, :] & oh
        # shift the nibble chain down one, carrying across words
        for wd in range(SEQ_WORDS):
            lo_sh = jnp.bitwise_and(seqs[wd] >> 4, 0x0FFFFFFF)
            if wd + 1 < SEQ_WORDS:
                carry = jnp.bitwise_and(seqs[wd + 1], 0xF) << 28
                lo_sh = jnp.bitwise_or(lo_sh, carry)
            seqs[wd] = jnp.where(wpop, lo_sh, seqs[wd])
        rems = jnp.where(wpop, rems - 1, rems)
        level = jnp.where(need_pop, jnp.where(found, l_star, level), level)
        cur_pop = jnp.where(found, base_l + c_pop, DONE)

        cur = jnp.where(descend, cur_desc, cur_pop)
        if occlusion:
            cur = jnp.where(hit_now, DONE, cur)
        cur = jnp.where(active, cur, DONE)

        nv = nv + jnp.sum(active.astype(jnp.int32))
        tt = tt + jnp.sum(jnp.where(tri_ok, jnp.minimum(count, WIDE_LEAF), 0))
        return (cur, level, tuple(seqs), bases, rems, t, prim, tri, bv, bw,
                nv, tt, it + 1)

    z32 = jnp.zeros((), jnp.int32)
    if carry is None:
        prim0 = jnp.full(n, -1, jnp.int32)
        tri0 = jnp.full(n, -1, jnp.int32)
        bv0 = jnp.zeros(n)
        bw0 = jnp.zeros(n)
    else:  # restart phase: resume with the best hit found so far
        prim0, tri0, bv0, bw0 = carry
    cur0 = jnp.zeros(n, jnp.int32)  # root row 0
    if start_done is not None:
        # already-finished rays in a mixed boundary chunk start DONE and
        # cost zero iterations instead of re-walking the tree
        cur0 = jnp.where(start_done, DONE, cur0)
    st0 = (
        cur0,
        jnp.full(n, -1, jnp.int32),  # level: empty stack
        tuple(jnp.zeros((depth,) + n, jnp.int32) for _ in range(SEQ_WORDS)),
        jnp.zeros((depth,) + n, jnp.int32),
        jnp.zeros((depth,) + n, jnp.int32),  # rems: remaining children/level
        t0,
        prim0,
        tri0,
        bv0, bw0, z32, z32, z32,
    )
    out = jax.lax.while_loop(cond, body, st0)
    if full_state:
        return out
    return out[5], out[6], out[7], out[8], out[9], out[10], out[11]


# packed phased-state column indices: one (npad, 16) f32 matrix holds the
# whole inter-phase ray state so each phase boundary moves state with ONE
# row gather.  Integer fields (ign/prim/tri/origin index) are stored as
# exact float VALUES (all < 2^24; see _i32 / CLAUDE.md pitfall 1).
_C_OX, _C_OY, _C_OZ, _C_DX, _C_DY, _C_DZ = 0, 1, 2, 3, 4, 5
_C_T, _C_BV, _C_BW, _C_IGN, _C_PRIM, _C_TRI, _C_ORIG, _C_DONE = \
    6, 7, 8, 9, 10, 11, 12, 13
_NCOL = 16


def _traverse(ps: PackedScene, o: Vec3, d: Vec3, t0, ignored_prim,
              occlusion: bool):
    """Phased restart dispatch over the flat ray batch.

    Phase p runs every not-yet-finished ray for at most ``PHASE_CAPS[p]``
    lockstep iterations; rays still walking are then packed to the front
    (one stable argsort — their pixel-order coherence survives) and restarted
    from the root with their carried best hit, whose t bound prunes the
    already-resolved subtrees.  Chunks past the live prefix are skipped
    (``lax.cond``), so the cost of a pass tracks the number of rays that
    still need iterations instead of batch-width x worst-ray (measured mean
    3.0 visits/ray vs ~62 lockstep iterations on the bench scene — a 20x
    tail the phases reclaim).  Rays whose ``t0 < 0`` (dead wavefront lanes,
    non-facing shadow queries) finish in one iteration of phase one and are
    excluded from every later phase, which is what makes late mostly-dead
    bounces cheap without any caller-side compaction.

    Data movement discipline (measured, tools/prof10): scalar-array gathers
    of a chunk from the batch cost ~3 ms EACH (12 of them made the naive
    step 10x slower than its loop), while row gathers, scatters and argsort
    are cheap.  So the inter-phase state lives in ONE (npad, 16) f32 matrix:
    each phase does a single row-gather to sort unfinished rays first, the
    state stays permuted across phases (each chunk slice is then contiguous
    and free), per-chunk field access goes through one MXU transpose, and
    one row-scatter at the very end restores caller order via the carried
    original-index column."""
    depth = int(ps.wide_depth_arr.shape[0])
    rows = ps.wide_rows
    n = int(t0.shape[0])

    # Routing policy (measured IN-FRAME, bench_A vs bench_r3b at 1080p):
    # the Pallas packet kernel takes EVERY wave by default.  Standalone
    # probes (tools/prof26+29) say the phased XLA pipeline wins DENSE
    # incoherent closest-hit (202 ms vs 370 at 60% live), but round 3a's
    # cond on coherence alone REGRESSED the frame 1079 -> 2575 ms: every
    # sparse late bounce (which the compacted packet path finishes in
    # ~10 ms) paid the XLA path's ~200 ms liveness-independent full-batch
    # cost.  BUAS_INCOHERENT=xla opts in the refined cond below, which
    # routes to XLA only waves that are BOTH incoherent (diffuse fans)
    # AND too live for the compact packet path.
    from . import pallas_packet as pp
    use_packet = pp.enabled_for(rows, depth)
    v4 = None if use_packet else pp.v4_tables_for(ps, depth)
    if use_packet or v4 is not None:
        interp = pp.interpret_mode()
        if (occlusion or n <= pp.COMPACT_BLOCKS * pp.BLOCK
                or os.environ.get("BUAS_INCOHERENT", "packet") != "xla"):
            return pp.traverse_dispatch(rows, ps.scene_lo, ps.scene_hi,
                                        o, d, t0, ignored_prim, occlusion,
                                        interpret=interp, v4_tables=v4)
        args = (o.x, o.y, o.z, d.x, d.y, d.z, t0, ignored_prim)

        def packet(a):
            return pp.traverse_dispatch(rows, ps.scene_lo, ps.scene_hi,
                                        Vec3(a[0], a[1], a[2]),
                                        Vec3(a[3], a[4], a[5]), a[6],
                                        _i32(a[7]), occlusion=False,
                                        interpret=interp, v4_tables=v4)

        def xla(a):
            return _traverse_xla(ps, rows, depth,
                                 Vec3(a[0], a[1], a[2]),
                                 Vec3(a[3], a[4], a[5]), a[6], _i32(a[7]),
                                 occlusion=False)

        coh = pp.block_coherence(d, t0)
        n_live = jnp.sum((t0 >= 0.0).astype(jnp.int32))
        dense_incoherent = (coh <= 0.9) \
            & (n_live > pp.COMPACT_BLOCKS * pp.BLOCK)
        return jax.lax.cond(dense_incoherent, xla, packet, args)

    return _traverse_xla(ps, rows, depth, o, d, t0, ignored_prim, occlusion)


def _traverse_xla(ps: PackedScene, rows, depth, o: Vec3, d: Vec3, t0,
                  ignored_prim, occlusion: bool):
    n = int(t0.shape[0])
    if n <= CHUNK or not PHASE_CAPS:
        return _traverse_chunk(rows, depth, o, d, t0, ignored_prim, occlusion)

    # Runtime liveness dispatch: when the live rays fit ONE chunk (late
    # bounces, mostly-dead wavefronts, sparse shadow queries), compact them
    # into a single chunk and skip every full-batch data-movement pass.
    # The full phased pipeline costs ~275 ms at 2M rays REGARDLESS of
    # liveness (its boundaries/restore are full-batch); this path is ~90 ms
    # and shrinks further with the loop's actual work.
    n_live = jnp.sum((t0 >= 0.0).astype(jnp.int32))
    args = (o.x, o.y, o.z, d.x, d.y, d.z, t0, ignored_prim)
    return jax.lax.cond(
        n_live <= CHUNK,
        lambda a: _traverse_compact(rows, depth, a, occlusion),
        lambda a: _traverse_full(rows, depth, a, occlusion),
        args)


def _traverse_compact(rows, depth, args, occlusion: bool):
    """Low-liveness path: pack the 8 input fields, row-gather the (at most
    CHUNK) live rays to the front, run ONE uncapped lockstep chunk, scatter
    the 5 results back.  Rays outside the gathered prefix are all done
    (t0 < 0) and keep their default outputs."""
    ox, oy, oz, dx, dy, dz, t0, ign = args
    n = int(t0.shape[0])
    done0 = t0 < 0.0
    perm = jnp.argsort(done0, stable=True)
    ids = perm[:CHUNK]  # all live rays live here when this branch runs

    eye8 = jnp.eye(8, dtype=jnp.float32)
    cols = jnp.stack([ox, oy, oz, dx, dy, dz, t0,
                      ign.astype(jnp.float32)])  # (8, n)
    big = jax.lax.dot_general(
        cols, eye8, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # (n, 8) rows
    blk = big[ids]  # ONE row gather of the live prefix
    bT = jax.lax.dot_general(
        eye8, blk, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # (8, CHUNK)
    out = _traverse_chunk(rows, depth, Vec3(bT[0], bT[1], bT[2]),
                          Vec3(bT[3], bT[4], bT[5]), bT[6], _i32(bT[7]),
                          occlusion)

    def back(col, default):
        return default.at[ids].set(col, unique_indices=True)

    prim = back(out[1], jnp.full((n,), -1, jnp.int32))
    if occlusion:
        # occlusion callers consume ONLY prim (intersect_shadow_ray);
        # scatters are per-index latency-bound, so skip the other four
        z = jnp.zeros((n,))
        return t0, prim, jnp.full((n,), -1, jnp.int32), z, z, out[5], out[6]
    t = back(out[0], t0)
    tri = back(out[2], jnp.full((n,), -1, jnp.int32))
    bv = back(out[3], jnp.zeros((n,)))
    bw = back(out[4], jnp.zeros((n,)))
    return t, prim, tri, bv, bw, out[5], out[6]


def _traverse_full(rows, depth, args, occlusion: bool):
    o = Vec3(args[0], args[1], args[2])
    d = Vec3(args[3], args[4], args[5])
    t0, ignored_prim = args[6], args[7]
    n = int(t0.shape[0])
    c = -(-n // CHUNK)
    npad = c * CHUNK
    assert npad < (1 << 24), "origin-index column must stay float-exact"

    def pad1(x, fill=0.0):
        return jnp.pad(x, (0, npad - n), constant_values=fill)

    t_in = pad1(t0, -1.0)  # padded rays: t0 < 0 -> done before phase one
    cols = [
        pad1(o.x), pad1(o.y), pad1(o.z),
        pad1(d.x), pad1(d.y, 1.0), pad1(d.z),
        t_in,
        jnp.zeros((npad,)), jnp.zeros((npad,)),  # bv, bw
        jnp.pad(ignored_prim, (0, npad - n),
                constant_values=-1).astype(jnp.float32),
        jnp.full((npad,), -1.0),  # prim
        jnp.full((npad,), -1.0),  # tri
        jnp.arange(npad, dtype=jnp.float32),  # original position
        (t_in < 0.0).astype(jnp.float32),  # done
        jnp.zeros((npad,)), jnp.zeros((npad,)),
    ]
    # ONE materialized transpose (cols-on-sublanes -> rows): MXU identity dot
    eye = jnp.eye(_NCOL, dtype=jnp.float32)
    big = jax.lax.dot_general(
        jnp.stack(cols), eye, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # (npad, 16)

    nv = jnp.zeros((), jnp.int32)
    tt = jnp.zeros((), jnp.int32)
    chunk_ix = jnp.arange(c, dtype=jnp.int32) * CHUNK
    done = t_in < 0.0  # (npad,) carried OUTSIDE the matrix: reading a
    # column back out of row-major `big` would be a full cross-lane relayout

    for p_i, cap in enumerate(list(PHASE_CAPS) + [None]):
        if p_i == 0:
            # phase 1 runs in NATURAL order: rays start pixel-coherent, and
            # a whole-batch permute costs ~50 ms (tools/prof13) — instead a
            # cheap per-chunk reduce skips chunks with no live rays at all
            # (dead wavefronts cluster spatially), and start_done lanes
            # cost zero iterations inside mixed chunks.
            flags = jnp.sum((~done).reshape(c, CHUNK), axis=1) > 0
        else:
            # later phases compact the scattered survivors to the front:
            # stable partition, unfinished rays first (keeps pixel-order
            # coherence).  Gather form on purpose: TPU random access is
            # per-index latency-bound and scatters cost ~4x gathers at
            # this size (prof13: row gather 46 ms, row scatter 205 ms,
            # bool argsort ~3 ms).
            perm = jnp.argsort(done, stable=True)
            big = big[perm]  # state STAYS permuted across phases
            n_todo = npad - jnp.sum(done.astype(jnp.int32))
            flags = chunk_ix < n_todo
        e_done = eye[_C_DONE]  # (16,) picks the done column via one matvec

        def step(carry_st, xs, cap=cap, e_done=e_done):
            nv, tt = carry_st
            flag, blk = xs  # blk: (CHUNK, 16) contiguous rows

            def run(blk):
                # per-field reads must be sublane slices: transpose through
                # the MXU (exact; same trick as the traversal loop body)
                bT = jax.lax.dot_general(
                    eye, blk, (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)  # (16, CHUNK)
                go = Vec3(bT[_C_OX], bT[_C_OY], bT[_C_OZ])
                gd = Vec3(bT[_C_DX], bT[_C_DY], bT[_C_DZ])
                sd = bT[_C_DONE] > 0.5
                out = _traverse_chunk(
                    rows, depth, go, gd, bT[_C_T], _i32(bT[_C_IGN]),
                    occlusion, cap=cap, full_state=True,
                    carry=(_i32(bT[_C_PRIM]), _i32(bT[_C_TRI]),
                           bT[_C_BV], bT[_C_BW]),
                    start_done=sd)
                fin = (out[0] == DONE) | sd
                new_cols = [
                    bT[_C_OX], bT[_C_OY], bT[_C_OZ],
                    bT[_C_DX], bT[_C_DY], bT[_C_DZ],
                    out[5], out[8], out[9], bT[_C_IGN],
                    out[6].astype(jnp.float32), out[7].astype(jnp.float32),
                    bT[_C_ORIG], fin.astype(jnp.float32),
                    bT[14], bT[15],
                ]
                nblk = jax.lax.dot_general(
                    jnp.stack(new_cols), eye, (((0,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)  # (CHUNK, 16)
                return nblk, fin, out[10], out[11]

            def skip(blk):
                # done flags ride out via one matvec (a column slice of the
                # row-major block would relayout the whole block)
                fin = jax.lax.dot_general(
                    blk, e_done, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32) > 0.5
                return (blk, fin, jnp.zeros((), jnp.int32),
                        jnp.zeros((), jnp.int32))

            nblk, fin, dnv, dtt = jax.lax.cond(flag, run, skip, blk)
            return (nv + dnv, tt + dtt), (nblk, fin)

        (nv, tt), (big3, fins) = jax.lax.scan(
            step, (nv, tt), (flags, big.reshape(c, CHUNK, _NCOL)))
        big = big3.reshape(npad, _NCOL)
        done = fins.reshape(npad)

    # restore caller order via the origin-index column: one MXU transpose
    # (sublane-slice field reads) + 5 SCALAR scatters.  A single (npad, 16)
    # row scatter measured ~205 ms vs ~54 ms for this form (tools/prof13) —
    # TPU scatter cost is per-index latency-bound, and scalar scatters move
    # only the 5 result fields instead of all 16.
    bT = jax.lax.dot_general(
        eye, big, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # (16, npad)
    orig = _i32(bT[_C_ORIG])
    z = jnp.zeros((npad,), jnp.float32)

    def restore(col):
        return z.at[orig].set(col, unique_indices=True)[:n]

    prim = _i32(restore(bT[_C_PRIM]))
    if occlusion:
        # occlusion callers consume ONLY prim; skip 4 of the 5 scatters
        zn = z[:n]
        return t0, prim, jnp.full((n,), -1, jnp.int32), zn, zn, nv, tt
    return (restore(bT[_C_T]), prim, _i32(restore(bT[_C_TRI])),
            restore(bT[_C_BV]), restore(bT[_C_BW]), nv, tt)


def intersect_shadow_ray(ps: PackedScene, ray_o: Vec3, ray_d: Vec3, max_t,
                         ignored_prim) -> jnp.ndarray:
    """Occlusion query (intersection.cpp:600-604). True if anything blocks."""
    t_pl, plane_idx = _intersect_planes(ps, ray_o, ray_d, max_t)
    t, prim, *_ = _traverse(ps, ray_o, ray_d, t_pl, ignored_prim,
                            occlusion=True)
    return (prim >= 0) | (plane_idx >= 0)


def intersect_scene(ps: PackedScene, ray_o: Vec3, ray_d: Vec3,
                    max_t=None, ignored_prim=None) -> Hit:
    """Full closest-hit query + deferred normal (intersection.cpp:606-610)."""
    t0 = jnp.full_like(ray_o.x, BIG_T) if max_t is None else max_t
    if ignored_prim is None:
        ignored_prim = jnp.full_like(t0, -1).astype(jnp.int32)

    t_pl, plane_idx = _intersect_planes(ps, ray_o, ray_d, t0)
    t, prim, tri, bv, bw, nv, tt = _traverse(
        ps, ray_o, ray_d, t_pl, ignored_prim, occlusion=False)

    n_prims = int(ps.prim_type.shape[0])
    plane_won = (plane_idx >= 0) & (prim < 0)
    hit_id = jnp.where(prim >= 0, prim,
                       jnp.where(plane_won, n_prims + plane_idx, -1))
    hit_p = ray_o + ray_d * t

    # ---- deferred normal (":NormalCalculation", intersection.cpp:526-591) --
    primc = jnp.maximum(prim, 0)
    n_prims_k = int(ps.prim_nrm16.shape[0])
    if n_prims_k <= 64:
        # small prim table: one-hot MXU contraction — no per-ray gather at
        # all (per-index latency is the cost, tools/prof24: one-hot 9x)
        oh_p = (primc[None, :] == jnp.arange(n_prims_k, dtype=jnp.int32
                                             )[:, None]).astype(jnp.float32)
        mT = jax.lax.dot_general(
            ps.prim_nrm16, oh_p, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    else:
        # ONE row gather of (inverse transform | box extents | type), MXU-
        # transposed so every per-field read is a sublane slice (a direct
        # column extraction costs a full-array lane relayout per field, and
        # separate gathers pay per-index latency 5x, docs/PERFORMANCE.md)
        mT = jax.lax.dot_general(
            jnp.eye(16, dtype=jnp.float32), ps.prim_nrm16[primc],
            (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    mi = [mT[i] for i in range(12)]
    ptypes = _i32(mT[15])

    def _pt(p):
        return Vec3(mi[0] * p.x + mi[1] * p.y + mi[2] * p.z + mi[3],
                    mi[4] * p.x + mi[5] * p.y + mi[6] * p.z + mi[7],
                    mi[8] * p.x + mi[9] * p.y + mi[10] * p.z + mi[11])

    def _vec(v):
        return Vec3(mi[0] * v.x + mi[1] * v.y + mi[2] * v.z,
                    mi[4] * v.x + mi[5] * v.y + mi[6] * v.z,
                    mi[8] * v.x + mi[9] * v.y + mi[10] * v.z)

    def _nrm(nn):  # inverse-transpose: transpose of the gathered INVERSE 3x3
        return Vec3(mi[0] * nn.x + mi[4] * nn.y + mi[8] * nn.z,
                    mi[1] * nn.x + mi[5] * nn.y + mi[9] * nn.z,
                    mi[2] * nn.x + mi[6] * nn.y + mi[10] * nn.z)

    # sphere/box: object-space normal via inverse transform, back by inv-T
    os_o = _pt(ray_o)
    os_d = _vec(ray_d)
    os_hit_p = os_o + os_d * t
    n_sphere = os_hit_p
    box_r = Vec3(mT[12], mT[13], mT[14])
    rel = Vec3(os_hit_p.x / jnp.maximum(box_r.x, 1e-30),
               os_hit_p.y / jnp.maximum(box_r.y, 1e-30),
               os_hit_p.z / jnp.maximum(box_r.z, 1e-30))
    ax_, ay_, az_ = jnp.abs(rel.x), jnp.abs(rel.y), jnp.abs(rel.z)
    x_big = (ax_ >= ay_) & (ax_ >= az_)
    y_big = ~x_big & (ay_ >= az_)
    n_box = Vec3(
        jnp.where(x_big, jnp.sign(rel.x), 0.0),
        jnp.where(y_big, jnp.sign(rel.y), 0.0),
        jnp.where(x_big | y_big, 0.0, jnp.sign(rel.z)),
    )
    n_ana = vwhere(ptypes == PRIM_SPHERE, n_sphere, n_box)
    n_ana_world = noz(_nrm(n_ana))

    # mesh: world-space data directly (pre-transformed at pack).  All four
    # normals + has_n come from ONE (nc,16) row gather + MXU transpose —
    # 13 scalar gathers here measured ~200 ms/call at 2M rays.
    tric = jnp.maximum(tri, 0)
    bu = 1.0 - bv - bw
    nT = jax.lax.dot_general(
        jnp.eye(16, dtype=jnp.float32), ps.wtri_nrm16[tric],
        (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # (16, nc)
    na = Vec3(nT[0], nT[1], nT[2])
    nb = Vec3(nT[3], nT[4], nT[5])
    nc = Vec3(nT[6], nT[7], nT[8])
    n_smooth = noz(na * bu + nb * bv + nc * bw)
    n_geom = Vec3(nT[9], nT[10], nT[11])
    n_mesh = vwhere((nT[12] > 0.5) & (tri >= 0), n_smooth, n_geom)

    is_mesh = tri >= 0
    n_world = vwhere(is_mesh, n_mesh, n_ana_world)

    plc = jnp.maximum(plane_idx, 0)
    n_planes = int(ps.plane_mat.shape[0])
    if n_planes <= 16:
        # tiny plane set: unrolled where-chain, no per-ray gathers
        n_plane = Vec3(jnp.zeros_like(bv), jnp.zeros_like(bv),
                       jnp.zeros_like(bv))
        for p_i in range(n_planes):
            sel = plane_idx == p_i
            n_plane = Vec3(jnp.where(sel, ps.plane_n.x[p_i], n_plane.x),
                           jnp.where(sel, ps.plane_n.y[p_i], n_plane.y),
                           jnp.where(sel, ps.plane_n.z[p_i], n_plane.z))
    else:
        n_plane = _gather_v3(ps.plane_n, plc)
    n_world = vwhere(plane_won, n_plane, n_world)

    if n_prims_k <= 64 and n_planes <= 16:
        # material ids via static where-chains (prims ride the one-hot made
        # above; planes are a tiny unrolled loop) — no per-ray gathers
        pm_f = jax.lax.dot_general(
            ps.prim_mat.astype(jnp.float32)[None, :], oh_p,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)[0]
        prim_mat_sel = pm_f.astype(jnp.int32)  # exact values < 2^24
        plane_mat_sel = jnp.zeros_like(plc)
        for p_i in range(n_planes):
            plane_mat_sel = jnp.where(plane_idx == p_i, ps.plane_mat[p_i],
                                      plane_mat_sel)
        mat_id = jnp.where(prim >= 0, prim_mat_sel,
                           jnp.where(plane_won, plane_mat_sel, 0))
    else:
        mat_id = jnp.where(prim >= 0, ps.prim_mat[primc],
                           jnp.where(plane_won, ps.plane_mat[plc], 0))

    return Hit(t=t, hit_id=hit_id, mat_id=mat_id,
               tri=jnp.where(prim >= 0, tri, -1),
               bary_v=bv, bary_w=bw, p=hit_p, n=n_world,
               node_visits=nv, tri_tests=tt)
