// Native wide-BVH collapse: convert a binary SAH subtree into 8-wide
// self-describing rows (ops/wide_bvh.py row encoding).  The Python collapse
// is ~25 s for an 870k-triangle mesh; this is the production path.
//
// Children of a wide node are chosen by repeatedly expanding the
// largest-surface-area internal candidate until 8 slots fill (standard
// collapse).  Leaf candidates become triangle rows (<= 6 world-space
// triangles inline); rows for a wide node's children are allocated as a
// contiguous block of 8 (empty slots get degenerate point AABBs so the
// strict slab test misses).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

namespace {

constexpr int MAX_WIDE = 16;
constexpr int KIND_INTERNAL = 0;
constexpr int KIND_TRIS = 1;
constexpr int KIND_EMPTY = 3;

struct CollapseCtx {
    const float *lo, *hi;          // world AABBs per binary node (n,3)
    const int32_t *left_first, *count;
    const float *tri_a, *tri_e1, *tri_e2;  // (T,3) world-space, leaf-ordered
    int32_t tri_base, inst, row_base;
    float pad;
    int wide, row_w;               // node width / floats per row
    std::vector<float> rows;       // emitted rows, row_w floats each
};

static inline float sa(const float *lo, const float *hi) {
    float dx = std::max(hi[0] - lo[0], 0.0f);
    float dy = std::max(hi[1] - lo[1], 0.0f);
    float dz = std::max(hi[2] - lo[2], 0.0f);
    return 2.0f * (dx * dy + dy * dz + dz * dx);
}

static int32_t alloc_rows(CollapseCtx &c, int n) {
    int32_t base = (int32_t)(c.rows.size() / c.row_w);
    c.rows.resize(c.rows.size() + (size_t)n * c.row_w, 0.0f);
    for (int k = 0; k < n; k++)
        c.rows[(base + k) * (size_t)c.row_w] = (float)KIND_EMPTY;
    return base;
}

static void fill_leaf(CollapseCtx &c, int32_t node, int32_t idx) {
    float *row = c.rows.data() + (size_t)idx * c.row_w;
    int32_t cnt = c.count[node];
    int32_t first = c.left_first[node];
    // builders guarantee leaves fit one row (forced median split); clamp
    // as defense so a violated invariant can never write past the row.
    const int32_t wide_leaf = (c.row_w - 8) / 9;
    if (cnt > wide_leaf) cnt = wide_leaf;
    row[0] = (float)KIND_TRIS;
    row[1] = (float)cnt;
    row[2] = (float)(c.tri_base + first);
    row[3] = (float)c.inst;
    for (int k = 0; k < cnt; k++) {
        int s = 8 + 9 * k;
        const float *a = c.tri_a + (size_t)(first + k) * 3;
        const float *e1 = c.tri_e1 + (size_t)(first + k) * 3;
        const float *e2 = c.tri_e2 + (size_t)(first + k) * 3;
        std::memcpy(row + s, a, 12);
        std::memcpy(row + s + 3, e1, 12);
        std::memcpy(row + s + 6, e2, 12);
    }
}

// returns subtree wide-depth
static int emit_into(CollapseCtx &c, int32_t node, int32_t idx) {
    if (c.count[node] > 0) {
        fill_leaf(c, node, idx);
        return 1;
    }
    int32_t cands[MAX_WIDE];
    int n_cands = 2;
    cands[0] = c.left_first[node];
    cands[1] = c.left_first[node] + 1;
    while (n_cands < c.wide) {
        int best = -1;
        float best_sa = -1.0f;
        for (int i = 0; i < n_cands; i++) {
            if (c.count[cands[i]] == 0) {
                float s = sa(c.lo + (size_t)cands[i] * 3,
                             c.hi + (size_t)cands[i] * 3);
                if (s > best_sa) { best_sa = s; best = i; }
            }
        }
        if (best < 0) break;
        int32_t l = c.left_first[cands[best]];
        cands[best] = l;
        cands[n_cands++] = l + 1;
    }
    int32_t child_base = alloc_rows(c, c.wide);
    {
        float *row = c.rows.data() + (size_t)idx * c.row_w;
        row[0] = (float)KIND_INTERNAL;
        row[1] = (float)(c.row_base + child_base);
        for (int i = 0; i < c.wide; i++) {
            int s = 2 + 6 * i;
            if (i < n_cands) {
                const float *l = c.lo + (size_t)cands[i] * 3;
                const float *h = c.hi + (size_t)cands[i] * 3;
                row[s + 0] = l[0] - c.pad;
                row[s + 1] = l[1] - c.pad;
                row[s + 2] = l[2] - c.pad;
                row[s + 3] = h[0] + c.pad;
                row[s + 4] = h[1] + c.pad;
                row[s + 5] = h[2] + c.pad;
            } else {
                // degenerate point box: strict slab test (tn < tf) misses
                for (int q = 0; q < 6; q++) row[s + q] = 3.0e38f;
            }
        }
    }
    int depth = 0;
    for (int i = 0; i < n_cands; i++)
        depth = std::max(depth, emit_into(c, cands[i], child_base + i));
    return depth + 1;
}

}  // namespace

extern "C" {

// Collapse the binary subtree rooted at `root` into wide rows.  The FIRST
// emitted row (local index 0) is the subtree's wide root; child_base links
// are pre-offset by `row_base` (the caller's global row cursor).  Returns a
// handle; fetch with wide_fetch (row count known from out_n_rows).
void *wide_collapse(const float *world_lo, const float *world_hi,
                    const int32_t *left_first, const int32_t *count,
                    int32_t root,
                    const float *tri_a, const float *tri_e1,
                    const float *tri_e2,
                    int32_t tri_base, int32_t inst, int32_t row_base,
                    float pad, int32_t wide, int32_t row_w,
                    int32_t *out_n_rows, int32_t *out_depth) {
    auto *c = new CollapseCtx{world_lo, world_hi, left_first, count,
                              tri_a, tri_e1, tri_e2,
                              tri_base, inst, row_base, pad,
                              (int)wide, (int)row_w, {}};
    alloc_rows(*c, 1);  // local row 0 = subtree root
    *out_depth = emit_into(*c, root, 0);
    *out_n_rows = (int32_t)(c->rows.size() / c->row_w);
    return c;
}

void wide_fetch(void *handle, float *out_rows) {
    auto *c = static_cast<CollapseCtx *>(handle);
    std::memcpy(out_rows, c->rows.data(), c->rows.size() * sizeof(float));
}

void wide_release(void *handle) { delete static_cast<CollapseCtx *>(handle); }

}  // extern "C"
