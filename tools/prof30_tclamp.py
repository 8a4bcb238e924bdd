# Round-3: t-clamped two-pass closest-hit on the REAL bounce-1 wave.
# Hypothesis: an incoherent block's union-of-visits explodes because every
# ray starts with t = BIG_T, so the slab test (tn < t) prunes nothing until
# a hit is found.  Most diffuse bounce rays in interior regions hit within a
# small distance; giving pass 1 an initial t = clamp bounds every block's
# union to the LOCAL node neighborhood of its (Morton-compacted) spatial
# cell.  Unresolved rays (no hit under the clamp) retrace unbounded in a
# recompacted pass 2.  Exact semantics: pass-1 hits are true closest hits
# (all nodes with tn < clamp were visited); escapees get the full walk.
import os, time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

sys.argv = [sys.argv[0]]
exec(open("/root/repo/tools/prof26.py").read().split("def bounce_fn")[0])

os.environ["BUAS_FORCE_COMPACT"] = "1"   # bounce waves always compact

diag = float(np.linalg.norm(np.asarray(ps.scene_hi) - np.asarray(ps.scene_lo)))
print(f"scene diag {diag:.1f}", flush=True)


def baseline_fn():
    @jax.jit
    def f(*a):
        out = pp.traverse_dispatch(ps.wide_rows, ps.scene_lo, ps.scene_hi,
                                   Vec3(a[0], a[1], a[2]),
                                   Vec3(a[3], a[4], a[5]), a[6],
                                   jnp.full((N,), -1, jnp.int32),
                                   occlusion=False)
        return out[0].sum() + out[1].sum()
    return f


def clamp2_fn(clamp):
    @jax.jit
    def f(*a):
        o = Vec3(a[0], a[1], a[2]); d = Vec3(a[3], a[4], a[5])
        live = a[6] >= 0.0
        ign = jnp.full((N,), -1, jnp.int32)
        t1 = jnp.where(live, jnp.float32(clamp), -1.0)
        o1 = pp.traverse_dispatch(ps.wide_rows, ps.scene_lo, ps.scene_hi,
                                  o, d, t1, ign, occlusion=False)
        resolved = o1[1] >= 0
        # pass 2: only unresolved live rays, full range
        t2 = jnp.where(live & ~resolved, jnp.float32(tw.BIG_T), -1.0)
        o2 = pp.traverse_dispatch(ps.wide_rows, ps.scene_lo, ps.scene_hi,
                                  o, d, t2, ign, occlusion=False)
        t = jnp.where(resolved, o1[0], o2[0])
        prim = jnp.where(resolved, o1[1], o2[1])
        return t.sum() + prim.sum(), jnp.sum((live & ~resolved)
                                             .astype(jnp.float32))
    return f


def parity_and_escapees(clamp):
    f = clamp2_fn(clamp)
    b = baseline_fn()
    a = wave_args(0)
    s2, esc = (np.asarray(x) for x in f(*a))
    s1 = np.asarray(b(*a))
    live = float(w0[15])
    print(f"  clamp {clamp:7.2f}: escapees {esc/live*100:5.1f}% of live, "
          f"parity diff {abs(float(s1) - float(s2)):.3e}", flush=True)


bt = tmin(baseline_fn(), wave_args)
print(f"baseline (compacted, BIG_T): {bt:7.1f} ms", flush=True)

for frac in (4.0, 8.0, 16.0, 32.0):
    clamp = diag / frac
    parity_and_escapees(clamp)
    f = clamp2_fn(clamp)
    t = tmin(lambda *a: f(*a)[0], wave_args)
    print(f"  clamp diag/{frac:4.0f} two-pass   : {t:7.1f} ms", flush=True)
print("PROF30 DONE", flush=True)
