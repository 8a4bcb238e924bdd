# Round-3: head-to-head on the REAL bounce-1 and shadow waves — packet v2
# (natural / oct_major-compacted) vs the XLA phased-restart path per call.
# If the XLA path wins the incoherent wave by enough, the integrator should
# route STATICALLY (primary/shadow -> packet, in-loop bounces -> XLA)
# instead of the measured-worse lax.cond dynamic routing.
import os, time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

sys.argv = [sys.argv[0]]
exec(open("/root/repo/tools/prof26.py").read().split("for v1, key, force")[0])

# XLA phased path on the same waves (routing is resolved at trace time in
# traverse_wide._traverse via pallas_packet.enabled_for)
os.environ["BUAS_TRAVERSAL"] = "wide"


def bounce_xla():
    @jax.jit
    def f(*a):
        out = tw._traverse(ps, Vec3(a[0], a[1], a[2]),
                           Vec3(a[3], a[4], a[5]), a[6],
                           jnp.full((N,), -1, jnp.int32), occlusion=False)
        return out[0].sum() + out[1].sum()
    return f


def shadow_xla():
    @jax.jit
    def f(*a):
        out = tw._traverse(ps, Vec3(a[7], a[8], a[9]),
                           Vec3(a[10], a[11], a[12]), a[13],
                           a[14].astype(jnp.int32), occlusion=True)
        return out[1].sum()
    return f


tb = tmin(bounce_xla(), wave_args)
tsh = tmin(shadow_xla(), wave_args)
print(f"XLA phased      : bounce-1 wave {tb:7.1f} ms   shadow wave "
      f"{tsh:7.1f} ms", flush=True)
print("PROF29 DONE", flush=True)
