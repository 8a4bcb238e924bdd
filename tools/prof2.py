# Component-level profiling, one mode per process (axon client crashes if a
# process loads too many executables).  Usage: python tools/prof2.py MODE
import time, sys, os
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from dataclasses import replace

MODE = sys.argv[1] if len(sys.argv) > 1 else "frame8"
W, H = int(os.environ.get("PW", 960)), int(os.environ.get("PH", 540))
import bench as B
sc = B.build_bench_scene(W, H)
ps = sc.pack()
N = W * H


def timeit(fn, args_fn, n=4, tag=""):
    out = fn(*args_fn(0))
    jax.block_until_ready(out)
    ts = []
    for i in range(1, n + 1):
        a = args_fn(i)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)[1:-1] if len(ts) > 2 else ts
    dt = sum(ts) / len(ts)
    print(f"[{tag}] {dt*1e3:8.2f} ms   (raw {[round(t*1e3,2) for t in ts]})",
          flush=True)
    return dt, out


def make_rays(i, n=N, coherent=True):
    # primary-like rays from the camera with per-call jitter (prevents folding)
    from buas_pathtracer_tpu.models import camera as cm
    from buas_pathtracer_tpu.core.vec import Vec3, normalize
    k = jax.random.PRNGKey(i)
    px = jax.random.uniform(k, (n,)) * W
    py = jax.random.uniform(jax.random.fold_in(k, 1), (n,)) * H
    cam = sc.camera
    z = jnp.zeros((n,))
    pr = cm.generate_rays(cam, px, py, W, H, z + 0.5, z + 0.5, z, z,
                          0.0, 1.0, 6, 0.0, 0.0)
    o, d = pr.o, pr.d
    if not coherent:
        k2 = jax.random.fold_in(k, 2)
        dx = jax.random.normal(k2, (3, n))
        d = normalize(Vec3(dx[0], dx[1], dx[2]))
        o = Vec3(o.x + jax.random.uniform(jax.random.fold_in(k, 3), (n,)) * 8 - 4,
                 o.y * 0 + 2.0 + jax.random.uniform(jax.random.fold_in(k, 4), (n,)) * 3,
                 o.z + jax.random.uniform(jax.random.fold_in(k, 5), (n,)) * 8 - 4)
    return o, d


if MODE.startswith("frame"):
    mb = int(MODE[5:])
    from buas_pathtracer_tpu.runtime import film
    from buas_pathtracer_tpu.runtime.render import render_frame
    s = replace(sc.settings, max_bounce_count=mb)
    accum0 = film.new_accumulation_buffer(H, W)

    def f(fi):
        return render_frame(ps, s, sc.camera, accum0, fi, h=H, w=W,
                            n_lights=sc.n_lights,
                            filter_name="Mitchell Netravali")

    jf = f
    dt, (a, st) = timeit(jf, lambda i: (jnp.uint32(i),), tag=MODE)
    rays = float(np.asarray(st[0]))
    print(f"[{MODE}] rays={rays/1e6:.2f}M -> {rays/dt/1e6:.2f} Mrays/s "
          f"node_visits={float(np.asarray(st[1]))/1e6:.1f}M "
          f"tri_tests={float(np.asarray(st[2]))/1e6:.1f}M", flush=True)

elif MODE in ("trav", "travinc"):
    from buas_pathtracer_tpu.ops import traverse

    @jax.jit
    def f(o, d):
        h = traverse.intersect_scene(ps, o, d)
        return h.t, h.hit_id, h.node_visits

    coherent = MODE == "trav"
    dt, out = timeit(f, lambda i: make_rays(i, coherent=coherent), tag=MODE)
    print(f"[{MODE}] {N/dt/1e6:.2f} Mrays/s  node_visits/ray="
          f"{float(np.asarray(out[2]))/N:.1f}", flush=True)

elif MODE in ("shadow", "shadowinc"):
    from buas_pathtracer_tpu.ops import traverse
    from buas_pathtracer_tpu.core.vec import Vec3

    @jax.jit
    def f(o, d):
        occ = traverse.intersect_shadow_ray(
            ps, o, d, jnp.full((N,), traverse.BIG_T),
            jnp.full((N,), -1, jnp.int32))
        return occ

    coherent = MODE == "shadow"
    dt, out = timeit(f, lambda i: make_rays(i, coherent=coherent), tag=MODE)
    print(f"[{MODE}] {N/dt/1e6:.2f} Mrays/s  occ_frac="
          f"{float(np.mean(np.asarray(out))):.2f}", flush=True)

elif MODE == "film":
    # everything EXCEPT traversal: raygen + sampler + splat + (no post here)
    from buas_pathtracer_tpu.runtime import film
    from buas_pathtracer_tpu.runtime.render import render_frame
    s = replace(sc.settings, max_bounce_count=0)  # 0 bounces if supported
    accum0 = film.new_accumulation_buffer(H, W)
    try:
        def f(fi):
            return render_frame(ps, s, sc.camera, accum0, fi, h=H, w=W,
                                n_lights=sc.n_lights,
                                filter_name="Mitchell Netravali")
        dt, _ = timeit(f, lambda i: (jnp.uint32(i),), tag="film(mb=0)")
    except Exception as e:
        print("film probe failed:", e, flush=True)

print("PROF2 DONE", MODE, flush=True)
