# Round-2 profiling: per-bounce cost structure on the real TPU.
# Loaded into the persistent REPL via exec(open(...).read()).
import time, sys, os
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from dataclasses import replace

W, H = int(os.environ.get("PW", 960)), int(os.environ.get("PH", 540))
import bench as B
sc = B.build_bench_scene(W, H)
ps = sc.pack()
from buas_pathtracer_tpu.runtime import film
from buas_pathtracer_tpu.runtime.render import render_frame

print("devices:", jax.devices(), flush=True)

def frame_time(settings, n=3, tag=""):
    accum = film.new_accumulation_buffer(H, W)
    a, st = render_frame(ps, settings, sc.camera, accum, jnp.uint32(0),
                         h=H, w=W, n_lights=sc.n_lights,
                         filter_name="Mitchell Netravali")
    jax.block_until_ready((a, st))
    times = []
    rays = 0.0
    for i in range(n):
        t0 = time.perf_counter()
        a, st = render_frame(ps, settings, sc.camera, a, jnp.uint32(i + 1),
                             h=H, w=W, n_lights=sc.n_lights,
                             filter_name="Mitchell Netravali")
        jax.block_until_ready((a, st))
        times.append(time.perf_counter() - t0)
        rays = float(np.asarray(st[0]))
    dt = min(times)
    print(f"{tag}: {dt*1e3:8.1f} ms/frame (all: {[round(t*1e3,1) for t in times]})"
          f"  rays={rays/1e6:6.2f}M  -> {rays/dt/1e6:7.2f} Mrays/s  "
          f"node_visits={float(np.asarray(st[1]))/1e6:.1f}M", flush=True)
    return dt, rays

for mb in (1, 2, 4, 8):
    s = replace(sc.settings, max_bounce_count=mb)
    frame_time(s, tag=f"bounces={mb}")
print("PROF1 DONE", flush=True)
