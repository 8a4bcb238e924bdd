# Bisect the full-frame slowness: render_frame at 1080p with varying
# bounce counts and NEE on/off.  Each config in-process (same executable
# budget), scalar-fetch sync.
import time, sys, os
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from dataclasses import replace

W, H = 1920, 1080
import bench as B
from buas_pathtracer_tpu.runtime import film
from buas_pathtracer_tpu.runtime.render import render_frame

sc = B.build_bench_scene(W, H)
ps = sc.pack()

for nee in (True, False):
    for mb in (1, 2, 4, 8):
        st = replace(sc.settings, max_bounce_count=mb,
                     next_event_estimation=nee)
        accum = film.new_accumulation_buffer(H, W)
        t0 = time.perf_counter()
        accum, stats = render_frame(ps, st, sc.camera, accum, jnp.uint32(0),
                                    h=H, w=W, n_lights=sc.n_lights,
                                    filter_name="Mitchell Netravali")
        s0 = np.asarray(stats)
        t_compile = time.perf_counter() - t0
        ts = []
        for r in (1, 2):
            t0 = time.perf_counter()
            accum, stats = render_frame(ps, st, sc.camera, accum,
                                        jnp.uint32(r), h=H, w=W,
                                        n_lights=sc.n_lights,
                                        filter_name="Mitchell Netravali")
            _ = np.asarray(stats)
            ts.append(time.perf_counter() - t0)
        print(f"nee={int(nee)} bounces={mb}: frame {min(ts)*1e3:8.0f} ms "
              f"(compile+1st {t_compile:.0f}s) rays={float(s0[0])/1e6:.1f}M",
              flush=True)
print("PROF15 DONE", flush=True)
