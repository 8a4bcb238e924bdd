# Round-4: re-measure the env-hero FRAME TIME with the round-4 machinery
# (staged wavefront compaction, presorted stage walks, v6 grouped kernel,
# 2N-rung shadow ladder).  The README's 3.5 s/frame figure predates all
# of it.  Same workload as tools/hero_render.py: 1080p, env map +
# 12-instance TLAS + DOF + env-NEE (merged 2N shadow wave), 1 spp/frame.
# Methodology: warm compile, then 3 timed frames with varying seeds and a
# scalar-stats sync per frame (CLAUDE.md 4b).
import os, sys, time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from hero_render import hero_scene

from buas_pathtracer_tpu.runtime import film
from buas_pathtracer_tpu.runtime.render import render_frame

W, H = 1920, 1080
sc = hero_scene(W, H)
ps = sc.pack()
print(f"rows {ps.wide_rows.shape[0]} env {ps.env_pixels.shape}", flush=True)

accum = film.new_accumulation_buffer(H, W)
seed = (int(time.time() * 1000) & 0x3FFF) * 64

accum, stats = render_frame(ps, sc.settings, sc.camera, accum,
                            jnp.uint32(seed), h=H, w=W,
                            n_lights=sc.n_lights,
                            filter_name="Mitchell Netravali")
np.asarray(stats)
ts = []
for f in range(3):
    t0 = time.perf_counter()
    accum, stats = render_frame(ps, sc.settings, sc.camera, accum,
                                jnp.uint32(seed + f + 1), h=H, w=W,
                                n_lights=sc.n_lights,
                                filter_name="Mitchell Netravali")
    rays = float(np.asarray(stats)[0])
    ts.append(time.perf_counter() - t0)
el = min(ts)
print(f"hero frame: {el*1e3:.1f} ms  ({rays/1e6:.2f}M live rays, "
      f"{rays/el/1e6:.2f} Mrays/s)  all={[round(t*1e3) for t in ts]}",
      flush=True)
