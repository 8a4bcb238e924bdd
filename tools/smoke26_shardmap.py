# Round-3: single-chip REAL-TPU shard_map smoke run (verdict item 3).
# Proves the production Pallas packet kernel compiles and executes inside a
# shard_map-partitioned program on actual TPU hardware (mesh of 1 — the only
# chip this environment has), and that the result matches the unsharded
# frame bit-for-bit.
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

W, H = 512, 256
import bench as B
from dataclasses import replace

print("backend:", jax.default_backend(), flush=True)

sc = B.build_bench_scene(W, H)
sc.settings = replace(sc.settings, max_bounce_count=4)

from buas_pathtracer_tpu.parallel.mesh import ShardedRenderer, make_mesh
from buas_pathtracer_tpu.runtime import film
from buas_pathtracer_tpu.runtime.render import render_frame

t0 = time.perf_counter()
r = ShardedRenderer(sc, W, H, mesh=make_mesh(1))
r.step()
sharded = r.resolve()
print(f"shard_map(1) frame ok in {time.perf_counter()-t0:.1f}s "
      f"(incl compile)", flush=True)

ps = sc.pack()
accum = film.new_accumulation_buffer(H, W)
accum, _ = render_frame(ps, sc.settings, sc.camera, accum, jnp.uint32(0),
                        h=H, w=W, n_lights=sc.n_lights,
                        filter_name=sc.filter_name)
single = np.asarray(film.resolve(accum))
diff = float(np.abs(sharded - single).max())
print("max |sharded - single| =", diff, flush=True)
assert diff == 0.0, diff
print("SMOKE26 SHARD_MAP TPU OK", flush=True)
