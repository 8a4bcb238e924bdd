"""Multi-chip rendering: pixel-sharded SPMD over a jax device mesh.

The reference's only multi-worker parallelism is a tile work queue over OS
threads with atomics + semaphores (SURVEY §2.2, raytracer.cpp:551-762).  The
TPU replacement is dataflow, not a queue: pixel rows are sharded over the
device mesh (data parallelism over rays — every device runs the identical
wavefront program on its shard), the scene is replicated, and XLA's SPMD
partitioner inserts the collectives:

  * the reconstruction splat is a static stencil (shifted adds), so GSPMD
    lowers the cross-shard filter overlap to a halo exchange over ICI —
    replacing the reference's RACY unsynchronized cross-tile splat
    (raytracer.cpp:240-258) with a deterministic collective;
  * traversal-stats reduction becomes a psum (replacing atomic_add).

There is no cancellation/semaphore machinery to port: progressive frames are
asynchronously dispatched device computations, and "discard render" is just
dropping the in-flight buffer (runtime/progressive.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.jitfix import distinct_scalar_leaves, safe_jit
from ..models.scene import PackedScene, Scene, SceneSettings
from ..runtime import film
from ..runtime.render import render_frame_impl


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("rows",))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh):
    return NamedSharding(mesh, P("rows", None, None))


class ShardedRenderer:
    """Row-sharded progressive renderer over a device mesh.

    The accumulation buffer lives row-sharded across devices; the packed
    scene is replicated once.  Each render_frame call is one SPMD program.
    """

    def __init__(self, scene: Scene, w: int, h: int,
                 mesh: Optional[Mesh] = None, filter_name: Optional[str] = None):
        self.mesh = mesh if mesh is not None else make_mesh()
        n = self.mesh.devices.size
        assert h % n == 0, f"height {h} must divide over {n} devices"
        self.w, self.h = w, h
        self.scene = scene
        self.filter_name = filter_name or scene.filter_name

        repl = replicated(self.mesh)
        self.ps = jax.device_put(scene.pack(), repl)
        self.cam = jax.device_put(distinct_scalar_leaves(scene.camera), repl)
        self.accum = jax.device_put(film.new_accumulation_buffer(h, w),
                                    row_sharded(self.mesh))
        self.frame_index = 0

        # safe_jit supplies the jax-0.9.0 dispatch recovery ladder
        # (core/jitfix): clear-cache retry, then consts-as-args fallback.
        self._step = safe_jit(
            partial(render_frame_impl, h=h, w=w, n_lights=scene.n_lights,
                    filter_name=self.filter_name),
            static_argnames=("settings",),
            out_shardings=(row_sharded(self.mesh), repl),
            donate_argnums=(3,),
        )

    def step(self):
        """Render one frame (spp passes), accumulate. Returns stats (3,)."""
        self.accum, stats = self._step(
            self.ps, self.scene.settings, self.cam, self.accum,
            jnp.uint32(self.frame_index))
        self.frame_index += int(self.scene.settings.samples_per_pixel)
        return stats

    def resolve(self) -> np.ndarray:
        return np.asarray(jax.device_get(film.resolve(self.accum)))

    def reset(self):
        self.accum = jax.device_put(
            film.new_accumulation_buffer(self.h, self.w), row_sharded(self.mesh))
        self.frame_index = 0
