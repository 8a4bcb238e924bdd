"""Render checkpoint/resume.

The reference has NO checkpointing: progressive accumulation state is
in-memory only and any settings change resets it (raytracer.cpp:711-718);
the only persistence is a BMP snapshot.  For long offline renders (the
"take picture" path at high spp) on preemptible TPUs, the accumulation
buffer (V4 color-sum + weight, Raytracer.h:44-48) plus the committed
settings/camera IS the full render state, so we persist exactly that.

Format: a single .npz with the accumulation array, frame_count, the camera
pytree leaves, and a JSON-encoded SceneSettings — loadable anywhere numpy
exists.  Resume validates that settings/camera match the current renderer
(a mismatched checkpoint would silently blend two different images —
refuse instead, mirroring the reference's reset-on-change protocol).
"""

from __future__ import annotations

import json
from dataclasses import asdict

import jax
import numpy as np

from ..models.scene import SceneSettings


def save_checkpoint(path: str, accum, frame_count: int, settings: SceneSettings,
                    camera) -> None:
    cam_leaves = [np.asarray(x, np.float32) for x in jax.tree.leaves(camera)]
    np.savez_compressed(
        path,
        accum=np.asarray(jax.device_get(accum)),
        frame_count=np.int64(frame_count),
        settings=json.dumps(asdict(settings)),
        n_cam=len(cam_leaves),
        **{f"cam_{i}": leaf for i, leaf in enumerate(cam_leaves)},
    )


def load_checkpoint(path: str):
    """Returns (accum np.ndarray, frame_count int, settings, cam_leaves)."""
    z = np.load(path, allow_pickle=False)
    settings = SceneSettings(**json.loads(str(z["settings"])))
    cam_leaves = [z[f"cam_{i}"] for i in range(int(z["n_cam"]))]
    return z["accum"], int(z["frame_count"]), settings, cam_leaves


def resume_into(renderer, path: str) -> int:
    """Load a checkpoint into a ProgressiveRenderer.  Refuses on mismatch.

    Returns the restored accumulated-spp count."""
    import jax.numpy as jnp
    accum, frame_count, settings, cam_leaves = load_checkpoint(path)
    if accum.shape != (renderer.h, renderer.w, 4):
        raise ValueError(
            f"checkpoint is {accum.shape[1]}x{accum.shape[0]}, renderer is "
            f"{renderer.w}x{renderer.h}")
    if settings != renderer.new_settings:
        raise ValueError("checkpoint settings differ from the renderer's; "
                         "accumulating across different settings would blend "
                         "two different images")
    cur = [np.asarray(x, np.float32) for x in jax.tree.leaves(renderer.new_camera)]
    if not all(np.allclose(a, b, atol=1e-6) for a, b in zip(cam_leaves, cur)):
        raise ValueError("checkpoint camera differs from the renderer's")
    renderer.settings = renderer.new_settings
    renderer.camera = renderer.new_camera
    renderer.accum = jnp.asarray(accum)
    renderer.frame_count = frame_count
    return frame_count


def checkpoint_renderer(renderer, path: str) -> None:
    save_checkpoint(path, renderer.accum, renderer.frame_count,
                    renderer.settings, renderer.camera)
