"""Checkpoint/resume: a resumed render must produce the SAME image as an
uninterrupted one (the accumulation state is the full render state)."""

import numpy as np
import pytest

from buas_pathtracer_tpu.core import vec
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.models.scene import Scene, SceneSettings
from buas_pathtracer_tpu.runtime import checkpoint
from buas_pathtracer_tpu.runtime.progressive import ProgressiveRenderer


def small_scene():
    sc = Scene(name="ckpt")
    m = sc.add_diffuse_material((0.7, 0.7, 0.7), 1.2)
    li = sc.add_emissive_material((10, 10, 10))
    sc.add_plane(m, (0, 1, 0), 0.0)
    sc.add_sphere(m, 1.0, vec.translate([0, 1, 3]))
    sc.add_sphere(li, 0.5, vec.translate([0, 4, 2]))
    sc.camera = cm.aim_camera_at(
        cm.make_camera(p=(0, 2, -3), aspect=1.0), (0, 1, 3))
    sc.settings = SceneSettings(samples_per_pixel=1, max_bounce_count=3)
    return sc


def test_resume_bitwise_identical(tmp_path):
    p = str(tmp_path / "ckpt.npz")

    r1 = ProgressiveRenderer(small_scene(), 16, 16)
    for _ in range(2):
        r1.render_one_frame()
    checkpoint.checkpoint_renderer(r1, p)
    for _ in range(2):
        r1.render_one_frame()
    straight = r1.resolve_hdr()

    r2 = ProgressiveRenderer(small_scene(), 16, 16)
    restored = checkpoint.resume_into(r2, p)
    assert restored == 2
    for _ in range(2):
        r2.render_one_frame()
    resumed = r2.resolve_hdr()

    np.testing.assert_array_equal(straight, resumed)


def test_mismatch_refused(tmp_path):
    p = str(tmp_path / "ckpt.npz")
    r1 = ProgressiveRenderer(small_scene(), 16, 16)
    r1.render_one_frame()
    checkpoint.checkpoint_renderer(r1, p)

    sc = small_scene()
    sc.settings = SceneSettings(samples_per_pixel=1, max_bounce_count=5)
    r2 = ProgressiveRenderer(sc, 16, 16)
    with pytest.raises(ValueError, match="settings differ"):
        checkpoint.resume_into(r2, p)

    r3 = ProgressiveRenderer(small_scene(), 8, 8)
    with pytest.raises(ValueError, match="renderer is 8x8"):
        checkpoint.resume_into(r3, p)


def test_take_picture_resumes_from_checkpoint(tmp_path):
    """A take_picture interrupted mid-render resumes from its checkpoint and
    produces the same image as an uninterrupted run."""
    ck = str(tmp_path / "pic.ckpt.npz")
    out1 = str(tmp_path / "a.png")
    out2 = str(tmp_path / "b.png")

    r1 = ProgressiveRenderer(small_scene(), 16, 16)
    r1.take_picture(6, out1, checkpoint_every=2, checkpoint_path=ck)

    # "preempted" run: fresh renderer picks up the checkpoint (written at
    # 6 spp by the loop above) and renders 2 more
    r2 = ProgressiveRenderer(small_scene(), 16, 16)
    r2.take_picture(8, out2, checkpoint_path=ck)

    # uninterrupted 8-spp render for comparison
    r3 = ProgressiveRenderer(small_scene(), 16, 16)
    r3.take_picture(8, str(tmp_path / "c.png"))
    np.testing.assert_array_equal(r2.resolve_hdr(), r3.resolve_hdr())


def test_filter_change_commits_and_resets():
    """The viewer filter picker participates in the commit protocol: changing
    new_filter resets accumulation at the next frame boundary and the frame
    renders with the NEW filter (same image as a renderer constructed with
    that filter from scratch)."""
    r = ProgressiveRenderer(small_scene(), 16, 16)
    r.render_one_frame()
    assert r.frame_count == 1
    r.new_filter = "Lanczos 4"
    r.render_one_frame()
    assert r.frame_count == 1  # reset happened, then one frame accumulated
    assert r.filter_name == "Lanczos 4"

    sc = small_scene()
    sc.filter_name = "Lanczos 4"
    ref = ProgressiveRenderer(sc, 16, 16)
    ref.render_one_frame()
    np.testing.assert_array_equal(r.resolve_hdr(), ref.resolve_hdr())
