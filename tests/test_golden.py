"""Golden-image regression tests.

The reference has no golden tests (SURVEY §4); BASELINE.json's metric
includes image RMSE, so the TPU build locks small deterministic renders in
as fixtures.  The sampler streams are counter-based (core/rng.py), so a
render is a pure function of (scene, settings, resolution) — any drift
beyond float-reassociation tolerance is a real behavior change.

Regenerate intentionally with BUAS_REGEN_GOLDENS=1 after verified changes.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # minutes-long renders; default run: -m 'not slow'

from buas_pathtracer_tpu.core import vec
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.models.scene import Scene, SceneSettings
from buas_pathtracer_tpu.runtime.render import render

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
W = H = 32
REGEN = os.environ.get("BUAS_REGEN_GOLDENS") == "1"


def scene_spheres():
    sc = Scene(name="g-spheres")
    grey = sc.add_diffuse_material((0.6, 0.6, 0.6), 1.2)
    red = sc.add_diffuse_material((0.8, 0.2, 0.2), 1.4)
    glass = sc.add_translucent_material((0.2, 0.1, 0.0), 1.5)
    li = sc.add_emissive_material((15, 14, 12))
    sc.add_plane(grey, (0, 1, 0), 0.0)
    sc.add_sphere(red, 1.0, vec.translate([-1.2, 1, 4]))
    sc.add_sphere(glass, 0.9, vec.translate([1.2, 0.9, 3]))
    sc.add_sphere(li, 0.6, vec.translate([0, 4, 2]))
    sc.top_sky_color = (0.4, 0.55, 0.8)
    sc.bot_sky_color = (0.9, 0.9, 0.9)
    sc.camera = cm.aim_camera_at(
        cm.make_camera(p=(0, 1.8, -3), vfov=np.radians(55), aspect=1.0),
        (0, 1.0, 3.5))
    return sc


def scene_mesh():
    from buas_pathtracer_tpu.utils.procgen import icosphere
    sc = Scene(name="g-mesh")
    grey = sc.add_diffuse_material((0.55, 0.55, 0.55), 1.2, 0.0, True)
    blue = sc.add_diffuse_material((0.2, 0.3, 0.8), 1.4)
    li = sc.add_emissive_material((20, 20, 20))
    sc.add_plane(grey, (0, 1, 0), 0.0)
    sc.add_mesh(blue, icosphere(subdivisions=2),
                vec.translate([0, 1.2, 3]) * vec.scale(1.2))
    sc.add_box(grey, (0.5, 0.5, 0.5),
               vec.translate([1.8, 0.5, 4]) * vec.rotate_y(0.6))
    sc.add_sphere(li, 0.5, vec.translate([-2, 4, 1]))
    sc.camera = cm.aim_camera_at(
        cm.make_camera(p=(0, 2, -2.5), vfov=np.radians(55), aspect=1.0),
        (0.3, 1.0, 3.2))
    return sc


CASES = {
    "spheres_advanced": (scene_spheres, "Advanced Pathtracer", 8),
    "spheres_whitted": (scene_spheres, "Whitted", 4),
    "mesh_advanced": (scene_mesh, "Advanced Pathtracer", 8),
    "mesh_normals": (scene_mesh, "Normals", 1),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    build, integrator, frames = CASES[name]
    sc = build()
    sc.settings = SceneSettings(samples_per_pixel=1, max_bounce_count=4,
                                integrator=integrator)
    hdr, _, _ = render(sc, W, H, frames=frames)
    assert np.isfinite(hdr).all()

    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, hdr=hdr)
        pytest.skip(f"golden written: {path}")
    golden = np.load(path)["hdr"]
    # counter-based sampling => deterministic; tolerance covers backend
    # float-reassociation only
    np.testing.assert_allclose(hdr, golden, rtol=2e-3, atol=2e-3)
