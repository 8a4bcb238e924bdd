"""Integrator validation — the reference's own strategy, made quantitative.

The reference validates its advanced pathtracer against simpler reference
integrators by eye ("Ground Truth Recursive exists to test the correctness of
the iterative one, which exists to test the advanced pathtracer",
about_strings.h:68-77).  Here the same ladder is a numeric test: at equal
sample counts the Advanced Pathtracer (NEE+MIS on) must converge to the same
image as Ground Truth (brute-force path tracing) within Monte Carlo noise.
Normals/Distances are checked for their analytic invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from dataclasses import replace

from buas_pathtracer_tpu.core import vec
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.models.scene import Scene, SceneSettings
from buas_pathtracer_tpu.runtime.render import render

W = H = 24


def cornell() -> Scene:
    sc = Scene(name="cornell-mini")
    white = sc.add_diffuse_material((0.8, 0.8, 0.8), 1.5)
    red = sc.add_diffuse_material((0.75, 0.1, 0.1), 1.5)
    green = sc.add_diffuse_material((0.1, 0.75, 0.1), 1.5)
    light = sc.add_emissive_material((18.0, 18.0, 18.0))
    sc.add_plane(white, (0, 1, 0), 0.0)
    sc.add_plane(white, (0, -1, 0), -5.0)
    sc.add_plane(white, (0, 0, -1), -5.0)
    sc.add_plane(red, (1, 0, 0), -2.5)
    sc.add_plane(green, (-1, 0, 0), -2.5)
    sc.add_sphere(light, 0.6, vec.translate([0, 4.5, 2.5]))
    sc.add_sphere(white, 1.0, vec.translate([-1, 1, 3]))
    sc.add_box(white, (0.6, 1.4, 0.6), vec.translate([1.3, 1.4, 3.5]))
    cam = cm.make_camera(p=(0, 2.5, -4.5), vfov=np.radians(50), aspect=W / H)
    sc.camera = cm.aim_camera_at(cam, (0, 2.0, 2.5))
    return sc


def render_with(sc: Scene, frames: int, filter_name="Mitchell Netravali",
                **settings) -> np.ndarray:
    sc.settings = SceneSettings(samples_per_pixel=1, max_bounce_count=5,
                                **settings)
    hdr, _, stats = render(sc, W, H, frames=frames, filter_name=filter_name)
    assert np.isfinite(hdr).all()
    return hdr


def rel_rmse(a, b):
    denom = np.maximum(0.5 * (a + b), 1e-3)
    return float(np.sqrt(np.mean(((a - b) / denom) ** 2)))


@pytest.fixture(scope="module")
def gt_image():
    return render_with(cornell(), 96, integrator="Ground Truth Iterative")


class TestConvergence:
    def test_advanced_matches_ground_truth(self, gt_image):
        """Full-feature path (NEE + light IS + cosine IS + MIS + RR) must
        estimate the same integral as brute-force path tracing."""
        adv = render_with(cornell(), 96, integrator="Advanced Pathtracer")
        # mean brightness agreement is the convergence check; the per-pixel
        # bound only guards against gross structural divergence (the
        # brute-force oracle itself carries ~0.4 relative MC noise at 96 spp)
        assert abs(adv.mean() - gt_image.mean()) / gt_image.mean() < 0.06
        assert rel_rmse(adv, gt_image) < 0.8, rel_rmse(adv, gt_image)

    def test_nee_off_matches_ground_truth(self, gt_image):
        adv = render_with(cornell(), 192, integrator="Advanced Pathtracer",
                          next_event_estimation=False, use_mis=False)
        assert abs(adv.mean() - gt_image.mean()) / gt_image.mean() < 0.12

    def test_mis_off_matches(self, gt_image):
        adv = render_with(cornell(), 96, integrator="Advanced Pathtracer",
                          use_mis=False)
        assert abs(adv.mean() - gt_image.mean()) / gt_image.mean() < 0.08

    def test_uniform_light_pick_matches(self, gt_image):
        adv = render_with(cornell(), 96, integrator="Advanced Pathtracer",
                          importance_sample_lights=False)
        assert abs(adv.mean() - gt_image.mean()) / gt_image.mean() < 0.08

    def test_uniform_hemisphere_matches(self, gt_image):
        adv = render_with(cornell(), 96, integrator="Advanced Pathtracer",
                          importance_sample_diffuse=False)
        assert abs(adv.mean() - gt_image.mean()) / gt_image.mean() < 0.10

    def test_no_rr_unbiased(self, gt_image):
        adv = render_with(cornell(), 96, integrator="Advanced Pathtracer",
                          russian_roulette=False)
        assert abs(adv.mean() - gt_image.mean()) / gt_image.mean() < 0.06


class TestDebugIntegrators:
    def test_normals_unit_or_zero(self):
        # Box filter: any wider reconstruction kernel BLENDS neighboring
        # normals and the decoded lengths drop below 1 everywhere
        img = render_with(cornell(), 1, integrator="Normals",
                          filter_name="Box")
        assert img.min() >= -1e-5 and img.max() <= 1.0 + 1e-5
        n = img * 2.0 - 1.0
        lens = np.linalg.norm(n, axis=-1)
        hit = lens > 0.5
        assert hit.mean() > 0.9  # cornell box fills the view
        assert np.median(np.abs(lens[hit] - 1.0)) < 0.02

    def test_distances_monotone_floor(self):
        img = render_with(cornell(), 1, integrator="Distances")
        assert (img >= -1e-6).all()

    def test_whitted_runs_finite(self):
        img = render_with(cornell(), 2, integrator="Whitted")
        assert np.isfinite(img).all()
        assert img.mean() > 0.01


class TestEmissiveAndCaustics:
    def test_direct_light_visible(self):
        """Camera ray hitting the light must see emission (bounce-0 specular
        rule, integrators.cpp:651-670)."""
        sc = cornell()
        cam = cm.make_camera(p=(0, 2.5, -4.5), vfov=np.radians(30), aspect=1.0)
        sc.camera = cm.aim_camera_at(cam, (0, 4.5, 2.5))  # look at the light
        img = render_with(sc, 4, integrator="Advanced Pathtracer")
        assert img.max() > 5.0  # emission 18 visible somewhere

    def test_beer_absorption_darkens(self):
        """A tinted glass sphere must transmit less than a clear one."""
        def scene_with(absorb):
            sc = cornell()
            glass = sc.add_translucent_material(absorb, 1.5)
            sc.add_sphere(glass, 1.0, vec.translate([0, 2.0, 1.0]))
            return sc
        clear = render_with(scene_with((0.0, 0.0, 0.0)), 48)
        tinted = render_with(scene_with((3.0, 3.0, 3.0)), 48)
        assert tinted.mean() < clear.mean()


class TestEnvmapNEE:
    """Env-map CDF importance sampling (the reference's stubbed feature,
    assets.cpp:630-661 / integrators.cpp:230-233) must be unbiased: the
    advanced pathtracer with env-NEE+MIS converges to brute-force ground
    truth under a sun-like env map, with far fewer fireflies."""

    def _scene(self):
        from buas_pathtracer_tpu.utils.image import procedural_sky_hdr
        sc = Scene(name="env-nee")
        grey = sc.add_diffuse_material((0.6, 0.6, 0.6), 1.2)
        sc.add_plane(grey, (0, 1, 0), 0.0)
        sc.add_sphere(grey, 1.0, vec.translate([0, 1, 3]))
        sc.env_map = procedural_sky_hdr(32, 64, sun_intensity=200.0)
        sc.camera = cm.aim_camera_at(
            cm.make_camera(p=(0, 2, -3), vfov=np.radians(55), aspect=1.0),
            (0, 1, 3))
        return sc

    def test_env_nee_matches_ground_truth(self):
        gt = render_with(self._scene(), 512,
                         integrator="Ground Truth Iterative")
        adv = render_with(self._scene(), 64, integrator="Advanced Pathtracer")
        assert abs(adv.mean() - gt.mean()) / gt.mean() < 0.08, \
            (adv.mean(), gt.mean())

    def test_env_nee_reduces_variance(self):
        """At equal spp, env-NEE renders must be far less noisy than
        BRDF-only sampling (NEE off) for a small bright sun."""
        adv = render_with(self._scene(), 16, integrator="Advanced Pathtracer")
        raw = render_with(self._scene(), 16, integrator="Advanced Pathtracer",
                          next_event_estimation=False, use_mis=False)
        gt = render_with(self._scene(), 512,
                         integrator="Ground Truth Iterative")
        err_nee = np.mean((adv - gt) ** 2)
        err_raw = np.mean((raw - gt) ** 2)
        assert err_nee < 0.5 * err_raw, (err_nee, err_raw)
