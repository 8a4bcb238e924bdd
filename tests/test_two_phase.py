"""Two-phase wavefront compaction (integrators/advanced.py) must be
BIT-IDENTICAL to the single full-width loop.

The compacted continuation re-runs the same bounce body on an NBL-lane
prefix: per-lane RNG draws (white noise from the carried xorshift state at
bounce >= 1), shading math and the float accumulation order are all
unchanged, and the final scatter restores each lane's total.  Any drift —
a lost uint32 state bit through the f32 pack, a wrong mask at the
boundary, a reordered accumulation — shows up as non-equality here.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from buas_pathtracer_tpu.core import sampler as smp
from buas_pathtracer_tpu.core import vec
from buas_pathtracer_tpu.integrators import advanced as adv
from buas_pathtracer_tpu.models import camera as cm
from buas_pathtracer_tpu.models.scene import Scene, SceneSettings

W, H = 96, 48
N = W * H


def _scene() -> Scene:
    """Open scene (sky misses) so liveness decays fast enough that the
    full-width loop breaks to the compact continuation within a bounce
    or two even at tiny widths."""
    sc = Scene(name="two-phase")
    grey = sc.add_diffuse_material((0.6, 0.6, 0.6), 1.2)
    blue = sc.add_diffuse_material((0.2, 0.3, 0.8), 1.4)
    glass = sc.add_translucent_material((0.2, 0.05, 0.05), 1.5)
    light = sc.add_emissive_material((25.0, 25.0, 22.0))
    sc.add_box(grey, (8, 1, 8), vec.translate([0, -1.0, 0]))
    sc.add_sphere(blue, 1.0, vec.translate([-1.2, 1.0, 0]))
    sc.add_sphere(glass, 0.8, vec.translate([1.4, 0.9, -0.5]))
    sc.add_sphere(light, 0.7, vec.translate([0, 5.0, 2.0]))
    cam = cm.make_camera(p=(0, 2.0, -6.0), vfov=np.radians(45),
                         aspect=W / H)
    sc.camera = cm.aim_camera_at(cam, (0, 1.0, 0))
    return sc


def _render(monkeypatch, two_phase: bool, stages: str, env: bool = False):
    monkeypatch.setenv("BUAS_TWO_PHASE", "1" if two_phase else "0")
    monkeypatch.setenv("BUAS_PHASE_BLOCKS", stages)
    sc = _scene()
    if env:
        # tiny equirect env map: the merged light+env 2N shadow wave then
        # crosses the stage widths (concat of two nbl-lane queries)
        rng_ = np.random.RandomState(7)
        sc.env_map = (rng_.rand(8, 16, 3) ** 2).astype(np.float32) * 3.0
    ps = sc.pack()
    settings = SceneSettings(max_bounce_count=6, samples_per_pixel=1,
                             integrator="Advanced Pathtracer")
    strategy = int(settings.sampling_strategy)
    px = (jnp.arange(N, dtype=jnp.int32) % W).astype(jnp.float32)
    py = (jnp.arange(N, dtype=jnp.int32) // W).astype(jnp.float32)
    sampler = smp.make_sampler(px.astype(jnp.uint32),
                               py.astype(jnp.uint32),
                               jnp.uint32(3), strategy=strategy)
    sampler, aa_u, aa_v = smp.sample_2d(sampler, strategy,
                                        smp.SampleDimension.AA, 0)
    sampler, dof_u, dof_v = smp.sample_2d(sampler, strategy,
                                          smp.SampleDimension.DOF, 0)
    rays = cm.generate_rays(sc.camera, px, py, W, H, aa_u, aa_v,
                            dof_u, dof_v, 0.0, 1.0, 6, 0.0, 0.0)
    color, _, stats = adv.advanced(ps, settings, sampler, rays.o, rays.d,
                                   n_lights=sc.n_lights)
    img = np.stack([np.asarray(color.x), np.asarray(color.y),
                    np.asarray(color.z)])
    assert np.isfinite(img).all()
    return img, np.asarray(stats)


@pytest.fixture(scope="module")
def single_loop_image():
    # scope-module fixture can't use monkeypatch; set env via a local shim
    class _MP:
        def setenv(self, k, v):
            import os
            os.environ[k] = v

    return _render(_MP(), two_phase=False, stages="1")


@pytest.mark.parametrize("stages", ["1", "3", "3,1"])
def test_two_phase_bit_identical(single_loop_image, monkeypatch,
                                 stages):
    """1024 lanes breaks late (deep decay), 3072 breaks at bounce 1,
    "3,1" chains TWO compact stages — every continuation must
    reproduce the single loop exactly."""
    ref_img, ref_stats = single_loop_image
    img, stats = _render(monkeypatch, two_phase=True,
                         stages=stages)
    np.testing.assert_array_equal(img, ref_img)
    # ray count is exact; node-visit/tri-test counters are block-union
    # diagnostics and legitimately SHRINK when the wavefront compacts
    # (smaller lockstep unions per block)
    assert stats[0] == ref_stats[0]
    assert 0 < stats[1] <= ref_stats[1]


def test_two_phase_env_nee_bit_identical(monkeypatch):
    """env-NEE doubles the stage shadow wave (light+env queries CONCAT
    into one 2N occlusion call); the staged continuation must still
    reproduce the single loop exactly."""
    ref_img, _ = _render(monkeypatch, two_phase=False, stages="1", env=True)
    img, _ = _render(monkeypatch, two_phase=True, stages="3,1", env=True)
    np.testing.assert_array_equal(img, ref_img)


def test_packet_dispatch_hints(monkeypatch):
    """Drive the stage loops through the REAL packet dispatch (interpret
    mode): the presorted CH walk (presorted_hint -> direct grouped
    kernel, no gather/scatter) and the hinted occlusion Morton walk
    (phase_compact_hint) must reproduce the single loop bit-identically,
    including the pix-composed total unsort.  COMPACT_BLOCKS shrinks so
    both hints engage at test scale."""
    from buas_pathtracer_tpu.ops import pallas_packet as pp

    monkeypatch.setenv("BUAS_TRAVERSAL", "packet")
    monkeypatch.setenv("BUAS_PACKET_INTERPRET", "1")
    monkeypatch.setattr(pp, "COMPACT_BLOCKS", 1)
    ref_img, _ = _render(monkeypatch, two_phase=False, stages="1")
    img, _ = _render(monkeypatch, two_phase=True, stages="2,1")
    np.testing.assert_array_equal(img, ref_img)
