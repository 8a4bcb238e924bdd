"""The Pallas post-processing kernel must match the jnp path bit-for-bit
(interpret mode off-TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from buas_pathtracer_tpu.models.scene import PostProcessSettings
from buas_pathtracer_tpu.ops.pallas_post import post_process_pallas
from buas_pathtracer_tpu.runtime.post import _post_process_jnp


def test_pallas_post_bit_identical():
    rng = np.random.default_rng(3)
    h, w = 40, 200  # non-multiples of the (8, 128) tile: exercises padding
    a = rng.uniform(0, 4, (h, w, 4)).astype(np.float32)
    a[..., 3] = rng.uniform(0.5, 8, (h, w))
    a[3, 7] = np.nan          # cyan path
    a[9, 11, 3] = -1.0        # magenta path
    a[0, 0, 3] = 0.0          # zero-weight path
    accum = jnp.asarray(a)
    interpret = jax.devices()[0].platform != "tpu"
    for st in (PostProcessSettings(),
               PostProcessSettings(exposure=0.7, contrast=0.4, midpoint=0.4),
               PostProcessSettings(tonemapping=False, srgb_transform=False,
                                   dither=False)):
        ref = np.asarray(_post_process_jnp(accum, st, 0))
        pal = np.asarray(post_process_pallas(accum, st, 0,
                                             interpret=interpret))
        np.testing.assert_array_equal(ref, pal)
