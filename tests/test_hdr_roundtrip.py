"""Radiance HDR write -> parse roundtrip (native + python decoders)."""

import numpy as np

from buas_pathtracer_tpu.utils.assets import parse_hdr
from buas_pathtracer_tpu.utils.image import procedural_sky_hdr, write_hdr


def test_hdr_roundtrip(tmp_path):
    img = procedural_sky_hdr(32, 64)
    p = str(tmp_path / "sky.hdr")
    write_hdr(p, img)
    back = parse_hdr(open(p, "rb").read())
    assert back is not None and back.shape == (32, 64, 3)
    # RGBE quantization: 8-bit mantissa => ~1% relative error on bright texels
    bright = img > 0.05
    rel = np.abs(back[bright] - img[bright]) / img[bright]
    assert float(np.median(rel)) < 0.02
    assert float(rel.max()) < 0.2


def test_sun_is_brightest():
    img = procedural_sky_hdr(64, 128)
    assert img.max() > 100.0  # sun disk intensity survives encode ranges
