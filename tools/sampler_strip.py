"""Gallery strip: Uniform vs Stratified vs Blue-noise at equal low spp
(round-4 verdict item 6).  Renders the Cornell Box at 1 and 4 spp with each
sampling strategy and tiles the crops side by side — the screen-space error
DISTRIBUTION difference (blue noise pushes MC error to high frequencies,
Heitz/Belcour's property, blue_noise_samplers/README.txt) is directly
visible even though per-pixel variance is comparable.

CPU-friendly (small frame); run:  python tools/sampler_strip.py [out.png]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main(out_path):
    from dataclasses import replace

    import jax.numpy as jnp

    from buas_pathtracer_tpu.models.scenes import load_scene
    from buas_pathtracer_tpu.runtime import film, post
    from buas_pathtracer_tpu.runtime.render import render_frame
    from buas_pathtracer_tpu.utils.image import write_png

    w, h = 192, 108
    strategies = [(0, "uniform"), (2, "stratified"), (1, "blue-noise")]
    spps = [1, 4]

    sc = load_scene("Cornell Box", w, h)
    ps = sc.pack()
    rows = []
    for spp in spps:
        tiles = []
        for strat, name in strategies:
            settings = replace(sc.settings, sampling_strategy=strat,
                               samples_per_pixel=1)
            accum = film.new_accumulation_buffer(h, w)
            for i in range(spp):
                accum, _ = render_frame(ps, settings, sc.camera, accum,
                                        jnp.uint32(i), h=h, w=w,
                                        n_lights=sc.n_lights,
                                        filter_name="Box")
            img = np.asarray(post.post_process(accum, sc.post_settings, spp))
            tiles.append(img[..., :3])
            print(f"{name} {spp}spp done", flush=True)
        rows.append(np.concatenate(tiles, axis=1))
    strip = np.concatenate(rows, axis=0)
    write_png(out_path, strip)
    print(f"wrote {out_path}: rows={spps} cols={[n for _, n in strategies]}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(os.path.dirname(os.path.dirname(
             os.path.abspath(__file__))),
             "gallery", "sampler_strip_uniform_stratified_bluenoise.png"))
