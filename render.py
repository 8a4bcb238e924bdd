"""CLI renderer — the reference's "Take picture" path, headless.

  python render.py --list
  python render.py --scene "Cornell Box" --size 1024x576 --spp 16 --out out.png
  python render.py --scene "Week 6" --integrator Normals --spp 1

Options mirror the reference UI controls (scene/integrator/filter/strategy
pickers, spp, bounces, post toggles).  Prints the same completion line as
the reference ("Took WxH spp image in N seconds", raytracer.cpp:2177-2179)
plus the traversal-stats panel numbers.
"""

import argparse
import os
import sys
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="Nested Dielectrics")
    ap.add_argument("--size", default="1024x576")
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--bounces", type=int, default=None)
    ap.add_argument("--integrator", default=None,
                    help="Advanced Pathtracer | Whitted | Ground Truth Iterative | Normals | Distances")
    ap.add_argument("--filter", dest="filter_name", default=None)
    ap.add_argument("--strategy", type=int, default=None, help="0=uniform 1=blue-noise 2=stratified")
    ap.add_argument("--out", default="out.png")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--devices", type=int, default=0, help="shard over N devices (0 = single)")
    args = ap.parse_args()

    from buas_pathtracer_tpu.models.scenes import SCENES, load_scene

    if args.list:
        for s in SCENES:
            print(s.name)
        return

    w, h = (int(v) for v in args.size.split("x"))
    sc = load_scene(args.scene, w, h)
    if args.integrator:
        sc.settings = replace(sc.settings, integrator=args.integrator)
    if args.bounces is not None:
        sc.settings = replace(sc.settings, max_bounce_count=args.bounces)
    if args.strategy is not None:
        sc.settings = replace(sc.settings, sampling_strategy=args.strategy)
    if args.filter_name:
        sc.filter_name = args.filter_name

    def progress(done, total):
        print(f"\r{done}/{total} spp", end="", flush=True)

    if args.devices > 1:
        import time
        import jax
        from buas_pathtracer_tpu.parallel.mesh import ShardedRenderer, make_mesh
        from buas_pathtracer_tpu.runtime import post as post_mod
        from buas_pathtracer_tpu.utils.image import write_bmp, write_png
        r = ShardedRenderer(sc, w, h, mesh=make_mesh(args.devices))
        t0 = time.perf_counter()
        while r.frame_index < args.spp:
            r.step()
            progress(r.frame_index, args.spp)
        jax.block_until_ready(r.accum)
        elapsed = time.perf_counter() - t0
        img = jax.device_get(post_mod.post_process(
            jax.device_put(r.accum), sc.post_settings, r.frame_index))
        (write_png if args.out.endswith(".png") else write_bmp)(args.out, img)
    else:
        from buas_pathtracer_tpu.runtime.progressive import ProgressiveRenderer
        pr = ProgressiveRenderer(sc, w, h)
        elapsed = pr.take_picture(args.spp, args.out, progress=progress)
        rays, nodes, tris = pr.last_stats
        print(f"\nlast frame: {rays:.0f} rays, {nodes:.0f} node visits, {tris:.0f} tri tests")

    print(f"Took {w}x{h} {args.spp}spp image in {elapsed:.3f} seconds -> {args.out}")


if __name__ == "__main__":
    main()
