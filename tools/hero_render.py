# Hero render at BASELINE.md spec: 1080p, 1024 spp, multi-mesh TLAS +
# env map + area lights, with periodic checkpointing so a preempted run
# resumes (runtime/checkpoint.py).  Usage:
#   python tools/hero_render.py [--spp 1024] [--size 1920x1080]
#       [--ckpt-every 64] [--stop-at N]   (--stop-at: exit early to
#       exercise resume; rerun the same command to continue)
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def hero_scene(w, h):
    from buas_pathtracer_tpu.core import vec
    from buas_pathtracer_tpu.models import camera as cm
    from buas_pathtracer_tpu.models.materials import Material
    from buas_pathtracer_tpu.models.scene import Scene, SceneSettings
    from buas_pathtracer_tpu.utils.assets import load_environment_map
    from buas_pathtracer_tpu.utils.procgen import icosphere

    sc = Scene(name="hero")
    ground = sc.add_diffuse_material((0.62, 0.6, 0.58), 1.1, 0.0, True)
    blue = sc.add_diffuse_material((0.2, 0.32, 0.78), 1.3)
    metal = sc.add_material(Material(albedo=(0.9, 0.82, 0.6), ior=1.5,
                                     metallic=1.0, roughness=0.04))
    glass = sc.add_translucent_material((0.25, 0.08, 0.04), 1.52)
    red = sc.add_diffuse_material((0.75, 0.12, 0.1), 1.4)
    light = sc.add_emissive_material((120.0, 110.0, 95.0))
    light2 = sc.add_emissive_material((40.0, 55.0, 90.0))

    hi = icosphere(subdivisions=5)   # 20480 tris
    lo = icosphere(subdivisions=4)   # 5120 tris
    sc.add_mesh(glass, hi, vec.translate([0.0, 2.1, 0.0]) * vec.scale(2.1))
    sc.add_mesh(metal, hi, vec.translate([-4.6, 1.6, 2.2]) * vec.scale(1.6))
    sc.add_mesh(blue, hi, vec.translate([4.4, 1.5, -0.8]) * vec.scale(1.5))
    for i in range(7):  # ring of satellites: more TLAS instances
        a = i * 2 * np.pi / 7
        mat = (red, blue, metal)[i % 3]
        sc.add_mesh(mat, lo, vec.translate([6.5 * np.cos(a), 0.55,
                                            6.5 * np.sin(a)])
                    * vec.scale(0.55))
    sc.add_box(ground, (40, 1, 40), vec.translate([0, -1.0, 0]))
    sc.add_sphere(light, 1.6, vec.translate([5.0, 13.0, 7.0]))
    sc.add_sphere(light2, 1.0, vec.translate([-9.0, 8.0, -7.0]))

    env_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "gallery", "hero_sky.hdr")
    if os.path.exists(env_path):
        sc.env_map = load_environment_map(env_path)

    cam = cm.make_camera(p=(0.5, 4.2, -12.5), vfov=np.radians(42),
                         aspect=w / h, lens_radius=0.12,
                         focus_distance=12.5)
    sc.camera = cm.aim_camera_at(cam, (0, 1.9, 0))
    # env_nee ON: light-NEE and env-NEE occlusion queries ride ONE merged
    # shadow traversal per bounce (integrators/advanced.py), so the frame
    # program keeps two traversal call sites and stays under the axon
    # tunnel's per-process executable table (round-2 crash was at ~113 with
    # the third call site).
    # spp=1 per frame: samples_per_pixel unrolls whole integrator passes
    # into ONE program, and the axon tunnel caps per-process executables
    sc.settings = SceneSettings(max_bounce_count=8, samples_per_pixel=1,
                                env_nee=True)
    return sc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=1024)
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--ckpt-every", type=int, default=64)
    ap.add_argument("--stop-at", type=int, default=0,
                    help="checkpoint and exit at this spp (resume test)")
    ap.add_argument("--out", default="gallery/hero_1080p_1024spp.png")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    from buas_pathtracer_tpu.runtime.progressive import ProgressiveRenderer

    ckpt = args.out + ".ckpt.npz"
    sc = hero_scene(w, h)
    r = ProgressiveRenderer(sc, w, h)
    target = args.stop_at or args.spp
    t0 = time.time()
    last = [time.time()]

    def progress(done, total):
        now = time.time()
        print(f"  {done}/{args.spp} spp  (+{now - last[0]:.1f}s, "
              f"total {now - t0:.0f}s)", flush=True)
        last[0] = now

    # self-managed loop (instead of take_picture) so the PNG is refreshed
    # at EVERY checkpoint: whatever spp the run reaches, the gallery file
    # is current and a later run resumes from the checkpoint
    from buas_pathtracer_tpu.runtime import checkpoint as ckpt_mod
    from buas_pathtracer_tpu.utils.image import write_png
    if os.path.exists(ckpt):
        ckpt_mod.resume_into(r, ckpt)
        print(f"resumed at {r.frame_count} spp", flush=True)
    last_ckpt = r.frame_count
    while r.frame_count < target:
        r.render_one_frame()
        progress(r.frame_count, target)
        if r.frame_count - last_ckpt >= args.ckpt_every:
            ckpt_mod.checkpoint_renderer(r, ckpt)
            write_png(args.out, r.display_rgba8())
            print(f"  checkpoint + png at {r.frame_count} spp", flush=True)
            last_ckpt = r.frame_count
    write_png(args.out, r.display_rgba8())
    print(f"done: {r.frame_count} spp in {time.time()-t0:.0f}s -> "
          f"{args.out}", flush=True)
    if r.frame_count >= args.spp and os.path.exists(ckpt):
        os.remove(ckpt)


if __name__ == "__main__":
    main()
