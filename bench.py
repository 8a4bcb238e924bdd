"""Headline benchmark: Mrays/sec on a mesh scene (BASELINE.md workload).

Workload: 1080p, 8 bounces, Advanced Pathtracer (NEE + MIS + RR + stratified),
mesh-heavy scene (procedural icospheres — the reference's dragon OBJ is not
redistributable/checked in).  Prints ONE final JSON line:
  {"metric": "Mrays_per_sec", "value": N, "unit": "Mrays/s", "vs_baseline": N,
   "samples_per_sec": N, "closest_hit_mrays": N, ...}
vs_baseline divides the live-ray Mrays/s metric by BASELINE.json's target of
100 Mrays/s/chip on v5e (`vs_baseline_metric` names the dividend).
`samples_per_sec` is BASELINE.md's own unit: full path samples finished per
second at the bench resolution (w*h*spp*frames / elapsed).

Structure (round-4 verdict item 1 — the bench must land a number inside the
driver budget even if a stage dies):
  1. the orchestrator (this process, never touches jax) runs the FRAME
     measurement in a subprocess with inherited stdout, so its JSON line
     reaches the driver the moment it's measured;
  2. only then runs the primary closest-hit subprocess (bounded timeout),
     and re-prints the enriched JSON line.  Whichever line the driver's
     parser picks up carries the headline metric.
Each stage is its own process because two live TPU clients contend on the
axon tunnel and a killed one takes the other down (CLAUDE.md).  Both stages
enable the persistent compilation cache (.jax_cache/) so the 6-10 min remote
full-frame compile is paid once across rounds, not per run.

Env overrides: BENCH_W, BENCH_H, BENCH_FRAMES, BENCH_SPP (CPU smoke runs);
BENCH_BOUNCES / BENCH_NEE / BENCH_FILTER (attribution knobs);
BENCH_SCENE=stress (655k-tri scene through the v4 leaf-DMA kernel);
BENCH_CLOSEST_HIT=0 (skip the primary-throughput subprocess);
BENCH_BREAKDOWN=0 (skip the per-wave attribution legs), BENCH_BD_FRAMES,
BENCH_CH_K (traversals per closest-hit dispatch, default 32);
BENCH_FRAME_TIMEOUT / BENCH_CH_TIMEOUT / BENCH_BD_TIMEOUT (stage budgets, s).
"""

import json
import os
import sys
import time

import numpy as np  # orchestrator-safe; jax is only imported inside stages

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

_RESULT_FILE = os.path.join(_HERE, ".bench_frame_result.json")


def _enable_compile_cache():
    """Persistent XLA compilation cache: the remote axon compiler takes
    6-10 min for the full frame program; cache entries survive across bench
    runs AND rounds (VERDICT r03 item 1).  Best-effort — harmless if the
    backend doesn't support serialization.  BENCH_CPU=1 forces the CPU
    platform for smoke runs (JAX_PLATFORMS alone is overridden by the axon
    sitecustomize — CLAUDE.md)."""
    try:
        import jax

        if os.environ.get("BENCH_CPU") == "1":
            jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(_HERE, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def build_bench_scene(w, h):
    from buas_pathtracer_tpu.core import vec
    from buas_pathtracer_tpu.models import camera as cm
    from buas_pathtracer_tpu.models.scene import Scene, SceneSettings
    from buas_pathtracer_tpu.utils.procgen import icosphere

    sc = Scene(name="bench")
    ground = sc.add_diffuse_material((0.55, 0.55, 0.55), 1.0, 0.0, True)
    blue = sc.add_diffuse_material((0.25, 0.35, 0.8), 1.3)
    from buas_pathtracer_tpu.models.materials import Material
    metal = sc.add_material(Material(albedo=(0.85, 0.85, 0.85), ior=1.5, metallic=1.0))
    glass = sc.add_translucent_material((0.3, 0.1, 0.05), 1.5)
    light = sc.add_emissive_material((80.0, 80.0, 72.0))

    mesh = icosphere(subdivisions=5)  # 20480 triangles
    sc.add_mesh(blue, mesh, vec.translate([0, 2.0, 0]) * vec.scale(2.0))
    sc.add_mesh(metal, mesh, vec.translate([-4.5, 1.5, 2]) * vec.scale(1.5))
    sc.add_mesh(glass, mesh, vec.translate([4.5, 1.5, -1]) * vec.scale(1.5))
    sc.add_box(ground, (30, 1, 30), vec.translate([0, -1.0, 0]))
    sc.add_sphere(light, 2.0, vec.translate([0, 14.0, 6]))
    sc.add_sphere(light, 1.0, vec.translate([-8, 10.0, -6]))

    cam = cm.make_camera(p=(0, 4, -12), vfov=np.radians(45), aspect=w / h)
    cam = cm.aim_camera_at(cam, (0, 1.8, 0))
    sc.camera = cam
    sc.settings = SceneSettings(max_bounce_count=8, samples_per_pixel=1,
                                integrator="Advanced Pathtracer")
    return sc


def build_stress_scene(w, h):
    """655k-triangle scale scene (two 327k-tri icosphere instances): the
    wide table (77 MB) exceeds the packet kernel's VMEM residence budget,
    so this exercises the v4 leaf-DMA path end to end.  BENCH_SCENE=stress
    selects it (960x540, 6 bounces by default via env)."""
    from buas_pathtracer_tpu.core import vec
    from buas_pathtracer_tpu.models import camera as cm
    from buas_pathtracer_tpu.models.scene import Scene, SceneSettings
    from buas_pathtracer_tpu.utils.procgen import icosphere

    sc = Scene(name="stress")
    grey = sc.add_diffuse_material((0.6, 0.6, 0.6), 1.2)
    red = sc.add_diffuse_material((0.75, 0.25, 0.2), 1.4)
    light = sc.add_emissive_material((60.0, 60.0, 55.0))
    mesh = icosphere(subdivisions=7)  # 327,680 triangles
    sc.add_mesh(grey, mesh, vec.translate([-2.2, 2.0, 0]) * vec.scale(2.0))
    sc.add_mesh(red, mesh, vec.translate([2.2, 1.5, 1.0]) * vec.scale(1.5))
    sc.add_box(grey, (20, 1, 20), vec.translate([0, -1.0, 0]))
    sc.add_sphere(light, 1.5, vec.translate([0, 12.0, 4]))
    cam = cm.make_camera(p=(0, 3.5, -9), vfov=np.radians(50), aspect=w / h)
    sc.camera = cm.aim_camera_at(cam, (0, 1.8, 0))
    sc.settings = SceneSettings(max_bounce_count=6, samples_per_pixel=1,
                                integrator="Advanced Pathtracer")
    return sc


def build_scene(w, h):
    if os.environ.get("BENCH_SCENE", "") == "stress":
        return build_stress_scene(w, h)
    return build_bench_scene(w, h)


def closest_hit_main():
    """BENCH_MODE=closest_hit: primary-ray closest-hit throughput through
    the production traversal path (the hardware-facing headline number).
    Runs in its own process so its executables don't count against the
    frame bench's tunnel budget (CLAUDE.md 4b).

    Round-5 (verdict item 2): the headline ``closest_hit_mrays_raw`` now
    AMORTIZES the per-dispatch tunnel overhead away honestly instead of
    subtracting it — ONE dispatch runs K=BENCH_CH_K traversals of varying
    ray sets in a fori_loop (AA jitter keyed off the loop index, result
    summed so nothing folds), and the raw wall time divides by K*n rays.
    At K=32 the ~28 ms tunnel tax is <2% of the dispatch.  The no-op
    overhead measurement is kept for the breakdown's fixed-cost field."""
    _enable_compile_cache()
    w = int(os.environ.get("BENCH_W", 1920))
    h = int(os.environ.get("BENCH_H", 1080))
    K = int(os.environ.get("BENCH_CH_K", 32))
    import jax
    import jax.numpy as jnp
    from buas_pathtracer_tpu.models import camera as cm
    from buas_pathtracer_tpu.ops import traverse_wide as tw
    from buas_pathtracer_tpu.runtime.render import _tiled

    sc = build_scene(w, h)
    ps = sc.pack()
    n = w * h
    py_, px_ = jnp.meshgrid(jnp.arange(h, dtype=jnp.int32),
                            jnp.arange(w, dtype=jnp.int32), indexing="ij")
    px = _tiled(px_).astype(jnp.float32)
    py = _tiled(py_).astype(jnp.float32)

    @jax.jit
    def noop(r):
        return (r * 2.0).sum()

    def gen(r):
        # varying arg: per-call entropy defeats the terminal's cross-process
        # result caching of byte-identical dispatches
        z = jnp.zeros((n,)) + r * 1e-7
        return cm.generate_rays(sc.camera, px, py, w, h, z + 0.5, z + 0.5,
                                z, z, 0.0, 1.0, 6, 0.0, 0.0)

    def walk(o, d):
        out = tw._traverse(ps, o, d, jnp.full((n,), tw.BIG_T),
                           jnp.full((n,), -1, jnp.int32), occlusion=False)
        return out[0].sum() + out[1].sum()

    @jax.jit
    def hit_sum(r):
        pr = gen(r)
        return walk(pr.o, pr.d)

    @jax.jit
    def hit_sum_k(r):
        # rays generated ONCE; each iteration jitters the origins along the
        # ray by an iteration-dependent epsilon — the traversal input varies
        # (so the loop body cannot be hoisted) at ~zero non-traversal cost,
        # and the measured dispatch is K traversals, not K raygens
        pr = gen(r)

        from buas_pathtracer_tpu.core.vec import Vec3

        def step(i, acc):
            e = 1e-5 * (i.astype(jnp.float32) + r)
            o = Vec3(pr.o.x + pr.d.x * e, pr.o.y + pr.d.y * e,
                     pr.o.z + pr.d.z * e)
            return acc + walk(o, pr.d)
        return jax.lax.fori_loop(0, K, step, jnp.float32(0.0))

    seed = int(time.time() * 1000) % 1000
    # self-calibrate the per-dispatch tunnel overhead with a tiny no-op
    _ = np.asarray(noop(jnp.float32(0.0)))
    overhead = 1e9
    for r in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(noop(jnp.float32(seed + r)))
        overhead = min(overhead, time.perf_counter() - t0)

    _ = np.asarray(hit_sum_k(jnp.float32(0.0)))  # compile + warm
    ts = []
    for r in range(2):
        t0 = time.perf_counter()
        _ = np.asarray(hit_sum_k(jnp.float32(seed + r + 1)))
        ts.append(time.perf_counter() - t0)
    raw_k = min(ts)

    # single-dispatch legacy number (kept for round-over-round continuity)
    _ = np.asarray(hit_sum(jnp.float32(0.5)))
    t0 = time.perf_counter()
    _ = np.asarray(hit_sum(jnp.float32(seed + 11)))
    raw1 = time.perf_counter() - t0
    el = max(raw1 - overhead, 1e-9)
    print(json.dumps({
        "closest_hit_mrays_raw": round(K * n / raw_k / 1e6, 1),
        "closest_hit_k": K,
        "closest_hit_mrays": round(n / el / 1e6, 1),
        "closest_hit_single_dispatch_mrays": round(n / raw1 / 1e6, 1),
        "dispatch_overhead_ms": round(overhead * 1e3, 1),
    }), flush=True)


def frame_main():
    """BENCH_MODE=frame: the full-frame measurement.  Prints the headline
    JSON line directly to (inherited) stdout the moment it's measured, and
    mirrors it to .bench_frame_result.json for the orchestrator."""
    _enable_compile_cache()
    w = int(os.environ.get("BENCH_W", 1920))
    h = int(os.environ.get("BENCH_H", 1080))
    frames = int(os.environ.get("BENCH_FRAMES", 4))
    spp = int(os.environ.get("BENCH_SPP", 1))
    bounces = int(os.environ.get("BENCH_BOUNCES", 0))  # attribution knobs
    nee = os.environ.get("BENCH_NEE", "1") == "1"
    filt = os.environ.get("BENCH_FILTER", "Mitchell Netravali")

    import jax.numpy as jnp

    from buas_pathtracer_tpu.runtime import film
    from buas_pathtracer_tpu.runtime.render import render_frame

    sc = build_scene(w, h)
    from dataclasses import replace
    if spp != 1:
        sc.settings = replace(sc.settings, samples_per_pixel=spp)
    if bounces:
        sc.settings = replace(sc.settings, max_bounce_count=bounces)
    if not nee:
        sc.settings = replace(sc.settings, next_event_estimation=False)

    ps = sc.pack()
    accum = film.new_accumulation_buffer(h, w)

    # per-run entropy: the axon terminal caches RESULTS of identical
    # dispatches across processes, so repeated benches with identical
    # frame indices can "run" without executing; distinct sample indices
    # keep the workload statistically identical but uncacheable
    seed = (int(time.time() * 1000) & 0x3FFF) * 64

    # warmup / compile
    accum, stats = render_frame(ps, sc.settings, sc.camera, accum,
                                jnp.uint32(seed), h=h, w=w,
                                n_lights=sc.n_lights,
                                filter_name=filt)
    np.asarray(stats)  # REAL sync (block_until_ready can lie over axon)

    t0 = time.perf_counter()
    for f_i in range(frames):
        accum, stats = render_frame(ps, sc.settings, sc.camera, accum,
                                    jnp.uint32(seed + (f_i + 1) * spp),
                                    h=h, w=w,
                                    n_lights=sc.n_lights,
                                    filter_name=filt)
    # np.asarray forces a real host fetch: over the axon tunnel,
    # block_until_ready alone can return before the dispatch queue drains
    # and report impossible numbers (CLAUDE.md pitfall 4b)
    stats = np.asarray(stats)
    t1 = time.perf_counter()
    # stats[0] counts rays (primary+bounce+shadow) for the LAST frame; frames
    # are identical workloads so scale by frame count.
    rays_per_frame = float(stats[0])
    elapsed = t1 - t0
    mrays = rays_per_frame * frames / elapsed / 1e6

    result = {
        "metric": "Mrays_per_sec",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
        "vs_baseline_metric": "live_ray_Mrays_per_sec / 100 Mrays/s/chip",
        "samples_per_sec": round(w * h * spp * frames / elapsed, 1),
        "frame_ms": round(elapsed / frames * 1e3, 1),
        "rays_per_frame_M": round(rays_per_frame / 1e6, 2),
    }
    with open(os.environ.get("BENCH_RESULT_FILE", _RESULT_FILE), "w") as f:
        json.dump(result, f)
    print(json.dumps(result), flush=True)


def main():
    """Orchestrator: frame measurement first (inherited stdout — its JSON
    line lands even if everything after dies), then the closest-hit stage,
    then ONE enriched final line.  No jax in this process: each stage is a
    clean-exiting TPU client of its own."""
    import subprocess

    if os.path.exists(_RESULT_FILE):
        os.remove(_RESULT_FILE)
    frame_timeout = float(os.environ.get("BENCH_FRAME_TIMEOUT", 2100))
    ch_timeout = float(os.environ.get("BENCH_CH_TIMEOUT", 1200))

    try:
        subprocess.run([sys.executable, os.path.abspath(__file__)],
                       env={**os.environ, "BENCH_MODE": "frame"},
                       timeout=frame_timeout)
    except subprocess.SubprocessError:
        pass
    result = None
    if os.path.exists(_RESULT_FILE):
        with open(_RESULT_FILE) as f:
            result = json.load(f)
    if result is None:
        # frame stage died: nothing trustworthy to report
        sys.exit(1)

    ch = {}
    if os.environ.get("BENCH_CLOSEST_HIT", "1") == "1":
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, "BENCH_MODE": "closest_hit"},
                capture_output=True, text=True, timeout=ch_timeout)
            for line in r.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    ch = json.loads(line)
        except (subprocess.SubprocessError, ValueError, OSError):
            ch = {}
    result.update(ch or {"closest_hit_mrays": None})
    print(json.dumps(result), flush=True)

    # -- per-wave attribution breakdown (round-4 verdict item 1) ----------
    # The frame's waves all live inside ONE jitted while_loop, so the
    # attribution is measured by LEG DIFFERENCING with the existing knobs
    # (the method of docs/PERFORMANCE.md rounds 4e/4m), each leg its own
    # clean TPU process at the driver frame shape:
    #   no_shadow  (BUAS_DEBUG_NO_SHADOW=1): all NEE math, no occlusion
    #              walks -> occlusion_waves_ms = full - no_shadow
    #   no_nee     (BENCH_NEE=0): -> nee_sampling_ms = no_shadow - no_nee
    #   b1         (BENCH_BOUNCES=1, NEE off): primary CH + shade + splat
    #              + fixed -> bounce_ch_ms = no_nee - b1
    # Sampling noise across legs is a few ms; negatives clamp to 0.
    if os.environ.get("BENCH_BREAKDOWN", "1") == "1" and result.get("frame_ms"):
        bd_timeout = float(os.environ.get("BENCH_BD_TIMEOUT", 1800))
        t_stage = time.perf_counter()
        legs = {}
        for name, env in (
                ("no_shadow", {"BUAS_DEBUG_NO_SHADOW": "1"}),
                ("no_nee", {"BENCH_NEE": "0"}),
                ("b1", {"BENCH_NEE": "0", "BENCH_BOUNCES": "1"})):
            left = bd_timeout - (time.perf_counter() - t_stage)
            if left < 60:
                break
            rf = os.path.join(_HERE, f".bench_leg_{name}.json")
            if os.path.exists(rf):
                os.remove(rf)
            try:
                subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env={**os.environ, "BENCH_MODE": "frame",
                         "BENCH_FRAMES": os.environ.get("BENCH_BD_FRAMES", "2"),
                         "BENCH_RESULT_FILE": rf, **env},
                    capture_output=True, timeout=left)
                if os.path.exists(rf):
                    with open(rf) as f:
                        legs[name] = json.load(f)["frame_ms"]
            except (subprocess.SubprocessError, ValueError, OSError, KeyError):
                pass
        full_ms = result["frame_ms"]
        ns, nn, b1 = (legs.get("no_shadow"), legs.get("no_nee"),
                      legs.get("b1"))
        ov = result.get("dispatch_overhead_ms") or 0.0
        bd = {
            "breakdown_occlusion_waves_ms":
                round(max(full_ms - ns, 0.0), 1) if ns else None,
            "breakdown_nee_sampling_ms":
                round(max(ns - nn, 0.0), 1) if ns and nn else None,
            "breakdown_bounce_ch_ms":
                round(max(nn - b1, 0.0), 1) if nn and b1 else None,
            "breakdown_primary_ch_shade_splat_ms":
                round(max(b1 - ov, 0.0), 1) if b1 else None,
            "breakdown_dispatch_overhead_ms": round(ov, 1),
        }
        result.update(bd)
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    mode = os.environ.get("BENCH_MODE", "")
    if mode == "frame":
        frame_main()
    elif mode == "closest_hit":
        closest_hit_main()
    else:
        main()
