"""Drive the interactive viewer against the REAL TPU chip and record the
session (round-4 verdict missing item 1 / next-round item 4): stand the
actual HTTP viewer up at preview resolution, let the progressive preview
accumulate, change settings mid-run (commit protocol + per-pass cancel),
take a screenshot of the live frame endpoint, and report progressive fps.

Run on the TPU (one client at a time, CLAUDE.md):
    python tools/viewer_tpu_demo.py [--scene "Cornell Box"] [--size 512x288]
Writes gallery/viewer_tpu_session.png and prints a JSON session record.
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="Cornell Box")
    ap.add_argument("--size", default="512x288")
    ap.add_argument("--frames", type=int, default=12,
                    help="progressive frames to time after warmup")
    ap.add_argument("--out", default=os.path.join(
        _REPO, "gallery", "viewer_tpu_session.png"))
    args = ap.parse_args()
    w, h = (int(t) for t in args.size.split("x"))

    # persistent compile cache: the preview program compiles once per shape
    import jax
    if os.environ.get("VIEWER_DEMO_CPU") == "1":  # harness smoke runs
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from http.server import ThreadingHTTPServer

    from buas_pathtracer_tpu.app.viewer import ViewerState, make_handler

    state = ViewerState(args.scene, w, h)
    rt = threading.Thread(target=state.render_loop, daemon=True)
    rt.start()
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    st = threading.Thread(target=server.serve_forever, daemon=True)
    st.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    print(f"viewer live at {base} ({args.scene} {w}x{h})", flush=True)

    def get_state():
        with urllib.request.urlopen(base + "/state", timeout=600) as r:
            return json.loads(r.read())

    def post(msg):
        req = urllib.request.Request(base + "/control",
                                     data=json.dumps(msg).encode(),
                                     method="POST")
        urllib.request.urlopen(req, timeout=600).read()

    # -- warmup: wait until the first real frame lands (compile) ----------
    t0 = time.time()
    while True:
        s = get_state()
        if s["spp"] >= 2:
            break
        time.sleep(2.0)
        if time.time() - t0 > 2400:
            raise SystemExit("viewer warmup timed out")
    warm_s = time.time() - t0
    print(f"first frames after {warm_s:.0f}s; timing {args.frames} "
          f"progressive frames...", flush=True)

    # -- timed progressive accumulation -----------------------------------
    spp0 = s["spp"]
    t1 = time.time()
    while True:
        s = get_state()
        if s["spp"] >= spp0 + args.frames:
            break
        time.sleep(0.25)
    elapsed = time.time() - t1
    fps = (s["spp"] - spp0) / elapsed
    record = {
        "scene": s["scene"], "size": f"{w}x{h}",
        "progressive_fps": round(fps, 2),
        "frame_ms": s["frame_ms"], "spp_accumulated": s["spp"],
        "mrays_per_s": s["mrays_per_s"], "title": s["title"],
        "warmup_s": round(warm_s, 1),
    }
    print("progressive:", json.dumps(record), flush=True)

    # -- mid-run settings change: commit protocol resets accumulation -----
    post({"type": "setting", "field": "max_bounce_count", "value": 4})
    t2 = time.time()
    while True:
        s = get_state()
        if s["settings"]["max_bounce_count"] == 4 and s["spp"] <= 3:
            break
        time.sleep(0.25)
        if time.time() - t2 > 600:
            raise SystemExit("settings change never took effect")
    record["settings_change_applied_s"] = round(time.time() - t2, 2)

    # camera move (freelook) also resets + keeps rendering; then let the
    # preview re-accumulate a few spp for a clean screenshot
    post({"type": "look", "dx": 60, "dy": 0})
    t3 = time.time()
    while get_state()["spp"] < 6:
        time.sleep(0.5)
        if time.time() - t3 > 600:
            raise SystemExit("preview stopped accumulating after look")
    with urllib.request.urlopen(base + "/frame.png", timeout=600) as r:
        png = r.read()
    with open(args.out, "wb") as f:
        f.write(png)
    record["screenshot"] = os.path.relpath(args.out, _REPO)
    print("RESULT " + json.dumps(record), flush=True)

    state.running = False
    rt.join(timeout=300)
    server.shutdown()


if __name__ == "__main__":
    main()
