"""Package console entry points (pyproject.toml [project.scripts])."""

from __future__ import annotations


def render_main():
    """`buas-render` — delegates to the repo-root render.py main()."""
    import importlib.util
    import os
    import sys

    # installed layout: render.py logic lives here; repo layout: reuse it
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    candidate = os.path.join(root, "render.py")
    if os.path.exists(candidate):
        spec = importlib.util.spec_from_file_location("_buas_render", candidate)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.main()
    print("render.py not found next to the package; use the repo checkout",
          file=sys.stderr)
    return 1
