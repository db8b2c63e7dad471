#!/usr/bin/env python
"""Hardware image sanity for the raised chunk ceiling (round 5): render
suzanne_xxhi (991,232 triangles, 15,488 chunks) on the TPU kernel path
with RT_MAX_CHUNKED_TRIS raised, and compare against a second render.

Two modes:

- `transparency` (default): kernel path vs kernel path with the
  shortlist DISABLED (plain chunked grid). Shortlists are
  bit-transparent by construction (a shortlist-pruned chunk could
  never pass the per-lane slab test), so this comparison must be
  BITWISE IDENTICAL — it validates the raised-ceiling kernel machinery
  (flat shortlist construction, bounds-aware capacity search, chunk
  windows at 15,488 chunks) internally exact on hardware.

- `composed`: kernel path vs the composed XLA body
  (RT_DISABLE_WFKERNELS=1), equal RNG streams. This is a
  CROSS-PROGRAM comparison, so the usual ulp-scale flip classes apply
  (CLAUDE.md: fma-contraction trajectory flips + division-free
  occlusion predicate boundary flips) — and their per-pixel rate
  scales with the number of primitive tests along the path. At 991k
  triangles an 8-bounce path performs ~8M triangle tests (~1000x
  suzanne), so whole-path flips hit ~20% of 1-spp pixels (measured:
  bit_equal_frac 0.779 at 128^2) while remaining unbiased: the
  acceptance is therefore STATISTICAL — small relative L2, image
  means in close agreement, and a majority of pixels still bit-equal.

Usage: python scripts/xxhi_image_check.py [size] [spp] [mode]
Prints one JSON line per comparison.
"""

import json
import os
import subprocess
import sys
import tempfile

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("RT_MAX_CHUNKED_TRIS", "1048576")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys
import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, %(root)r)
from rsoderh_raytracing_tpu import load_scene
from rsoderh_raytracing_tpu.render.renderer import Renderer
s = load_scene(os.path.join(%(root)r, "assets/scenes/suzanne_xxhi.toml"))
r = Renderer(s, width=%(size)d, height=%(size)d)
r.step_batch(%(spp)d)
np.save(%(out)r, np.asarray(r.film.mean_radiance()))
"""


def render(out, size, spp, extra_env=None):
    env = dict(os.environ)
    env.update(extra_env or {})
    code = CHILD % {"root": ROOT, "size": size, "spp": spp, "out": out}
    subprocess.run(
        [sys.executable, "-c", code], env=env, check=True, timeout=1800
    )


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    mode = sys.argv[3] if len(sys.argv) > 3 else "transparency"
    other_env = (
        {"RT_DISABLE_WFKERNELS": "1"}
        if mode == "composed"
        else {"RT_DISABLE_SHORTLIST": "1"}
    )
    with tempfile.TemporaryDirectory() as td:
        a = os.path.join(td, "kernel.npy")
        b = os.path.join(td, "other.npy")
        render(a, size, spp)
        render(b, size, spp, extra_env=other_env)
        import numpy as np

        ka, kb = np.load(a), np.load(b)
        eq = (ka == kb).all(axis=-1)
        frac = float(eq.mean())
        diff = np.abs(ka - kb)
        rel = float(
            np.linalg.norm(ka - kb) / max(np.linalg.norm(kb), 1e-30)
        )
        mean_a, mean_b = float(ka.mean()), float(kb.mean())
        print(
            json.dumps(
                {
                    "metric": f"xxhi kernel-vs-{mode} (tpu)",
                    "size": size,
                    "spp": spp,
                    "bit_equal_frac": round(frac, 6),
                    "rel_l2": rel,
                    "max_abs": float(diff.max()),
                    "mean_kernel": mean_a,
                    "mean_other": mean_b,
                }
            )
        )
        if mode == "transparency":
            # bit-transparent perturbation: demand exact equality
            ok = frac == 1.0
        else:
            # cross-program: whole-path flips scale with primitive-test
            # count (~8M/pixel here), so judge the ESTIMATOR, not bits
            ok = (
                frac > 0.5
                and rel < 0.05
                and abs(mean_a - mean_b) < 1e-3 * max(abs(mean_b), 1e-6)
            )
        print(f"xxhi image check [{mode}]:", "PASS" if ok else "FAIL")
        return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
