"""Benchmark: path-tracing throughput on the benchmark scene.

Renders assets/scenes/house.toml (BASELINE.md stress config) on the
available accelerator and reports Mrays/s, where rays = closest-hit rays
actually alive per bounce + NEE shadow rays for lanes that hit — the
"pixels x spp x mean path length" accounting from SURVEY.md section 5.
Baseline target: 100 Mrays/s per v5e chip (BASELINE.json).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N/100}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_MRAYS = 100.0


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax

    from rsoderh_raytracing_tpu import load_scene
    from rsoderh_raytracing_tpu.env.environment import (
        Environment,
        device_environment,
    )
    from rsoderh_raytracing_tpu.env.hdr_io import procedural_sky
    from rsoderh_raytracing_tpu.render.integrator import camera_pytree
    from rsoderh_raytracing_tpu.scene.device import build_device_scene

    root = os.path.dirname(os.path.abspath(__file__))
    scene_name = os.environ.get("BENCH_SCENE", "house")  # house | suzanne | default
    scene = load_scene(
        os.path.join(root, "assets", "scenes", f"{scene_name}.toml")
    )
    ds = build_device_scene(scene)
    env = device_environment(
        Environment.from_texture("bench_sky", procedural_sky(2048, 1024))
    )
    cam = camera_pytree(scene.camera)

    size = int(os.environ.get("BENCH_SIZE", "2048"))
    max_bounces = int(os.environ.get("BENCH_BOUNCES", "8"))
    resolution = (size, size)
    n_pixels = size * size

    from rsoderh_raytracing_tpu.render.wavefront import (
        render_freerun,
        render_spp_sync,
    )

    spp = int(os.environ.get("BENCH_SPP", "16"))
    # BENCH_MODE=sync renders bounce-synchronized exact-spp rounds
    # (render_spp_sync) instead of the free-run budgeted wavefront; in
    # that mode BENCH_ITERS means SAMPLES per timed call.
    mode = os.environ.get("BENCH_MODE", "freerun")
    # Iteration budget per call: longer budgets amortize the wavefront
    # drain tail and the per-call sync (256 -> 123 Mrays/s, 1024 -> 127,
    # measured) — but a single device call must stay under the axon
    # tunnel's RPC deadline (~2 min): suzanne-class scenes run ~6x slower
    # per iteration, so they take a smaller per-call budget (a 1024-iter
    # suzanne call is ~4 min of device time and dies UNAVAILABLE).
    default_iters = {
        "house": "1024",
        "default": "1024",
        "suzanne": "128",
        "spheres": "128",  # 1000 spheres = 16 sphere chunks (suzanne-class)
        "suzanne_hi": "16",
    }.get(scene_name, "64")
    if mode == "sync":
        default_iters = {"suzanne_hi": "4"}.get(scene_name, "32")
    iterations = int(os.environ.get("BENCH_ITERS", default_iters))

    def render_step(base_counts):
        if mode == "sync":
            return render_spp_sync(
                ds, env, cam, base_counts, resolution,
                np.uint32(iterations), max_bounces, with_stats=True,
            )
        return render_freerun(
            ds, env, cam, base_counts, resolution,
            np.uint32(iterations), max_bounces, with_stats=True,
        )

    # --- timed free-run wavefront renders ---------------------------------
    # Every traced ray lands in the film (free-run keeps all lanes busy,
    # with per-pixel sample counts), so throughput is measured directly
    # from the kernel's own ray counters.
    # Array-typed base counts from the start so the timed calls reuse the
    # same compiled executable (a scalar base would be a separate shape).
    warmup_img, warmup_counts, _ = render_step(
        np.zeros((size, size), np.uint32)
    )
    jax.block_until_ready(warmup_img)
    import jax.numpy as jnp

    counts = warmup_counts  # device array: no host round trips in the loop

    timed = int(os.environ.get("BENCH_STEPS", "3"))
    total_rays = 0.0
    total_spp = 0.0
    start = time.perf_counter()
    out = None
    for s in range(timed):
        # counts holds the PREVIOUS call's per-pixel sample tally; feeding
        # it back as base keeps every pixel's RNG stream advancing.
        out, counts_dev, stats = render_step(counts)
        counts = counts + counts_dev
        # stats are O(1) scalars — reading them is the step sync point.
        total_rays += float(stats["closest_rays"] + stats["shadow_rays"])
        total_spp += float(jnp.mean(counts_dev.astype(jnp.float32)))
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    rays_per_pixel_sample = total_rays / (n_pixels * max(total_spp, 1e-9))
    mrays = total_rays / elapsed / 1e6

    platform = jax.devices()[0].platform
    result = {
        "metric": f"{scene_name}_{size}"
        f"{'_sync' if mode == 'sync' else ''} Mrays/s ({platform},"
        f" {max_bounces} bounces, {rays_per_pixel_sample:.2f} rays/px/spp)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
