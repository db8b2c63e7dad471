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
    import jax.numpy as jnp

    from rsoderh_raytracing_tpu import load_scene
    from rsoderh_raytracing_tpu.env.environment import (
        Environment,
        device_environment,
    )
    from rsoderh_raytracing_tpu.env.hdr_io import procedural_sky
    from rsoderh_raytracing_tpu.ops import rng
    from rsoderh_raytracing_tpu.render.integrator import (
        camera_pytree,
        generate_camera_rays,
        render_sample,
        trace_rays,
    )
    from rsoderh_raytracing_tpu.scene.device import build_device_scene

    root = os.path.dirname(os.path.abspath(__file__))
    scene = load_scene(os.path.join(root, "assets", "scenes", "house.toml"))
    ds = build_device_scene(scene)
    env = device_environment(
        Environment.from_texture("bench_sky", procedural_sky(2048, 1024))
    )
    cam = camera_pytree(scene.camera)

    size = int(os.environ.get("BENCH_SIZE", "2048"))
    max_bounces = int(os.environ.get("BENCH_BOUNCES", "8"))
    resolution = (size, size)
    n_pixels = size * size

    # --- mean rays/sample from an instrumented low-res run ---------------
    def stats_fn(scene_, env_, camera_, sample_index):
        width, height = 256, 256
        y, x = jnp.meshgrid(
            jnp.arange(height, dtype=jnp.int32),
            jnp.arange(width, dtype=jnp.int32),
            indexing="ij",
        )
        x = x.reshape(-1)
        y = y.reshape(-1)
        pix = (y * width + x).astype(jnp.uint32)
        state = rng.seed(pix, sample_index)
        state, ro, rd = generate_camera_rays(
            state, x, y, camera_, (width, height)
        )
        _, _, stats = trace_rays(
            scene_, env_, state, ro, rd, max_bounces, with_stats=True
        )
        return stats["closest_rays"] + stats["shadow_rays"]

    stats_jit = jax.jit(stats_fn)
    total = 0.0
    n_stat_samples = 4
    for s in range(n_stat_samples):
        total += float(stats_jit(ds, env, cam, np.uint32(s)))
    rays_per_pixel_sample = total / (n_stat_samples * 256 * 256)

    # --- timed full-size progressive samples ------------------------------
    warmup = 2
    timed = int(os.environ.get("BENCH_STEPS", "8"))
    for s in range(warmup):
        render_sample(
            ds, env, cam, np.uint32(s), resolution, max_bounces
        ).block_until_ready()

    start = time.perf_counter()
    out = None
    for s in range(timed):
        out = render_sample(
            ds, env, cam, np.uint32(warmup + s), resolution, max_bounces
        )
    out.block_until_ready()
    elapsed = time.perf_counter() - start

    total_rays = rays_per_pixel_sample * n_pixels * timed
    mrays = total_rays / elapsed / 1e6

    platform = jax.devices()[0].platform
    result = {
        "metric": f"house_{size} Mrays/s ({platform},"
        f" {max_bounces} bounces, {rays_per_pixel_sample:.2f} rays/px/spp)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
