#!/usr/bin/env python
"""Phase-timed TPU probe for the flat-BVH composed path (round-4
crossover diagnosis): tiny render via render_freerun with the bvh
intersector, printing wall times for scene build / compile+warmup /
timed iterations so an RPC-deadline death is distinguishable from a
kernel fault. Usage: python scripts/bvh_tpu_probe.py [size] [iters]
[scene] [intersector] — intersector in {bvh, sweep, auto} (default bvh;
sweep/auto make the same tiny render comparable across routes)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1
scene_name = sys.argv[3] if len(sys.argv) > 3 else "suzanne_hi"
intersector = sys.argv[4] if len(sys.argv) > 4 else "bvh"


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


stamp(
    f"start size={size} iters={iters} scene={scene_name} "
    f"intersector={intersector}"
)
from rsoderh_raytracing_tpu import load_scene
from rsoderh_raytracing_tpu.env.environment import (
    Environment,
    device_environment,
)
from rsoderh_raytracing_tpu.env.hdr_io import procedural_sky
from rsoderh_raytracing_tpu.render.integrator import camera_pytree
from rsoderh_raytracing_tpu.render.wavefront import render_freerun
from rsoderh_raytracing_tpu.scene.device import build_device_scene

scene = load_scene(
    os.path.join(ROOT, "assets", "scenes", f"{scene_name}.toml")
)
ds = build_device_scene(
    scene,
    with_bvh="auto" if intersector == "auto" else intersector == "bvh",
)
env = device_environment(
    Environment.from_texture("bench_sky", procedural_sky(512, 256))
)
cam = camera_pytree(scene.camera)
stamp(f"scene built; bvh nodes={ds.bvh.nodes_max.shape if ds.bvh else None}")

t0 = time.perf_counter()
img, counts, stats = render_freerun(
    ds, env, cam, np.zeros((size, size), np.uint32), (size, size),
    np.uint32(iters), 8, with_stats=True,
)
jax.block_until_ready(img)
stamp(f"warmup (compile+run) {time.perf_counter() - t0:.1f}s")

t0 = time.perf_counter()
img, counts, stats = render_freerun(
    ds, env, cam, counts, (size, size),
    np.uint32(iters), 8, with_stats=True,
)
jax.block_until_ready(img)
dt = time.perf_counter() - t0
rays = float(stats["closest_rays"] + stats["shadow_rays"])
stamp(
    f"timed {dt:.2f}s rays={rays:.0f} -> {rays / dt / 1e6:.2f} Mrays/s "
    f"({float(stats['iterations'])} iterations)"
)
