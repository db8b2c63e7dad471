#!/usr/bin/env python
"""Hardware smoke test: the TPU-only correctness checks CI can't run.

CPU tests (tests/) cover the composed XLA body; the two-Pallas-kernel
production path only activates on real TPU hardware. This script re-runs
the cross-checks used to validate it:

1. kernel path vs composed XLA path at 1 spp (expect ~99.9% of pixels
   bitwise-equal; the rest are fma-contraction trajectory flips),
2. sharded (1x1 mesh, shard_map) == unsharded, bitwise,
3. fused_trace vs composed closest_hit/any_hit/material takes.

Run on the TPU host:  python scripts/tpu_smoke.py
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> int:
    import jax

    from rsoderh_raytracing_tpu import load_scene
    from rsoderh_raytracing_tpu.env.environment import (
        Environment,
        device_environment,
    )
    from rsoderh_raytracing_tpu.env.hdr_io import procedural_sky
    from rsoderh_raytracing_tpu.ops import pallas_intersect, pallas_wavefront
    from rsoderh_raytracing_tpu.ops.intersect import any_hit, closest_hit
    from rsoderh_raytracing_tpu.parallel.sharding import (
        make_mesh,
        render_freerun_sharded,
    )
    from rsoderh_raytracing_tpu.render.integrator import camera_pytree
    from rsoderh_raytracing_tpu.render.wavefront import (
        render_freerun,
        render_wavefront,
    )
    from rsoderh_raytracing_tpu.scene.device import build_device_scene

    if jax.default_backend() == "cpu":
        print("WARNING: running on CPU — the kernel path will not engage.")

    scene = load_scene("assets/scenes/house.toml")
    ds = build_device_scene(scene)
    env = device_environment(
        Environment.from_texture("smoke_sky", procedural_sky(512, 256))
    )
    cam = camera_pytree(scene.camera)
    size = 256
    failures = 0

    # 1. kernel vs composed at 1 spp --------------------------------------
    assert pallas_wavefront.supported(ds), "kernel path not engaged"
    img_k = np.asarray(
        render_wavefront(ds, env, cam, np.uint32(0), (size, size), np.uint32(1))
    )
    os.environ["RT_DISABLE_WFKERNELS"] = "1"
    render_wavefront.clear_cache()
    img_x = np.asarray(
        render_wavefront(ds, env, cam, np.uint32(0), (size, size), np.uint32(1))
    )
    del os.environ["RT_DISABLE_WFKERNELS"]
    render_wavefront.clear_cache()
    frac = float((np.abs(img_k - img_x).max(-1) <= 1e-5).mean())
    ok = frac > 0.995
    failures += not ok
    print(f"[{'ok' if ok else 'FAIL'}] kernel vs composed 1spp: "
          f"{frac * 100:.2f}% pixels equal (expect > 99.5%)")

    # 1b. big-scene (chunked + mega-shade) kernel path vs composed --------
    suz = build_device_scene(load_scene("assets/scenes/suzanne.toml"))
    assert pallas_intersect.chunked_trace_supported(suz), "big path off"
    img_k = np.asarray(
        render_wavefront(suz, env, cam, np.uint32(0), (size, size),
                         np.uint32(1))
    )
    os.environ["RT_DISABLE_WFKERNELS"] = "1"
    render_wavefront.clear_cache()
    img_x = np.asarray(
        render_wavefront(suz, env, cam, np.uint32(0), (size, size),
                         np.uint32(1))
    )
    del os.environ["RT_DISABLE_WFKERNELS"]
    render_wavefront.clear_cache()
    frac = float((np.abs(img_k - img_x).max(-1) <= 1e-5).mean())
    ok = frac > 0.995
    failures += not ok
    print(f"[{'ok' if ok else 'FAIL'}] big-scene kernel vs composed 1spp: "
          f"{frac * 100:.2f}% pixels equal (expect > 99.5%)")

    # 2. sharded == unsharded, bitwise ------------------------------------
    mesh = make_mesh(n_devices=len(jax.devices()), tile=1)
    img_s, cnt_s, _ = render_freerun_sharded(
        ds, env, cam, np.zeros((size, size), np.uint32), mesh,
        (size, size), np.uint32(64),
    )
    img_u, cnt_u = render_freerun(
        ds, env, cam, np.zeros((size, size), np.uint32),
        (size, size), np.uint32(64),
    )
    if mesh.shape["sample"] == 1 and mesh.shape["tile"] == 1:
        same = np.array_equal(np.asarray(img_s), np.asarray(img_u)) and (
            np.array_equal(np.asarray(cnt_s), np.asarray(cnt_u))
        )
        failures += not same
        print(f"[{'ok' if same else 'FAIL'}] sharded (1x1) == unsharded, "
              "bitwise")
    else:
        finite = bool(np.isfinite(np.asarray(img_s)).all())
        failures += not finite
        print(f"[{'ok' if finite else 'FAIL'}] sharded "
              f"{dict(mesh.shape)} ran (multi-device: streams differ by "
              "design; checked finite)")

    # 3. fused_trace vs composed ------------------------------------------
    rng_np = np.random.default_rng(0)
    n = 1 << 18
    ro = rng_np.normal(0, 3, (n, 3)).astype(np.float32)
    rd = rng_np.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    sd = rng_np.normal(size=(n, 3)).astype(np.float32)
    sd /= np.linalg.norm(sd, axis=-1, keepdims=True)
    hit_f, pt_f, n_f, *_rest, occ_f = pallas_intersect.fused_trace(
        ds, ro, rd, sd
    )
    hit = closest_hit(ds, ro, rd)
    occ = any_hit(ds, hit.point, sd)
    ok = (
        np.array_equal(np.asarray(hit_f), np.asarray(hit.did_hit))
        and np.array_equal(np.asarray(occ_f), np.asarray(occ))
        and np.abs(np.asarray(pt_f) - np.asarray(hit.point)).max() == 0.0
        and np.abs(np.asarray(n_f) - np.asarray(hit.normal)).max() < 1e-6
    )
    failures += not ok
    print(f"[{'ok' if ok else 'FAIL'}] fused_trace == composed "
          "(masks/points exact, normals < 1e-6)")

    print("smoke:", "PASS" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
