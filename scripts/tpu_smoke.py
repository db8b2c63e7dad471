#!/usr/bin/env python
"""Hardware smoke test: the TPU-only correctness checks CI can't run.

CPU tests (tests/) cover the composed XLA body; the two-Pallas-kernel
production path only activates on real TPU hardware. This script re-runs
the cross-checks used to validate it:

1.  kernel path vs composed XLA path at 1 spp (expect ~99.9% of pixels
    bitwise-equal; the rest are fma-contraction trajectory flips),
1b. big-scene (chunked + mega-shade) path vs composed on suzanne,
1c. lifted-ceiling path vs composed on suzanne_hi (15,488 tris),
1f. grouped (G=4) and front-to-back(+tie-break) shortlists vs the
    default flat/index-order kernels, bit-transparent,
1d. sphere-window path vs composed on the 1000-sphere cloud,
1e. MIXED grid (triangle + sphere windows in one kernel) vs composed,
2.  sharded (shard_map) == unsharded, bitwise,
3.  fused_trace vs composed closest_hit/any_hit/material takes,
4.  bounce-synchronized rounds (render_spp_sync) == render_wavefront,
    bitwise, on the kernel path.

Run on the TPU host:  python scripts/tpu_smoke.py [--json docs/tpu_smoke_rNN.json]

The JSON artifact records each check's measured numbers so kernel-state
divergence regressions are visible round over round (VERDICT round 2,
"what's weak" #4).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

CHECKS = []


def record(name, ok, **metrics):
    CHECKS.append({"name": name, "ok": bool(ok), **metrics})
    print(f"[{'ok' if ok else 'FAIL'}] {name}: "
          + " ".join(f"{k}={v}" for k, v in metrics.items()))
    return not ok


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", default=None, help="write results JSON here")
    args = parser.parse_args()

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
        render_spp_sync,
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

    def kernel_vs_composed(name, dscene, camera, px, thresh=0.995):
        nonlocal failures
        img_k = np.asarray(
            render_wavefront(
                dscene, env, camera, np.uint32(0), (px, px), np.uint32(1)
            )
        )
        os.environ["RT_DISABLE_WFKERNELS"] = "1"
        render_wavefront.clear_cache()
        img_x = np.asarray(
            render_wavefront(
                dscene, env, camera, np.uint32(0), (px, px), np.uint32(1)
            )
        )
        del os.environ["RT_DISABLE_WFKERNELS"]
        render_wavefront.clear_cache()
        eq = np.abs(img_k - img_x).max(-1) <= 1e-5
        frac = float(eq.mean())
        failures += record(
            name, frac > thresh,
            pixels_bit_equal_frac=round(frac, 6),
            diverging_pixels=int((~eq).sum()),
            size=px,
        )

    # 1. kernel vs composed at 1 spp --------------------------------------
    assert pallas_wavefront.supported(ds), "kernel path not engaged"
    kernel_vs_composed("house kernel vs composed 1spp", ds, cam, size)

    # 1b. big-scene (chunked + mega-shade) kernel path vs composed --------
    suz_scene = load_scene("assets/scenes/suzanne.toml")
    suz = build_device_scene(suz_scene)
    suz_cam = camera_pytree(suz_scene.camera)
    assert pallas_intersect.chunked_trace_supported(suz), "big path off"
    kernel_vs_composed(
        "suzanne big-scene kernel vs composed 1spp", suz, suz_cam, size
    )

    # 1c. lifted ceiling: suzanne_hi (15,488 tris) on the chunked path ----
    hi_scene = load_scene("assets/scenes/suzanne_hi.toml")
    hi = build_device_scene(hi_scene)
    hi_cam = camera_pytree(hi_scene.camera)
    assert pallas_intersect.chunked_trace_supported(hi), "hi path off"
    kernel_vs_composed(
        "suzanne_hi (15488 tris) kernel vs composed 1spp", hi, hi_cam, 128
    )

    # 1f. grouped + front-to-back shortlists on hardware --------------------
    # Both knobs are bit-transparent by construction (group reachability
    # is coarser than flat + unchanged per-chunk culls; f2b compiles the
    # lowest-index tie-break), but each knob is a DIFFERENT compiled
    # program, so rare contraction-class ulp flips are legal — record
    # the fraction like the kernel-vs-composed checks.
    def knob_vs_default(name, knobs, dscene, camera, px, thresh=0.995):
        nonlocal failures
        img_d = np.asarray(
            render_wavefront(
                dscene, env, camera, np.uint32(0), (px, px), np.uint32(1)
            )
        )
        for k, v in knobs.items():
            os.environ[k] = v
        render_wavefront.clear_cache()
        img_k = np.asarray(
            render_wavefront(
                dscene, env, camera, np.uint32(0), (px, px), np.uint32(1)
            )
        )
        for k in knobs:
            del os.environ[k]
        render_wavefront.clear_cache()
        eq = np.abs(img_k - img_d).max(-1) <= 1e-5
        frac = float(eq.mean())
        failures += record(
            name, frac > thresh,
            pixels_bit_equal_frac=round(frac, 6),
            diverging_pixels=int((~eq).sum()),
            size=px,
        )

    knob_vs_default(
        "grouped shortlist (G=4) == flat, suzanne_hi 1spp",
        {"RT_SHORTLIST_GROUP": "4"}, hi, hi_cam, 128,
    )
    # G > GROUP_UNROLL_MAX compiles the OTHER grouped body: sub-chunk
    # sweeps under an in-kernel fori_loop with dynamic SMEM window
    # offsets + transposed windows (ops/pallas_intersect.py:1134-1144)
    # — the variant suzanne_xhi actually runs in production (G=16 at
    # 2048^2). Interpret-mode tests cover its construction, but round 4
    # proved interpret parity does not imply hardware parity on this
    # stack (the blocked-spec wrinkle), so the fori_loop body gets the
    # same hardware bit/statistical discipline here (VERDICT r4 task 1a;
    # at small resolutions xhi itself auto-selects a FLAT list — forcing
    # G on suzanne_hi is the only way to pin this program shape cheaply).
    knob_vs_default(
        "grouped fori_loop (G=8) == flat, suzanne_hi 1spp",
        {"RT_SHORTLIST_GROUP": "8"}, hi, hi_cam, 128,
    )
    knob_vs_default(
        "grouped fori_loop (G=16) == flat, suzanne_hi 1spp",
        {"RT_SHORTLIST_GROUP": "16"}, hi, hi_cam, 128,
    )
    knob_vs_default(
        "front-to-back closest (+tie-break) == index order, suzanne_hi 1spp",
        {"RT_SHORTLIST_F2B": "1"}, hi, hi_cam, 128,
    )

    # 1d. sphere windows: the 1000-sphere cloud on the chunked path --------
    sph_scene = load_scene("assets/scenes/spheres.toml")
    sph = build_device_scene(sph_scene)
    sph_cam = camera_pytree(sph_scene.camera)
    assert pallas_intersect.chunked_trace_supported(sph), "sphere path off"
    assert pallas_intersect._chunk_spheres(sph), "sphere windows off"
    # Looser bound than the triangle scenes: the fma-contraction flip
    # class scales with the number of sphere QUADRATICS per segment
    # (disc = b^2-4ac cancellation amplifies a contraction ulp into a
    # ~1e-6-relative t perturbation on ordinary hits, not just grazes),
    # and every segment here tests 1000 spheres vs house's 3. Measured
    # 96.7% bit-equal; winner identity and occlusion are EXACT on
    # camera rays, and at 64 spp the kernel-vs-composed clamped RMSE
    # (5.3%) sits BELOW the composed-vs-composed decorrelated-stream
    # noise floor (6.9-7.2%) — the scene's mirror spheres make an
    # unclamped-firefly heavy tail both paths sample identically in
    # distribution (docs/ROUND3_NOTES.md, sphere-window section).
    kernel_vs_composed(
        "spheres (1000 sphere windows) kernel vs composed 1spp",
        sph, sph_cam, 128, thresh=0.95,
    )

    # 1e. mixed grid: triangle windows + sphere windows in ONE kernel ------
    # (the pl.when dual-sweep branch; suzanne's mesh + a deterministic
    # 200-sphere cloud). Bound sits between the tri-only (99.5%) and
    # sphere-only (95%) thresholds — flips scale with the sphere count.
    from rsoderh_raytracing_tpu.scene.types import Scene, Sphere

    rng_mix = np.random.default_rng(5)
    mixed_scene = Scene(
        materials=suz_scene.materials,
        spheres=list(suz_scene.spheres)
        + [
            Sphere(
                pos=rng_mix.uniform(-4.0, 4.0, 3),
                radius=float(rng_mix.uniform(0.1, 0.4)),
                material_id=int(
                    rng_mix.integers(0, len(suz_scene.materials))
                ),
            )
            for _ in range(200)
        ],
        planes=suz_scene.planes,
        meshes=suz_scene.meshes,
        camera=suz_scene.camera,
    )
    mixed = build_device_scene(mixed_scene)
    assert pallas_intersect._chunk_spheres(mixed), "mixed sphere windows off"
    assert mixed.tri_valid.shape[0] > 0
    assert pallas_intersect.chunked_trace_supported(mixed), "mixed path off"
    kernel_vs_composed(
        "mixed grid (16 tri + 4 sphere windows) kernel vs composed 1spp",
        mixed, suz_cam, 128, thresh=0.97,
    )

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
        failures += record(
            "sharded (1x1) == unsharded", same, bitwise=same
        )
    else:
        finite = bool(np.isfinite(np.asarray(img_s)).all())
        failures += record(
            "sharded multi-device ran (streams differ by design)",
            finite, mesh=str(dict(mesh.shape)),
        )

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
    normal_max = float(np.abs(np.asarray(n_f) - np.asarray(hit.normal)).max())
    ok = (
        np.array_equal(np.asarray(hit_f), np.asarray(hit.did_hit))
        and np.array_equal(np.asarray(occ_f), np.asarray(occ))
        and np.abs(np.asarray(pt_f) - np.asarray(hit.point)).max() == 0.0
        and normal_max < 1e-6
    )
    failures += record(
        "fused_trace == composed", ok, normal_abs_max=normal_max
    )

    # 4. spp-sync rounds ~= wavefront on the kernel path -------------------
    # Deliberately NOT a bitwise check on hardware: sync launches every
    # round's camera rays from the XLA prologue (_camera_rays: matmul +
    # linalg.norm), while the wavefront's regenerated samples compute
    # them IN-KERNEL (componentwise FMAs) — identical RNG draws but
    # ulp-different float directions, so every sample >= 1 trajectory
    # is ulp-perturbed. Same estimator; assert estimator-level
    # agreement (first-sample pixels stay bitwise: CPU tests assert the
    # composed path bitwise, where both modes share _camera_rays).
    for nm, dscene, camera in (
        ("house", ds, cam),
        ("suzanne", suz, suz_cam),
    ):
        img_sync, cnt_sync = render_spp_sync(
            dscene, env, camera, np.uint32(0), (size, size), np.uint32(2)
        )
        img_wf = render_wavefront(
            dscene, env, camera, np.uint32(0), (size, size), 2
        )
        a, b = np.asarray(img_sync), np.asarray(img_wf)
        d = a - b
        # whole-path fp flips (a perturbed trajectory takes another
        # branch) are excluded the same way ACCEPTANCE.md's anchors do
        flip = np.abs(d).max(-1) > 1e-2
        keep = ~flip
        rel = float(np.sqrt((d[keep] ** 2).mean())) / max(
            float(np.sqrt((b[keep] ** 2).mean())), 1e-20
        )
        counts_ok = bool((np.asarray(cnt_sync) == 2).all())
        # Half of all samples here are cross-implementation (round 1 of
        # 2), so whole-path flips run ~2% — same order as the 64^2@8spp
        # suzanne anchor's 2.2% (docs/ACCEPTANCE.md); bound at 5%.
        failures += record(
            f"spp_sync ~= wavefront ({nm}, 2 rounds)",
            rel < 5e-3 and flip.mean() < 0.05 and counts_ok,
            nonflip_rel_rmse=round(rel, 7),
            flipped_pixel_frac=round(float(flip.mean()), 6),
        )

    # 5. periodic lane compaction is output-transparent (round 4) ----------
    # compact_every permutes LANES only; per-pixel film/counts must match
    # the unsorted run. The two runs are different compiled PROGRAMS
    # (the compaction cond/permute changes the while-loop body), so on
    # hardware XLA may contract the glue differently — bitwise is
    # expected (the per-lane math lives in the kernels, bit-identical
    # code), but rare class-4 ulp flips are legal; record the fraction.
    img_c, cnt_c = render_freerun(
        suz, env, suz_cam, np.uint32(0), (size, size), np.uint32(8),
        compact_every=4,
    )
    img_n, cnt_n = render_freerun(
        suz, env, suz_cam, np.uint32(0), (size, size), np.uint32(8),
        compact_every=0,
    )
    a, b = np.asarray(img_c), np.asarray(img_n)
    eq = np.abs(a - b).max(-1) <= 1e-5
    counts_eq = bool((np.asarray(cnt_c) == np.asarray(cnt_n)).all())
    failures += record(
        "freerun compaction transparent (suzanne, K=4)",
        eq.mean() > 0.999 and counts_eq,
        pixels_bit_equal_frac=round(float(eq.mean()), 6),
        counts_equal=counts_eq,
    )

    print("smoke:", "PASS" if failures == 0 else f"{failures} FAILURES")
    if args.json:
        payload = {
            "backend": jax.default_backend(),
            "checks": CHECKS,
            "pass": failures == 0,
        }
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)
        print("wrote", args.json)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
