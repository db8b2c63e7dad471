"""Time the chunked sweep kernels standalone at bench scale (suzanne,
rows=32768 = 4.2M lanes) to locate where big-scene iteration time goes.

Run on TPU: `python scripts/sweep_microbench.py`. Compare against the
end-to-end per-iteration cost from `BENCH_SCENE=suzanne python bench.py`
(rays/iteration / Mrays/s).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rsoderh_raytracing_tpu.ops import pallas_intersect as pint
from rsoderh_raytracing_tpu.scene.device import build_device_scene
from rsoderh_raytracing_tpu.scene.toml_loader import load_scene


def timeit(label, fn, *args, iters=8):
    out = jax.block_until_ready(fn(*args))  # warmup/compile
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - start) / iters
    lanes = args[1][0].size if isinstance(args[1], tuple) else None
    ns = dt / (lanes or 1) * 1e9
    print(f"{label}: {dt * 1e3:.2f} ms  ({ns:.2f} ns/lane)")
    return dt


def main() -> int:
    print("devices:", jax.devices())
    scene = build_device_scene(load_scene("assets/scenes/suzanne.toml"))
    assert pint.chunked_trace_supported(scene)
    n_tri = int(scene.tri_valid.shape[0])
    print(f"triangles (padded): {n_tri}, chunks: {n_tri // pint.TRI_CHUNK}")

    rows = 32768
    rng = np.random.default_rng(0)
    shape = (rows, pint.LANES)
    # Mimic wavefront state: origins near the scene, directions mixed
    # (some toward the head, some sky/ground).
    ro = tuple(
        jnp.asarray(rng.normal(size=shape).astype(np.float32) * 2.0 + o)
        for o in (0.0, 0.5, 1.0)
    )
    rd_raw = rng.normal(size=(3,) + shape).astype(np.float32)
    norm = np.sqrt((rd_raw**2).sum(0))
    rd = tuple(jnp.asarray(c / norm) for c in rd_raw)

    for sub in (64, 128, 256):
        closest_s = jax.jit(
            lambda ro, rd, s=sub: pint.chunked_closest_tiles(
                scene, ro, rd, sublanes=s
            )
        )
        timeit(f"closest sweep (sub={sub})", closest_s, ro, rd)

    closest = jax.jit(
        lambda ro, rd: pint.chunked_closest_tiles(scene, ro, rd, sublanes=64)
    )

    t, btype, bidx = closest(ro, rd)
    hm = (btype >= 0).astype(jnp.int32)
    print("hit fraction:", float(jnp.mean(hm.astype(jnp.float32))))

    anym = jax.jit(
        lambda ro, rd, hm: pint.chunked_any_tiles(
            scene, ro, rd, hit_mask=hm, sublanes=64
        )
    )
    timeit("occlusion sweep (masked, sub=64)", anym, ro, rd, hm)

    any_un = jax.jit(
        lambda ro, rd: pint.chunked_any_tiles(scene, ro, rd, sublanes=64)
    )
    timeit("occlusion sweep (unmasked, sub=64)", any_un, ro, rd)
    return 0


if __name__ == "__main__":
    sys.exit(main())
