#!/usr/bin/env python
"""Flagship (house 2048^2) headroom audit: time each budget term alone.

VERDICT r4 stretch task 6: house has sat at ~127 Mrays/s for three
rounds; the ns/lane budget table (PERFORMANCE.md) attributes ~6.1 to
the two env gathers, ~3.5 to the trace kernel, ~2.5 to the shade
kernel, ~1.2 to XLA glue. This script MEASURES each term standalone on
hardware so every entry gets either a lever or a roofline-closed
verdict:

  gathers   - the real alias-row + dependent quad-row gather pair at
              4.2M lanes over the real 2048x1024 packed env arrays,
              with in-context-like index concentration (alias draws)
  trace     - pwf.trace_call (the fused trace kernel) alone in a loop
  glue      - the per-iteration XLA math outside kernels/gathers:
              alias draw arithmetic, equirect uv <-> direction
              (arctan2/asin), stats sums
  loop      - one full render_freerun iteration for reference
              (BENCH-equivalent program, iteration budget amortized)

Each term runs under jax.jit in a lax.fori_loop carrying its inputs so
XLA cannot hoist the work; ns/lane = elapsed / iters / 4.2M.

Usage: python scripts/flagship_audit.py [iters]
Prints one JSON line per term.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

SIZE = int(os.environ.get("AUDIT_SIZE", "2048"))
ROWS = SIZE * SIZE // 128
LANES = 128


def main() -> int:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    import jax
    import jax.numpy as jnp

    from rsoderh_raytracing_tpu import load_scene
    from rsoderh_raytracing_tpu.env.environment import (
        Environment,
        device_environment,
    )
    from rsoderh_raytracing_tpu.env.hdr_io import procedural_sky
    from rsoderh_raytracing_tpu.ops import envmap, rng
    from rsoderh_raytracing_tpu.ops import pallas_wavefront as pwf
    from rsoderh_raytracing_tpu.render.integrator import camera_pytree
    from rsoderh_raytracing_tpu.scene.device import build_device_scene

    scene = load_scene("assets/scenes/house.toml")
    ds = build_device_scene(scene)
    env = device_environment(
        Environment.from_texture("bench_sky", procedural_sky(2048, 1024))
    )
    cam = camera_pytree(scene.camera)
    n = ROWS * LANES

    key = np.random.default_rng(0)
    state0 = jnp.asarray(
        key.integers(0, 2**32, (ROWS, LANES), dtype=np.uint32)
    )
    d = key.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rd = tuple(jnp.asarray(d[:, i].reshape(ROWS, LANES)) for i in range(3))
    o = key.normal(0, 3, (n, 3)).astype(np.float32)
    ro = tuple(jnp.asarray(o[:, i].reshape(ROWS, LANES)) for i in range(3))

    def timed(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        start = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - start
        ns_lane = dt / iters / n * 1e9
        print(json.dumps({
            "term": name,
            "iters": iters,
            "wall_s": round(dt, 4),
            "ms_per_iter": round(1000 * dt / iters, 3),
            "ns_per_lane": round(ns_lane, 3),
        }), flush=True)
        return ns_lane

    # --- gathers: alias row draw + dependent quad row ------------------
    def gathers(state):
        def body(_, s):
            s, _idx, uv, pmf = envmap.sample_alias_index(
                s.reshape(-1), env
            )
            radiance, qpmf = envmap.radiance_and_pmf(env, uv)
            # fold results back into the carry so nothing is dead code
            mix = (
                radiance[:, 0] + pmf + qpmf
            ).astype(jnp.uint32) ^ s
            return mix.reshape(ROWS, LANES)
        return jax.lax.fori_loop(0, iters, body, state)

    # --- alias draw WITHOUT the gathers (the arithmetic part) ----------
    def glue(state):
        def body(_, s):
            flat = s.reshape(-1)
            s1, u1 = rng.next_uniform(flat)
            s2, u2 = rng.next_uniform(s1)
            s3, jx = rng.next_uniform(s2)
            s4, jy = rng.next_uniform(s3)
            uv = jnp.stack([u1 * 0.999, u2 * 0.999], axis=-1)
            nd = envmap.equirect_uv_to_direction(uv)
            # miss-side uv math (arctan2 + arcsin on every lane)
            mu = jnp.arctan2(nd[..., 2], nd[..., 0])
            mv = jnp.arcsin(jnp.clip(nd[..., 1], -1.0, 1.0))
            mix = (mu + mv + jx + jy).astype(jnp.uint32) ^ s4
            return mix.reshape(ROWS, LANES)
        return jax.lax.fori_loop(0, iters, body, state)

    # --- stats sums (2 full-lane reductions per iteration) -------------
    def stats(state):
        def body(_, c):
            s, acc = c
            acc = acc + jnp.sum((s & 1).astype(jnp.float32))
            acc = acc + jnp.sum((s & 2).astype(jnp.float32))
            s = s * jnp.uint32(747796405) + jnp.uint32(2891336453)
            return (s, acc)
        return jax.lax.fori_loop(0, iters, body, (state, jnp.float32(0)))

    # --- trace kernel alone --------------------------------------------
    env_h, env_w = env.texture_shape[0], env.texture_shape[1]

    def trace(state):
        def body(_, s):
            flat = s.reshape(-1)
            s1, u = rng.next_uniform(flat)
            s1 = s1.reshape(ROWS, LANES)
            uv0 = (u * 0.999).reshape(ROWS, LANES)
            uv1 = uv0 * 0.5
            tr = pwf.trace_call(
                ds, env_w, env_h, ro, rd,
                (rd[0], rd[1], rd[2]), (uv0, uv1), (uv0, uv1), s1,
            )
            return tr["state"] ^ tr["hit"].astype(jnp.uint32)
        return jax.lax.fori_loop(0, iters, body, state)

    terms = os.environ.get(
        "AUDIT_TERMS", "gathers,glue,stats,trace,loop"
    ).split(",")
    if "gathers" in terms:
        timed("gathers(alias+quad)", gathers, state0)
    if "glue" in terms:
        timed("glue(draws+uv+atan2/asin)", glue, state0)
    if "stats" in terms:
        timed("stats(2 lane sums)", stats, state0)
    if "trace" in terms:
        timed("trace_kernel", trace, state0)
    if "loop" not in terms:
        return 0

    # --- full production iteration for reference ------------------------
    from rsoderh_raytracing_tpu.render.wavefront import render_freerun

    img, counts, st = render_freerun(
        ds, env, cam, np.zeros((SIZE, SIZE), np.uint32), (SIZE, SIZE),
        np.uint32(iters), with_stats=True,
    )
    jax.block_until_ready(img)
    start = time.perf_counter()
    img, counts, st = render_freerun(
        ds, env, cam, np.asarray(counts), (SIZE, SIZE),
        np.uint32(iters), with_stats=True,
    )
    jax.block_until_ready(img)
    dt = time.perf_counter() - start
    its = float(st["iterations"])
    print(json.dumps({
        "term": "full_freerun_iteration",
        "iters": its,
        "wall_s": round(dt, 4),
        "ms_per_iter": round(1000 * dt / max(its, 1), 3),
        "ns_per_lane": round(dt / max(its, 1) / n * 1e9, 3),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
