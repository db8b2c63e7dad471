"""Time the big-path winner-take stage and big_shade inputs at bench
scale to finish the suzanne iteration budget (see sweep_microbench.py).
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
    out = jax.block_until_ready(fn(*args))
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - start) / iters
    print(f"{label}: {dt * 1e3:.2f} ms  ({dt / (32768 * 128) * 1e9:.2f} ns/lane)")
    return dt


def main() -> int:
    print("devices:", jax.devices())
    scene = build_device_scene(load_scene("assets/scenes/suzanne.toml"))
    rows = 32768
    rng = np.random.default_rng(0)
    shape = (rows, pint.LANES)
    n_tri = int(scene.tri_valid.shape[0])
    btype = jnp.asarray(rng.integers(-1, 3, size=shape).astype(np.int32))
    bidx = jnp.asarray(rng.integers(0, n_tri, size=shape).astype(np.int32))

    def take_stage(btype, bidx):
        idx_s = jnp.where(btype == 0, bidx, 0)
        idx_p = jnp.where(btype == 1, bidx, 0)
        idx_t = jnp.where(btype == 2, bidx, 0)

        def take3(tbl, idx):
            r = jnp.take(tbl, idx, axis=0)
            return (r[..., 0], r[..., 1], r[..., 2])

        mid = jnp.where(
            btype == 0,
            jnp.take(scene.sph_material, idx_s, axis=0),
            jnp.where(
                btype == 1,
                jnp.take(scene.pln_material, idx_p, axis=0),
                jnp.take(scene.tri_material, idx_t, axis=0),
            ),
        )
        out = take3(scene.sph_pos, idx_s)
        out += (jnp.take(scene.sph_radius, idx_s, axis=0),)
        out += take3(scene.pln_normal, idx_p)
        out += take3(scene.tri_a, idx_t)
        out += take3(scene.tri_edge0, idx_t)
        out += take3(scene.tri_edge1, idx_t)
        out += take3(scene.tri_n0, idx_t)
        out += take3(scene.tri_n1, idx_t)
        out += take3(scene.tri_n2, idx_t)
        return out + (mid,)

    timeit("winner-take stage (13 takes)", jax.jit(take_stage), btype, bidx)

    def tri_takes_only(btype, bidx):
        idx_t = jnp.where(btype == 2, bidx, 0)

        def take3(tbl, idx):
            r = jnp.take(tbl, idx, axis=0)
            return (r[..., 0], r[..., 1], r[..., 2])

        out = take3(scene.tri_a, idx_t)
        out += take3(scene.tri_edge0, idx_t)
        out += take3(scene.tri_edge1, idx_t)
        out += take3(scene.tri_n0, idx_t)
        out += take3(scene.tri_n1, idx_t)
        out += take3(scene.tri_n2, idx_t)
        return out

    timeit("tri takes only (6 takes)", jax.jit(tri_takes_only), btype, bidx)

    packed = jnp.concatenate(
        [scene.tri_a, scene.tri_edge0, scene.tri_edge1,
         scene.tri_n0, scene.tri_n1, scene.tri_n2], axis=-1
    )  # (T, 18) f32 = 72B rows
    print("packed tri table:", packed.shape, packed.dtype)

    def packed_take(btype, bidx):
        idx_t = jnp.where(btype == 2, bidx, 0)
        r = jnp.take(packed, idx_t, axis=0)
        return tuple(r[..., i] for i in range(18))

    timeit("packed tri take (1x72B rows)", jax.jit(packed_take), btype, bidx)

    # The production unified winner table (union layout; keep this the
    # real thing so the numbers keep describing the shipped path).
    from rsoderh_raytracing_tpu.ops import pallas_wavefront as pwf

    n_sph = scene.sph_radius.shape[0]
    n_pln = scene.pln_valid.shape[0]
    table = jax.jit(pwf.winner_table)(scene)
    print("unified table:", table.shape)

    def unified_take(btype, bidx):
        gidx = jnp.where(
            btype == 0, bidx,
            jnp.where(
                btype == 1, n_sph + bidx,
                jnp.where(btype == 2, n_sph + n_pln + bidx, 0),
            ),
        )
        r = jnp.take(table, gidx, axis=0)
        return tuple(r[..., i] for i in range(19))

    timeit("unified winner take (1x80B rows)", jax.jit(unified_take),
           btype, bidx)
    return 0


if __name__ == "__main__":
    sys.exit(main())
