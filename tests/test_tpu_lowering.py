"""Mosaic TPU-lowering lint: lower the production kernel programs for the
TPU target ON THE CPU HOST via
``jax.jit(f).trace(*args).lower(lowering_platforms=("tpu",))`` — no
device, no remote compile, a few seconds per program.

Why this exists: interpret-mode tests (RT_PALLAS_INTERPRET=1) execute
kernel SEMANTICS but skip Mosaic lowering entirely, so hardware-only
lowering failures — the blocked-spec rule (last block dims divisible by
(8, 128) or equal to the array dims), bad window orientations, illegal
in-kernel ops — surface only on the tunnel, mid-sweep, as rc=1 bench
deaths (round 4: the `win_t` wrinkle, docs/ROUND4_NOTES.md; the sweep's
`suzanne_hi_sub16` / `suzanne_xhi_nogroup` ValueErrors were this exact
class, raised CLIENT-side during lowering). This lint runs the real
Mosaic lowering pass for every production kernel regime on CPU, so that
class regresses in CI instead of on hardware.

What it cannot catch: remote-compiler failures (SMEM/VMEM budget
overruns arrive as `HTTP 500: tpu_compile_helper`) and runtime faults —
those still need the tunnel (scripts/tpu_smoke.py). Lowering legality
is the half that needs no hardware.

Reference parity note: the reference compiles one WGSL megakernel at
startup (/root/reference/src/state.rs shader module creation) and gets
its validation from naga at build time; this framework's analog is this
lowering lint over the Pallas program zoo.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsoderh_raytracing_tpu import load_scene
from rsoderh_raytracing_tpu.ops import pallas_intersect as pint
from rsoderh_raytracing_tpu.scene.device import build_device_scene

ASSETS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets")

# 2048^2 pixels = 4,194,304 lanes = 32,768 rows of 128: the flagship /
# bench lane count, which drives the shortlist-regime selection
# (_shortlist_group counts tiles = rows / sublanes).
ROWS = 32768
LANES = 128


def _lower_tpu(f, *args):
    jax.jit(f).trace(*args).lower(lowering_platforms=("tpu",))


def _tiles():
    z = jnp.ones((ROWS, LANES), jnp.float32)
    return (z, z, z)


@pytest.fixture(scope="module")
def scenes():
    out = {}
    for nm in ("suzanne", "suzanne_hi", "spheres"):
        out[nm] = build_device_scene(
            load_scene(os.path.join(ASSETS, "scenes", f"{nm}.toml"))
        )
    return out


@pytest.fixture(scope="module")
def xhi_scale_scene():
    """Synthetic 247,808-triangle soup: suzanne_xhi's exact lane count
    (3,872 chunks), so the lint lowers the REAL xhi production regime —
    auto grouped shortlist, G=16, in-kernel fori_loop sub-chunk sweeps,
    transposed SMEM windows — without the 17 MB generated OBJ."""
    from rsoderh_raytracing_tpu.scene.camera import Camera
    from rsoderh_raytracing_tpu.scene.types import (
        Material,
        PackedMeshes,
        Scene,
    )

    n_tri = 247808
    rng = np.random.default_rng(0)
    base = rng.uniform(-4, 4, (n_tri, 3)).astype(np.float32)
    jit1 = rng.normal(0, 0.05, (n_tri, 3)).astype(np.float32)
    jit2 = rng.normal(0, 0.05, (n_tri, 3)).astype(np.float32)
    verts = np.concatenate([base, base + jit1, base + jit2], axis=0)
    idx = np.arange(n_tri, dtype=np.int32)
    tris = np.stack(
        [idx, idx + n_tri, idx + 2 * n_tri,
         np.zeros(n_tri, np.int32), np.zeros(n_tri, np.int32),
         np.zeros(n_tri, np.int32), np.zeros(n_tri, np.int32)],
        axis=1,
    )
    scene = Scene(
        materials=[Material((0.5, 0.5, 0.5), 0.5, 0.0, (0, 0, 0))],
        spheres=[],
        planes=[],
        meshes=PackedMeshes(
            vertices=verts,
            normals=np.array([[0.0, 1.0, 0.0]], np.float32),
            triangles=tris,
        ),
        camera=Camera(pos=[0, 0, 8], yaw=0, pitch=0, fov_y=1.2),
    )
    ds = build_device_scene(scene)
    assert pint.scene_chunk_count(ds) == 3872
    return ds


# (name, scene key, sublanes, env knobs) — every chunked-kernel regime
# the production router or the measurement sweeps can select. Regime
# notes verified against _shortlist_group's budget math at ROWS rows:
# suzanne 16 chunks -> plain grid; suzanne_hi 242 chunks -> flat list at
# sub64 (512 tiles), grouped G=2 TRANSPOSED window at sub32 (1024
# tiles), plain grid at sub16 (2048 tiles never fit); G=8/16 force the
# in-kernel fori_loop sub-chunk sweep (> GROUP_UNROLL_MAX); f2b compiles
# the tie-break closest kernel; spheres lowers the sphere-window lanes.
CHUNKED_CONFIGS = [
    ("suzanne_plain_sub64", "suzanne", 64, {}),
    ("suzanne_hi_flat_sub64", "suzanne_hi", 64, {}),
    ("suzanne_hi_g2_transposed_sub32", "suzanne_hi", 32, {}),
    # the round-4 sweep's rc=1 config — stale since the win_t fix; kept
    # here so the plain-grid-at-2048-tiles regime stays lowerable
    ("suzanne_hi_plain_sub16", "suzanne_hi", 16, {}),
    ("suzanne_hi_g8_fori", "suzanne_hi", 64, {"RT_SHORTLIST_GROUP": "8"}),
    ("suzanne_hi_g16_fori", "suzanne_hi", 64, {"RT_SHORTLIST_GROUP": "16"}),
    ("suzanne_hi_f2b_tiebreak", "suzanne_hi", 64, {"RT_SHORTLIST_F2B": "1"}),
    ("spheres_windows_sub64", "spheres", 64, {}),
]


@pytest.mark.parametrize(
    "name,scene_key,sub,knobs",
    CHUNKED_CONFIGS,
    ids=[c[0] for c in CHUNKED_CONFIGS],
)
def test_chunked_kernels_lower_for_tpu(
    monkeypatch, scenes, name, scene_key, sub, knobs
):
    for k, v in knobs.items():
        monkeypatch.setenv(k, v)
    ds = scenes[scene_key]
    rt = _tiles()
    live = jnp.ones((ROWS, LANES), jnp.int32)
    _lower_tpu(
        lambda a, b, m: pint.chunked_closest_tiles(
            ds, a, b, live_mask=m, sublanes=sub
        ),
        rt, rt, live,
    )
    _lower_tpu(
        lambda a, b, m: pint.chunked_any_tiles(
            ds, a, b, hit_mask=m, sublanes=sub
        ),
        rt, rt, live,
    )


def test_xhi_scale_grouped_fori_lowers(xhi_scale_scene):
    """The suzanne_xhi production program shape: 3,872 chunks at 512
    tiles auto-select the G=16 grouped shortlist whose sub-chunk sweeps
    run under the in-kernel fori_loop with dynamic SMEM window offsets
    (ops/pallas_intersect.py GROUP_UNROLL_MAX)."""
    ds = xhi_scale_scene
    rt = _tiles()
    live = jnp.ones((ROWS, LANES), jnp.int32)
    _lower_tpu(
        lambda a, b, m: pint.chunked_closest_tiles(
            ds, a, b, live_mask=m, sublanes=64
        ),
        rt, rt, live,
    )
    _lower_tpu(
        lambda a, b, m: pint.chunked_any_tiles(
            ds, a, b, hit_mask=m, sublanes=64
        ),
        rt, rt, live,
    )


@pytest.mark.parametrize("scene_name", ["house", "suzanne_hi"])
def test_freerun_production_program_lowers(monkeypatch, scene_name):
    """End-to-end: the full render_freerun program (trace/shade or
    chunked+mega-shade kernels, env gathers, auto compaction cadence,
    film) lowers for TPU at the flagship 2048^2 resolution. The kernel
    path is backend-gated, so force it — lowering targets TPU even
    though the host backend is CPU."""
    from rsoderh_raytracing_tpu.env.environment import (
        Environment,
        device_environment,
    )
    from rsoderh_raytracing_tpu.env.hdr_io import procedural_sky
    from rsoderh_raytracing_tpu.render import wavefront as wf
    from rsoderh_raytracing_tpu.render.integrator import camera_pytree

    monkeypatch.setattr(pint, "pallas_enabled", lambda: True)
    scene = load_scene(os.path.join(ASSETS, "scenes", f"{scene_name}.toml"))
    ds = build_device_scene(scene)
    env = device_environment(
        Environment.from_texture("sky", procedural_sky(2048, 1024))
    )
    cam = camera_pytree(scene.camera)
    wf.render_freerun.trace(
        ds, env, cam, jnp.uint32(0), (2048, 2048), jnp.uint32(64)
    ).lower(lowering_platforms=("tpu",))


def test_xxhi_scale_raised_ceiling_lowers(monkeypatch):
    """RT_MAX_CHUNKED_TRIS can raise the chunk ceiling to 991k-tri
    scenes (suzanne_xxhi = 15,488 chunks; default stays 262,144). At
    that scale the capacity search — whose total bound counts the
    (6, n_chunks) bounds table's 363 KB SMEM allocation alongside the
    shortlist — selects the plain chunked grid at the 2048^2 tile
    count and a G=2 grouped shortlist at 256^2 (the config measured at
    0.11 Mrays/s, 10x the composed sweep). Lower both regimes for
    TPU."""
    from rsoderh_raytracing_tpu.scene.camera import Camera
    from rsoderh_raytracing_tpu.scene.types import (
        Material,
        PackedMeshes,
        Scene,
    )

    monkeypatch.setattr(pint, "MAX_CHUNKED_TRIS", 1048576)
    n_tri = 991232
    rng = np.random.default_rng(1)
    base = rng.uniform(-4, 4, (n_tri, 3)).astype(np.float32)
    verts = np.concatenate(
        [base, base + np.float32([0.05, 0, 0]),
         base + np.float32([0, 0.05, 0])],
        axis=0,
    )
    idx = np.arange(n_tri, dtype=np.int32)
    z = np.zeros(n_tri, np.int32)
    tris = np.stack(
        [idx, idx + n_tri, idx + 2 * n_tri, z, z, z, z], axis=1
    )
    scene = Scene(
        materials=[Material((0.5, 0.5, 0.5), 0.5, 0.0, (0, 0, 0))],
        spheres=[],
        planes=[],
        meshes=PackedMeshes(
            vertices=verts,
            normals=np.array([[0.0, 1.0, 0.0]], np.float32),
            triangles=tris,
        ),
        camera=Camera(pos=[0, 0, 8], yaw=0, pitch=0, fov_y=1.2),
    )
    ds = build_device_scene(scene)
    assert ds.bvh is None  # raised ceiling: the kernel path covers it
    assert pint.scene_chunk_count(ds) == 15488
    assert pint._shortlist_group(15488, ROWS // 64) == 0  # plain grid
    assert pint._shortlist_group(15488, 512 // 64) == 2  # 256^2: G=2

    live = jnp.ones((ROWS, LANES), jnp.int32)
    rt = _tiles()
    _lower_tpu(
        lambda a, b, m: pint.chunked_closest_tiles(
            ds, a, b, live_mask=m, sublanes=64
        ),
        rt, rt, live,
    )
    _lower_tpu(
        lambda a, b, m: pint.chunked_any_tiles(
            ds, a, b, hit_mask=m, sublanes=64
        ),
        rt, rt, live,
    )
    small = jnp.ones((512, LANES), jnp.float32)
    rt_s = (small, small, small)
    live_s = jnp.ones((512, LANES), jnp.int32)
    _lower_tpu(
        lambda a, b, m: pint.chunked_closest_tiles(
            ds, a, b, live_mask=m, sublanes=64
        ),
        rt_s, rt_s, live_s,
    )
    _lower_tpu(
        lambda a, b, m: pint.chunked_any_tiles(
            ds, a, b, hit_mask=m, sublanes=64
        ),
        rt_s, rt_s, live_s,
    )


def test_treelet_cluster_programs_lower(monkeypatch):
    """RT_CHUNK_CLUSTER=treelet changes chunk counts (suzanne_hi 242 ->
    ~340 padded SAH-treelet chunks) and therefore the shortlist-regime
    selection and SMEM table shapes. Lower the closest + occlusion
    programs the router would pick at the flagship tile count, at both
    production sublane heights."""
    monkeypatch.setenv("RT_CHUNK_CLUSTER", "treelet")
    ds = build_device_scene(
        load_scene(os.path.join(ASSETS, "scenes", "suzanne_hi.toml"))
    )
    assert pint.scene_chunk_count(ds) > 242  # padded treelet chunks
    rt = _tiles()
    live = jnp.ones((ROWS, LANES), jnp.int32)
    for sub in (64, 32):
        _lower_tpu(
            lambda a, b, m, s=sub: pint.chunked_closest_tiles(
                ds, a, b, live_mask=m, sublanes=s
            ),
            rt, rt, live,
        )
        _lower_tpu(
            lambda a, b, m, s=sub: pint.chunked_any_tiles(
                ds, a, b, hit_mask=m, sublanes=s
            ),
            rt, rt, live,
        )


def test_lint_actually_checks():
    """Negative control: a deliberately illegal block spec (last dim 20
    of a (64, 40) array — neither a 128-multiple nor the full dim) must
    raise during host-side TPU lowering. If this stops failing, the
    lowering path stopped running the Mosaic checks and every test
    above is vacuous."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = jnp.ones((64, 40), jnp.float32)

    def f(x):
        return pl.pallas_call(
            k,
            grid=(2,),
            in_specs=[
                pl.BlockSpec(
                    (64, 20), lambda i: (0, i), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec(
                (64, 20), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((64, 40), jnp.float32),
        )(x)

    with pytest.raises(ValueError, match="divisible"):
        _lower_tpu(f, x)
