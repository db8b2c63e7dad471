#!/bin/bash
# Round-5 remaining TPU measurements, sequential (one chip).
# Log: /tmp/r5b.log. Each probe is deadline-safe (tiny sizes).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
L=/tmp/r5b.log
run() {
  echo "=== $* $(date +%H:%M:%S)" >> "$L"
  timeout 1200 "$@" >> "$L" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$L"
}

# 1. RT_BVH_PACKED on TPU (knob verdict): packed vs unpacked walk,
#    suzanne 128^2 (round-4 unpacked measured 0.01 Mrays/s here)
RT_BVH_PACKED=1 run python scripts/bvh_tpu_probe.py 128 1 suzanne bvh
run python scripts/bvh_tpu_probe.py 128 1 suzanne bvh

# 2. xhi BVH walk at deadline-safe size (r5_xhi_bvh_1024 stand-in)
run python scripts/bvh_tpu_probe.py 128 1 suzanne_xhi bvh

# 3. Past-ceiling routing: 991k-tri xxhi, walk vs composed dense sweep
run python scripts/bvh_tpu_probe.py 128 1 suzanne_xxhi bvh
run python scripts/bvh_tpu_probe.py 128 1 suzanne_xxhi sweep

# 4. Flagship headroom audit (house 2048^2, per-term ns/lane)
run python scripts/flagship_audit.py 64

# 5. Viewer fps (default scene, 256x144, converge + moving)
run python scripts/viewer_fps.py default

# 6. BENCH_r05 confirmation (house 2048^2)
run python bench.py
echo "ALL DONE $(date +%H:%M:%S)" >> "$L"
