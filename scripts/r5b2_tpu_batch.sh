#!/bin/bash
# Round-5 second TPU batch (resumed session), sequential on the one chip.
# Log: /tmp/r5b2.log.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
L=/tmp/r5b2.log
run() {
  echo "=== $* $(date +%H:%M:%S)" >> "$L"
  timeout 1500 "$@" >> "$L" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$L"
}

# 1. Past-ceiling routing decider: packed flat-BVH walk on the 991k-tri
#    scene (unpacked measured 0.002, composed dense sweep 0.01).
RT_BVH_PACKED=1 run python scripts/bvh_tpu_probe.py 128 1 suzanne_xxhi bvh

# 2. Flagship headroom audit, remaining terms (gathers/glue/stats are in
#    /tmp/r5b.log from the interrupted first batch).
AUDIT_TERMS=trace,loop run python scripts/flagship_audit.py 64

# 3. Viewer fps (round-3 task-5 criterion): converge + moving.
run python scripts/viewer_fps.py default

# 4. TRI_CHUNK=32 on the remaining chunked scenes (hi/xhi already
#    measured as wins) — decides whether 32 becomes the default.
RT_TRI_CHUNK=32 BENCH_SCENE=suzanne run python bench.py
RT_TRI_CHUNK=32 BENCH_SCENE=spheres run python bench.py

echo "ALL DONE $(date +%H:%M:%S)" >> "$L"
