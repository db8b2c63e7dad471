#!/usr/bin/env python
"""Round-5 TPU experiment sweep (VERDICT round-4 tasks 1b, 2, 3).

Same resumable harness as scripts/round4_sweep.py: each config runs as
a fresh bench.py child (env knobs are trace-time constants) and appends
one JSON line to the log; configs already green in the log are skipped.

Groups:
  baseline  - session-variance anchors (auto defaults)
  keyablate - RT_COMPACT_KEY / RT_COMPACT_MORTON_BITS ablation of the
              compaction sort key (VERDICT r4 weak #1: the 15-bit
              Morton + 7-bit direction key was adopted whole)
  chunk32   - TRI_CHUNK=32: smaller windows -> tighter per-chunk culls,
              the direction OPPOSITE the measured-worse 128/256
  sub16     - the round-4 rc=1 config, re-run after the win_t fix
              (lowering verified host-side by tests/test_tpu_lowering.py)
  dangling  - round-4 rc=1 re-runs: xhi grouped ablation, BVH packed
              gather rows, xhi BVH
  ceiling   - past-MAX_CHUNKED_TRIS routing probe: suzanne_xxhi
              (991,232 tris) composed dense sweep vs flat-BVH walk vs
              the auto route, small resolution (VERDICT r4 task 3)

Usage: python scripts/round5_sweep.py [logfile] [group ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HI = {"BENCH_SCENE": "suzanne_hi"}
XHI = {"BENCH_SCENE": "suzanne_xhi"}
# Past-ceiling probes run small: the composed dense sweep is O(P) with
# P ~ 1M, and the BVH walk measured 0.01 Mrays/s — 2048^2 would blow
# the axon RPC deadline by hours.
XXHI = {"BENCH_SCENE": "suzanne_xxhi", "BENCH_SIZE": "256",
        "BENCH_ITERS": "1", "BENCH_STEPS": "2"}

# (name, env, timeout_s)
CONFIGS = {
    "baseline": [
        ("r5_suzanne_hi_auto", dict(HI), 1800),
        ("r5_suzanne_xhi_auto", dict(XHI), 2400),
    ],
    "keyablate": [
        # every mode is bit-transparent (tests assert it); only cull
        # quality / sort cost move. Auto defaults (K=2 + sub32) stay on.
        ("r5_hi_key_dead", {**HI, "RT_COMPACT_KEY": "dead"}, 1800),
        ("r5_hi_key_morton", {**HI, "RT_COMPACT_KEY": "morton"}, 1800),
        ("r5_hi_key_dir", {**HI, "RT_COMPACT_KEY": "dir"}, 1800),
        ("r5_hi_key_bits4", {**HI, "RT_COMPACT_MORTON_BITS": "4"}, 1800),
        ("r5_hi_key_bits7", {**HI, "RT_COMPACT_MORTON_BITS": "7"}, 1800),
        # xhi compacts EVERY iteration — sort cost is 3,872-chunks big
        # there, so a cheaper key could matter more than on hi
        ("r5_xhi_key_dead", {**XHI, "RT_COMPACT_KEY": "dead"}, 2400),
        ("r5_xhi_key_morton", {**XHI, "RT_COMPACT_KEY": "morton"}, 2400),
    ],
    "chunk32": [
        ("r5_hi_tc32", {**HI, "RT_TRI_CHUNK": "32"}, 1800),
        ("r5_xhi_tc32", {**XHI, "RT_TRI_CHUNK": "32"}, 2400),
    ],
    "sub16": [
        ("r5_hi_sub16", {**HI, "RT_SWEEP_SUBLANES": "16"}, 1800),
    ],
    "dangling": [
        ("r5_xhi_nogroup",
         {**XHI, "RT_DISABLE_GROUP_SHORTLIST": "1"}, 2400),
        ("r5_hi_bvh_packed_1024",
         {**HI, "BENCH_INTERSECTOR": "bvh", "RT_BVH_PACKED": "1",
          "BENCH_SIZE": "1024", "BENCH_ITERS": "16"}, 2400),
        ("r5_xhi_bvh_1024",
         {**XHI, "BENCH_INTERSECTOR": "bvh",
          "BENCH_SIZE": "1024", "BENCH_ITERS": "8"}, 2400),
    ],
    "ceiling": [
        ("r5_xxhi_sweep", {**XXHI, "BENCH_INTERSECTOR": "sweep"}, 3000),
        ("r5_xxhi_bvh", {**XXHI, "BENCH_INTERSECTOR": "bvh"}, 3000),
        ("r5_xxhi_auto", {**XXHI, "BENCH_INTERSECTOR": "auto"}, 3000),
    ],
    # Compositions of the round-5 single-lever winners, never measured
    # together: TRI_CHUNK=32 (hi 6.34 / xhi 0.93 vs 6.22/0.89 auto) and
    # RT_COMPACT_MORTON_BITS=4 (hi 6.25). TC32 doubles the chunk count,
    # which changes both the compaction key's useful resolution and the
    # cadence regime (hi: 484 chunks at TC32, still the K=2 mid-scale
    # band — ce1 probes whether the doubled chunk count moves the
    # cadence optimum the way >1024-chunk grids did).
    # SAH-derived chunk clustering (scene/cluster.py, RT_CHUNK_CLUSTER):
    # host-side probe numbers (scripts/chunk_cluster_probe.py) say bvh
    # order cuts total chunk SA -9%/-18% free, treelet cuts per-chunk SA
    # 2.2-3.1x for ~40% more chunks. Fresh same-session anchors first —
    # hi/xhi session variance is ~10%. Treelet on xhi pads 3,872 ->
    # 5,482 chunks = 350,848 lanes, past the default ceiling, so it
    # rides the raised-ceiling knob (measured safe at 991k lanes).
    "cluster": [
        ("r5b_hi_anchor", dict(HI), 2400),
        ("r5b_hi_clus_bvh", {**HI, "RT_CHUNK_CLUSTER": "bvh"}, 2400),
        ("r5b_hi_clus_treelet",
         {**HI, "RT_CHUNK_CLUSTER": "treelet"}, 2400),
        ("r5b_xhi_anchor", dict(XHI), 3000),
        ("r5b_xhi_clus_bvh", {**XHI, "RT_CHUNK_CLUSTER": "bvh"}, 3000),
        ("r5b_xhi_clus_treelet",
         {**XHI, "RT_CHUNK_CLUSTER": "treelet",
          "RT_MAX_CHUNKED_TRIS": "1048576"}, 3000),
    ],
    "combo5": [
        ("r5_hi_tc32_bits4",
         {**HI, "RT_TRI_CHUNK": "32",
          "RT_COMPACT_MORTON_BITS": "4"}, 1800),
        ("r5_xhi_tc32_bits4",
         {**XHI, "RT_TRI_CHUNK": "32",
          "RT_COMPACT_MORTON_BITS": "4"}, 2400),
        ("r5_hi_tc32_ce1",
         {**HI, "RT_TRI_CHUNK": "32", "BENCH_COMPACT": "1"}, 1800),
    ],
}


def main() -> int:
    log_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/round5_sweep.jsonl"
    groups = sys.argv[2:] or list(CONFIGS)
    done = set()
    if os.path.exists(log_path):
        with open(log_path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("rc") == 0:
                    done.add(rec.get("config"))

    for group in groups:
        for name, env, tmo in CONFIGS[group]:
            if name in done:
                print(f"skip {name} (already in log)", file=sys.stderr)
                continue
            print(f"=== {name} {env}", file=sys.stderr, flush=True)
            child_env = {
                **os.environ,
                **env,
                "RT_BENCH_ATTEMPTS": "1",
            }
            start = time.time()
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.join(ROOT, "bench.py")],
                    env=child_env, capture_output=True, text=True,
                    timeout=tmo,
                )
                rc = proc.returncode
                lines = [
                    ln for ln in proc.stdout.splitlines() if ln.strip()
                ]
                try:
                    result = json.loads(lines[-1]) if lines else None
                except ValueError:
                    result = None
                err_tail = proc.stderr.splitlines()[-1:] if rc else []
            except subprocess.TimeoutExpired:
                rc, result, err_tail = 124, None, ["sweep timeout"]
            rec = {
                "config": name,
                "env": env,
                "rc": rc,
                "wall_s": round(time.time() - start, 1),
                "result": result,
                "err": err_tail,
            }
            with open(log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
