#!/usr/bin/env python
"""Round-4 TPU experiment sweep (VERDICT round-3 tasks 1-3, 5, 6).

Runs each configuration as a fresh bench.py child (backend init is
once-per-process; env knobs are trace-time constants) and appends one
JSON line per config to the log. Skips configs already present in the
log, so the sweep is resumable across tunnel flakes.

Usage: python scripts/round4_sweep.py [logfile] [group ...]
Groups: sanity large xhi compact sublanes bvh (default: all)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (name, env, timeout_s)
CONFIGS = {
    "sanity": [
        ("house_2048_baseline", {}, 2000),
    ],
    "large": [
        ("suzanne_baseline", {"BENCH_SCENE": "suzanne"}, 1800),
        ("suzanne_hi_baseline", {"BENCH_SCENE": "suzanne_hi"}, 1800),
        ("spheres_baseline", {"BENCH_SCENE": "spheres"}, 1800),
    ],
    "compact": [
        ("suzanne_hi_compact8",
         {"BENCH_SCENE": "suzanne_hi", "BENCH_COMPACT": "8"}, 1800),
        ("suzanne_hi_compact16",
         {"BENCH_SCENE": "suzanne_hi", "BENCH_COMPACT": "16"}, 1800),
        ("suzanne_hi_compact4",
         {"BENCH_SCENE": "suzanne_hi", "BENCH_COMPACT": "4"}, 1800),
        ("suzanne_compact16",
         {"BENCH_SCENE": "suzanne", "BENCH_COMPACT": "16"}, 1800),
        ("spheres_compact16",
         {"BENCH_SCENE": "spheres", "BENCH_COMPACT": "16"}, 1800),
    ],
    "sublanes": [
        ("suzanne_hi_sub32",
         {"BENCH_SCENE": "suzanne_hi", "RT_SWEEP_SUBLANES": "32"}, 1800),
        ("suzanne_hi_sub16",
         {"BENCH_SCENE": "suzanne_hi", "RT_SWEEP_SUBLANES": "16"}, 1800),
    ],
    "bvh": [
        # composed-path traversal: smaller size keeps one call under the
        # RPC deadline (PERFORMANCE.md measured the composed cliff at
        # 1024^2 for the same reason)
        ("suzanne_bvh_1024",
         {"BENCH_SCENE": "suzanne", "BENCH_INTERSECTOR": "bvh",
          "BENCH_SIZE": "1024", "BENCH_ITERS": "32"}, 1800),
        ("suzanne_hi_bvh_1024",
         {"BENCH_SCENE": "suzanne_hi", "BENCH_INTERSECTOR": "bvh",
          "BENCH_SIZE": "1024", "BENCH_ITERS": "16"}, 1800),
        # packed gather rows: LOSES 1.5x on CPU (XLA:CPU strided loads
        # beat the wide row), measuring the TPU gather-issue hypothesis
        ("suzanne_hi_bvh_packed_1024",
         {"BENCH_SCENE": "suzanne_hi", "BENCH_INTERSECTOR": "bvh",
          "RT_BVH_PACKED": "1",
          "BENCH_SIZE": "1024", "BENCH_ITERS": "16"}, 1800),
    ],
    "xhi": [
        # default now picks a GROUPED shortlist at this scale (group=16
        # at 2048^2, group=4 at 1024^2 — the flat list would need
        # 7.9 MB of SMEM). The 1024^2 config goes first: its G=4 body
        # is a compile size already proven on this toolchain
        # (TRI_CHUNK=256), so a short tunnel window lands at least one
        # xhi number even if the G=16 compile is slow.
        ("suzanne_xhi_1024",
         {"BENCH_SCENE": "suzanne_xhi", "BENCH_SIZE": "1024",
          "BENCH_ITERS": "8"}, 2400),
        ("suzanne_xhi_chunked", {"BENCH_SCENE": "suzanne_xhi"}, 2400),
        ("suzanne_xhi_nogroup",
         {"BENCH_SCENE": "suzanne_xhi",
          "RT_DISABLE_GROUP_SHORTLIST": "1"}, 2400),
        ("suzanne_xhi_bvh_1024",
         {"BENCH_SCENE": "suzanne_xhi", "BENCH_INTERSECTOR": "bvh",
          "BENCH_SIZE": "1024", "BENCH_ITERS": "8"}, 2400),
    ],
    # front-to-back shortlist order on the CLOSEST kernel (occlusion is
    # always f2b); only shortlist scenes (>32 chunks) are affected
    "f2b": [
        ("suzanne_hi_f2b",
         {"BENCH_SCENE": "suzanne_hi", "RT_SHORTLIST_F2B": "1"}, 1800),
        ("suzanne_xhi_f2b",
         {"BENCH_SCENE": "suzanne_xhi", "RT_SHORTLIST_F2B": "1"}, 2400),
    ],
    # grouped shortlists where the FLAT list also fits: fewer grid steps
    # (242 -> 61 at G=4) vs coarser reachability — measure the tradeoff
    "group": [
        ("suzanne_hi_group4",
         {"BENCH_SCENE": "suzanne_hi", "RT_SHORTLIST_GROUP": "4"}, 1800),
        ("suzanne_hi_group8",
         {"BENCH_SCENE": "suzanne_hi", "RT_SHORTLIST_GROUP": "8"}, 1800),
    ],
    # lever combinations: compaction makes tiles coherent, which is
    # exactly what the shortlist pre-pass and f2b ordering feed on —
    # measure whether the levers stack (run after the singles)
    "combo": [
        # compact8 won the singles (3.82 -> 4.88 on suzanne_hi); stack
        # the other levers on top of it
        ("suzanne_hi_compact8_f2b",
         {"BENCH_SCENE": "suzanne_hi", "BENCH_COMPACT": "8",
          "RT_SHORTLIST_F2B": "1"}, 1800),
        ("suzanne_hi_compact8_sub32",
         {"BENCH_SCENE": "suzanne_hi", "BENCH_COMPACT": "8",
          "RT_SWEEP_SUBLANES": "32"}, 1800),
        ("suzanne_hi_compact8_f2b_sub32",
         {"BENCH_SCENE": "suzanne_hi", "BENCH_COMPACT": "8",
          "RT_SHORTLIST_F2B": "1", "RT_SWEEP_SUBLANES": "32"}, 1800),
        ("suzanne_hi_compact8_f2b_sub16",
         {"BENCH_SCENE": "suzanne_hi", "BENCH_COMPACT": "8",
          "RT_SHORTLIST_F2B": "1", "RT_SWEEP_SUBLANES": "16"}, 1800),
        ("suzanne_xhi_compact8_f2b",
         {"BENCH_SCENE": "suzanne_xhi", "BENCH_COMPACT": "8",
          "RT_SHORTLIST_F2B": "1"}, 2400),
        # ablate the always-on occlusion front-to-back ordering: is the
        # r4 suzanne_hi baseline dip (4.22 -> 3.82) the entry-bound
        # pre-pass cost, or tunnel noise?
        ("suzanne_hi_nof2b",
         {"BENCH_SCENE": "suzanne_hi",
          "RT_DISABLE_SHORTLIST_F2B": "1"}, 1800),
        # repeat anomalous/baseline configs for variance bounds
        ("suzanne_hi_baseline_repeat", {"BENCH_SCENE": "suzanne_hi"}, 1800),
        ("suzanne_hi_compact16_repeat",
         {"BENCH_SCENE": "suzanne_hi", "BENCH_COMPACT": "16"}, 1800),
    ],
    # chunk-window size: r3 measured 128/256 neutral-to-worse at suzanne
    # (16 scattered chunks, cull granularity loss). suzanne_hi under
    # shortlists+compaction is a different regime: halving/quartering the
    # 242 grid steps cuts per-step overhead where coherent tiles already
    # cull, and Morton chunks stay spatially tight at 128 rows.
    "chunksize": [
        ("suzanne_hi_tc128",
         {"BENCH_SCENE": "suzanne_hi", "RT_TRI_CHUNK": "128"}, 1800),
        ("suzanne_hi_tc128_compact8",
         {"BENCH_SCENE": "suzanne_hi", "RT_TRI_CHUNK": "128",
          "BENCH_COMPACT": "8"}, 1800),
        ("suzanne_hi_tc256_compact8",
         {"BENCH_SCENE": "suzanne_hi", "RT_TRI_CHUNK": "256",
          "BENCH_COMPACT": "8"}, 1800),
        ("suzanne_hi_group4_compact8",
         {"BENCH_SCENE": "suzanne_hi", "RT_SHORTLIST_GROUP": "4",
          "BENCH_COMPACT": "8"}, 1800),
        # longer per-call budget: if the winning combo shortens the
        # iteration, more of the 2-min RPC window amortizes the drain
        # tail + per-call sync (house measured 256->1024 iters = +3%)
        ("suzanne_hi_best_iters32",
         {"BENCH_SCENE": "suzanne_hi", "BENCH_COMPACT": "8",
          "BENCH_ITERS": "32"}, 1800),
    ],
}


def main() -> int:
    log_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/round4_sweep.jsonl"
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
                # one attempt per config here; the sweep itself resumes
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
