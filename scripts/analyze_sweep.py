#!/usr/bin/env python
"""Summarize a round4_sweep JSONL log as a markdown table.

Usage: python scripts/analyze_sweep.py [logfile]

Keeps the LAST successful record per config (the sweep may append
retries across tunnel windows), prints Mrays/s sorted by config name,
and flags configs with no successful run.
"""

from __future__ import annotations

import json
import os
import sys
import importlib.util

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_configs():
    spec = importlib.util.spec_from_file_location(
        "round4_sweep", os.path.join(ROOT, "scripts", "round4_sweep.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return [
        (group, name)
        for group, grp in mod.CONFIGS.items()
        for (name, _, _) in grp
    ]


def main() -> int:
    log_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(ROOT, "docs", "round4_sweep.jsonl")
    )
    best = {}
    try:
        with open(log_path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("rc") == 0 and rec.get("result"):
                    best[rec["config"]] = rec
    except FileNotFoundError:
        print(f"no log at {log_path}", file=sys.stderr)

    print("| config | Mrays/s | vs_baseline | wall s |")
    print("|---|---|---|---|")
    missing = []
    for group, name in load_configs():
        rec = best.get(name)
        if rec is None:
            missing.append(name)
            continue
        res = rec["result"]
        print(
            f"| {name} | {res.get('value')} "
            f"| {res.get('vs_baseline')} | {rec.get('wall_s')} |"
        )
    if missing:
        print(f"\nmissing ({len(missing)}): {', '.join(missing)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
