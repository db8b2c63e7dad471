"""Host-side probe: chunk-AABB quality under candidate clustering orders.

Compares the production Morton-64 chunking against SAH-BVH-derived
orders before any kernel-path change:

- morton:   the production order (scene/device.py _morton_order)
- bvh-dfs:  triangles in SAH BVH depth-first leaf order, fixed 64-windows
- treelet:  subtree cuts with <= 64 triangles, each padded to its own
            64-lane chunk (pad rows collapse to a chunk-local vertex)

Metric: per-chunk AABB surface area summed over chunks (the repo's
standing cull-quality proxy — device.py cites suzanne 143 -> 96 for
Morton), plus the G-group union surface area that drives grouped
shortlists at suzanne_xhi scale, and the chunk count (each chunk is a
fixed per-step overhead even when culled).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rsoderh_raytracing_tpu.accel.bvh import build_bvh_from_bounds
from rsoderh_raytracing_tpu.scene.device import _morton_order
from rsoderh_raytracing_tpu.scene.toml_loader import load_scene

TRI_CHUNK = 64


def tri_points(vertices, tris):
    return np.stack(
        [vertices[tris[:, 0]], vertices[tris[:, 1]], vertices[tris[:, 2]]],
        axis=1,
    )  # (T, 3, 3)


def chunk_sa(pts, chunk_ids):
    """Sum of AABB surface areas over chunks given per-tri chunk ids.
    Returns (n_chunks, total_sa, per_chunk_min, per_chunk_max)."""
    n_chunks = int(chunk_ids.max()) + 1
    mins = np.full((n_chunks, 3), np.inf)
    maxs = np.full((n_chunks, 3), -np.inf)
    flat = pts.reshape(len(pts) * 3, 3)
    ids3 = np.repeat(chunk_ids, 3)
    np.minimum.at(mins, ids3, flat)
    np.maximum.at(maxs, ids3, flat)
    d = np.maximum(maxs - mins, 0.0)
    sa = 2.0 * (d[:, 0] * d[:, 1] + d[:, 0] * d[:, 2] + d[:, 1] * d[:, 2])
    return n_chunks, float(sa.sum()), mins, maxs


def group_sa(mins, maxs, g):
    n = len(mins)
    ng = -(-n // g)
    pad = ng * g - n
    if pad:
        mins = np.concatenate([mins, np.repeat(mins[-1:], pad, 0)])
        maxs = np.concatenate([maxs, np.repeat(maxs[-1:], pad, 0)])
    gmin = mins.reshape(ng, g, 3).min(axis=1)
    gmax = maxs.reshape(ng, g, 3).max(axis=1)
    d = np.maximum(gmax - gmin, 0.0)
    return float(
        (2.0 * (d[:, 0] * d[:, 1] + d[:, 0] * d[:, 2] + d[:, 1] * d[:, 2])).sum()
    )


def subtree_counts(payload, count):
    """Per-node primitive counts for the flat DFS BVH."""
    n = len(payload)
    out = np.zeros(n, np.int64)
    # Reverse order: children always have higher indices than parents in
    # DFS preorder, so a reverse sweep sees children first.
    for k in range(n - 1, -1, -1):
        if count[k] > 0:
            out[k] = count[k]
        else:
            out[k] = out[k + 1] + out[payload[k]]
    return out


def treelet_cuts(payload, count, cap=TRI_CHUNK):
    """DFS cut: emit maximal subtrees with <= cap primitives. Returns the
    list of (node, n_prims) in DFS order."""
    counts = subtree_counts(payload, count)
    cuts = []
    stack = [0]
    while stack:
        k = stack.pop()
        if counts[k] <= cap or count[k] > 0:
            cuts.append((k, int(counts[k])))
        else:
            # push right then left so left pops first (DFS order)
            stack.append(int(payload[k]))
            stack.append(k + 1)
    return cuts


def leaf_ranges(payload, count):
    """(node -> ordered-prim range) via leaf starts; subtree range =
    [min leaf start, max leaf end) — contiguous in DFS preorder."""
    n = len(payload)
    lo = np.full(n, np.iinfo(np.int64).max)
    hi = np.zeros(n, np.int64)
    for k in range(n - 1, -1, -1):
        if count[k] > 0:
            lo[k] = payload[k]
            hi[k] = payload[k] + count[k]
        else:
            lo[k] = min(lo[k + 1], lo[payload[k]])
            hi[k] = max(hi[k + 1], hi[payload[k]])
    return lo, hi


def main():
    for name in sys.argv[1:] or ["suzanne_hi", "suzanne_xhi"]:
        scene = load_scene(f"assets/scenes/{name}.toml")
        tris = scene.meshes.triangles
        verts = scene.meshes.vertices
        pts = tri_points(verts, tris)
        t = len(tris)
        print(f"\n== {name}: {t} triangles ==")

        tmins = pts.min(axis=1).astype(np.float32)
        tmaxs = pts.max(axis=1).astype(np.float32)
        types = np.full(t, 2, np.int32)
        idx = np.arange(t, dtype=np.int32)
        bvh = build_bvh_from_bounds(tmins, tmaxs, types, idx)
        order_dfs = bvh.source_order

        orders = {
            "morton": _morton_order(verts, tris),
            "bvh-dfs": order_dfs,
        }
        results = {}
        for label, order, in orders.items():
            p = pts[order]
            ids = np.arange(len(p)) // TRI_CHUNK
            n_chunks, sa, mins, maxs = chunk_sa(p, ids)
            g16 = group_sa(mins, maxs, 16)
            g4 = group_sa(mins, maxs, 4)
            results[label] = (n_chunks, sa, g4, g16)
            print(
                f"  {label:8s}: chunks={n_chunks:6d}  sumSA={sa:10.2f}"
                f"  G4 unionSA={g4:10.2f}  G16 unionSA={g16:10.2f}"
            )

        # treelet(cap): subtree cuts <= cap, then greedy sequential
        # packing of DFS-adjacent cuts into 64-capacity chunks (padded).
        # cap=64 packs nothing beyond single cuts (maximal subtrees
        # can't merge); smaller caps trade subtree tightness for fill.
        lo, hi = leaf_ranges(bvh.node_payload, bvh.node_count)
        p = pts[order_dfs]
        for cap in (64, 48, 32, 24, 16):
            cuts = treelet_cuts(bvh.node_payload, bvh.node_count, cap)
            chunk_of = np.zeros(t, np.int64)
            ci = 0
            fill = 0
            fills = []
            for k, c in cuts:
                if fill + c > TRI_CHUNK:
                    fills.append(fill)
                    ci += 1
                    fill = 0
                chunk_of[lo[k]: hi[k]] = ci
                fill += c
            fills.append(fill)
            n_chunks, sa, mins, maxs = chunk_sa(p, chunk_of)
            g16 = group_sa(mins, maxs, 16)
            g4 = group_sa(mins, maxs, 4)
            fills = np.asarray(fills)
            print(
                f"  tre{cap:3d}  : chunks={n_chunks:6d}  sumSA={sa:10.2f}"
                f"  G4 unionSA={g4:10.2f}  G16 unionSA={g16:10.2f}"
                f"  fill={fills.mean():.1f}/{TRI_CHUNK}"
                f" (min {fills.min()}, max {fills.max()})"
            )


if __name__ == "__main__":
    main()
