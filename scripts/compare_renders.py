#!/usr/bin/env python
"""RMSE comparison between two renders (the BASELINE 'RMSE < 1% at 256
spp vs reference' harness).

Accepts .npy (linear HDR mean radiance), .npz film checkpoints, or .png
(8-bit sRGB; converted back to linear for comparison). Prints absolute
RMSE, relative RMSE (vs the reference image's RMS), and per-channel
stats; exit code 1 if --max-relative-rmse is exceeded.

Usage:
  python scripts/compare_renders.py ref.npy test.npy --max-relative-rmse 0.01
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def load(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path).astype(np.float64)
    if path.endswith(".npz"):
        with np.load(path) as z:
            counts = z["counts"] if "counts" in z.files else z["sample_count"]
            return (
                z["cumulative"].astype(np.float64)
                / np.maximum(counts, 1)[..., None]
            )
    if path.endswith(".png"):
        img = _read_png(path).astype(np.float64) / 255.0
        # sRGB -> linear
        return np.where(
            img <= 0.04045, img / 12.92, ((img + 0.055) / 1.055) ** 2.4
        )
    raise SystemExit(f"unsupported format: {path}")


def _read_png(path: str) -> np.ndarray:
    import struct
    import zlib

    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    idat = b""
    width = height = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, depth, color = struct.unpack(">IIBB", payload[:10])
            assert depth == 8 and color == 2, "expected RGB8"
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = width * 3 + 1
    img = np.zeros((height, width, 3), np.uint8)
    prev = np.zeros(width * 3, np.int64)
    for row in range(height):
        line = raw[row * stride : (row + 1) * stride]
        filt, body = line[0], np.frombuffer(line[1:], np.uint8).astype(np.int64)
        if filt == 0:
            cur = body
        elif filt == 1:
            cur = body.copy()
            for i in range(3, len(cur)):
                cur[i] = (cur[i] + cur[i - 3]) & 0xFF
        elif filt == 2:
            cur = (body + prev) & 0xFF
        elif filt == 3:
            cur = body.copy()
            for i in range(len(cur)):
                left = cur[i - 3] if i >= 3 else 0
                cur[i] = (cur[i] + (left + prev[i]) // 2) & 0xFF
        elif filt == 4:
            cur = body.copy()
            for i in range(len(cur)):
                a = cur[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise SystemExit(f"unsupported PNG filter {filt}")
        img[row] = cur.astype(np.uint8).reshape(width, 3)
        prev = cur
    return img


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("reference")
    ap.add_argument("test")
    ap.add_argument("--max-relative-rmse", type=float, default=None)
    args = ap.parse_args()

    ref = load(args.reference)
    test = load(args.test)
    if ref.shape != test.shape:
        raise SystemExit(f"shape mismatch: {ref.shape} vs {test.shape}")

    diff = test - ref
    rmse = float(np.sqrt(np.mean(diff**2)))
    scale = float(np.sqrt(np.mean(ref**2)))
    rel = rmse / max(scale, 1e-12)
    print(f"shape:          {ref.shape}")
    print(f"rmse:           {rmse:.6f}")
    print(f"reference rms:  {scale:.6f}")
    print(f"relative rmse:  {rel * 100:.3f}%")
    for c, name in enumerate("RGB"):
        crmse = float(np.sqrt(np.mean(diff[..., c] ** 2)))
        print(f"  {name} rmse:     {crmse:.6f}")
    print(f"max abs diff:   {float(np.abs(diff).max()):.6f}")

    if args.max_relative_rmse is not None and rel > args.max_relative_rmse:
        print(
            f"FAIL: relative RMSE {rel:.4f} >"
            f" {args.max_relative_rmse:.4f}",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
