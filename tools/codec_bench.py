#!/usr/bin/env python3
"""Gorilla codec micro-bench: single-core encode/decode throughput and
compression ratio on a representative tier payload (smooth trend + noise,
regular hourly timestamps) and on an all-constant series.

Usage: python tools/codec_bench.py [--n 1000000] [--reps 5]

Round-1 baseline for comparison (same host, per-point pure-Python bit loop,
commit d1b6836^): encode ~0.47-0.58M pts/s, decode ~0.66-0.71M pts/s.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stl_decomp_4j_spark.codec.gorilla import (  # noqa: E402
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)
from stl_decomp_4j_spark.plans.malloc import tune_malloc  # noqa: E402


def bench(vals: np.ndarray, ts: np.ndarray, reps: int) -> dict:
    n = len(vals)
    best_enc = best_dec = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        ev = encode_values(vals)
        et = encode_timestamps(ts)
        best_enc = min(best_enc, time.perf_counter() - t0)
        t0 = time.perf_counter()
        dv = decode_values(ev)
        dt = decode_timestamps(et)
        best_dec = min(best_dec, time.perf_counter() - t0)
    assert np.array_equal(dv.view(np.uint64), vals.view(np.uint64))
    assert np.array_equal(dt, ts)
    raw = n * 16
    return {
        "points": n,
        "encode_pts_per_sec": round(n / best_enc),
        "decode_pts_per_sec": round(n / best_dec),
        "bytes": len(ev) + len(et),
        "compression_ratio": round(raw / (len(ev) + len(et)), 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    tune_malloc()

    rng = np.random.default_rng(1)
    ts = 1_600_000_000_000 + np.arange(args.n, dtype=np.int64) * 3_600_000
    smooth = np.cumsum(rng.standard_normal(args.n)) * 0.1 + 50
    constant = np.full(args.n, 42.0)
    counts = rng.poisson(2.0, args.n).astype(float)  # gap-filled crawl counts

    print(json.dumps({
        "smooth_trend": bench(smooth, ts, args.reps),
        "hourly_counts": bench(counts, ts, args.reps),
        "constant": bench(constant, ts, args.reps),
    }, indent=2))


if __name__ == "__main__":
    main()
