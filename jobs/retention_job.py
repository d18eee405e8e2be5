#!/usr/bin/env python3
"""Retention expiry job, launched via spark-submit:

    spark-submit --py-files dist/stl_decomp_4j_spark.zip jobs/retention_job.py \
        --output /path/to/rollup_root \
        --keep-1h 90 [--keep-1d 730] [--keep-1w -1] \
        [--now 2026-08-17T00:00:00]

Drops wholly-expired (bucket, slab) partitions from the tier and Gorilla
tables (metadata-only — no rows read, no chunks rewritten) and records every
drop in the lineage manifest.  Negative keep = keep forever (default for
tiers not passed).  The slab granularity comes from the store's manifest;
--slab merely asserts it.
"""
from __future__ import annotations

import argparse
import datetime as dt
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", required=True)
    ap.add_argument("--keep-1h", type=int, default=-1, help="days of 1h tier to keep (-1 = forever)")
    ap.add_argument("--keep-1d", type=int, default=-1)
    ap.add_argument("--keep-1w", type=int, default=-1)
    ap.add_argument("--now", default=None, help="ISO timestamp for the cutoff clock (default: wall clock)")
    ap.add_argument(
        "--slab", default=None, choices=["day", "week", "month"],
        help="assert the store's slab granularity (it is read from the store's "
        "manifest; a mismatch fails loudly)",
    )
    args = ap.parse_args()

    from stl_decomp_4j_spark.operators.retention import apply_retention
    from stl_decomp_4j_spark.plans.session import build_session

    now = dt.datetime.fromisoformat(args.now) if args.now else dt.datetime.now()
    policy = {"1h": args.keep_1h, "1d": args.keep_1d, "1w": args.keep_1w}
    spark = build_session(app_name="stl-retention")
    dropped = apply_retention(spark, args.output, policy, now=now, slab=args.slab)
    print(json.dumps({
        "now": now.isoformat(),
        "policy": policy,
        "dropped_partitions": sum(len(v) for v in dropped.values()),
        "dropped": dropped,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
