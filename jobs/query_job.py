#!/usr/bin/env python3
"""Range-read job over a rollup_job.py output root, launched via spark-submit:

    spark-submit --py-files dist/stl_decomp_4j_spark.zip jobs/query_job.py \
        --store /path/to/rollup_root --tier 1h \
        [--url https://... ...] [--from 2025-01-05] [--to 2025-01-12] \
        [--columns trend seasonal] [--output /path/to/result_parquet]

Reads the Gorilla-compressed tier store, prunes chunks on (url, t0, t1,
column) metadata — the predicates reach the parquet scan as PushedFilters,
so chunks outside the range are never read, let alone decoded — and decodes
only the survivors.  Without --output, prints row count + a sample; with
it, writes the decoded (url, ts_ms, column, value) rows to parquet.
"""
from __future__ import annotations

import argparse
import datetime as dt
import json
import sys


def run_query(
    spark,
    store: str,
    tier: str = "1h",
    urls: list[str] | None = None,
    ts_min: dt.datetime | None = None,
    ts_max: dt.datetime | None = None,
    columns: list[str] | None = None,
    output: str | None = None,
) -> dict:
    from stl_decomp_4j_spark.operators.compress import prune_chunks, read_range

    chunks = spark.read.parquet(f"{store}/gorilla_{tier}")
    pruned = prune_chunks(chunks, urls, ts_min, ts_max, columns)
    rows = read_range(chunks, urls, ts_min, ts_max, columns)
    if output:
        rows.write.mode("overwrite").parquet(output)
        n = spark.read.parquet(output).count()
    else:
        n = rows.count()
    return {
        "tier": tier,
        "chunks_total": chunks.count(),
        "chunks_decoded": pruned.count(),
        "rows": n,
        "output": output,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True, help="rollup_job.py --output root")
    ap.add_argument("--tier", default="1h", choices=["1h", "1d", "1w"])
    ap.add_argument("--url", nargs="*", default=None)
    ap.add_argument("--from", dest="ts_min", default=None, help="ISO date/time lower bound")
    ap.add_argument("--to", dest="ts_max", default=None, help="ISO date/time upper bound")
    ap.add_argument("--columns", nargs="*", default=None)
    ap.add_argument("--output", default=None)
    ap.add_argument("--sample", type=int, default=10)
    args = ap.parse_args()

    from stl_decomp_4j_spark.plans.session import build_session

    spark = build_session(app_name="stl-range-read")
    res = run_query(
        spark,
        args.store,
        args.tier,
        args.url,
        dt.datetime.fromisoformat(args.ts_min) if args.ts_min else None,
        dt.datetime.fromisoformat(args.ts_max) if args.ts_max else None,
        args.columns,
        args.output,
    )
    print(json.dumps(res))
    if not args.output and args.sample:
        from stl_decomp_4j_spark.operators.compress import read_range

        chunks = spark.read.parquet(f"{args.store}/gorilla_{args.tier}")
        ts_min = dt.datetime.fromisoformat(args.ts_min) if args.ts_min else None
        ts_max = dt.datetime.fromisoformat(args.ts_max) if args.ts_max else None
        for r in read_range(chunks, args.url, ts_min, ts_max, args.columns).limit(args.sample).collect():
            print(r.asDict())
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
