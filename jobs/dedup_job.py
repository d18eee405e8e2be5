#!/usr/bin/env python3
"""Training-data corpus preparation job, launched via spark-submit:

    spark-submit --py-files dist/stl_decomp_4j_spark.zip jobs/dedup_job.py \
        --input /path/to/documents.parquet --output /path/to/cleaned \
        [--snapshot-key source] [--minhash-threshold 0.8] [--max-bucket 10000] \
        [--strip-spans-k 5] [--no-stats]

Runs the composed dedup pipeline (exact -> temporal snapshot -> near-dup
keep-one -> repeated-span removal; see operators/corpus.py) over a documents
table and writes the cleaned corpus.  Prints ONE JSON line with per-stage
survivor counts (unless --no-stats, which skips the extra per-stage actions
and is the cheapest path for very large corpora).
"""
from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--snapshot-key", default=None, help="snapshot key column (e.g. source); omit to skip")
    ap.add_argument("--snapshot-max-hamming", type=int, default=4)
    ap.add_argument("--minhash-threshold", type=float, default=0.8, help="<0 disables near-dup stage")
    ap.add_argument("--minhash-k", type=int, default=3)
    ap.add_argument("--max-bucket", type=int, default=None, help="LSH hot-bucket cap (skew valve)")
    ap.add_argument("--strip-spans-k", type=int, default=None, help="span-removal k-gram size; omit to skip")
    ap.add_argument("--no-stats", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from stl_decomp_4j_spark.operators.corpus import dedup_corpus
    from stl_decomp_4j_spark.plans.session import build_session

    pre_existing = SparkSession.getActiveSession()
    spark = pre_existing or build_session(app_name="stl-dedup-corpus")
    stats: dict | None = None if args.no_stats else {}
    handle: list = []
    cleaned = dedup_corpus(
        spark.read.parquet(args.input),
        text_col=args.text_col,
        id_col=args.id_col,
        snapshot_key=args.snapshot_key,
        snapshot_max_hamming=args.snapshot_max_hamming,
        minhash_threshold=None if args.minhash_threshold < 0 else args.minhash_threshold,
        minhash_k=args.minhash_k,
        max_bucket=args.max_bucket,
        strip_spans_k=args.strip_spans_k,
        stats=stats,
        cache_handle=handle,
    )
    cleaned.write.mode("overwrite").parquet(args.output)
    for df in handle:
        df.unpersist()
    print(json.dumps({"input": args.input, "output": args.output, "stages": stats}))
    if pre_existing is None:
        spark.stop()


if __name__ == "__main__":
    main()
