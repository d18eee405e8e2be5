#!/usr/bin/env python3
"""ANN serving-index job, launched via spark-submit:

    # once: materialize the serving indexes (vectors written partitioned by
    # LSH bucket / IVF cluster, planes/centroids as side tables)
    spark-submit --py-files dist/stl_decomp_4j_spark.zip jobs/ann_job.py \
        --build --input /path/to/embeddings.parquet --index /warehouse/ann \
        [--kind lsh|ivf|both] [--n-planes 8] [--n-clusters 16]

    # per crawl: append new vectors (stored planes/centroids assign them —
    # no rebuild, no re-read of the existing corpus)
    ... ann_job.py --extend --input /path/to/new_embeddings.parquet \
        --index /warehouse/ann [--kind lsh|ivf|both]

    # per query: partition-pruned top-k lookups against the stored index
    ... ann_job.py --query --index /warehouse/ann --vec-id 42 \
        --input /path/to/embeddings.parquet [--kind lsh] [--k 10] \
        [--multiprobe-bits 1] [--nprobe 4] [--output /path/to/result]

Build is write-once; each query then reads ONLY its Hamming-ball probe
buckets (LSH) or nprobe nearest cluster partitions (IVF) — partition
pruning, no full-table re-hash/re-assign per lookup (see
operators/similarity.py and the PLANS.md PartitionFilters checks).  The
query vector comes from --vec-id (looked up in --input) or --vector (a JSON
float list).  Prints ONE JSON line; --output also writes the result rows.
"""
from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--extend", action="store_true",
                    help="append --input vectors to an existing index (stored planes/centroids assign; no rebuild)")
    ap.add_argument("--query", action="store_true")
    ap.add_argument("--input", default=None, help="embeddings parquet (build; or --vec-id lookup)")
    ap.add_argument("--index", required=True, help="index root (gets /lsh and /ivf subdirs)")
    ap.add_argument("--kind", choices=["lsh", "ivf", "both"], default="both")
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--vec-col", default="embedding")
    ap.add_argument("--n-planes", type=int, default=8)
    ap.add_argument("--n-clusters", type=int, default=16)
    ap.add_argument("--vec-id", type=int, default=None)
    ap.add_argument("--vector", default=None, help="query vector as a JSON float list")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--multiprobe-bits", type=int, default=1)
    ap.add_argument("--nprobe", type=int, default=4)
    ap.add_argument("--output", default=None)
    args = ap.parse_args()
    if sum([args.build, args.extend, args.query]) != 1:
        ap.error("exactly one of --build / --extend / --query")
    if (args.build or args.extend) and not args.input:
        ap.error("--build/--extend require --input")

    from pyspark.sql import SparkSession

    from stl_decomp_4j_spark.operators.similarity import (
        build_ivf_index,
        build_lsh_index,
        extend_ivf_index,
        extend_lsh_index,
        ivf_index_topk,
        lsh_index_topk,
    )
    from stl_decomp_4j_spark.plans.session import build_session

    pre_existing = SparkSession.getActiveSession()
    spark = pre_existing or build_session(app_name="stl-ann-index")

    if args.build:
        emb = spark.read.parquet(args.input)
        built = []
        if args.kind in ("lsh", "both"):
            build_lsh_index(
                emb, args.index + "/lsh", n_planes=args.n_planes,
                id_col=args.id_col, vec_col=args.vec_col,
            )
            built.append("lsh")
        if args.kind in ("ivf", "both"):
            build_ivf_index(
                emb, args.index + "/ivf", n_clusters=args.n_clusters,
                id_col=args.id_col, vec_col=args.vec_col,
            )
            built.append("ivf")
        print(json.dumps({"index": args.index, "built": built}))
    elif args.extend:
        emb = spark.read.parquet(args.input)
        extended = []
        if args.kind in ("lsh", "both"):
            extend_lsh_index(emb, args.index + "/lsh", id_col=args.id_col, vec_col=args.vec_col)
            extended.append("lsh")
        if args.kind in ("ivf", "both"):
            extend_ivf_index(emb, args.index + "/ivf", id_col=args.id_col, vec_col=args.vec_col)
            extended.append("ivf")
        print(json.dumps({"index": args.index, "extended": extended}))
    else:
        if args.vector is not None:
            q = [float(x) for x in json.loads(args.vector)]
        elif args.vec_id is not None and args.input:
            import pyspark.sql.functions as F

            row = (
                spark.read.parquet(args.input)
                .filter(F.col(args.id_col) == args.vec_id)
                .select(args.vec_col)
                .first()
            )
            if row is None:
                raise SystemExit(f"--vec-id {args.vec_id} not found in {args.input}")
            q = [float(x) for x in row[args.vec_col]]
        else:
            ap.error("--query requires --vector, or --vec-id with --input")
        results = {}
        out_df = None
        if args.kind in ("lsh", "both"):
            df = lsh_index_topk(
                spark, args.index + "/lsh", q, k=args.k,
                multiprobe_bits=args.multiprobe_bits,
            )
            results["lsh"] = [r.asDict() for r in df.collect()]
            out_df = df
        if args.kind in ("ivf", "both"):
            df = ivf_index_topk(
                spark, args.index + "/ivf", q, k=args.k, nprobe=args.nprobe
            )
            results["ivf"] = [r.asDict() for r in df.collect()]
            out_df = df if out_df is None else out_df
        if args.output and out_df is not None:
            out_df.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"index": args.index, "k": args.k, "results": results}))
    if pre_existing is None:
        spark.stop()


if __name__ == "__main__":
    main()
