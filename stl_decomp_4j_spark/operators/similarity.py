"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: exact baseline; the query vector is closed over
  (broadcast with the serialized UDF), scores computed as one NumPy matmul
  per Arrow batch in a vectorized pandas UDF.
- LSH-bucketed ANN: random-hyperplane signs bucket the vectors; candidates
  exact-reranked.  The scale path: bucket filter replaces the full scan, with
  multi-probe (search neighboring buckets by flipping bits) as the recall
  knob.
- embedding near-dup pairs: all pairs with cosine >= threshold, candidates
  from the same hyperplane LSH, exact-verified.
- persisted ANN index (round 5): build_lsh_index / build_ivf_index write the
  vectors once, PARTITIONED BY bucket / cluster, with the plane matrix /
  centroids as tiny side tables; lsh_index_topk / ivf_index_topk then answer
  each query by reading only the probed partitions (partition pruning — no
  full-table re-hash/re-assign per lookup).  The serving twin of the batch
  ann_*_topk paths, same results by construction.  extend_lsh_index /
  extend_ivf_index append new batches via the STORED planes / centroids
  (per-crawl maintenance — never re-reads or rebuilds the existing index).

Scale shape: all vector math runs in Arrow-batched pandas UDFs (one
float64 matmul / einsum per batch) — Catalyst higher-order-function lambdas
are interpreted per element and were the dominant cost at dim x 10^9 rows
(see CLAUDE.md); top-k uses orderBy().limit(k) (TakeOrderedAndProject — a
distributed partial top-k per partition + merge on the driver side of the
exchange), never a global unpartitioned Window.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _stack(series: pd.Series) -> np.ndarray:
    # float32 arrays cross Arrow as-is; widening to float64 here is exact and
    # batch-vectorized.  (A JVM-side F.transform(cast) would be an interpreted
    # per-element lambda — dim x rows interpreted casts per scoring pass.)
    return np.stack(series.to_numpy()).astype(np.float64, copy=False)


def cosine_vs_query_udf(query: list[float]):
    """Vectorized pandas UDF: cosine(v, query) as one matmul per Arrow batch."""
    q = np.asarray(query, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    @F.pandas_udf("double")
    def cos(v: pd.Series) -> pd.Series:
        mat = _stack(v)
        return pd.Series((mat @ q) / (np.linalg.norm(mat, axis=1) * qn))

    return cos


def pair_cosine_udf():
    """Vectorized pandas UDF: cosine(va, vb) via batched einsum."""

    @F.pandas_udf("double")
    def cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        a, b = _stack(va), _stack(vb)
        num = np.einsum("ij,ij->i", a, b)
        return pd.Series(num / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)))

    return cos


def norm_udf():
    @F.pandas_udf("double")
    def nrm(v: pd.Series) -> pd.Series:
        return pd.Series(np.linalg.norm(_stack(v), axis=1))

    return nrm


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    """(vec_id, cos) -> top-k with rank, deterministic (cos desc, vec_id).

    orderBy().limit(k) compiles to TakeOrderedAndProject (per-partition
    partial top-k, no full-data single-partition shuffle); the row_number
    window then runs over at most k rows.  partitionBy(lit(0)) gives the
    window an explicit (constant) partition spec — same semantics as a
    global window, but without WindowExec's move-everything warning path.
    """
    top = scored.orderBy(F.col("cos").desc(), F.col("vec_id")).limit(k)
    w = Window.partitionBy(F.lit(0)).orderBy(F.col("cos").desc(), F.col("vec_id"))
    return top.withColumn("rank", F.row_number().over(w))


def brute_force_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against one query vector.  Output:
    (vec_id, cos, rank) with deterministic (cos desc, vec_id) ordering."""
    cos = cosine_vs_query_udf(query)
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.round(cos(F.col(vec_col)), 6).alias("cos"),
    )
    return _ranked_topk(scored, k)


def all_pairs_cosine(
    embeddings: DataFrame,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 50_000,
) -> DataFrame:
    """Exact all-pairs cosine pairs >= threshold — a cartesian product,
    O(n^2) BY CONSTRUCTION.  This exists only as the exact baseline/oracle
    twin of the LSH path (embedding_near_dup_pairs); it must never be the
    scale path, so it refuses inputs larger than ``max_rows`` (one bounded
    metadata count) instead of silently launching an n^2 job on a large
    table.  Raise ``max_rows`` explicitly only when a quadratic exact
    baseline is genuinely intended."""
    n = embeddings.count()
    if n > max_rows:
        raise ValueError(
            f"all_pairs_cosine is a cartesian product (O(n^2)): refusing {n} rows"
            f" > max_rows={max_rows}; use the LSH path (embedding_near_dup_pairs)"
            " at scale, or pass a larger max_rows explicitly."
        )
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    cos = pair_cosine_udf()
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos(F.col("_va"), F.col("_vb")), 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_udf(planes: np.ndarray):
    """Random-hyperplane signature as a vectorized pandas UDF: one
    (batch x dim) @ (dim x planes) matmul per Arrow batch; bit p =
    sign(dot(v, plane_p))."""
    pt = np.ascontiguousarray(planes.T, dtype=np.float64)
    pow2 = (1 << np.arange(planes.shape[0], dtype=np.uint64)).astype(np.uint64)

    @F.pandas_udf("long")
    def bucket(v: pd.Series) -> pd.Series:
        mat = _stack(v)
        signs = (mat @ pt) > 0
        return pd.Series((signs.astype(np.uint64) @ pow2).astype(np.int64))

    return bucket


def _query_signature(query: np.ndarray, planes: np.ndarray) -> int:
    sig = 0
    for p, plane in enumerate(planes):
        if float(query @ plane) > 0:
            sig |= 1 << p
    return sig


def ann_lsh_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket is within
    ``multiprobe_bits`` bit-flips (Hamming distance) of the query's bucket."""
    qv = np.asarray(query, dtype=np.float64)
    planes = _hyperplanes(len(query), n_planes)
    bucket = lsh_bucket_udf(planes)
    qsig = _query_signature(qv, planes)
    df = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    cands = df.filter(
        F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qsig).cast("long"))) <= multiprobe_bits
    )
    cos = cosine_vs_query_udf(query)
    scored = cands.select("vec_id", F.round(cos(F.col("v")), 6).alias("cos"))
    return _ranked_topk(scored, k)


def kmeans_centroids(mat: np.ndarray, k: int, iters: int = 10, seed: int = 7) -> np.ndarray:
    """Deterministic Lloyd k-means (NumPy, fixed seed/iterations) for the IVF
    coarse quantizer.  Runs on a bounded driver-side TRAINING SAMPLE only —
    the full table is never collected; assignment is distributed."""
    rng = np.random.default_rng(seed)
    mat = np.asarray(mat, dtype=np.float64)
    cent = mat[rng.choice(len(mat), size=min(k, len(mat)), replace=False)].copy()
    for _ in range(iters):
        d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(len(cent)):
            members = mat[assign == j]
            if len(members):
                cent[j] = members.mean(0)
    return cent


def ivf_assign_udf(centroids: np.ndarray):
    """Vectorized pandas UDF: nearest-centroid id per vector (one matmul per
    Arrow batch; argmin over ||v||^2 - 2 v.c + ||c||^2, the ||v||^2 term
    dropped as assignment-invariant)."""
    ct = np.ascontiguousarray(centroids.T, dtype=np.float64)
    half_cc = 0.5 * np.einsum("ij,ij->i", centroids, centroids)

    @F.pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        mat = _stack(v)
        return pd.Series((half_cc[None, :] - mat @ ct).argmin(axis=1).astype(np.int32))

    return assign


def ann_ivf_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train_sample: int = 4096,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: a k-means coarse quantizer buckets the vectors;
    only the ``nprobe`` clusters nearest to the query are scanned, then
    exact-cosine reranked.  The 100-TB shape: centroids train on a bounded
    sample and broadcast with the UDF; assignment, probe filtering and
    rerank are fully distributed (no driver loop over data)."""
    qv = np.asarray(query, dtype=np.float64)
    if centroids is None:
        sample = embeddings.select(vec_col).orderBy(id_col).limit(max_train_sample).collect()
        mat = np.array([list(map(float, r[vec_col])) for r in sample])
        centroids = kmeans_centroids(mat, n_clusters)
    qd = ((centroids - qv[None, :]) ** 2).sum(1)
    probes = [int(c) for c in np.argsort(qd)[:nprobe]]
    assign = ivf_assign_udf(centroids)
    cands = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        assign(F.col(vec_col)).alias("cluster"),
    ).filter(F.col("cluster").isin(probes))
    cos = cosine_vs_query_udf(query)
    scored = cands.select("vec_id", F.round(cos(F.col("v")), 6).alias("cos"))
    return _ranked_topk(scored, k)


def _hamming_ball(center: int, n_bits: int, radius: int) -> list[int]:
    """All n_bits-wide signatures within Hamming distance <= radius of
    ``center`` — the static probe set for an indexed LSH lookup.  Size is
    sum_{i<=radius} C(n_bits, i) (37 for 8 planes / radius 2), enumerated
    driver-side; a radius large enough to blow this up is past the point
    where LSH pruning helps at all."""
    from itertools import combinations

    out = [center]
    for r in range(1, radius + 1):
        for flips in combinations(range(n_bits), r):
            sig = center
            for b in flips:
                sig ^= 1 << b
            out.append(sig)
    return sorted(out)


def build_lsh_index(
    embeddings: DataFrame,
    path: str,
    n_planes: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize a serving LSH index: the vectors written ONCE to parquet
    PARTITIONED BY their hyperplane bucket, plus the plane matrix as a tiny
    side table.  This is the 100-TB serving shape: `ann_lsh_topk` re-hashes
    the whole table on every query (fine for one batch pass, wrong for
    repeated lookups); a query against this index enumerates its Hamming-ball
    probe buckets driver-side and reads ONLY those partitions — partition
    pruning, no full scan, no per-query UDF pass over the table.  Same move
    as the Gorilla chunk store's metadata-pruned range read."""
    sample = embeddings.limit(1).collect()
    dim = len(sample[0][vec_col]) if sample else 0
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = lsh_bucket_udf(planes)
    spark = embeddings.sparkSession
    (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("v"),
            bucket(F.col(vec_col)).alias("bucket"),
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path + "/vectors")
    )
    rows = [(p, [float(x) for x in planes[p]]) for p in range(n_planes)]
    spark.createDataFrame(rows, "p int, plane array<double>").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path + "/planes")


def extend_lsh_index(
    new_embeddings: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a new batch to a `build_lsh_index` store WITHOUT rebuilding:
    the stored plane matrix (tiny side table) hashes the new vectors, which
    append to their bucket partitions.  At 100 TB an index is written once
    and extended per crawl — rebuilding would re-read the full corpus for
    every batch.  Bucketing stays identical to a from-scratch build because
    the planes are fixed at build time."""
    spark = new_embeddings.sparkSession
    prows = spark.read.parquet(path + "/planes").orderBy("p").collect()
    planes = np.array([r["plane"] for r in prows], dtype=np.float64)
    bucket = lsh_bucket_udf(planes)
    (
        new_embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("v"),
            bucket(F.col(vec_col)).alias("bucket"),
        )
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(path + "/vectors")
    )


def extend_ivf_index(
    new_embeddings: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a new batch to a `build_ivf_index` store: the STORED centroids
    assign the new vectors (no re-training — cluster geometry is fixed at
    build time, the standard IVF maintenance contract), which append to
    their cluster partitions."""
    spark = new_embeddings.sparkSession
    crows = spark.read.parquet(path + "/centroids").orderBy("cluster").collect()
    centroids = np.array([r["centroid"] for r in crows], dtype=np.float64)
    assign = ivf_assign_udf(centroids)
    (
        new_embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("v"),
            assign(F.col(vec_col)).alias("cluster"),
        )
        .write.mode("append")
        .partitionBy("cluster")
        .parquet(path + "/vectors")
    )


def lsh_index_topk(
    spark, path: str, query: list[float], k: int = 10, multiprobe_bits: int = 1
) -> DataFrame:
    """Approximate top-k against a `build_lsh_index` store.  The query's
    bucket and its <=multiprobe_bits Hamming neighbors become a static IN
    list on the partition column, so the scan touches only the probed bucket
    directories (PartitionFilters — verified in PLANS.md); scoring runs on
    the candidates alone.  Results are identical to `ann_lsh_topk` with the
    same planes/seed."""
    prows = spark.read.parquet(path + "/planes").orderBy("p").collect()
    planes = np.array([r["plane"] for r in prows], dtype=np.float64)
    qv = np.asarray(query, dtype=np.float64)
    qsig = _query_signature(qv, planes)
    probes = _hamming_ball(qsig, len(prows), multiprobe_bits)
    cands = spark.read.parquet(path + "/vectors").filter(F.col("bucket").isin(probes))
    cos = cosine_vs_query_udf(query)
    scored = cands.select("vec_id", F.round(cos(F.col("v")), 6).alias("cos"))
    return _ranked_topk(scored, k)


def build_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_clusters: int = 16,
    max_train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> None:
    """Materialize a serving IVF index: centroids trained once on a bounded
    sample, every vector assigned once and written PARTITIONED BY cluster,
    centroids stored beside the vectors.  A query then reads only its nprobe
    nearest clusters (partition pruning) instead of re-training + re-assigning
    the whole table per lookup, which is what `ann_ivf_topk` does."""
    if centroids is None:
        sample = (
            embeddings.select(vec_col).orderBy(id_col).limit(max_train_sample).collect()
        )
        mat = np.array([list(map(float, r[vec_col])) for r in sample])
        centroids = kmeans_centroids(mat, n_clusters)
    assign = ivf_assign_udf(centroids)
    spark = embeddings.sparkSession
    (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("v"),
            assign(F.col(vec_col)).alias("cluster"),
        )
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(path + "/vectors")
    )
    rows = [(int(c), [float(x) for x in centroids[c]]) for c in range(len(centroids))]
    spark.createDataFrame(rows, "cluster int, centroid array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(path + "/centroids")


def ivf_index_topk(
    spark, path: str, query: list[float], k: int = 10, nprobe: int = 4
) -> DataFrame:
    """Approximate top-k against a `build_ivf_index` store: rank the stored
    centroids driver-side (n_clusters rows — bounded metadata), read only the
    nprobe nearest cluster partitions, exact-cosine rerank.  Identical
    results to `ann_ivf_topk` with the same centroids."""
    crows = spark.read.parquet(path + "/centroids").orderBy("cluster").collect()
    centroids = np.array([r["centroid"] for r in crows], dtype=np.float64)
    qv = np.asarray(query, dtype=np.float64)
    qd = ((centroids - qv[None, :]) ** 2).sum(1)
    probes = [int(crows[i]["cluster"]) for i in np.argsort(qd)[:nprobe]]
    cands = spark.read.parquet(path + "/vectors").filter(F.col("cluster").isin(probes))
    cos = cosine_vs_query_udf(query)
    scored = cands.select("vec_id", F.round(cos(F.col("v")), 6).alias("cos"))
    return _ranked_topk(scored, k)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold; candidates restricted to pairs
    whose LSH buckets are within Hamming distance 1 (same bucket or one
    differing hyperplane sign — high recall at high thresholds),
    exact-verified.  Output: (id_a, id_b, cos).

    Implemented as probe-explode + bucket equi-join (each vector emitted
    under its bucket and all 1-bit neighbors, joined to anchors) — a
    shuffle-bounded equi-join, not an all-pairs filter."""
    sample = embeddings.limit(1).collect()
    dim = len(sample[0][vec_col]) if sample else 0
    planes = _hyperplanes(dim, n_planes)
    bucket = lsh_bucket_udf(planes)
    base = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    probed = base.select(
        "vec_id",
        F.explode(
            F.array(F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << p).cast("long")) for p in range(n_planes)])
        ).alias("probe"),
    )
    anchored = base.select("vec_id", F.col("bucket").alias("probe"))
    cands = (
        probed.alias("a")
        .join(anchored.alias("b"), "probe")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )
    # precompute per-vector norms once — the exact-verify pass then only
    # evaluates one batched dot product per candidate pair
    nrm = norm_udf()
    vecs = base.select("vec_id", "v", nrm(F.col("v")).alias("nrm"))
    pairs = (
        cands.join(
            vecs.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")),
            "id_a",
        ).join(
            vecs.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")),
            "id_b",
        )
    )

    @F.pandas_udf("double")
    def pair_dot(va: pd.Series, vb: pd.Series) -> pd.Series:
        return pd.Series(np.einsum("ij,ij->i", _stack(va), _stack(vb)))

    cos = pair_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        pairs.select("id_a", "id_b", F.round(cos, 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
