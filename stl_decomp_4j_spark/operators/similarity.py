"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: exact baseline; broadcast the query vector(s),
  dot product via F.aggregate/zip_with (JVM-side, codegen — no Python).
- LSH-bucketed ANN: random-hyperplane signs bucket the vectors; candidates
  exact-reranked.  The scale path: bucket join replaces the full scan, with
  multi-probe (search neighboring buckets by flipping bits) as the recall
  knob.
- embedding near-dup pairs: all pairs with cosine >= threshold, candidates
  from the same hyperplane LSH, exact-verified.
"""
from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against one query vector.  Output:
    (vec_id, cos, rank) with deterministic (cos desc, vec_id) ordering."""
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.round(cosine(_as_double(F.col(vec_col)), q), 6).alias("cos"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cos").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(vec_col, planes: np.ndarray) -> Column:
    """Random-hyperplane signature: bit p = sign(dot(v, plane_p))."""
    sig = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(vec_col, F.array(*[F.lit(float(x)) for x in plane]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long")))
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
    ``multiprobe_bits`` bit-flips of the query's bucket."""
    dim = len(query)
    planes = _hyperplanes(dim, n_planes)
    df = embeddings.select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("v"),
        lsh_bucket(_as_double(F.col(vec_col)), planes).alias("bucket"),
    )
    qsig = 0
    qv = np.asarray(query, dtype=float)
    for p, plane in enumerate(planes):
        if float(qv @ plane) > 0:
            qsig |= 1 << p
    probes = {qsig}
    if multiprobe_bits >= 1:
        for p in range(n_planes):
            probes.add(qsig ^ (1 << p))
    if multiprobe_bits >= 2:
        for p in range(n_planes):
            for p2 in range(p + 1, n_planes):
                probes.add(qsig ^ (1 << p) ^ (1 << p2))
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = (
        df.filter(F.col("bucket").isin(list(probes)))
        .select("vec_id", F.round(cosine(F.col("v"), q), 6).alias("cos"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cos").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold; candidates restricted to pairs
    sharing an LSH bucket OR differing in one bucket bit (high recall at high
    thresholds), exact-verified.  Output: (id_a, id_b, cos)."""
    # probe cheaply by emitting each vector under its bucket and all 1-bit
    # neighbors; join on bucket
    sample = embeddings.limit(1).collect()
    dim = len(sample[0][vec_col]) if sample else 0
    planes = _hyperplanes(dim, n_planes)
    base = embeddings.select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("v"),
        lsh_bucket(_as_double(F.col(vec_col)), planes).alias("bucket"),
    )
    probed = base.select(
        "vec_id",
        "v",
        F.explode(
            F.array(F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << p).cast("long")) for p in range(n_planes)])
        ).alias("probe"),
    )
    anchored = base.select("vec_id", "v", F.col("bucket").alias("probe"))
    cands = (
        probed.alias("a")
        .join(anchored.alias("b"), "probe")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )
    # precompute per-vector norms once — the exact-verify pass then only
    # evaluates one dot product per candidate pair instead of three
    vecs = base.select("vec_id", "v", norm(F.col("v")).alias("nrm"))
    pairs = (
        cands.join(
            vecs.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")),
            "id_a",
        ).join(
            vecs.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")),
            "id_b",
        )
    )
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        pairs.select("id_a", "id_b", F.round(cos, 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
