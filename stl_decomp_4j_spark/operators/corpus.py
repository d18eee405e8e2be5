"""Corpus preparation pipeline: the dedup suite composed into one
training-data cleaning pass.

Production LLM-data pipelines run the document-level dedup family in a fixed
order — exact first (free, shrinks everything downstream), then temporal
snapshot collapse (recrawl corpora are mostly unchanged re-fetches), then
near-dup keep-one (MinHash-LSH pairs -> connected components -> keep the
minimum id per component), then cross-document repeated-span removal on the
survivors.  ``dedup_corpus`` is that composition over the operators in
dedup.py / components.py, returning a cleaned DataFrame with the input
schema (text rewritten when span-stripping is on).

Every stage is one of the already-plan-audited operators; the composition
adds only doc_id anti-joins (slim key tables) between stages.  Stage order
matters at 100 TB: each stage only sees the previous stage's survivors, so
the expensive shingle/band machinery never touches documents that exact or
snapshot dedup already discarded.

Stats are opt-in (pass ``stats={}``): counting survivors per stage forces an
action per stage, so the function persists each counted stage to stop the
whole prefix re-running — pass ``cache_handle=[]`` and unpersist after
materializing the result, same contract as dedup_minhash_lsh.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .components import connected_components
from .dedup import dedup_minhash_lsh, snapshot_dedup, strip_duplicate_spans


def dedup_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    snapshot_key: str | None = None,
    snapshot_max_hamming: int = 4,
    minhash_threshold: float | None = 0.8,
    minhash_k: int = 3,
    max_bucket: int | None = None,
    strip_spans_k: int | None = None,
    stats: dict | None = None,
    cache_handle: list | None = None,
) -> DataFrame:
    """Chain exact -> snapshot -> near-dup keep-one -> span-strip dedup.

    Any stage except exact can be disabled (snapshot_key=None,
    minhash_threshold=None, strip_spans_k=None).  Keep-one is deterministic
    everywhere: lowest id per exact-digest group, per near-dup component,
    and the earliest snapshot of an unchanged run survive.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    in_cols = list(docs.columns)

    def note(name: str, df: DataFrame) -> DataFrame:
        if stats is None:
            return df
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        if cache_handle is not None:
            cache_handle.append(df)
        stats[name] = df.count()
        return df

    out = note("input", docs)

    # 1. exact: keep the lowest id per content digest.  row_number over the
    # digest window (vs groupBy+join back) removes dups in ONE exchange.
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    out = (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    out = note("after_exact", out)

    # 2. temporal snapshot collapse (lag-1 simhash within key)
    if snapshot_key is not None:
        flagged = snapshot_dedup(
            out, text_col, id_col, snapshot_key, snapshot_max_hamming
        ).select(F.col("doc_id").alias(id_col))
        out = out.join(flagged, id_col, "left_anti")
        out = note("after_snapshot", out)

    # 3. near-dup keep-one: LSH pairs -> connected components -> keep the
    # component minimum (component id IS the minimum node id)
    if minhash_threshold is not None:
        pairs = dedup_minhash_lsh(
            out,
            text_col,
            id_col,
            k=minhash_k,
            threshold=minhash_threshold,
            max_bucket=max_bucket,
            cache_handle=cache_handle,
        )
        drop = (
            connected_components(pairs)
            .filter(F.col("node") != F.col("component"))
            .select(F.col("node").alias(id_col))
        )
        out = out.join(drop, id_col, "left_anti")
        out = note("after_neardup", out)

    # 4. repeated-span removal on the survivors; inner join drops
    # fully-duplicated documents (zero surviving words), per
    # strip_duplicate_spans semantics
    if strip_spans_k is not None:
        cleaned = strip_duplicate_spans(out, text_col, id_col, k=strip_spans_k).select(
            F.col("doc_id").alias(id_col), F.col("clean_text").alias(text_col)
        )
        out = out.drop(text_col).join(cleaned, id_col)
        out = note("after_span_strip", out)

    return out.select(*in_cols)
