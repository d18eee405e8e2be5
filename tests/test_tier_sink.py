"""Streaming continuous-aggregate refresh (tier_sink): exactly-once by
recompute-overwrite — batch/stream parity, retry idempotence, and untouched
partitions preserved."""
import datetime as dt

import pyspark.sql.functions as F

from stl_decomp_4j_spark.streaming.ingest import BUCKET_SCHEMA
from stl_decomp_4j_spark.streaming.tier_sink import (
    refresh_tier_partitions,
    start_tier_refresh_stream,
)

T0 = dt.datetime(2024, 3, 1)


def _rows(day, hours, base):
    """hourly bucket rows for one day: urls a (cnt=h+base) and b (cnt=2h)."""
    out = []
    for h in hours:
        ts = T0 + dt.timedelta(days=day, hours=h)
        out.append(("a", ts, base + h))
        out.append(("b", ts, 2 * h + 1))
    return out


def _expected(spark, buckets_path):
    return (
        spark.read.parquet(buckets_path)
        .groupBy("url", F.date_trunc("day", "ts").alias("ts"))
        .agg(
            F.sum("cnt").alias("sum_cnt"),
            F.min("cnt").alias("min_cnt"),
            F.max("cnt").alias("max_cnt"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
    )


def _snapshot(spark, tier_path):
    return sorted(
        map(tuple, spark.read.parquet(tier_path)
            .select("url", "ts", "sum_cnt", "min_cnt", "max_cnt", "n_buckets")
            .collect())
    )


def test_stream_tier_refresh_parity_and_idempotence(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    buckets = str(tmp_path / "buckets")
    tier = str(tmp_path / "tier_1d")
    ckpt = str(tmp_path / "ckpt")

    # chunk 1: days 0-1 complete; chunk 2: late day-1 hours + day 2 — the
    # overlap forces a RE-refresh of day 1 (recompute, not increment)
    chunks = [
        _rows(0, range(0, 24), 5) + _rows(1, range(0, 12), 7),
        _rows(1, range(12, 24), 7) + _rows(2, range(0, 24), 3),
    ]
    for chunk in chunks:
        df = spark.createDataFrame(chunk, BUCKET_SCHEMA)
        df.write.mode("append").parquet(buckets)   # source-of-truth lands first
        df.write.mode("append").parquet(src)       # then the stream sees it
        q = start_tier_refresh_stream(
            spark.readStream.schema(BUCKET_SCHEMA).parquet(src),
            buckets, tier, ckpt,
        )
        q.awaitTermination(180)

    got = _snapshot(spark, tier)
    want = sorted(map(tuple, _expected(spark, buckets).collect()))
    assert got == want and len(got) == 6  # 2 urls x 3 days

    # retry idempotence: re-running a refresh for already-applied days (a
    # foreachBatch retry after a crash) must leave the table byte-equal
    days = [T0 + dt.timedelta(days=1), T0 + dt.timedelta(days=2)]
    n = refresh_tier_partitions(spark, buckets, tier, days)
    assert n == 4  # 2 urls x 2 days rewritten
    assert _snapshot(spark, tier) == got


def test_refresh_touches_only_listed_partitions(spark, tmp_path):
    buckets = str(tmp_path / "buckets")
    tier = str(tmp_path / "tier")
    spark.createDataFrame(
        _rows(0, range(0, 6), 1) + _rows(1, range(0, 6), 1), BUCKET_SCHEMA
    ).write.parquet(buckets)
    refresh_tier_partitions(spark, buckets, tier, [T0])
    refresh_tier_partitions(spark, buckets, tier, [T0 + dt.timedelta(days=1)])

    # poison day 0 in the buckets table, refresh ONLY day 1: day 0's stored
    # tier rows must be preserved (dynamic overwrite, not full truncate)
    before = {r[:2]: r for r in _snapshot(spark, tier)}
    spark.createDataFrame(_rows(0, [23], 100), BUCKET_SCHEMA).write.mode(
        "append"
    ).parquet(buckets)
    refresh_tier_partitions(spark, buckets, tier, [T0 + dt.timedelta(days=1)])
    after = {r[:2]: r for r in _snapshot(spark, tier)}
    assert after == before  # day-0 partition untouched despite dirty source
