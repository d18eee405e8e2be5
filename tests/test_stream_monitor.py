"""Streaming outage monitor: exactly-once gap events across micro-batches and
restarts, and bit-parity with the batch detect_outages on identical input."""
import datetime as dt

import pyspark.sql.functions as F
import pytest

from stl_decomp_4j_spark.operators.diagnostics import detect_outages
from stl_decomp_4j_spark.streaming.ingest import BUCKET_SCHEMA
from stl_decomp_4j_spark.streaming.monitor import stream_outage_monitor

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows(hours, url="u1"):
    return [(url, T0 + dt.timedelta(hours=h), 1) for h in hours]


def _drain(spark, src, out, ckpt, **kwargs):
    stream = spark.readStream.schema(BUCKET_SCHEMA).parquet(src)
    q = (
        stream_outage_monitor(stream, **kwargs)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_outages_match_batch_across_restarts(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    # u1: gaps at 2-4 (in batch 1) and 6-6, 9-10 (spanning the restart);
    # u2: gapless.  Hour 12 for u1 closes the last gap in batch 2.
    b1 = _rows([0, 1, 5]) + _rows([0, 1, 2], url="u2")
    b2 = _rows([7, 8, 11, 12]) + _rows([3], url="u2")
    spark.createDataFrame(b1, BUCKET_SCHEMA).write.mode("append").parquet(src)
    _drain(spark, src, out, ckpt)
    spark.createDataFrame(b2, BUCKET_SCHEMA).write.mode("append").parquet(src)
    _drain(spark, src, out, ckpt)  # fresh query object, state from checkpoint

    got = sorted(
        (r.url, r.gap_start, r.gap_end, r.missing)
        for r in spark.read.parquet(out).collect()
    )
    batch = spark.createDataFrame(b1 + b2, BUCKET_SCHEMA)
    want = sorted(
        (r.url, r.gap_start, r.gap_end, r.missing)
        for r in detect_outages(batch, "hour").collect()
    )
    assert got == want
    assert len(got) == 3  # u1 x3; u2 none
    assert got[0] == ("u1", T0 + dt.timedelta(hours=2), T0 + dt.timedelta(hours=4), 3)


def test_stream_outages_exactly_once_on_replay(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    spark.createDataFrame(_rows([0, 3]), BUCKET_SCHEMA).write.mode("append").parquet(src)
    _drain(spark, src, out, ckpt)
    # replay the SAME buckets (new files, same content) plus one stale row:
    # no duplicate gap events may be emitted
    spark.createDataFrame(_rows([0, 3, 1]), BUCKET_SCHEMA).write.mode("append").parquet(src)
    _drain(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == 1


def test_stream_outages_min_missing_and_trailing_open(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    # gap of 1 (hour 1) filtered by min_missing=2; gap 3-4 emitted; the
    # trailing absence after hour 5 is open -> nothing emitted for it
    spark.createDataFrame(_rows([0, 2, 5]), BUCKET_SCHEMA).write.mode("append").parquet(src)
    _drain(spark, src, out, ckpt, min_missing=2)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    assert got[0].gap_start == T0 + dt.timedelta(hours=3)
    assert got[0].missing == 2


def test_stream_outages_reject_misaligned(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    rows = [("u1", T0, 1), ("u1", T0 + dt.timedelta(minutes=30), 1)]
    spark.createDataFrame(rows, BUCKET_SCHEMA).write.mode("append").parquet(src)
    with pytest.raises(Exception, match="not aligned"):
        _drain(spark, src, out, ckpt)
