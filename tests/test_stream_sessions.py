"""Streaming sessionizer: closed sessions exactly once across micro-batches
and restarts, parity with batch session_summary minus trailing open sessions."""
import datetime as dt

from stl_decomp_4j_spark.operators.sessions import session_summary
from stl_decomp_4j_spark.streaming.sessions import EVENT_SCHEMA, stream_session_monitor

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows(minutes, url="u1"):
    return [(url, T0 + dt.timedelta(minutes=m)) for m in minutes]


def _drain(spark, src, out, ckpt, **kwargs):
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (
        stream_session_monitor(stream, **kwargs)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _batch_closed(spark, rows, gap_s):
    """Batch sessions minus each url's trailing (open) session."""
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    out = session_summary(df, gap_s=gap_s).collect()
    last = {}
    for r in out:
        last[r.url] = max(last.get(r.url, 0), r.session_id)
    return sorted(
        (r.url, r.session_id, r.start_ts, r.end_ts, r.n_events, r.duration_s)
        for r in out
        if r.session_id != last[r.url]
    )


def test_stream_sessions_match_batch_across_restarts(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    gap_s = 1800  # 30 min
    # u1: session A (0,10,20), session B (80,85 — spans the restart), session
    # C opened by 180 (closes B), still open at the end.
    # u2: one session per batch, second still open.
    b1 = _rows([0, 10, 20, 80]) + _rows([5, 15], url="u2")
    b2 = _rows([85, 180]) + _rows([400], url="u2")
    spark.createDataFrame(b1, EVENT_SCHEMA).write.mode("append").parquet(src)
    _drain(spark, src, out, ckpt, gap_s=gap_s)
    spark.createDataFrame(b2, EVENT_SCHEMA).write.mode("append").parquet(src)
    _drain(spark, src, out, ckpt, gap_s=gap_s)  # state from checkpoint

    got = sorted(
        (r.url, r.session_id, r.start_ts, r.end_ts, r.n_events, r.duration_s)
        for r in spark.read.parquet(out).collect()
    )
    assert got == _batch_closed(spark, b1 + b2, gap_s)
    # u1: sessions 1 (3 events) and 2 (2 events) closed; u2: session 1 closed
    assert [(u, s, n) for (u, s, _, _, n, _) in got] == [
        ("u1", 1, 3),
        ("u1", 2, 2),
        ("u2", 1, 2),
    ]
    u1a = got[0]
    assert u1a[2] == T0 and u1a[3] == T0 + dt.timedelta(minutes=20)
    assert u1a[5] == 1200.0


def test_stream_sessions_exactly_once_on_replay(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    spark.createDataFrame(_rows([0, 5]), EVENT_SCHEMA).write.mode("append").parquet(src)
    _drain(spark, src, out, ckpt, gap_s=600)
    # replay the same events (new files) plus the closing event
    spark.createDataFrame(
        _rows([0, 5, 60]), EVENT_SCHEMA
    ).write.mode("append").parquet(src)
    _drain(spark, src, out, ckpt, gap_s=600)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    assert got[0].n_events == 2 and got[0].session_id == 1
    # replaying the closing event again must emit nothing new
    spark.createDataFrame(_rows([60]), EVENT_SCHEMA).write.mode("append").parquet(src)
    _drain(spark, src, out, ckpt, gap_s=600)
    assert spark.read.parquet(out).count() == 1


def test_stream_sessions_duplicates_in_batch_counted(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    rows = _rows([0, 0, 0, 5]) + _rows([60])  # dup instants, then a closer
    spark.createDataFrame(rows, EVENT_SCHEMA).write.mode("append").parquet(src)
    _drain(spark, src, out, ckpt, gap_s=600)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1 and got[0].n_events == 4
