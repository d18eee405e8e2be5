"""Gap-based sessionization: hand-computed sessions, boundary semantics,
duplicate-instant determinism."""
import datetime as dt

import pyspark.sql.functions as F  # noqa: F401  (parity with sibling tests)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_session_summary_hand_case(spark):
    from stl_decomp_4j_spark.operators.sessions import session_summary

    df = spark.createDataFrame(
        [
            # url a: 3 events tight, 3h silence, 2 events
            ("a", _ts("2024-01-01 00:00:00")),
            ("a", _ts("2024-01-01 00:30:00")),
            ("a", _ts("2024-01-01 01:00:00")),
            ("a", _ts("2024-01-01 04:00:00")),
            ("a", _ts("2024-01-01 04:10:00")),
            # url b: single event
            ("b", _ts("2024-01-01 12:00:00")),
        ],
        "url string, ts timestamp",
    )
    rows = {
        (r["url"], r["session_id"]): r
        for r in session_summary(df, gap_s=7200).collect()
    }
    s1 = rows[("a", 1)]
    assert s1["start_ts"] == _ts("2024-01-01 00:00:00")
    assert s1["end_ts"] == _ts("2024-01-01 01:00:00")
    assert s1["n_events"] == 3 and s1["duration_s"] == 3600.0
    s2 = rows[("a", 2)]
    assert s2["start_ts"] == _ts("2024-01-01 04:00:00")
    assert s2["n_events"] == 2 and s2["duration_s"] == 600.0
    b = rows[("b", 1)]
    assert b["n_events"] == 1 and b["duration_s"] == 0.0
    assert len(rows) == 3


def test_session_gap_boundary_is_strict(spark):
    from stl_decomp_4j_spark.operators.sessions import session_summary

    df = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:00:00")),
            ("a", _ts("2024-01-01 02:00:00")),  # exactly gap_s -> SAME session
            ("a", _ts("2024-01-01 04:00:01")),  # gap_s + 1s -> new session
        ],
        "url string, ts timestamp",
    )
    out = session_summary(df, gap_s=7200).collect()
    assert sorted((r["session_id"], r["n_events"]) for r in out) == [(1, 2), (2, 1)]


def test_session_duplicate_instants_counted_once_for_gaps(spark):
    from stl_decomp_4j_spark.operators.sessions import session_summary

    df = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:00:00")),
            ("a", _ts("2024-01-01 00:00:00")),  # duplicate instant
            ("a", _ts("2024-01-01 00:00:00")),
            ("a", _ts("2024-01-01 03:00:00")),
            ("a", _ts("2024-01-01 03:00:00")),  # duplicate at session start
        ],
        "url string, ts timestamp",
    )
    rows = sorted(
        session_summary(df, gap_s=7200).collect(), key=lambda r: r["session_id"]
    )
    assert [(r["session_id"], r["n_events"]) for r in rows] == [(1, 3), (2, 2)]
