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


def test_sessionize_matches_python_reference_property(spark):
    import numpy as np
    import pandas as pd

    from stl_decomp_4j_spark.operators.sessions import session_summary

    rng = np.random.default_rng(13)
    base = pd.Timestamp("2024-01-01")
    rows = []
    for k in range(4):
        t = 0
        for _ in range(int(rng.integers(1, 150))):
            rows.append((f"u{k}", base + pd.Timedelta(seconds=t)))
            if rng.random() < 0.2:  # occasional duplicate instant
                rows.append((f"u{k}", base + pd.Timedelta(seconds=t)))
            t += int(rng.integers(1, 20000))
    pdf = pd.DataFrame(rows, columns=["url", "ts"])

    gap_s = 7200
    expected = {}
    for url, g in pdf.groupby("url"):
        instants = sorted(g["ts"].unique())
        counts = g.groupby("ts").size()
        sid, prev = 0, None
        sessions = {}
        for t in instants:
            if prev is None or (t - prev).total_seconds() > gap_s:
                sid += 1
                sessions[sid] = []
            sessions[sid].append(t)
            prev = t
        for s, ts_list in sessions.items():
            expected[(url, s)] = (
                min(ts_list).to_pydatetime(),
                max(ts_list).to_pydatetime(),
                int(sum(counts[t] for t in ts_list)),
                (max(ts_list) - min(ts_list)).total_seconds(),
            )

    got = session_summary(spark.createDataFrame(pdf), gap_s=gap_s).collect()
    assert len(got) == len(expected)
    for r in got:
        start, end, n, dur = expected[(r["url"], r["session_id"])]
        assert (r["start_ts"], r["end_ts"]) == (start, end), r
        assert r["n_events"] == n and r["duration_s"] == dur, r


def test_sessionize_agrees_with_spark_session_window(spark):
    """Cross-engine validation: session_summary's grouping must equal
    Spark's built-in session_window aggregation — including the boundary
    case (a gap of exactly gap_s stays inside the session in BOTH: Spark
    merges adjacent windows, matching this engine's strict-> rule)."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.functions as F

    from stl_decomp_4j_spark.operators.sessions import session_summary

    rng = np.random.default_rng(17)
    base = pd.Timestamp("2024-01-01")
    rows = []
    for k in range(3):
        t = 0
        for _ in range(80):
            rows.append((f"u{k}", base + pd.Timedelta(seconds=t)))
            # gaps of 1..599s (inside) or 601..1200s (outside); never 600
            t += int(rng.integers(1, 600)) + (601 if rng.random() < 0.25 else 0)
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "ts"]))

    ours = sorted(
        (r["url"], r["start_ts"], r["end_ts"], r["n_events"])
        for r in session_summary(df, gap_s=600).collect()
    )
    builtin = sorted(
        (r["url"], r["w"]["start"], r["e"], r["n"])
        for r in df.groupBy("url", F.session_window("ts", "600 seconds").alias("w"))
        .agg(F.max("ts").alias("e"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # session_window.start == first event ts; end_ts == max(ts) within it
    assert ours == builtin

    # boundary: gap == exactly gap_s stays one session in both engines
    edge = spark.createDataFrame(
        [("a", base.to_pydatetime()), ("a", (base + pd.Timedelta(seconds=600)).to_pydatetime())],
        "url string, ts timestamp",
    )
    assert session_summary(edge, gap_s=600).count() == 1
    assert (
        edge.groupBy("url", F.session_window("ts", "600 seconds")).count().count()
        == 1
    )
    # ...and gap_s + 1s splits in both
    edge2 = spark.createDataFrame(
        [("a", base.to_pydatetime()), ("a", (base + pd.Timedelta(seconds=601)).to_pydatetime())],
        "url string, ts timestamp",
    )
    assert session_summary(edge2, gap_s=600).count() == 2
    assert (
        edge2.groupBy("url", F.session_window("ts", "600 seconds")).count().count()
        == 2
    )
