#!/usr/bin/env python3
"""Generate independent STL-family oracle fixtures by running the REFERENCE
Java library (stl-decomp-4j, compiled with javac against Spark's
commons-math3 jar) on the gap-filled event series of each test sf dir.

Pipeline per sf:
  1. DuckDB (not the engine) gap-fills events to the dense hourly grid —
     the same SQL the gapfill oracle uses, so the input series is fully
     independent of the Spark code under test.
  2. Exogenous regressors (weekend flag + daily sine) are derived from the
     grid timestamps exactly as the driver query derives them.
  3. The reference runs: standard decompose (period 24, sw 35, ni=2/no=0),
     fit stats, smoothSeasonal(15), periodic & robust-periodic diagnostics,
     and the exogenous decompose.
  4. Outputs land in tests/fixtures/oracle/*.parquet with raw float64
     values plus an ``n_events`` discriminator column so a single fixed
     oracle SQL string can select the right sf's rows at query time.

Usage: python tools/make_stl_fixtures.py [sf_dir ...]
Requires: javac/java 17 (installed), /opt/spark/jars/commons-math3-3.6.1.jar.
"""
from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
FIXDIR = REPO / "tests" / "fixtures" / "oracle"
JAVA_SRC = REPO / "tools" / "java_fixture_gen" / "FixtureGen.java"
CM_JAR = "/opt/spark/jars/commons-math3-3.6.1.jar"
REF_SRC = "/root/reference/stl-decomp-4j/src/main/java"
CLASSES = Path("/tmp/stlref/fixture_classes")

GAPFILL_SQL = """
    WITH hourly AS (
        SELECT event_type AS url, date_trunc('hour', ts) AS ts, count(*) AS cnt
        FROM read_parquet('{sf}/events.parquet') GROUP BY 1, 2
    ),
    bounds AS (SELECT url, min(ts) AS t0, max(ts) AS t1 FROM hourly GROUP BY url),
    grid AS (SELECT url, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS ts FROM bounds)
    SELECT g.url, g.ts, coalesce(CAST(h.cnt AS DOUBLE), 0.0) AS value
    FROM grid g LEFT JOIN hourly h ON g.url = h.url AND g.ts = h.ts
    ORDER BY g.url, g.ts
"""


def compile_runner() -> None:
    CLASSES.mkdir(parents=True, exist_ok=True)
    srcs = subprocess.run(
        ["find", REF_SRC, "-name", "*.java"], capture_output=True, text=True, check=True
    ).stdout.split()
    subprocess.run(
        ["javac", "-cp", CM_JAR, "-d", str(CLASSES), *srcs, str(JAVA_SRC)],
        check=True, capture_output=True, text=True,
    )


def run_reference(series: pd.DataFrame) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """series: (url, ts, value) sorted.  Returns (res, stats, smooth) frames."""
    inp = Path("/tmp/stlref/fixture_in.txt")
    outp = Path("/tmp/stlref/fixture_out.txt")
    with open(inp, "w") as f:
        for url, grp in series.groupby("url", sort=True):
            ts = pd.to_datetime(grp["ts"])
            weekend = (ts.dt.dayofweek >= 5).to_numpy(dtype=float)
            daily = np.sin(2.0 * np.pi * ts.dt.hour.to_numpy(dtype=float) / 24.0)
            vals = grp["value"].to_numpy(dtype=float)
            f.write(f"SERIES {url} {len(vals)}\n")
            for v, w, d in zip(vals, weekend, daily):
                f.write(f"{v:.17g} {w:.17g} {d:.17g}\n")
    subprocess.run(
        ["java", "-cp", f"{CLASSES}:{CM_JAR}", "FixtureGen", str(inp), str(outp)],
        check=True, capture_output=True, text=True,
    )
    res_rows, stat_rows, smooth_rows = [], [], []
    with open(outp) as f:
        for line in f:
            p = line.split()
            if p[0] == "RES":
                res_rows.append((p[1], p[2], int(p[3]), float(p[4]), float(p[5]), float(p[6]), float(p[7])))
            elif p[0] == "STATS":
                stat_rows.append((p[1], *[float(x) for x in p[2:9]]))
            elif p[0] == "SMOOTH":
                smooth_rows.append((p[1], int(p[2]), float(p[3]), float(p[4])))
    res = pd.DataFrame(res_rows, columns=["tag", "url", "i", "trend", "seasonal", "residual", "weight"])
    stats = pd.DataFrame(
        stat_rows,
        columns=["url", "data_mean", "data_variance", "trend_range", "seasonal_variance",
                 "residual_variance", "trendiness_z", "seasonal_z"],
    )
    smooth = pd.DataFrame(smooth_rows, columns=["url", "i", "seasonal_smoothed", "residual"])
    return res, stats, smooth


def build_fixtures(sf_dirs: list[str]) -> None:
    frames: dict[str, list[pd.DataFrame]] = {k: [] for k in (
        "stl_decompose_events", "stl_periodic", "stl_robust_periodic",
        "stl_seasonal_smooth", "stl_exogenous", "stl_fit_stats",
        "stl_backtest",
    )}
    for sf in sf_dirs:
        n_events = duckdb.sql(f"SELECT count(*) FROM read_parquet('{sf}/events.parquet')").fetchone()[0]
        series = duckdb.sql(GAPFILL_SQL.format(sf=sf)).df()
        res, stats, smooth = run_reference(series)

        # backtest fixture: the reference decomposes each series MINUS its
        # last 48 grid rows (the holdout the backtest query forecasts);
        # carries the truncated values too (the MASE scale reads them)
        trunc = duckdb.sql(
            "SELECT url, ts, value FROM ("
            "  SELECT *, row_number() OVER (PARTITION BY url ORDER BY ts DESC) AS rn"
            "  FROM series) WHERE rn > 48 ORDER BY url, ts"
        ).df()
        tres, _, _ = run_reference(trunc)
        trunc = trunc.reset_index(drop=True)
        trunc["i"] = trunc.groupby("url").cumcount()
        tkey = trunc[["url", "i", "ts", "value"]]
        tstd = tres[tres["tag"] == "std"].merge(tkey, on=["url", "i"])[
            ["url", "ts", "value", "trend", "seasonal", "residual"]
        ]
        tstd = tstd.copy()
        tstd["n_events"] = np.int64(n_events)
        frames["stl_backtest"].append(tstd)
        # positional index -> grid timestamp, per url
        series = series.reset_index(drop=True)
        series["i"] = series.groupby("url").cumcount()
        key = series[["url", "i", "ts", "value"]]

        def with_ts(tag: str, cols: list[str]) -> pd.DataFrame:
            sub = res[res["tag"] == tag].merge(key, on=["url", "i"])
            return sub[["url", "ts", "value", *cols]]

        std = with_ts("std", ["trend", "seasonal", "residual"])
        per = with_ts("per", ["trend", "seasonal"])
        rper = with_ts("rper", ["trend", "seasonal", "weight"])
        exog = with_ts("exog", ["trend", "seasonal", "residual"])
        sm = smooth.merge(key, on=["url", "i"])[["url", "ts", "seasonal_smoothed", "residual"]]
        for name, df in (
            ("stl_decompose_events", std), ("stl_periodic", per),
            ("stl_robust_periodic", rper), ("stl_exogenous", exog),
            ("stl_seasonal_smooth", sm), ("stl_fit_stats", stats),
        ):
            df = df.copy()
            df["n_events"] = np.int64(n_events)
            frames[name].append(df)
    FIXDIR.mkdir(parents=True, exist_ok=True)
    for name, parts in frames.items():
        out = pd.concat(parts, ignore_index=True)
        out.to_parquet(FIXDIR / f"{name}.parquet", index=False)
        print(f"{name}: {len(out)} rows -> {FIXDIR / (name + '.parquet')}")


if __name__ == "__main__":
    sfs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    compile_runner()
    build_fixtures(sfs)
