#!/usr/bin/env python3
"""Generate the LTTB downsampling oracle fixture with an INDEPENDENT naive
scalar implementation (straight from Steinarsson 2013, pseudocode p.19 —
per-point Python loops, no NumPy vectorization, no code shared with
operators/downsample.py), run on the DuckDB-gap-filled hourly series of
each test sf dir.  Same independence pattern as the simhash fixture: the
engine's vectorized kernel must reproduce a second from-the-paper
implementation point-for-point.

Usage: python tools/make_lttb_fixture.py [sf_dir ...]
"""
from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
FIXDIR = REPO / "tests" / "fixtures" / "oracle"
N_OUT = 100

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


def lttb_naive(ts: list[float], vs: list[float], n_out: int) -> list[int]:
    """Scalar LTTB, transcribed from the thesis pseudocode."""
    n = len(ts)
    if n <= n_out:
        return list(range(n))
    every = (n - 2) / (n_out - 2)
    selected = [0]
    a = 0
    for i in range(n_out - 2):
        range_start = int(i * every) + 1
        range_end = int((i + 1) * every) + 1
        avg_start = min(int((i + 1) * every) + 1, n)
        avg_end = min(int((i + 2) * every) + 1, n)
        avg_t = sum(ts[j] for j in range(avg_start, avg_end)) / (avg_end - avg_start)
        avg_v = sum(vs[j] for j in range(avg_start, avg_end)) / (avg_end - avg_start)
        best_area = -1.0
        best_j = range_start
        for j in range(range_start, range_end):
            area = abs(
                (ts[a] - avg_t) * (vs[j] - vs[a]) - (ts[a] - ts[j]) * (avg_v - vs[a])
            )
            if area > best_area:
                best_area = area
                best_j = j
        selected.append(best_j)
        a = best_j
    selected.append(n - 1)
    return selected


def main(sf_dirs: list[str]) -> None:
    parts = []
    for sf in sf_dirs:
        n_events = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{sf}/events.parquet')"
        ).fetchone()[0]
        series = duckdb.sql(GAPFILL_SQL.format(sf=sf)).df()
        for url, grp in series.groupby("url", sort=True):
            micros = (
                pd.to_datetime(grp["ts"]).to_numpy().astype("datetime64[us]")
                .astype(np.int64)
            )
            # relative micros: exact float64 integers (same coordinate
            # convention as the engine kernel — see downsample.py)
            t = [float(x) for x in micros - micros[0]]
            v = grp["value"].tolist()
            idx = lttb_naive(t, v, N_OUT)
            sub = grp.iloc[idx][["url", "ts", "value"]].copy()
            sub["n_events"] = np.int64(n_events)
            parts.append(sub)
    out = pd.concat(parts, ignore_index=True)
    FIXDIR.mkdir(parents=True, exist_ok=True)
    out.to_parquet(FIXDIR / "lttb_hourly.parquet", index=False)
    print(f"lttb_hourly: {len(out)} rows -> {FIXDIR / 'lttb_hourly.parquet'}")


if __name__ == "__main__":
    main(sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"
    ])
