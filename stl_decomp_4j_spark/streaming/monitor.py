"""Streaming crawl-outage monitor — the live twin of
operators/diagnostics.detect_outages.

Consumes finalized (url, ts, cnt) bucket rows (the append-mode output of
stream_bucketize, or that table re-streamed) and emits one gap event
(url, gap_start, gap_end, missing) per maximal run of missing grid slots,
exactly once, as soon as the bucket closing the gap arrives.  Alerting-shaped
output: a pipeline can sink it straight to a notification topic instead of
re-scanning the bucket table every monitor pass.

State (applyInPandasWithState) is one int64 per url — the last observed grid
slot — identical in size and checkpoint semantics to the streaming gap-fill's
state; history length never grows it.  Semantics mirror the batch operator
bit-for-bit so the two are interchangeable (tested by feeding identical
buckets through both):

- leading absence is not a gap (the per-url grid starts at its first
  observed bucket, matching gap-fill's [min, max] convention);
- a trailing/ongoing outage is NOT emitted until a bucket closes it —
  append-mode finalization, same as every other streaming stage here;
- bucket rows at or behind the state's last slot are stale replays and are
  dropped (their gaps were already emitted exactly once);
- misaligned timestamps raise loudly (the batch kernel's rule) instead of
  floor-dividing into wrong slots.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTAGE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("gap_start", TimestampType()),
        StructField("gap_end", TimestampType()),
        StructField("missing", LongType()),
    ]
)


def stream_outage_monitor(
    bucket_rows: DataFrame, step_seconds: int = 3600, min_missing: int = 1
) -> DataFrame:
    """Stateful streaming gap detector over finalized bucket rows.

    Returns an append-mode stream of (url, gap_start, gap_end, missing):
    one row per completed run of >= min_missing empty grid slots between two
    observed buckets, emitted in the micro-batch that observes the gap's
    closing bucket and never again (per-url last-slot state survives
    restarts via the query checkpoint).
    """
    import pandas as pd

    state_schema = StructType([StructField("last_slot", LongType())])

    def fn(key, pdf_iter, state):
        import numpy as np

        url = key[0]
        parts = [pdf for pdf in pdf_iter if len(pdf)]
        if not parts:
            return
        pdf = pd.concat(parts).sort_values("ts")
        ts = np.unique(pdf["ts"].to_numpy().astype("datetime64[s]").astype(np.int64))
        (last,) = state.get if state.exists else (None,)
        if last is not None:
            ts = ts[ts > last]
        if not len(ts):
            return  # stale replay entirely behind the state
        anchor = ts[0] if last is None else last
        if ((ts - anchor) % step_seconds).any():
            raise ValueError(
                f"bucket timestamps for url={url!r} are not aligned to the "
                f"{step_seconds}s grid (granularity mismatch between the "
                f"bucket stream and the monitor step)"
            )
        # prepend the state's last slot so a gap spanning micro-batches /
        # restarts is measured from the previously observed bucket
        seq = ts if last is None else np.concatenate(([last], ts))
        missing = np.diff(seq) // step_seconds - 1
        hit = missing >= int(min_missing)
        state.update((int(ts[-1]),))
        if not hit.any():
            return
        prev = seq[:-1][hit]
        nxt = seq[1:][hit]
        yield pd.DataFrame(
            {
                "url": url,
                "gap_start": (prev + step_seconds).astype("datetime64[s]"),
                "gap_end": (nxt - step_seconds).astype("datetime64[s]"),
                "missing": missing[hit],
            }
        )

    return bucket_rows.groupBy("url").applyInPandasWithState(
        fn, OUTAGE_SCHEMA, state_schema, "append", "NoTimeout"
    )
