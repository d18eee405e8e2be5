"""monitor_job: one maintenance pass (cross-tier audits + anomalies +
outages) over a real rollup store — clean store passes, a corrupted tier
partition is detected and exits nonzero with a lineage row."""
import json

import pyspark.sql.functions as F
import pytest

from stl_decomp_4j_spark.pipeline import PipelineConfig, run_pipeline
from stl_decomp_4j_spark.sources.pages import generate_pages


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("monitor") / "rollup")
    pages = generate_pages(spark, n_urls=6, days=14, events_per_url=200)
    pages_path = out + "_pages"
    pages.write.mode("overwrite").parquet(pages_path)
    run_pipeline(
        spark,
        spark.read.parquet(pages_path),
        out,
        PipelineConfig(n_buckets=2, compress=False),
    )
    return out, pages_path


def _run_monitor(monkeypatch, capsys, argv):
    import jobs.monitor_job as mj

    monkeypatch.setattr("sys.argv", ["monitor_job.py", *argv])
    rc = mj.main()
    out_lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    return rc, json.loads(out_lines[-1])


def test_clean_store_passes(store, monkeypatch, capsys):
    out, pages_path = store
    rc, summary = _run_monitor(monkeypatch, capsys, ["--output", out, "--input", pages_path])
    assert rc == 0
    assert summary["audit_mismatches"] == {"1h->1d": 0, "1d->1w": 0}
    assert "urls_with_outages" in summary
    # a monitor lineage row landed in the manifest
    lines = [json.loads(l) for l in open(f"{out}/manifest.jsonl")]
    rows = [l for l in lines if l["status"] == "monitor"]
    assert rows and rows[-1]["consistent"] is True


def test_corrupted_tier_fails_the_job(spark, store, monkeypatch, capsys):
    out, _ = store
    # corrupt one 1d bucket: shift sum_trend in a single partition rewrite
    t1d = spark.read.parquet(f"{out}/tier_1d")
    some = t1d.limit(1).collect()[0]
    corrupted = t1d.withColumn(
        "sum_trend",
        F.when(
            (F.col("url") == some.url) & (F.col("ts") == some.ts),
            F.col("sum_trend") + 100.0,
        ).otherwise(F.col("sum_trend")),
    )
    corrupted.write.mode("overwrite").parquet(f"{out}/tier_1d_corrupt")
    # swap the corrupted table in (filesystem rename keeps partitions)
    import shutil

    shutil.rmtree(f"{out}/tier_1d")
    shutil.move(f"{out}/tier_1d_corrupt", f"{out}/tier_1d")

    rc, summary = _run_monitor(monkeypatch, capsys, ["--output", out, "--report"])
    assert rc == 1
    assert summary["audit_mismatches"]["1h->1d"] == 1
    # the corrupted 1d value also makes the stored 1w disagree with
    # re-aggregation of the (corrupted) 1d — both audits fire
    assert summary["audit_mismatches"]["1d->1w"] == 1
    # --report wrote the mismatch rows from both audits
    rep = spark.read.parquet(f"{out}/monitor_report")
    rows = rep.collect()
    assert len(rows) == 2
    assert {r.check for r in rows} == {"audit_1h_1d", "audit_1d_1w"}
    assert all(r.metric == "sum_trend" for r in rows)
