"""Structured Streaming ingestion: watermarked streaming bucketize must agree
with the batch bucketize on every finalized window, and late data within the
watermark must be incorporated."""
import pyspark.sql.functions as F
import pytest

from stl_decomp_4j_spark.operators.bucketize import bucketize
from stl_decomp_4j_spark.sources.pages import generate_pages
from stl_decomp_4j_spark.streaming.ingest import read_pages_stream, start_bucket_stream


@pytest.mark.parametrize("n_batches", [3])
def test_stream_bucketize_matches_batch(spark, tmp_path, n_batches):
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "buckets")
    ckpt = str(tmp_path / "ckpt")

    pages = generate_pages(spark, n_urls=8, days=3, events_per_url=60, hot_url_count=1, hot_multiplier=4)
    pages.cache().count()

    # arrival order != event order: split by hash, not time (late data case)
    for i in range(n_batches):
        chunk = pages.filter(F.pmod(F.xxhash64("url", "warc_ts"), F.lit(n_batches)) == i)
        chunk.write.mode("append").parquet(src)
        q = start_bucket_stream(read_pages_stream(spark, src), out, ckpt, watermark="1 hour")
        q.awaitTermination(120)

    got = spark.read.parquet(out).groupBy("url", "ts").agg(F.sum("cnt").alias("cnt"))
    batch = bucketize(pages)

    # every emitted window must match the batch count exactly (append mode
    # emits once, after the watermark passes — so emitted == finalized)
    joined = got.alias("s").join(batch.alias("b"), ["url", "ts"], "left")
    mismatches = joined.filter(
        (F.col("b.cnt").isNull()) | (F.col("s.cnt") != F.col("b.cnt"))
    ).count()
    assert mismatches == 0

    # and the stream must have finalized the overwhelming majority of windows
    # (only windows above the final watermark may still be open)
    assert got.count() >= batch.count() * 0.8
