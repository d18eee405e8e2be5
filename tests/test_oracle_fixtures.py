"""Cross-checks between the independent oracle-fixture generators (pure
Python, tools/) and the engine's JVM-side implementations."""
import sys
from pathlib import Path

import pandas as pd
import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.make_simhash_fixture import xxh64  # noqa: E402

FIXDIR = Path(__file__).resolve().parent / "fixtures" / "oracle"
SF_DIR = "/root/testdata/sf0.001"


def test_python_xxh64_matches_spark(spark):
    words = ["", "a", "ab", "abc", "abcd", "abcde", "hello world",
             "x" * 7, "y" * 8, "z" * 9, "w" * 31, "v" * 32, "u" * 33, "t" * 100, "café"]
    got = {
        r["w"]: r["h"]
        for r in spark.createDataFrame([(w,) for w in words], ["w"])
        .select("w", F.xxhash64("w").alias("h"))
        .collect()
    }
    for w in words:
        mine = xxh64(w.encode("utf-8"))
        signed = mine - (1 << 64) if mine >= (1 << 63) else mine
        assert signed == got[w], w


def test_simhash_fixture_matches_engine(spark):
    from stl_decomp_4j_spark.operators.dedup import simhash

    fx = pd.read_parquet(FIXDIR / "simhash.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sum_chars = docs.agg(F.sum("n_chars")).collect()[0][0]
    fx = fx[fx["sum_chars"] == sum_chars].set_index("doc_id")["simhash"]
    got = simhash(docs).toPandas().set_index("doc_id")["simhash"]
    assert len(fx) == len(got)
    assert (fx.sort_index() == got.sort_index()).all()
