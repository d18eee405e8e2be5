"""CSV source/sink parity (reference A24) — reading the reference's own CSV
files and reproducing its 17-digit dump format."""
import numpy as np

from stl_decomp_4j_spark.sources.timeseries import (
    decomposition_to_json,
    read_co2_csv,
    write_decomposition_csv,
)
from stl_decomp_4j_spark.stl import decompose

CO2 = "/root/reference/examples/StlDemoRestServer/co2.csv"
GOLDEN = "/root/reference/examples/StlPerfTest/output.csv"


def test_read_co2_and_roundtrip_17_digits(spark, tmp_path):
    df = read_co2_csv(spark, CO2)
    pdf = df.orderBy("idx").toPandas()
    assert len(pdf) == 708
    data = pdf["value"].to_numpy()

    d = decompose(data, 12, seasonal_width=35, robust=False)
    out = tmp_path / "dump.csv"
    write_decomposition_csv(d, str(out))

    ours = out.read_text().strip().splitlines()
    golden = open(GOLDEN).read().strip().splitlines()
    assert len(ours) == len(golden)
    for line_a, line_b in zip(ours, golden):
        va = [float(x) for x in line_a.split(",")]
        vb = [float(x) for x in line_b.split(",")]
        assert np.max(np.abs(np.array(va) - np.array(vb))) < 1.0e-11

    js = decomposition_to_json(d)
    import json

    parsed = json.loads(js)
    assert set(parsed) == {"time", "value", "seasonal", "trend", "residual", "weight"}
    assert len(parsed["value"]) == 708
