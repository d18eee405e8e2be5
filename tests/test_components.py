"""Connected components (alternating large-star/small-star): labels must be
component minima, convergence must beat diameter-bound propagation, and a
seeded random graph must match a pure-Python union-find oracle."""
import random

import pyspark.sql.functions as F
import pytest

from stl_decomp_4j_spark.operators.components import connected_components


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def _collect(df):
    return sorted((r.node, r.component) for r in df.collect())


def test_chain_collapses_to_min_label(spark):
    # path 1-2-3-4-5: one component labeled 1
    got = _collect(connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])))
    assert got == [(1, 1), (2, 1), (3, 1), (4, 1), (5, 1)]


def test_two_components_and_edge_order_irrelevant(spark):
    edges = [(10, 7), (7, 3), (20, 25), (25, 21), (3, 10)]  # dup-ish, reversed
    got = _collect(connected_components(_pairs(spark, edges)))
    assert got == [(3, 3), (7, 3), (10, 3), (20, 20), (21, 20), (25, 20)]


def test_long_path_converges_in_log_rounds(spark):
    # a 200-node path has diameter 199; star contraction must converge well
    # inside the 50-round guard (naive propagation would need ~200 rounds)
    n = 200
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _collect(connected_components(_pairs(spark, edges)))
    assert got == [(i, 0) for i in range(n)]


def test_matches_union_find_on_seeded_random_graph(spark):
    rng = random.Random(20240817)
    n, m = 400, 300
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = sorted(
        (x, find(x)) for x in set(v for e in edges for v in e)
    )
    got = _collect(connected_components(_pairs(spark, edges)))
    assert got == want


def test_empty_pairs(spark):
    got = connected_components(_pairs(spark, []).filter(F.lit(False)))
    assert got.collect() == []
    assert got.columns == ["node", "component"]


def test_self_loops_ignored(spark):
    got = _collect(connected_components(_pairs(spark, [(4, 4), (4, 9)])))
    assert got == [(4, 4), (9, 4)]


def test_nonconvergence_guard_raises(spark):
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(_pairs(spark, [(i, i + 1) for i in range(30)]), max_rounds=1)
