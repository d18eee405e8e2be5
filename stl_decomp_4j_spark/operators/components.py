"""Connected components over near-duplicate pairs — the clustering step that
turns pairwise dedup output (dedup.py minhash/simhash, similarity.py
embedding pairs) into keep-one groups.

A near-dup pass emits PAIRS (a~b, b~c); an actual dedup must keep ONE
representative per transitive group, so pairs need connected components.
The algorithm is the alternating large-star / small-star method of Kiveris
et al., "Connected Components in MapReduce and Beyond" (ACM SoCC 2014):
each round is two hash-aggregate + join passes over the edge set, and the
edge set converges to per-component stars (every node pointing at its
component's minimum id) in O(log n) rounds — the published shape for
trillion-edge graphs, versus naive label propagation whose round count is
the graph DIAMETER (a 10^6-long chain of near-dups would need 10^6
shuffles; star contraction needs ~20).

Spark mapping: edges live in a DataFrame; each round is codegen
groupBy/join (no Python); each round ends with a RELIABLE eager
`checkpoint()` — the star rounds roughly triple the logical plan per
iteration, so without a plan cut Catalyst's analyzer OOMs around round 15
(persist alone does NOT cut the logical plan: InMemoryRelation substitution
happens at execution, not plan construction).  Reliable checkpoint files
live in the SparkContext checkpoint dir (HDFS/object store on a cluster),
so an executor loss re-reads them instead of failing the job — which is why
this deliberately does NOT use `localCheckpoint` (executor-local blocks,
job-fatal on loss; cf. the persist rationale in dedup.py's minhash
pipeline).  If no checkpoint dir is configured, one is created under the
local filesystem tmp dir (correct single-node default; a cluster deployment
should call `sc.setCheckpointDir` with a shared path — files are not
auto-deleted unless `spark.cleaner.referenceTracking.cleanCheckpoints` is
set).
Convergence is detected by an order-insensitive edge-set fingerprint
(count + xor of row hashes), one tiny aggregate per round — not a
driver-side collect of the edges.

The result is deterministic regardless of partitioning or round count:
labels are component minima.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) edges -> for every node, connect its larger neighbors to
    min(neighborhood ∪ self)."""
    b = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = b.groupBy("u").agg(F.min("v").alias("_mn")).select(
        "u", F.least(F.col("_mn"), F.col("u")).alias("m")
    )
    return (
        b.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient every edge toward the smaller id, then connect each node's
    smaller neighbors (and itself) to the minimum of that neighborhood."""
    o = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    m = o.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = o.join(m, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    selfs = m.select(F.col("u"), F.col("m").alias("v"))
    return nbrs.union(selfs).filter(F.col("u") != F.col("v")).distinct()


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    """Order-insensitive edge-set id: (count, xor of per-row hashes)."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("x"),
    ).collect()[0]
    return int(row["n"]), int(row["x"])


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``.

    ``component`` is the minimum node id of the node's connected component —
    deterministic, so downstream keep-one dedup (keep node == component) is
    reproducible run to run.  Nodes with no pair are absent (they are their
    own singleton component; callers union them back — see the driver's
    dedup_components query).

    Raises after ``max_rounds`` star rounds without convergence (the bound
    is log-scale generous: 2^50 nodes).
    """
    sc = pairs.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        # single-node default; cluster deployments set a shared dir up front
        import tempfile

        sc.setCheckpointDir(tempfile.mkdtemp(prefix="cc-checkpoint-"))

    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .checkpoint(eager=True)
    )
    if not edges.take(1):
        return edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    prev = _fingerprint(edges)
    for _ in range(max_rounds):
        prev_edges = edges
        edges = _small_star(_large_star(edges)).checkpoint(eager=True)
        cur = _fingerprint(edges)
        # the fingerprint is a (count, xor-of-xxhash64) pair, so a match could
        # in principle (p ~ 2^-64) be a collision: confirm the fixpoint with
        # one exact set comparison — counts are equal (part of the
        # fingerprint) and both sides are distinct sets, so a one-sided
        # exceptAll emptiness check proves equality.  Runs once, on the
        # terminating round only.
        if cur == prev and edges.exceptAll(prev_edges).isEmpty():
            # fixpoint: every edge is (node, component-min); nodes that ARE
            # the minimum appear only on the right-hand side
            labels = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
            roots = edges.select(F.col("v").alias("node")).distinct().withColumn(
                "component", F.col("node")
            )
            return labels.union(roots.join(labels, "node", "left_anti")).distinct()
        prev = cur
    raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")
