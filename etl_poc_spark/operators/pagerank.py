"""Distributed PageRank by power iteration (the iterative-algorithm tier
next to operators/dedup.py::connected_components).

Spark-first shape per iteration: one join (ranks -> edges on src) and one
groupBy(dst) — both shuffles on the edge keys, with map-side combine on
the contribution sum. Rank state is one (vertex, rank) frame; the deduped edge
frame is pinned inside the operator — verts, out-degrees, and every
iteration read it, and unpinned each reader would re-execute the
caller's edge-building lineage. Lineage is cut with an eager localCheckpoint
of the per-iteration rank state: the dangling-mass collect is an action
and the contribs join reads the same frame, so without the cut every
iteration re-executes the whole chain since the start twice, and 10+
chained joins build a plan Catalyst re-analyzes quadratically.

Dangling vertices (no out-edges) donate their mass uniformly to every
vertex each iteration — the standard stochastic-matrix fix; without it
rank mass leaks and the vector no longer sums to 1.

Numeric note: rank values are doubles whose partial-sum order varies by
partitioning, so PageRank is registered rows-only (no DuckDB oracle) —
the iterative/float class the correctness gate documents as weaker;
behavior is pinned by closed-form pytest cases instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_poc_spark.operators.pins import pin


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Ranks for every vertex appearing in `edges` (directed, unweighted;
    parallel edges count once). Returns (vertex, rank) with sum(rank)=1
    up to float error."""
    # pin the deduped edge list: verts, out_deg, and EVERY iteration's
    # contribs join read it — unpinned, each of those re-executes the
    # caller's edge-building lineage (a fact-table join for the registered
    # supplier_pagerank query). At cluster scale this is the materialized
    # edge table every graph engine starts from.
    e = pin(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct())
    verts = pin(
        e.select(F.col("src").alias("vertex"))
        .union(e.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    n = verts.count()  # bounded: one long per vertex partition-count, a count()
    out_deg = pin(
        e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).select(
            F.col("src").alias("od_src"), "deg"
        )
    )

    ranks = verts.select("vertex", F.lit(1.0 / n).alias("rank"))
    for i in range(n_iter):
        # materialize ONCE per iteration: the dangling-mass collect below
        # is an action, and both it and the contribs join read this frame —
        # without the eager checkpoint each iteration re-executes the whole
        # lineage since the last cut TWICE (measured 2.5x on the registered
        # supplier_pagerank query). Also caps plan depth at one iteration.
        with_deg = (
            ranks.join(out_deg, ranks.vertex == out_deg.od_src, "left")
            .drop("od_src")
            .localCheckpoint(eager=True)
        )
        contribs = (
            with_deg.where(F.col("deg").isNotNull())
            .join(e, F.col("vertex") == e.src)
            .select(F.col("dst").alias("vertex"), (F.col("rank") / F.col("deg")).alias("c"))
        )
        # dangling mass: ONE double per iteration fetched to the driver
        # (bounded by construction), redistributed uniformly
        dangling = (
            with_deg.where(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
            .collect()[0]["m"]
        )
        base = (1.0 - damping) / n + damping * dangling / n
        summed = contribs.groupBy("vertex").agg(F.sum("c").alias("s"))
        ranks = verts.join(summed, "vertex", "left").select(
            "vertex",
            (F.lit(base) + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))).alias(
                "rank"
            ),
        )
    return ranks  # verts/out_deg pins release via release_pins()
