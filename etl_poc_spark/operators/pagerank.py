"""Distributed PageRank by power iteration (the iterative-algorithm tier
next to operators/dedup.py::connected_components).

Spark-first shape per iteration: one join (ranks -> edges on src) and one
groupBy(dst) — both shuffles on the edge keys, with map-side combine on
the contribution sum. Rank state is one (vertex, rank) frame; the deduped edge
frame is pinned inside the operator — verts, out-degrees, and every
iteration read it, and unpinned each reader would re-execute the
caller's edge-building lineage. Lineage is cut with an eager checkpoint
of the per-iteration rank state, which is the ONLY per-iteration action:
the dangling-vertex mass is folded in-plan as a 1-row aggregate broadcast
into the rank update (no driver-side collect per iteration).

Checkpoint modes (the local-vs-cluster durability trade-off):

* default (`checkpoint_dir=None`): `localCheckpoint(eager=True)` — blocks
  live in executor storage. Fastest on local[*]; on a real cluster an
  executor loss mid-iteration loses blocks that, with lineage cut, cannot
  be recomputed, failing the job.
* reliable (`checkpoint_dir="hdfs://..."`): `df.checkpoint(eager=True)`
  to a fault-tolerant filesystem. Survives executor loss — the mode to use
  for long iterative jobs on a 1000-executor cluster, at the cost of one
  distributed write per iteration.

Dangling vertices (no out-edges) donate their mass uniformly to every
vertex each iteration — the standard stochastic-matrix fix; without it
rank mass leaks and the vector no longer sums to 1.

Numeric note: rank values are doubles whose partial-sum order varies by
partitioning, so PageRank is registered rows-only (no DuckDB oracle) —
the iterative/float class the correctness gate documents as weaker;
behavior is pinned by closed-form pytest cases instead.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_poc_spark.operators.pins import pin


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
    checkpoint_dir: str | None = None,
    checkpoint_every: int | None = None,
    cut_every: int = 1,
) -> DataFrame:
    """Ranks for every vertex appearing in `edges` (directed, unweighted;
    parallel edges count once). Returns (vertex, rank) with sum(rank)=1
    up to float error.

    checkpoint_dir: when set, per-iteration state is checkpointed reliably
    to this fault-tolerant directory (survives executor loss); when None,
    executor-local checkpoint (fast, not fault-tolerant).
    checkpoint_every: deprecated and ignored; accepted for one release
    for caller compatibility.
    cut_every: checkpoint (materialize) the rank state every this many
    iterations; in between, the state is lazily PINNED instead. r17
    measured the guide-§5 lineage-cap-vs-job-overhead trade at k=1/2/5
    on supplier_pagerank (5 iterations, pin-cold 3-run medians, one
    session): k=1 → 7.4s, k=2 → 9.4s, k=5 → 11.6s — the per-iteration
    eager cut WINS here, because every un-cut iteration's subplan is
    referenced by two consumers (the contribs join and the dangling
    broadcast build) and the nested re-evaluation costs more than the
    checkpoint job it saves. Default stays 1 (the r16 shape); the knob
    remains for cluster deployments where a checkpoint is a distributed
    write and the trade can flip. The rank ADDENDS are unchanged under
    any k — chaining changes when materialization happens, not what is
    summed (round(rank, 9) + the adversarial gate pin that invariance).
    """
    if checkpoint_every is not None:
        warnings.warn(
            "pagerank(checkpoint_every=...) is deprecated and ignored; "
            "see cut_every",
            DeprecationWarning,
            stacklevel=2,
        )
    if cut_every < 1:
        raise ValueError("cut_every must be >= 1")
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
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _cut(df: DataFrame) -> DataFrame:
        # the single per-iteration materialization: caps plan depth at one
        # iteration and stops each iteration re-executing the whole chain
        # (both the contribs join and the dangling aggregate read it)
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    # r16 optimization (guide §2.4): the (vertex -> deg) lookup is LOOP-
    # INVARIANT, so join it once and carry `deg` inside the iterated state
    # instead of re-joining ranks against out_deg every iteration — one
    # join (and its shuffle at cluster scale) per iteration removed. The
    # rank update reads the same addends as before; double partial-sum
    # order may differ by partitioning exactly as it already did between
    # sessions, which the registered query's round(rank, 9) absorbs (the
    # adversarial-session gate pins that invariance).
    vd = pin(
        verts.join(out_deg, verts.vertex == out_deg.od_src, "left").drop("od_src")
    )
    state = vd.select("vertex", "deg", F.lit(1.0 / n).alias("rank"))
    for it in range(n_iter):
        state = _cut(state) if it % cut_every == 0 else pin(state)
        contribs = (
            state.where(F.col("deg").isNotNull())
            .join(e, F.col("vertex") == e.src)
            .select(F.col("dst").alias("vertex"), (F.col("rank") / F.col("deg")).alias("c"))
        )
        # dangling mass: ONE double, folded in-plan as a 1-row aggregate
        # broadcast into the rank update — no extra driver action per
        # iteration (the misc_q.py scalar-crossJoin pattern)
        dangling = state.where(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling_m")
        )
        summed = contribs.groupBy("vertex").agg(F.sum("c").alias("s"))
        state = (
            vd.join(summed, "vertex", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "vertex",
                "deg",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("_dangling_m") / F.lit(float(n))
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return state.select("vertex", "rank")  # pins release via release_pins()
