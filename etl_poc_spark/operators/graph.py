"""Exact triangle counting and clustering coefficient — graph analytics
beside operators/pagerank.py (power iteration) and operators/dedup.py
(connected components), but ONE-SHOT: three joins, no iteration, exact
integer results with a plain SQL oracle.

Scale shape (degree-ordered counting, the standard distributed
formulation): canonical undirected edges re-orient from the LOWER-ranked
endpoint to the higher, ranked by (degree, id). Every triangle then has
exactly one vertex with out-edges to the other two, so it is enumerated
exactly once from that apex — and a vertex's out-degree under this
orientation is O(sqrt(E)), which bounds the wedge explosion a hot hub
would cause under naive id-ordering (total wedge work O(E^1.5) instead
of sum(deg^2) — the reason every production triangle counter
degree-orders). The count and all per-vertex attributions are
orientation-invariant, so a DuckDB oracle can use the simple a<b<c
formulation and still match bit-for-bit.

The wedge build and closure probe are two equi-joins on vertex keys;
degrees are one map-side-combined aggregate. Nothing touches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_poc_spark.operators.pins import pin


def canonical_edges(df: DataFrame, u: str = "u", v: str = "v") -> DataFrame:
    """Undirected simple edges: (u, v) with u < v, self-loops and
    duplicates (either orientation) removed."""
    return (
        df.select(
            F.least(F.col(u), F.col(v)).alias("u"),
            F.greatest(F.col(u), F.col(v)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def triangles(
    edges: DataFrame, u: str = "u", v: str = "v", assume_canonical: bool = False
) -> DataFrame:
    """All triangles as (a, b, c) rows, each enumerated exactly once.
    Input is canonicalized unless the caller already did (and ideally
    pinned) it; see module docstring for the degree-ordered plan."""
    e = edges if assume_canonical else pin(canonical_edges(edges, u, v))
    # degree agg + both wedge sides read e
    deg = (
        e.select(F.col("u").alias("x"))
        .union(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    with_deg = (
        e.join(deg.select(F.col("x").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("x").alias("v"), F.col("d").alias("dv")), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # oriented edge low-rank -> high-rank, carrying the dst rank for
    # deterministic wedge-pair ordering
    o = pin(
        with_deg.select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dst_d"),
        )
    )
    e1 = o.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), F.col("dst_d").alias("bd")
    )
    e2 = o.select(
        F.col("src").alias("a"), F.col("dst").alias("c"), F.col("dst_d").alias("cd")
    )
    b_first = (F.col("bd") < F.col("cd")) | (
        (F.col("bd") == F.col("cd")) & (F.col("b") < F.col("c"))
    )
    wedges = e1.join(e2, "a").where(b_first).select("a", "b", "c")
    closer = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    return wedges.join(closer, ["b", "c"], "left_semi").select("a", "b", "c")


def k_core(
    edges: DataFrame,
    k: int,
    u: str = "u",
    v: str = "v",
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """The k-core: the maximal subgraph where every vertex has degree
    >= k, by iterative peeling — drop under-degree vertices, restrict
    edges to survivors, repeat to fixpoint. Returns (vertex, core_degree)
    with the vertex's degree INSIDE the core.

    Iterative tier (same shape as pagerank/BPE training): per-iteration
    state is the surviving edge set, cut with an eager checkpoint
    (`checkpoint_dir` opt-in for cluster-durable; localCheckpoint
    default); each round is one degree aggregate + two semi-joins, and
    the only driver traffic is the 1-long surviving-edge count that
    decides convergence. Peeling converges in at most |V| rounds and in
    practice a handful — each round removes every currently-under-degree
    vertex at once (parallel peeling), which reaches the same fixpoint
    as sequential removal (the k-core is unique)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _cut(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    e = _cut(canonical_edges(edges, u, v))
    n_edges = e.count()
    for _ in range(max_iter):
        deg = (
            e.select(F.col("u").alias("x"))
            .union(e.select(F.col("v").alias("x")))
            .groupBy("x")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.where(F.col("d") >= k).select("x")
        e2 = _cut(
            e.join(keep, e.u == keep.x, "left_semi").join(
                keep, F.col("v") == keep.x, "left_semi"
            )
        )
        n2 = e2.count()  # ONE long per round: the convergence probe
        e = e2
        if n2 == n_edges:
            break
        n_edges = n2
    return (
        e.select(F.col("u").alias("vertex"))
        .union(e.select(F.col("v").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
    )


def local_clustering(edges: DataFrame, u: str = "u", v: str = "v") -> DataFrame:
    """Per-vertex local clustering coefficient:
    (vertex, degree, n_triangles, clustering) with clustering =
    2*triangles / (deg*(deg-1)), NULL for degree-1 vertices. Triangle
    attribution explodes each enumerated triangle to its three corners
    (orientation-invariant) and rides one vertex-keyed aggregate; the
    ratio is a single division of exact integers."""
    e = pin(canonical_edges(edges, u, v))
    deg = (
        e.select(F.col("u").alias("vertex"))
        .union(e.select(F.col("v").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri_v = (
        triangles(e, assume_canonical=True)
        .select(F.explode(F.array("a", "b", "c")).alias("vertex"))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return deg.join(tri_v, "vertex", "left").select(
        "vertex",
        F.col("degree").cast("bigint").alias("degree"),
        F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
        (
            F.lit(2) * F.coalesce("n_triangles", F.lit(0)).cast("double")
            / F.nullif(F.col("degree") * (F.col("degree") - 1), F.lit(0)).cast("double")
        ).alias("clustering"),
    )


def triangle_stats(edges: DataFrame, u: str = "u", v: str = "v") -> DataFrame:
    """One row: (n_vertices, n_edges, n_triangles, n_wedges,
    global_clustering) where global_clustering = 3*triangles / wedges
    (the transitivity ratio; NULL on a wedge-free graph). Exact integer
    counts, one double division."""
    # ONE pinned canonical frame feeds the degree aggregate, the edge
    # count, and the triangle enumeration — unpinned, each branch would
    # re-execute the caller's edge-building lineage (an orderkey
    # self-join for the registered co-purchase query)
    e = pin(canonical_edges(edges, u, v))
    deg = (
        e.select(F.col("u").alias("x"))
        .union(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    base = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vertices"),
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2).cast("bigint").alias("n_wedges"),
    )
    n_e = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    n_t = triangles(e, assume_canonical=True).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    return (
        base.crossJoin(F.broadcast(n_e))
        .crossJoin(F.broadcast(n_t))
        .select(
            "n_vertices",
            "n_edges",
            "n_triangles",
            "n_wedges",
            (
                F.lit(3) * F.col("n_triangles").cast("double")
                / F.nullif(F.col("n_wedges"), F.lit(0)).cast("double")
            ).alias("global_clustering"),
        )
    )
