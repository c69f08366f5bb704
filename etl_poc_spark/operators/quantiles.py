"""Exact distributed quantiles by two-pass selection — the third leg of
the quantile stack: `percentile()` is exact but buffers whole groups on
one executor (OOM at scale), the GK/histogram sketches are bounded but
approximate; this operator is exact AND never materializes more than one
bin's rows anywhere.

Pass 1 (coarse): histogram of fixed-width bins over the integer-scaled
values — one map-side-combined aggregate; the bin table (bounded by
value_range / bin_width, guarded) comes to the driver where a cumulative
scan locates, for each requested quantile, its bin and the rank offset
within that bin.

Pass 2 (select): only the (<= n_quantiles) target bins' rows are read
again, ranked per bin by a window on the scaled value, and the exact
rank-offset row selected. Each bin is a tiny fraction of the data; the
shuffle carries target-bin rows only.

Ranks use the ceil(q*n) convention via pure integer arithmetic
((q100*n + 99) div 100), and values are scaled through DECIMAL so
results are bit-exact against a SQL oracle — the same division-free
discipline as the histogram sketch in queries/dates_q.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles_2pass(
    df: DataFrame,
    value_col: str,
    q100s: list[int],
    scale: int = 100,
    bin_width: int = 50_000,
    max_bins: int = 1_000_000,
    precision: int = 18,
) -> DataFrame:
    """(q100, value) rows: for each percentile in `q100s` (integer
    percent), the exact value at 1-based rank ceil(q*n) of the sorted
    column. Values are fixed-point scaled (DECIMAL(precision, 2), exact
    for money-like columns) by `scale` before binning.

    Values that overflow the decimal cast (more integer digits than
    `precision` allows) would silently become NULL under non-ANSI
    semantics and vanish from an "exact" result — the NULL-bin guard
    below raises instead; widen `precision` for such columns.

    The driver sees only the bin histogram (guarded by `max_bins`) and
    the final quantile rows."""
    if not q100s:
        raise ValueError("need at least one percentile")
    if any(not 0 < q <= 100 for q in q100s):
        raise ValueError(f"percentiles must be in (0, 100]: {q100s}")

    v = (F.col(value_col).cast(f"decimal({precision},2)") * scale).cast("long")
    vals = df.where(F.col(value_col).isNotNull()).select(v.alias("__v"))
    hist = (
        vals.groupBy(F.floor(F.col("__v") / bin_width).cast("long").alias("__bin"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy("__bin")
    )
    bins = hist.collect()  # bounded: value_range / bin_width rows
    overflow = [r for r in bins if r["__bin"] is None]
    if overflow:
        raise ValueError(
            f"{overflow[0]['__c']} non-null value(s) overflowed "
            f"decimal({precision},2) and would be silently dropped; "
            "raise `precision`"
        )
    if len(bins) > max_bins:
        raise ValueError(
            f"{len(bins)} bins exceeds max_bins={max_bins}; raise bin_width"
        )
    n = sum(r["__c"] for r in bins)
    if n == 0:
        raise ValueError("no non-null values")

    # driver-side cumulative scan over the KB-sized bin table: for each
    # quantile, its bin and the 1-based rank offset within that bin
    targets = []  # (q100, bin, offset_in_bin)
    for q in sorted(set(q100s)):
        rank = (q * n + 99) // 100  # ceil(q/100 * n), integer-exact
        cum = 0
        for r in bins:
            if cum + r["__c"] >= rank:
                targets.append((q, r["__bin"], rank - cum))
                break
            cum += r["__c"]

    need_bins = sorted({b for _, b, _ in targets})
    w = Window.partitionBy("__bin").orderBy("__v")
    ranked = (
        vals.withColumn("__bin", F.floor(F.col("__v") / bin_width).cast("long"))
        .where(F.col("__bin").isin(need_bins))
        .withColumn("__rn", F.row_number().over(w))
    )
    spark = df.sparkSession
    probe = spark.createDataFrame(targets, "q100 int, __bin long, __rn int")
    return (
        ranked.join(F.broadcast(probe), ["__bin", "__rn"])
        .select(
            "q100",
            (F.col("__v").cast("double") / scale).alias("value"),
        )
    )
