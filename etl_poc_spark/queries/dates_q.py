"""Date arithmetic + percentile coverage (SURVEY §2.8 ABSENT-category
surface the engine exposes as built-ins)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_poc_spark.io import load_table
from etl_poc_spark.registry import query


@query(
    "order_date_arithmetic",
    oracle="""
    SELECT o.o_orderkey,
           strftime(o.o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           datediff('day', o.o_orderdate, l.l_shipdate) AS days_to_ship,
           CAST(extract(year FROM o.o_orderdate) AS INT) AS order_year,
           CAST(extract(month FROM o.o_orderdate) AS INT) AS order_month,
           CAST(dayofweek(o.o_orderdate) + 1 AS INT) AS order_dow
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey AND l.l_linenumber = 1
    WHERE o.o_orderkey <= 1000
    """,
)
def order_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: interval add, day diff, calendar field extraction
    (dow aligned to Spark's 1=Sunday convention in the oracle)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderkey",
            F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("due_date"),
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("days_to_ship"),
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofweek("o_orderdate").alias("order_dow"),
        )
    )


@query(
    "price_quantiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median, p90) per return flag —
    Spark's percentile() matches DuckDB's quantile_cont interpolation;
    rounded to 4 decimals to absorb last-ulp formula differences.

    SCALE NOTE: exact percentile() buffers every value of a group on one
    executor; safe here and at moderate group sizes, but a hot group at
    100x is a memory hazard — price_quantiles_approx is the documented
    scale path (see SCALING.md)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "price_quantiles_approx",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_rows,
           TRUE AS median_bound_ok, TRUE AS p90_bound_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def price_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile scale twin of price_quantiles: Greenwald-Khanna
    sketch at accuracy 10000 (rank error <= n/10000) keeps O(accuracy)
    state per group with map-side partial merge — no per-group value
    buffering, so a hot l_returnflag group cannot OOM an executor at
    100x.

    The sketch VALUE is partition-dependent by measurement (r11: the
    group-A sf0.01 median reads 52832.76 under the normal and adversarial
    sessions but 52826.91 after repartition(13)), so neither an oracle nor
    a pin can check it directly. What the sketch actually PROMISES is the
    rank-error bound — so this query emits that claim as an exact boolean
    (r13 verdict ask #3): a second map-side-combined pass counts, per
    group, how many values fall <=/< the sketch's answer (its exact rank
    interval [rank_lt+1, rank_le]), and `*_bound_ok` asserts that interval
    intersects [(q-eps)n - 1, (q+eps)n + 1] (eps = 1/accuracy; +-1 for
    floor/ceil slack at group boundaries). The estimator stays
    approximate; the claim about it is deterministic — TRUE under any
    partitioning iff the GK guarantee holds — and the DuckDB oracle
    asserts the same booleans from the guarantee side, making the row
    hash-exact. The second pass broadcasts the 3-row sketch frame: two
    sequential scans, zero value buffering — the scale posture is
    unchanged."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    approx = li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("__m"),
        F.expr("approx_percentile(l_extendedprice, 0.9, 10000)").alias("__p"),
    )
    eps = 1.0 / 10000.0
    agg = (
        li.join(F.broadcast(approx), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("__m"), 1).otherwise(0)
            ).alias("__m_le"),
            F.sum(
                F.when(F.col("l_extendedprice") < F.col("__m"), 1).otherwise(0)
            ).alias("__m_lt"),
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("__p"), 1).otherwise(0)
            ).alias("__p_le"),
            F.sum(
                F.when(F.col("l_extendedprice") < F.col("__p"), 1).otherwise(0)
            ).alias("__p_lt"),
        )
    )

    def _bound_ok(le: str, lt: str, q: float) -> F.Column:
        lo = F.floor((F.lit(q) - F.lit(eps)) * F.col("n_rows")) - F.lit(1)
        hi = F.ceil((F.lit(q) + F.lit(eps)) * F.col("n_rows")) + F.lit(1)
        return (F.col(le) >= lo) & ((F.col(lt) + F.lit(1)) <= hi)

    return agg.select(
        "l_returnflag",
        "n_rows",
        _bound_ok("__m_le", "__m_lt", 0.5).alias("median_bound_ok"),
        _bound_ok("__p_le", "__p_lt", 0.9).alias("p90_bound_ok"),
    )


@query(
    "price_quantiles_histogram",
    oracle="""
    WITH hist AS (
      SELECT CAST(FLOOR(o_totalprice / 500.0) AS BIGINT) AS bin, COUNT(*) AS cnt
      FROM orders GROUP BY 1
    ), c AS (
      SELECT bin, cnt,
             SUM(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER () AS n
      FROM hist
    ), q(q100) AS (VALUES (25), (50), (75), (90), (99))
    SELECT q100,
           CAST(MIN(bin) * 500.0 AS DOUBLE) AS est_quantile,
           CAST(MAX(n) AS BIGINT) AS n_rows
    FROM c JOIN q ON c.cum * 100 >= q.q100 * c.n
    GROUP BY q100
    """,
)
def price_quantiles_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin histogram quantile sketch: the third quantile tier next
    to exact percentile() (buffers groups) and approx_percentile (GK
    sketch, engine-opaque, rows-only check). Absolute 500-unit bins make
    the sketch STATE engine-portable, so this APPROXIMATE quantile path
    gets a hash-exact oracle — same philosophy as kmv_distinct_users.

    Mergeable by counter addition (bins are absolute, not data-dependent
    — no min/max pre-pass, so partitions/streams/days merge by summing
    bin counts); estimate = lower edge of the first bin whose cumulative
    count reaches ceil(q*n), with the rank test division-free
    (cum*100 >= q100*n, integer-exact). The unpartitioned windows run
    over the AGGREGATED bin frame (<= value_range/500 rows regardless of
    input rows); the quantile probe is a 5-literal-row broadcast against
    that frame."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    hist = (
        o.select(F.floor(F.col("o_totalprice") / F.lit(500.0)).cast("long").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # single-group partition key via a NON-FOLDABLE zero (bin*0): a plain
    # lit(0) is constant-folded out of the window spec and Spark then logs
    # the no-partition WindowExec warning on every task; bin*0 survives
    # optimization, costs nothing, and the frame is the aggregated bins
    # (bounded by value range / 500) either way
    zero = F.col("bin") * F.lit(0)
    wcum = (
        Window.partitionBy(zero)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = hist.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(zero))
    )
    qs = spark.createDataFrame([(25,), (50,), (75,), (90,), (99,)], "q100 int")
    return (
        c.join(F.broadcast(qs), c.cum * 100 >= qs.q100 * c.n)
        .groupBy("q100")
        .agg(
            (F.min("bin") * F.lit(500.0)).cast("double").alias("est_quantile"),
            F.max("n").alias("n_rows"),
        )
    )


@query(
    "price_quantiles_exact_2pass",
    oracle="""
    WITH vals AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM orders WHERE o_totalprice IS NOT NULL
    ), s AS (
      SELECT v, row_number() OVER (ORDER BY v) AS rn FROM vals
    ), n AS (SELECT COUNT(*) AS n FROM vals)
    SELECT q.q100, CAST(s.v AS DOUBLE) / 100 AS value
    FROM (VALUES (25), (50), (75), (90), (99)) q(q100)
    CROSS JOIN n
    JOIN s ON s.rn = (q.q100 * n.n + 99) // 100
    ORDER BY q.q100
    """,
)
def price_quantiles_exact_2pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fourth quantile leg: EXACT percentiles with no single-executor
    group buffering (operators/quantiles.py two-pass selection — coarse
    bin histogram to the driver, then rank-offset selection inside only
    the target bins). Closes the documented OOM hazard of exact
    percentile() while keeping bit-exact answers; ranks are
    ceil(q*n) via pure integer arithmetic, values decimal-scaled."""
    from etl_poc_spark.operators.quantiles import exact_quantiles_2pass

    o = load_table(spark, sf_dir, "orders")
    return exact_quantiles_2pass(
        o, "o_totalprice", [25, 50, 75, 90, 99], scale=100, bin_width=50_000
    )
