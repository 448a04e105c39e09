"""Relational core: filters, projections, joins, aggregations, sorts, set ops.

Every query here is a lazy DataFrame plan over the parquet fixtures plus an
equivalent DuckDB oracle (SURVEY.md §2.12).  Determinism conventions:

- money sums go through exact DECIMAL and come back as one double cast
  (``functions.numeric.dec_sum``) so results are bit-stable under any
  partitioning — and bit-identical to the oracle's
  ``CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)``;
- every LIMIT/top-k has a total tie-break order (floats alone don't key rows);
- every computed column is aliased identically in plan and oracle (the
  driver's comparator hashes columns by name).

Scale notes are inline per query: which side broadcasts, where the shuffle
lands, and why the plan survives 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lms_etl_pipeline_spark.functions.numeric import (
    dec,
    dec_sum,
    hl_double,
    hl_round4,
    hl_sums,
    units,
)
from lms_etl_pipeline_spark.operators.rank import global_ntile
from lms_etl_pipeline_spark.plans.catalog import query
from lms_etl_pipeline_spark.sources.tables import load_table

# Exact-decimal per-row revenue: extendedprice * (1 - discount).  Decimal
# multiply is exact (scale 4+4=8 digits), so partial/final agg order can't
# change the result.
_REVENUE_SQL = "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"


def _revenue() -> F.Column:
    """Decimal reference form of the revenue product — the semantics the
    unit fast path ``_rev6`` must reproduce (kept as the executable
    definition the conventions test pins against; hot paths use _rev6)."""
    return dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))


def _rev6() -> F.Column:
    """Scale-6 BIGINT revenue units: cents(price) x (10000 - bp(discount)).

    Value-identical to ``_revenue()`` (the fixtures' prices are exact cents,
    discounts exact basis points — see ``functions.numeric.units``), but a
    single long multiply per row instead of a BigDecimal scale-8 multiply
    with ANSI overflow checks: measured 2.8x faster on the q1 scan task —
    a per-core gain.  SUM CAPACITY IS NOT UNLIMITED: a direct SUM of
    scale-6 units (~1e11/row max) overflows int64 — and ANSI-aborts — at
    ~9e7 rows per group (whole-table TPC-H groups: sf~150), so every
    fact-table sum of this product over UNBOUNDED groups goes through
    ``hl_sums``' hi/lo split (capacity ~9e12 rows/group, sf~6e6);
    finalizers rebuild the exact sum in double and divide once
    (single-rounding discipline, value-identical to the unsplit formulas
    while the sum < 2^53 — the decimal convention's own exactness
    envelope).  See q1's comment block for the per-measure rounding
    decompositions.  Direct ``F.sum(_rev6())`` remains ONLY where the
    group key bounds the group at any SF (q3 per order ~7 rows, q10 per
    customer, q15 per supplier, q11 per part — fixed fan-out ratios in
    the schema), where the unsplit sum is exact and abort-free forever.
    """
    return units("l_extendedprice", 2) * (F.lit(10000) - units("l_discount", 4))


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM({_REVENUE_SQL}), 4) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(6,4)))
                    * (1 + CAST(l_tax AS DECIMAL(6,4)))), 4) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy partial+final hash aggregation.

    Scale: the filter and the 7-column projection push into the parquet scan;
    the shuffle moves only ~|groups| * partial-state rows (4 groups here), so
    the plan is scan-bound at any SF — exactly what you want at 100 TB.

    Measured floor note (local[32], sf0.1): the fixture is ONE file with ONE
    row group, so scan + partial agg serialize on one core; an explicit
    repartition does NOT help — the single scan task then pays the same
    cost as shuffle write.  The fix is data layout (more row groups /
    files — see ``sources.parquet_io``), never a plan change; at real
    scale the layout provides the parallelism.  Within that single task,
    integer-unit aggregation (see ``_rev6``/``units``) cut the stage from
    ~1.4 s to ~0.5 s — per-core arithmetic cost, which survives at any
    layout.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # Integer-unit formulation (value-identical to the decimal oracle; see
    # _rev6/units): q/p/d as scale-4 bigints, revenue m at scale 6, charge c
    # at scale 10 = cents x (1-d) x (1+t) basis points — exactly the
    # oracle's (12,2)x(6,4)x(6,4) decimal product.  Every money sum rides
    # the hi/lo split (functions.numeric.hl_sums): summing p4 (~1e9/row),
    # m6 (~1e11/row), or c10 (~1e15/row) directly would overflow int64 —
    # and ABORT under ANSI — at whole-table group sizes of sf~6000, sf~150,
    # and sf~8 respectively; split, every part-sum is safe past sf~6e6.
    # c10 splits THREE ways (1e12/1e6/1): its mid digits are themselves a
    # second hl_sums over the scale-10 value's 1e6-quotient.
    # Finalizers reconstruct each exact sum in ONE double expression and
    # divide ONCE (single-rounding discipline — bit-identical to the
    # unsplit formulas while the true sum < 2^53, the decimal convention's
    # own exactness envelope):
    #   S(p4)  = 1e6*phi + plo
    #   ROUND(S(m6), 4)-as-scale-4-int = 1e4*mhi + (mlo + 50) DIV 100
    #     [exact: 1e6*mhi is divisible by 100 and mlo >= 0]
    #   S(c10) = 1e12*chhi + 1e6*chlo + clo, so its scale-4 half-up round
    #     is 1e6*chhi + chlo + (clo + 5e5) DIV 1e6.
    u = li.filter(
        F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp")
    ).select(
        "l_returnflag",
        "l_linestatus",
        units("l_quantity", 4).alias("q4"),
        units("l_extendedprice", 4).alias("p4"),
        units("l_discount", 4).alias("d4"),
        _rev6().alias("m6"),
        (_rev6() * (F.lit(10000) + units("l_tax", 4))).alias("c10"),
    )
    return (
        u.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("q4").alias("sq4"),
            F.count("q4").alias("nq"),
            *hl_sums("p4", "p", non_negative=True),
            F.count("p4").alias("np"),
            *hl_sums("m6", "m", non_negative=True),
            *hl_sums("c10 DIV 1000000", "ch", non_negative=True),
            F.expr("SUM(c10 % 1000000)").alias("clo"),
            F.sum("d4").alias("sd4"),
            F.count("d4").alias("nd"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.expr("sq4 / 10000.0D").alias("sum_qty"),
            F.expr(hl_double("p", 4)).alias("sum_base_price"),
            F.expr(hl_round4("m")).alias("sum_disc_price"),
            F.expr(
                "(chhi * 1000000.0D + chlo + (clo + 500000) DIV 1000000) / 10000.0D"
            ).alias("sum_charge"),
            F.expr("sq4 / 10000.0D / nq").alias("avg_qty"),
            F.expr(f"{hl_double('p', 4)} / np").alias("avg_price"),
            F.expr("sd4 / 10000.0D / nd").alias("avg_disc"),
            "count_order",
        )
    )


@query(
    "agg_distinct_counts",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation: Spark expands COUNT(DISTINCT) into a two-phase
    partial-distinct plan automatically; no row explosion at scale."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
            dec_sum("o_totalprice", "sum_price"),
        )
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — subtotals + grand total in one shuffle.
    Quantity sums ride the integer-unit fast path (``units``; exact for
    the ≤4-dp domain, single long add per row vs a decimal accumulate).

    DOCUMENTED ENGINE DIVERGENCE on zero-row input: the SQL standard (and
    DuckDB/PostgreSQL) emit the () grand-total grouping-set row even over
    an empty table; Spark returns an empty result.  Pinned by
    tests/test_empty_fixture.py; see tools/make_sf0.py."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(units("l_quantity", 4)).alias("q4"), F.count("*").alias("n"))
        .withColumn("sum_qty", F.expr("q4 / 10000.0D"))
        .drop("q4")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM({rev}), 4) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """.format(rev=_REVENUE_SQL),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — all 4 grouping combinations, still one pass."""
    return (
        load_table(spark, sf_dir, "lineitem")
        # hi/lo split: the () grand-total group sums scale-6 revenue over
        # the WHOLE table — a direct int64 sum ANSI-aborts near sf~150
        .withColumn("r6u", _rev6())
        .cube("l_returnflag", "l_linestatus")
        .agg(*hl_sums("r6u", "r", non_negative=True), F.count("*").alias("n"))
        .withColumn(
            "revenue", F.expr(hl_round4("r"))
        )
        .drop("rhi", "rlo")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither pure rollup nor cube)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query("agg_approx_count_distinct", oracle=None)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch — the 100 TB path for distinct counts (constant
    memory vs the exact expansion).  Approximate by design => no SQL oracle;
    driver records the rows-only check."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"))
    )


@query("sketch_hll_partial_merge", oracle=None)
def sketch_hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — THE 100 TB aggregation pattern: build one
    HLL sketch per fine-grained group (nation), then merge sketches up to
    the coarse level (region) with ``hll_union_agg`` instead of rescanning
    the fact table.  At scale the fine sketches are tiny materialized
    aggregates (think: daily partitions) and any rollup — region, week,
    global — is a sketch union, not a second pass over 100 TB.

    Approximate by design (rows-only); exact anchor: the same rollup via
    COUNT(DISTINCT) in ``agg_distinct_counts`` / ``flagship`` family.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per_nation = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", "n_nationkey")
        .agg(F.hll_sketch_agg("c_custkey").alias("sk"))
    )
    return (
        per_nation.groupBy("n_regionkey")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_customers"))
    )


@query("sample_stratified_by_priority", oracle=None)
def sample_stratified_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-key fraction) sampling via ``sampleBy`` — quota
    sampling for building eval sets from skewed strata without a full
    shuffle (per-row Bernoulli keyed on the stratum, seeded).  Seeded but
    engine-specific randomness => rows-only; the sibling ``sample_fraction``
    documents the same contract for uniform sampling."""
    o = load_table(spark, sf_dir, "orders")
    fractions = {"1-URGENT": 0.2, "2-HIGH": 0.1, "3-MEDIUM": 0.05}
    return o.sampleBy("o_orderpriority", fractions, seed=42).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )


@query(
    "agg_incremental_merge",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a 'yesterday' partial aggregate
    merged with a 'today' delta batch's partial — proven identical to
    recomputing over the full table (the oracle).  The decomposable-state
    pattern (count→sum, sum→sum, max→max; exact DECIMAL partials so merge
    order can't leak) is what lets a 100 TB rollup absorb a daily delta by
    touching only the delta + the stored partials, never the history.
    """
    o = load_table(spark, sf_dir, "orders")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count("*").alias("n_orders"),
            F.sum(dec("o_totalprice")).alias("_sum_dec"),
            F.max("o_totalprice").alias("max_price"),
        )

    base = partial(o.filter(F.col("o_orderkey") % 10 != 0))  # stored rollup
    delta = partial(o.filter(F.col("o_orderkey") % 10 == 0))  # today's batch
    return (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("_sum_dec").cast("double").alias("total_price"),
            F.max("max_price").alias("max_price"),
        )
        .select("o_orderpriority", "n_orders", "total_price", "max_price")
    )


@query(
    "agg_min_max_by",
    oracle="""
    SELECT o_orderpriority,
           (MIN({'p': o_totalprice, 'k': o_orderkey})).k AS cheapest_order,
           (MAX({'p': o_totalprice, 'k': o_orderkey})).k AS priciest_order,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (argmin/argmax) aggregates — one pass, no self-join.

    Tie-DETERMINISTIC: the argmin/argmax runs over the lexicographic
    (price, orderkey) struct, so among equally-cheap orders the lowest
    orderkey wins and among equally-pricey orders the highest — a total
    order with no choice left to the engine.  (Found by the ~sf1
    adversarial sweep: replicated data makes extreme-price ties real, and
    a bare min_by/max_by then diverges between engines.)  Same plan as
    the bare form: one partial+final aggregate, struct comparison is
    codegen'd.
    """
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.min(F.struct(F.col("o_totalprice").alias("p"),
                           F.col("o_orderkey").alias("k")))["k"]
            .alias("cheapest_order"),
            F.max(F.struct(F.col("o_totalprice").alias("p"),
                           F.col("o_orderkey").alias("k")))["k"]
            .alias("priciest_order"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@query(
    "agg_stats_exact",
    oracle="""
    WITH m AS (
      SELECT c_nationkey,
             COUNT(*) AS n,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4)) * CAST(c_acctbal AS DECIMAL(18,4)))
                  AS DOUBLE) AS s2
      FROM customer GROUP BY c_nationkey
    )
    SELECT c_nationkey, n,
           ROUND(s1 / n, 6) AS mean_bal,
           ROUND((s2 - s1 * s1 / n) / (n - 1), 6) AS var_bal,
           ROUND(SQRT((s2 - s1 * s1 / n) / (n - 1)), 6) AS std_bal
    FROM m WHERE n > 1
    """,
)
def agg_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic variance/stddev from exact decimal moments.

    Built-in ``stddev`` streams floating-point state whose value depends on
    partition merge order — fine statistically, wrong for differential
    testing and bit-reproducibility.  Computing the (exact, order-free)
    decimal moments S1/S2 first and deriving var/std with a fixed handful
    of IEEE ops makes the result identical on every engine and every
    partitioning.  Same shuffle cost as the built-in (one partial+final agg).
    """
    c = load_table(spark, sf_dir, "customer")
    m = c.groupBy("c_nationkey").agg(
        F.count("*").alias("n"),
        F.sum(dec("c_acctbal")).cast("double").alias("s1"),
        F.sum(dec("c_acctbal") * dec("c_acctbal")).cast("double").alias("s2"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    return m.filter(F.col("n") > 1).select(
        "c_nationkey",
        "n",
        F.round(F.col("s1") / F.col("n"), 6).alias("mean_bal"),
        F.round(var, 6).alias("var_bal"),
        F.round(F.sqrt(var), 6).alias("std_bal"),
    )


@query(
    "agg_percentiles_exact",
    oracle="""
    SELECT o_orderpriority,
           ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS p50_price,
           ROUND(QUANTILE_CONT(o_totalprice, 0.9), 4) AS p90_price,
           ROUND(QUANTILE_CONT(o_totalprice, 0.99), 4) AS p99_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (PERCENTILE_CONT semantics) per group.

    Spark's ``percentile`` sorts within the aggregation buffer and linearly
    interpolates at rank (n-1)*p — the same definition DuckDB's
    QUANTILE_CONT uses, so results match to the last interpolation ulp;
    one ROUND(4) on both sides absorbs it.  The scale path for percentiles
    over billions of rows is ``approx_percentile`` (t-digest sketch, fixed
    memory, mergeable partials); this exact query is its correctness
    anchor, same pattern as approx_count_distinct / agg_distinct_counts.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99_price"),
    )


@query(
    "agg_approx_percentiles",
    oracle=None,  # t-digest sketch: engine-specific; exact anchor = agg_percentiles_exact
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (fixed-memory mergeable sketch) — the 100 TB
    percentile path; rows-only checked, anchored by agg_percentiles_exact."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("approx_percentile(o_totalprice, 0.5, 10000)"), 4).alias("p50_price"),
        F.round(F.expr("approx_percentile(o_totalprice, 0.9, 10000)"), 4).alias("p90_price"),
    )


@query(
    "agg_salted_skew",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-stage aggregation, differentially proven identical
    to the plain ``GROUP BY``.

    ``o_orderpriority`` has 5 values, so a naive groupBy funnels ~20% of the
    table into each of 5 reducers no matter how many executors exist.
    ``operators.skew.salted_agg`` pre-aggregates on (key, salt) — spreading
    every hot key over n=8 reducers — then combines the ≤8 exact-decimal
    partials per key.  Decimal partial sums make the two-stage result
    bit-identical to the one-stage oracle regardless of salt assignment.
    """
    from lms_etl_pipeline_spark.operators.skew import salted_agg

    o = load_table(spark, sf_dir, "orders")
    out = salted_agg(
        o,
        ["o_orderpriority"],
        {
            "n_orders": (F.count("*"), "sum"),
            "total_price": (F.sum(dec("o_totalprice")), "sum"),
        },
        n=8,
    )
    return out.select(
        "o_orderpriority",
        "n_orders",
        F.col("total_price").cast("double").alias("total_price"),
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT o_custkey,
           ARRAY_TO_STRING(LIST(o_orderkey ORDER BY o_orderkey), ',') AS order_keys,
           COUNT(*) AS n_orders
    FROM orders
    WHERE o_custkey < 50
    GROUP BY o_custkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: per-customer order-key list.  ``collect_list`` is
    shuffle-order-nondeterministic, so the engine convention is an explicit
    ``array_sort`` on top — reproducible AND comparable across engines.
    The list is serialized with ``array_join`` because the driver's
    pandas-based comparator cannot hash raw array cells (round-2 crash)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 50)
        .groupBy("o_custkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("o_orderkey")), ",").alias("order_keys"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "events_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, TIME_BUCKET(INTERVAL '1 day', MIN(ts)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             DATE_DIFF('day', f.cohort_day, TIME_BUCKET(INTERVAL '1 day', e.ts)) AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT f.cohort_day,
           CAST(a.day_offset AS INTEGER) AS day_offset,
           COUNT(*) AS n_active
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    WHERE a.day_offset <= 7
    GROUP BY 1, 2
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, activity counted
    per day-offset (the product-analytics staple).  Two aggregations + one
    equi-join on user_id; the cohort table is user-cardinality (small
    relative to events) and broadcastable at scale."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.date_trunc("day", F.min("ts")).alias("cohort_day"))
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.date_trunc("day", "ts"), F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_active"))
    )


@query("sample_fraction", oracle=None)
def sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sampling with a fixed seed (reproducible within Spark for a
    fixed partitioning; engine-specific RNG => rows-only check).  At scale a
    sample is a scan-time coin flip — no shuffle, no materialization."""
    return (
        load_table(spark, sf_dir, "orders")
        .sample(fraction=0.1, seed=42)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "distinct_projection",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = groupBy on all projected columns (hash, partial+final)."""
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------------------
# Filters / projections
# ---------------------------------------------------------------------------


@query(
    "filter_project_casts",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue,
           CASE WHEN l_quantity >= 30 THEN 'bulk' WHEN l_quantity >= 10 THEN 'mid' ELSE 'small' END AS qty_band,
           TRY_CAST(l_returnflag AS INTEGER) AS rf_int,
           CAST(l_quantity AS BIGINT) AS qty_int
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def filter_project_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive filter + expression projection + try_cast null-on-error.

    Scale: all four predicates and the 6-column read schema push into the
    parquet scan (PushedFilters in explain); revenue is computed in exact
    decimal then canonicalized via ROUND(..,4)→DOUBLE so both engines emit
    the identical IEEE value (decimal result *scale* differs between Spark
    and DuckDB, which round-2's driver hashed differently).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).withColumn("__m6", _rev6()).select(
        "l_orderkey",
        "l_linenumber",
        # per-row units finalization: m6 < 1.1e11, so the scale-4 integer
        # stays far below 2^53 and the divide is exact (same convention as
        # the decimal ROUND(..,4)->DOUBLE it replaces)
        F.expr("((__m6 + 50) DIV 100) / 10000.0D").alias("revenue"),
        F.when(F.col("l_quantity") >= 30, "bulk")
        .when(F.col("l_quantity") >= 10, "mid")
        .otherwise("small")
        .alias("qty_band"),
        F.col("l_returnflag").try_cast("int").alias("rf_int"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
    )


@query(
    "null_handling",
    oracle="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'N/A') AS seg_or_na,
           (c_acctbal IS NULL) AS bal_missing,
           IFNULL(TRY_CAST(NULLIF(c_name, c_name) AS DOUBLE), -1.0) AS always_fallback
    FROM customer
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalar surface: coalesce / nullif / isnull / ifnull."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("N/A")).alias("seg_or_na"),
        F.isnull("c_acctbal").alias("bal_missing"),
        F.ifnull(F.nullif("c_name", "c_name").try_cast("double"), F.lit(-1.0)).alias(
            "always_fallback"
        ),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "flagship_regional_revenue",
    oracle=f"""
    SELECT r.r_name,
           CAST(ROUND(SUM({_REVENUE_SQL}), 4) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY r.r_name
    """,
)
def flagship_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (SURVEY §7 milestone 0): fact-fact shuffle join + broadcast
    dimension chain + hash agg.

    Scale: lineitem⋈orders shuffles on orderkey (the one unavoidable big
    shuffle); customer/nation/region are broadcast so the dimension chain
    adds zero shuffles.  The date filter prunes orders before the join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        # hi/lo split: 5 region groups of scale-6 revenue ANSI-abort near
        # sf~800 unsplit (functions.numeric.units)
        .withColumn("r6u", _rev6())
        .groupBy("r_name")
        .agg(*hl_sums("r6u", "r", non_negative=True), F.count("*").alias("n_items"))
        .select(
            "r_name",
            F.expr(hl_round4("r")).alias(
                "revenue"
            ),
            "n_items",
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(ROUND(SUM({_REVENUE_SQL}), 4) AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension filter -> two joins -> agg ->
    top-10.  Scale: the segment filter cuts customer ~1/5 before its join;
    lineitem⋈orders shuffles on orderkey; final ordering is a driver-side
    merge of 10-row heaps (TakeOrderedAndProject)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_rev6()).alias("r6"))
        .select(
            "l_orderkey",
            F.expr("((r6 + 50) DIV 100) / 10000.0D").alias("revenue"),
            "o_orderdate",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(ROUND(SUM({_REVENUE_SQL}), 4) AS DOUBLE) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, one quarter.
    The returnflag filter pushes into the lineitem scan; nation broadcasts;
    top-20 avoids a global sort."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev6()).alias("r6"))
        .withColumn("revenue", F.expr("((r6 + 50) DIV 100) / 10000.0D"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(YEAR(o.o_orderdate) AS INTEGER) AS o_year,
           n2.n_name AS supp_nation,
           CAST(ROUND(SUM({_REVENUE_SQL}), 4) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN region r   ON n1.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    WHERE r.r_name = 'ASIA'
      AND p.p_type = 'STANDARD'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-relation join (nation twice) with selective
    filters on three different dimensions.  The part filter is
    ``p_type = 'STANDARD'`` (the fixtures use single-word p_type values;
    TPC-H's '%BRASS%' selected nothing, making round-2's green vacuous).

    Scale: Catalyst orders the joins; every dimension (customer excepted)
    broadcasts, so the only shuffles are lineitem⋈orders on orderkey and
    the final 2-key aggregation.  The p_type LIKE filter prunes part
    before its broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .withColumn("r6u", _rev6())
        .groupBy(F.year("o_orderdate").alias("o_year"), "supp_nation")
        .agg(*hl_sums("r6u", "r", non_negative=True), F.count("*").alias("n_items"))
        .withColumn(
            "revenue", F.expr(hl_round4("r"))
        )
        .drop("rhi", "rlo")
    )


@query(
    "join_inner_orders_customer",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 400000
    """,
)
def join_inner_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join; the selective fact-side filter is applied pre-join."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "join_left_outer_counts",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping order-less customers (NULL-safe COUNT/SUM)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_spend"),
        )
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT k.key_nation AS nationkey,
           c.n_cust, s.n_supp
    FROM (SELECT DISTINCT c_nationkey AS key_nation FROM customer
          UNION SELECT DISTINCT s_nationkey FROM supplier) k
    LEFT JOIN (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
           ON k.key_nation = c.c_nationkey
    LEFT JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
           ON k.key_nation = s.s_nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-nation customer vs supplier counts."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_supp"))
    )
    joined = c.join(s, c.c_nationkey == s.s_nationkey, "full")
    return joined.select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"), "n_cust", "n_supp"
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with at least one big order.  Semi joins
    never duplicate the left side — no fan-out at scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no URGENT order.  (Every fixture
    customer has *some* order, so the classic never-ordered anti-join
    matched on 0=0 rows — vacuous; the priority filter makes the check
    exercise real tuples at sf0.01.)"""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_nonequi_range",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_partkey, p.p_size,
           CAST(l.l_quantity AS BIGINT) AS qty
    FROM lineitem l JOIN part p
      ON l.l_partkey = p.p_partkey
     AND l.l_quantity BETWEEN p.p_size - 2 AND p.p_size + 2
    WHERE p.p_brand = 'Brand#11'
    """,
)
def join_nonequi_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + range residual (theta) predicate evaluated inside the join.

    Scale: the equi component keeps this a hash join (the residual is a
    post-probe filter), so it does NOT degrade to a nested-loop cross.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    return li.join(
        F.broadcast(p),
        (li.l_partkey == p.p_partkey)
        & li.l_quantity.between(p.p_size - 2, p.p_size + 2),
    ).select(
        "l_orderkey",
        "l_linenumber",
        "p_partkey",
        "p_size",
        F.col("l_quantity").cast("bigint").alias("qty"),
    )


@query(
    "join_broadcast_dim_agg",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_balance,
           COUNT(*) AS n_cust
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_broadcast_dim_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join on a dimension: zero shuffle for the join
    itself (only the final agg shuffles, on 25 keys)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(dec_sum("c_acctbal", "total_balance"), F.count("*").alias("n_cust"))
    )


@query(
    "join_asof_last_click",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts,
           c.ts AS asof_ts, c.click_id
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the same user's most recent
    click at-or-before it (attribution's core primitive).

    Implementation is the union-sort-window idiom (operators.temporal):
    ONE shuffle on user_id + per-key sort — same cost as a sort-merge
    join, no range-candidate explosion.  The right side is deduped on
    (key, ts) first so ties are deterministic on both engines.
    """
    from lms_etl_pipeline_spark.operators.temporal import asof_join

    e = load_table(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    return asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts", value_cols=["click_id"]
    )


@query(
    "join_interval_events",
    oracle="""
    SELECT err.event_id, err.user_id,
           COUNT(act.event_id) AS nearby_actions
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') err
    LEFT JOIN (SELECT event_id, user_id, ts FROM events
               WHERE event_type IN ('click', 'view')) act
      ON act.user_id = err.user_id
     AND act.ts BETWEEN err.ts - INTERVAL 5 MINUTE AND err.ts + INTERVAL 5 MINUTE
    GROUP BY err.event_id, err.user_id
    """,
)
def join_interval_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join on event time: activity within ±5 minutes of
    each error, per user.  The equi key keeps this a hash join with the
    time band as a residual predicate — never a nested loop (pinned in
    tests/test_plan_shapes.py)."""
    from lms_etl_pipeline_spark.operators.temporal import interval_join_condition

    e = load_table(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("user_id").alias("err_user"), F.col("ts").alias("err_ts")
    )
    act = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("act_id"), F.col("user_id").alias("act_user"), F.col("ts").alias("act_ts")
    )
    cond = interval_join_condition(
        F.col("err_user"), F.col("act_user"), F.col("err_ts"), F.col("act_ts"), "5 minutes"
    )
    return (
        err.join(act, cond, "left")
        .groupBy(F.col("err_id").alias("event_id"), F.col("err_user").alias("user_id"))
        .agg(F.count("act_id").alias("nearby_actions"))
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k
# ---------------------------------------------------------------------------


@query(
    "sort_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 15
    """,
)
def sort_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans this as TakeOrderedAndProject — each task
    keeps a k-row heap, the driver merges k*tasks rows; no full sort at
    scale.  o_orderkey tie-break makes the k-th row deterministic."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(15)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "sort_multi_key",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_acctbal < 0
    ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey ASC
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort (range-partitioned exchange at scale)."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .orderBy(F.col("c_mktsegment").asc(), F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE p.p_size <= 10
      AND l.l_extendedprice = (SELECT MIN(l2.l_extendedprice) FROM lineitem l2
                               WHERE l2.l_partkey = p.p_partkey)
    GROUP BY 1, 2, 3, 4
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part minimum-price supplier via a correlated
    scalar subquery.  Catalyst decorrelates into an aggregate + join —
    verified to run as two hash joins, never per-row re-execution."""
    for name in ("part", "lineitem", "supplier"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"{name}_q2")
    return spark.sql(
        """
        SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal
        FROM part_q2 p
        JOIN lineitem_q2 l ON l.l_partkey = p.p_partkey
        JOIN supplier_q2 s ON l.l_suppkey = s.s_suppkey
        WHERE p.p_size <= 10
          AND l.l_extendedprice = (SELECT MIN(l2.l_extendedprice) FROM lineitem_q2 l2
                                   WHERE l2.l_partkey = p.p_partkey)
        GROUP BY 1, 2, 3, 4
        """
    )


@query(
    "q16_supplier_cnt_excluding",
    oracle="""
    SELECT p.p_brand, p.p_type, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#11'
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2
    """,
)
def q16_supplier_cnt_excluding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-count with a NOT IN exclusion subquery
    (planned as a null-aware anti join — the correctness-subtle join type)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#11")
    li = load_table(spark, sf_dir, "lineitem")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY 1
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
    FROM orders o
    JOIN big ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2, 3, 4
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a HAVING
    threshold, re-joined for detail — aggregate-as-semi-join-filter."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(units("l_quantity", 4)).alias("q4"))
        .filter(F.col("q4") > 150 * 10000)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum(units("l_quantity", 4)).alias("q4"))
        .withColumn("total_qty", F.expr("q4 / 10000.0D"))
        .drop("q4")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue_delta,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive predicates + one global
    aggregate — the pushdown-efficiency benchmark (every predicate reaches
    the parquet reader; zero joins, zero group keys).

    The price x discount product is a 6-dp value, so the scale-6 unit sum
    is the exact rational the oracle's DECIMAL(38,8)->DOUBLE cast rounds;
    one exact int->double divide lands on the same correctly-rounded
    double while keeping the hot path in long arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        # hi/lo split (see hl_sums): a direct scale-6 sum overflows int64 —
        # and ANSI-aborts — near sf~8000 of filtered rows; split, both
        # part-sums are safe past sf~6e6.  The finalizer rebuilds the exact
        # sum in double and divides ONCE (bit-identical to r6/1e6 while the
        # sum < 2^53).
        .select((units("l_extendedprice", 2) * units("l_discount", 4)).alias("r6u"))
        .agg(
            *hl_sums("r6u", "r", non_negative=True),
            F.count("*").alias("n_items"),
        )
        .select(
            F.expr(hl_double("r", 6)).alias("revenue_delta"),
            "n_items",
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(ROUND(SUM({_REVENUE_SQL}), 4) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate -> max-of-aggregate scalar subquery ->
    join back (the 'view' query).  The 1-row max broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_rev6()).alias("r6"))
        .withColumn("total_revenue", F.expr("((r6 + 50) DIV 100) / 10000.0D"))
        .drop("r6")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.mx)
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT CAST(ROUND(SUM({_REVENUE_SQL}), 4) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs residual over a join.  The optimizer
    extracts the common sub-predicates it can (brand IN (...) pushes to the
    part scan); the full disjunction evaluates as a join residual."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (p.p_brand == "Brand#11") & p.p_size.between(1, 15) & li.l_quantity.between(1, 20)
    ) | (
        (p.p_brand == "Brand#22") & p.p_size.between(10, 30) & li.l_quantity.between(10, 30)
    ) | (
        (p.p_brand == "Brand#33") & p.p_size.between(20, 50) & li.l_quantity.between(20, 40)
    )
    return (
        li.join(F.broadcast(p), (p.p_partkey == li.l_partkey) & cond)
        .withColumn("r6u", _rev6())
        .agg(*hl_sums("r6u", "r", non_negative=True), F.count("*").alias("n_items"))
        .withColumn(
            "revenue", F.expr(hl_round4("r"))
        )
        .drop("rhi", "rlo")
    )


@query(
    "q12_shipmode_priority",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional-sum pivot over a fact-fact join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_share",
    oracle=f"""
    SELECT CAST(ROUND(100.0 * SUM(CASE WHEN p.p_type LIKE 'PROMO%%'
                         THEN {_REVENUE_SQL} ELSE CAST(0 AS DECIMAL(18,4)) END), 4) AS DOUBLE)
           / CAST(ROUND(SUM({_REVENUE_SQL}), 4) AS DOUBLE) AS promo_revenue_pct,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — conditional decimal sums on a
    broadcast-joined month slice, one division at the end."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.col("p_type").like("PROMO%")
    # Unit algebra: numerator value x100 at scale 4 is exactly the scale-6
    # unit sum N6 (ROUND((N6*100 + 50) DIV 100, 4) == N6), so the rounded
    # numerator double is N6/1e4; the denominator follows the standard
    # half-up finalization.  Both sides reproduce the oracle's
    # ROUND->DOUBLE values bit-exactly before the one double division.
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .withColumn("r6u", _rev6())
        .withColumn("p6u", F.when(promo, F.col("r6u")).otherwise(F.lit(0)))
        .agg(
            *hl_sums("p6u", "n", non_negative=True),
            *hl_sums("r6u", "d", non_negative=True),
            F.count("*").alias("n_items"),
        )
        .select(
            F.expr(f"{hl_double('n', 4)} / {hl_round4('d')}").alias("promo_revenue_pct"),
            "n_items",
        )
    )


@query(
    "join_null_safe",
    oracle="""
    WITH l AS (SELECT event_id, NULLIF(event_type, 'error') AS et FROM events WHERE event_id % 20 = 0),
         r AS (SELECT DISTINCT NULLIF(event_type, 'error') AS et FROM events)
    SELECT l.event_id, l.et
    FROM l JOIN r ON l.et IS NOT DISTINCT FROM r.et
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match each other — still a hash join (NULL hashes like any value under
    null-safe equality), unlike `=` which drops NULL rows."""
    e = load_table(spark, sf_dir, "events")
    l = e.filter(F.col("event_id") % 20 == 0).select(
        "event_id", F.nullif("event_type", F.lit("error")).alias("et")
    )
    r = e.select(F.nullif("event_type", F.lit("error")).alias("et")).distinct()
    return l.join(r, l.et.eqNullSafe(r.et)).select(l.event_id, l.et.alias("et"))


@query(
    "explode_outer_arrays",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(SUBSTRING(text, 1, 40), '\s+'), x -> x != '')
               AS toks
      FROM documents WHERE doc_id % 25 = 0
    )
    SELECT doc_id,
           CASE WHEN LEN(toks) = 0 THEN NULL ELSE UNNEST(CASE WHEN LEN(toks) = 0 THEN [NULL] ELSE toks END) END AS tok
    FROM t
    """,
)
def explode_outer_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with empty arrays survive as a NULL row (the
    left-join flavor of flattening — plain explode silently drops them)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    toks = F.filter(F.split(F.substring("text", 1, 40), r"\s+"), lambda t: t != F.lit(""))
    return d.select("doc_id", F.explode_outer(toks).alias("tok"))


@query(
    "timeseries_gap_fill",
    oracle="""
    WITH hours AS (
      SELECT user_id,
             UNNEST(GENERATE_SERIES(TIME_BUCKET(INTERVAL '1 hour', MIN(ts)),
                                    TIME_BUCKET(INTERVAL '1 hour', MAX(ts)),
                                    INTERVAL 1 HOUR)) AS hour
      FROM events WHERE user_id < 20 GROUP BY user_id
    ),
    actual AS (
      SELECT user_id, TIME_BUCKET(INTERVAL '1 hour', ts) AS hour, COUNT(*) AS n
      FROM events WHERE user_id < 20 GROUP BY 1, 2
    )
    SELECT h.user_id, h.hour, COALESCE(a.n, 0) AS n_events
    FROM hours h LEFT JOIN actual a ON a.user_id = h.user_id AND a.hour = h.hour
    """,
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense time series from sparse events: per-user hourly spine via
    ``sequence`` + explode, left-joined to actual counts (gaps become 0).
    Spine generation is per-group arithmetic — no cross join against a
    calendar table."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    spine = (
        e.groupBy("user_id")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("lo"),
            F.date_trunc("hour", F.max("ts")).alias("hi"),
        )
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
        )
    )
    actual = e.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n")
    )
    return spine.join(actual, ["user_id", "hour"], "left").select(
        "user_id", "hour", F.coalesce("n", F.lit(0)).alias("n_events")
    )


@query(
    "scd2_order_status_history",
    oracle="""
    WITH h AS (
      SELECT o_custkey, o_orderdate, o_orderstatus,
             ROW_NUMBER() OVER w AS rn,
             LEAD(o_orderdate) OVER w AS next_date
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    )
    SELECT o_custkey, o_orderstatus,
           o_orderdate AS valid_from,
           next_date AS valid_to,
           (next_date IS NULL) AS is_current
    FROM h WHERE o_custkey < 100
    """,
)
def scd2_order_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 validity windows: each per-customer order event becomes a
    [valid_from, valid_to) row, the latest marked current — the warehouse
    dimension-history build as ONE window pass (no self-join)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return o.select(
        "o_custkey",
        "o_orderstatus",
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.lead("o_orderdate").over(w).isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "unpivot_measures",
    oracle="""
    SELECT o_orderkey, measure, value FROM (
      SELECT o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS total_price,
             CAST(o_custkey AS DOUBLE) AS cust_key_num
      FROM orders WHERE o_orderkey % 50 = 0
    ) UNPIVOT (value FOR measure IN (total_price, cust_key_num))
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide measures to (key, measure, value) long form —
    plan-time row expansion, no shuffle."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 50 == 0)
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("total_price"),
            F.col("o_custkey").cast("double").alias("cust_key_num"),
        )
    )
    return o.unpivot("o_orderkey", ["total_price", "cust_key_num"], "measure", "value")


@query(
    "subquery_correlated",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice) FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
    """,
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders more than twice their customer's
    average.  Catalyst decorrelates this into an aggregate + join — no
    per-row re-execution (the rewrite the reference's eager model can't do).
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_sq o
        WHERE o_totalprice > 2 * (SELECT AVG(o2.o_totalprice) FROM orders_sq o2
                                  WHERE o2.o_custkey = o.o_custkey)
        """
    )


@query(
    "set_union_all",
    oracle="""
    SELECT * FROM (
      SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    )
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL via unionByName — no shuffle, pure concatenation."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s)


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics) — planned as an aggregate + semi join."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_nationkey < 13
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics) — anti-join under the hood.

    The right side is a filtered supplier subset: in the fixtures every
    customer nation also has a supplier, so the unfiltered difference is
    structurally empty (round-2's 0=0 green exercised nothing)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 13)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)


# ---------------------------------------------------------------------------
# TPC-H shapes, second wave: Q4/Q7/Q9/Q11/Q13/Q17/Q20/Q21/Q22
#
# The fixtures lack partsupp, l_commitdate/l_receiptdate, o_comment and
# c_phone, so each query keeps the REFERENCE OPERATOR SHAPE (EXISTS
# semi-join + agg, nation-pair volume, profit decomposition, HAVING over a
# global scalar, count-distribution, correlated scalar subquery, nested
# semi-join, exists/not-exists chain, anti-join + global-avg subquery) with
# predicates re-expressed over available columns.  Divergences are noted
# per query.
# ---------------------------------------------------------------------------


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join, then a
    low-cardinality aggregation.  (No l_commitdate in the fixtures; the
    "late" predicate becomes ``l_returnflag = 'R'``.)

    Scale: the date filter pushes into the orders scan; the semi join
    shuffles on orderkey and carries no lineitem payload (semi joins emit
    left rows only); the agg state is |priorities| rows."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INTEGER) AS l_year,
           CAST(ROUND(SUM({_REVENUE_SQL}), 4) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between a nation pair, both
    directions, by year.

    Scale: nation broadcasts twice under different aliases; the symmetric
    pair predicate is a residual on the joined row; the only shuffles are
    the two fact-fact joins (lineitem⋈orders, then ⋈customer)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("r6u", _rev6())
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(*hl_sums("r6u", "r", non_negative=True))
        .withColumn(
            "revenue", F.expr(hl_round4("r"))
        )
        .drop("rhi", "rlo")
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation, CAST(YEAR(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(ROUND(SUM({_REVENUE_SQL}
                 - CAST(l.l_quantity AS DECIMAL(12,2)) * CAST(p.p_retailprice AS DECIMAL(12,2))), 4) AS DOUBLE)
             AS sum_profit
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type = 'ECONOMY'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit decomposition (revenue minus cost) by supplier
    nation and order year.  (No partsupp in the fixtures: ps_supplycost is
    replaced by quantity x p_retailprice — same expression shape, exact
    decimal all the way.)

    Scale: part/supplier/nation broadcast; lineitem⋈orders is the one big
    shuffle; the profit expression is per-row codegen with exact decimals,
    summed order-independently."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    # profit units at scale 6: rev6 minus (qty x retailprice), the cost being
    # a scale-4 product of two scale-2 unit casts, promoted x100 to scale 6.
    # Profit can be NEGATIVE; hl_sums' pmod decomposition keeps lo >= 0 and
    # puts the sign in hi, so S = 1e6*phi + plo holds for any sign mix and
    # both part-sums stay int64-safe past sf~3e6 (a direct scale-6 sum
    # ANSI-aborts near sf~6700 at this query's per-(nation,year) grouping).
    # Half-away-from-zero ROUND(S, 4) from the parts, all-integer:
    #   T = floor(S/100) = 1e4*phi + plo DIV 100   [1e6*phi divisible by
    #       100; plo >= 0 so DIV is floor]
    #   r = pmod(S, 100) = plo % 100               [same divisibility]
    #   round(S/100) = T + 1 iff r > 50, or r = 50 and S >= 0 (<=> T >= 0,
    #       since T = floor(S/100)); else T.
    # One exact int -> double divide finalizes — the same single-rounding
    # discipline, value-identical to the old sign-branch formula (pinned by
    # tests/test_numeric_conventions.py on signed .5 boundaries).
    profit6 = _rev6() - units("l_quantity", 2) * units("p_retailprice", 2) * F.lit(100)
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .withColumn("p6u", profit6)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(*hl_sums("p6u", "p"))
        .withColumn("p6t", F.expr("phi * 10000 + plo DIV 100"))
        .withColumn("p6r", F.expr("plo % 100"))
        .withColumn(
            "sum_profit",
            F.expr(
                "(p6t + CASE WHEN p6r > 50 THEN 1"
                " WHEN p6r = 50 AND p6t >= 0 THEN 1 ELSE 0 END) / 10000.0D"
            ),
        )
        .drop("phi", "plo", "p6t", "p6r")
    )


@query(
    "q11_important_values",
    oracle=f"""
    WITH pv AS (
      SELECT l.l_partkey, SUM({_REVENUE_SQL}) AS value_dec
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey < 5
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(ROUND(value_dec, 4) AS DOUBLE) AS part_value
    FROM pv
    WHERE CAST(ROUND(value_dec, 4) AS DOUBLE)
        > (SELECT CAST(ROUND(SUM(value_dec), 4) AS DOUBLE) * 0.001 FROM pv)
    """,
)
def q11_important_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-key value sums kept only when above a fraction
    of the GLOBAL total — a scalar subquery over the same aggregate.
    (partsupp value becomes lineitem revenue per part from low-key-nation
    suppliers.)

    Scale: the per-part aggregate computes once; the global total is a
    1-row reaggregation of it (not a second corpus scan) broadcast into the
    filter.  Both sides canonicalize ROUND(..,4)->DOUBLE before comparing —
    the scale-8 total's scaled integer exceeds 2^53, where raw
    decimal->double conversion diverges between engines."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5)
    pv = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_rev6()).alias("v6"))
    )
    # The global total re-aggregates the per-part unit sums (Σv6 stays well
    # inside int64 through the fixture decades; the value-level exactness
    # envelope is the same 2^53-scaled bound as the decimal convention).
    total = pv.agg(
        (F.expr("((SUM(v6) + 50) DIV 100) / 10000.0D") * F.lit(0.001)).alias("threshold")
    )
    return (
        pv.join(F.broadcast(total))
        .withColumn("part_value", F.expr("((v6 + 50) DIV 100) / 10000.0D"))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts — a left
    outer join with a join-time residual, then two stacked aggregations.
    (o_comment NOT LIKE becomes an o_orderpriority exclusion.)

    Scale: the outer join shuffles on custkey; the first agg reuses that
    partitioning (no extra shuffle); the second agg is |distinct counts|
    rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE) / 7.0
             AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into a grouped aggregate joined back to the
    probe side.

    Scale: the per-part average is |parts| rows (broadcastable); the brand
    filter prunes part before its broadcast; quantities are integral
    doubles, so AVG is exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    per_part = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(per_part), li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        # hi/lo split: scale-4 money sums overflow int64 near sf~6000 of
        # group rows (see functions.numeric.units); split, safe past sf~6e6
        .withColumn("p4u", units("l_extendedprice", 4))
        .agg(
            *hl_sums("p4u", "p", non_negative=True),
            F.count("*").alias("n_lines"),
        )
        # a scale-4 unit sum IS a 4-dp value: ROUND(S,4) is the identity,
        # so the finalization is the exact double rebuild + the same two
        # divides as before (value-identical while the sum < 2^53)
        .select(
            F.expr(f"{hl_double('p', 4)} / 7.0D").alias("avg_yearly"),
            "n_lines",
        )
    )


@query(
    "q20_excess_shippers",
    oracle="""
    SELECT s.s_name, s.s_nationkey
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_name LIKE 'red%'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING SUM(l.l_quantity) > 50
    )
    """,
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-join — suppliers who shipped more than
    a threshold of any filtered part in a year.  (partsupp availability
    becomes shipped-quantity-per-supplier-part.)

    Scale: the inner aggregate groups on (suppkey, partkey) — one shuffle
    over the filtered year slice; the HAVING output is tiny and drives a
    left-semi join into supplier."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return s.join(heavy, s.s_suppkey == F.col("l_suppkey"), "left_semi").select(
        "s_name", "s_nationkey"
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the EXISTS / NOT-EXISTS pair ("another supplier on
    the order, but no OTHER supplier at fault") decorrelated into ONE
    per-order aggregate: n_suppliers > 1 AND n_flagged_suppliers == 1.
    (l_receiptdate > l_commitdate becomes l_returnflag = 'R'.)

    Scale: the decorrelation replaces two correlated-subquery scans with a
    single groupBy(orderkey) over lineitem — one shuffle, each side reused;
    the classic formulation would scan lineitem three times."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    per_order = li.groupBy(F.col("l_orderkey").alias("po_key")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_supp_r"),
    )
    l1 = li.filter(F.col("l_returnflag") == "R")
    return (
        l1.join(o, l1.l_orderkey == o.o_orderkey)
        .join(per_order, l1.l_orderkey == F.col("po_key"))
        .filter((F.col("n_supp") > 1) & (F.col("n_supp_r") == 1))
        .join(F.broadcast(s), l1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "q22_dormant_balances",
    oracle="""
    SELECT c.c_nationkey, COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                              / COUNT(*)
                         FROM customer c2 WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
    """,
)
def q22_dormant_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: anti-join + uncorrelated scalar-average subquery —
    above-average-balance customers with no urgent orders, grouped by
    nation.  (Phone country code becomes c_nationkey; "no orders" becomes
    "no URGENT orders" so the fixtures yield rows.)

    Scale: the global average is a 1-row broadcast; the anti join shuffles
    on custkey against the pre-filtered urgent slice; the final agg is
    |nations| rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(dec("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal"))
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(dec("c_acctbal")), 4).cast("double").alias("totacctbal"),
        )
    )


@query(
    "lateral_topk",
    oracle="""
    SELECT n.n_name, t.o_orderkey, t.o_totalprice
    FROM nation n, LATERAL (
      SELECT o.o_orderkey, o.o_totalprice
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
      LIMIT 3
    ) t
    """,
)
def lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT: the 3 largest
    orders per nation, expressed as a lateral top-k (the SQL-standard
    shape; Catalyst plans it as a DomainJoin rewrite -> per-key window,
    not one subquery execution per outer row — the decorrelation an eager
    engine can't do).  Tie-broken on orderkey so the result is a total
    order, exact in both engines."""
    for t in ("nation", "orders", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_lat")
    return spark.sql(
        """
        SELECT n.n_name, t.o_orderkey, t.o_totalprice
        FROM nation_lat n, LATERAL (
          SELECT o.o_orderkey, o.o_totalprice
          FROM orders_lat o JOIN customer_lat c ON o.o_custkey = c.c_custkey
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
          LIMIT 3
        ) t
        """
    )


def _morton_sql(x: str, y: str, bits: int = 10) -> str:
    """DuckDB expression: Morton-interleave the low ``bits`` of x and y."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def _morton_col(x, y, bits: int = 10):
    """Spark column: Morton-interleave the low ``bits`` of x and y."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


@query(
    "zorder_layout_stats",
    oracle=f"""
    WITH z AS (
      SELECT l_orderkey, l_partkey,
             {_morton_sql("(l_orderkey % 1024)", "(l_partkey % 1024)")} AS zkey
      FROM lineitem
    ),
    b AS (
      SELECT l_orderkey, l_partkey,
             NTILE(16) OVER (ORDER BY zkey ASC, l_orderkey ASC, l_partkey ASC)
                 AS bucket
      FROM z
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(l_orderkey % 1024) AS min_ok, MAX(l_orderkey % 1024) AS max_ok,
           MIN(l_partkey % 1024) AS min_pk, MAX(l_partkey % 1024) AS max_pk
    FROM b GROUP BY bucket
    """,
)
def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering for multi-dimensional data skipping —
    the layout optimization behind Delta/Iceberg OPTIMIZE ZORDER: interleave
    the bits of two filter dimensions into one sort key, range-split the
    table on it, and every file/bucket gets a TIGHT min/max range on BOTH
    dimensions (a sort on either single key leaves the other unbounded, so
    scans filtering on it can skip nothing).  Emitted here: per-bucket
    min/max of both dims — the footer stats a scan would prune against.

    The Morton key is 40 bitwise ops in one codegen'd projection; at real
    scale the same key feeds ``repartitionByRange(zkey)`` + sorted parquet
    writes (``tests/test_parquet_partitioning.py`` pins the pruned-scan
    side).  NTILE over (zkey, tiebreak) stands in for the range split —
    deterministic total order, exact in both engines.

    Scale: the NTILE runs over ALL of lineitem, so a naive global window
    would single-partition the corpus.  Instead the exact bucket comes
    from operators/rank.py's ``global_ntile`` with the zkey's high 6 bits
    as the coarse bucket (zkey is a 20-bit Morton code, so ``zkey >> 14``
    is a pure, monotone, CONSTANT-domain 64-way split): one ordinary hash
    shuffle, partitioned row_number, and a 64-row broadcast prefix table —
    the only unpartitioned window left is over those 64 rows
    (machine-checked by tools/audit_plans.py ALLOW_GLOBAL_WINDOW)."""
    li = load_table(spark, sf_dir, "lineitem")
    ok = F.col("l_orderkey") % 1024
    pk = F.col("l_partkey") % 1024
    z = li.select(
        "l_orderkey", "l_partkey", _morton_col(ok, pk).alias("zkey")
    )
    order = [
        F.col("zkey").asc(), F.col("l_orderkey").asc(), F.col("l_partkey").asc()
    ]
    b = global_ntile(
        z, 16, order, F.shiftright("zkey", 14), bucket_col="bucket"
    ).select(ok.alias("ok"), pk.alias("pk"), "bucket")
    return b.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.min("ok").alias("min_ok"),
        F.max("ok").alias("max_ok"),
        F.min("pk").alias("min_pk"),
        F.max("pk").alias("max_pk"),
    )


@query(
    "range_join_binned",
    oracle="""
    WITH err AS (SELECT event_id, ts FROM events WHERE event_type = 'error'),
    act AS (SELECT event_id, ts FROM events WHERE event_type = 'purchase')
    SELECT err.event_id, COUNT(act.event_id) AS nearby_purchases
    FROM err LEFT JOIN act
      ON act.ts BETWEEN err.ts - INTERVAL 2 MINUTE AND err.ts + INTERVAL 2 MINUTE
    GROUP BY err.event_id
    """,
)
def range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS time-range join — purchases within ±2 minutes of each error,
    corpus-wide — rewritten as a covering-bin EQUI-join: each error probes
    its own 2-minute bin plus both neighbors, the activity side buckets
    once, and the exact band check runs as a residual on the (small)
    per-bin candidate set.  Without this rewrite a keyless range join is a
    broadcast-nested-loop — quadratic and fatal at 100 TB; with it, the
    plan is a plain hash join on a uniform integer key whose fan-out is
    bounded by 3x regardless of data size.  (When an equi key exists,
    prefer it — see join_interval_events; this is the technique for when
    one doesn't.)  The oracle states the naive BETWEEN semantics; binning
    with covering neighbors is lossless, so results match exactly."""
    bin_us = 2 * 60 * 1_000_000  # 2-minute bins in epoch-microseconds
    e = load_table(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.unix_micros("ts").alias("err_us")
    )
    act = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("act_id"),
        F.unix_micros("ts").alias("act_us"),
        (F.unix_micros("ts") / bin_us).cast("bigint").alias("bin"),
    )
    probes = err.select(
        "err_id",
        "err_us",
        F.explode(
            F.array(
                (F.col("err_us") / bin_us).cast("bigint") - 1,
                (F.col("err_us") / bin_us).cast("bigint"),
                (F.col("err_us") / bin_us).cast("bigint") + 1,
            )
        ).alias("bin"),
    )
    hits = (
        probes.join(act, "bin")
        .filter(F.abs(F.col("act_us") - F.col("err_us")) <= bin_us)
        .groupBy("err_id")
        .agg(F.count("act_id").alias("nearby_purchases"))
    )
    return (
        err.select("err_id")
        .join(hits, "err_id", "left")
        .select(
            F.col("err_id").alias("event_id"),
            F.coalesce("nearby_purchases", F.lit(0)).alias("nearby_purchases"),
        )
    )


@query(
    "winsorize_event_values",
    oracle="""
    WITH b AS (
      SELECT event_type,
             ROUND(QUANTILE_CONT(value, 0.05), 6) AS lo,
             ROUND(QUANTILE_CONT(value, 0.95), 6) AS hi
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           ROUND(LEAST(GREATEST(e.value, b.lo), b.hi), 6) AS value_w
    FROM events e JOIN b USING (event_type)
    """,
)
def winsorize_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization: clamp each event's measure into its event
    type's [p5, p95] band — the standard outlier-robust pre-aggregation
    treatment (metric pipelines winsorize before averaging so one bot
    session can't move the mean).  Clamp bounds are the ROUNDED exact
    percentiles on both engines, so the comparison is knife-edge-free.

    Scale: one |types|-group exact-percentile aggregate (t-digest
    ``approx_percentile`` is the 100 TB drop-in, same plan shape), then the
    tiny bounds table broadcasts back onto a map-only clamp projection —
    the fact stream never shuffles."""
    e = load_table(spark, sf_dir, "events")
    b = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.05)"), 6).alias("lo"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("hi"),
    )
    return e.join(F.broadcast(b), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.round(F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")), 6).alias(
            "value_w"
        ),
    )
