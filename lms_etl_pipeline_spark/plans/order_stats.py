"""Exact order statistics at scale: radix selection instead of a sort.

The engine already ships the *approximate* quantile family
(``agg_approx_percentiles`` — Spark's Greenwald-Khanna sketch, rows-only
by design) and exact single-column medians where the plan can afford a
windowed sort.  What it lacked is the operator a 100 TB column actually
needs: an EXACT quantile with neither a global sort (all-to-all range
shuffle of every row) nor an approximation bound.

``operators.selection.kth_smallest`` is that operator: 8 bounded
aggregate passes (one 256-bucket byte count each, 256-row collect per
pass — the GD-trainer bounded-driver-loop class), exact by construction.
This module registers the oracle-checkable plan over it.

Scale posture: the quantile loop's data movement is 256 counts per pass,
independent of n; the scans are narrow column-pruned parquet reads over a
frame materialized ONCE via the deployment seam and released at the end.
K quantiles cost K*8 counting aggregates over the cached integer column —
at 100 TB that is the difference between "8 map-reduce counts" and "sort
100 TB".
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lms_etl_pipeline_spark.operators.selection import kth_smallest
from lms_etl_pipeline_spark.plans.catalog import query
from lms_etl_pipeline_spark.session import materialize, release
from lms_etl_pipeline_spark.sources.tables import load_table

#: quantiles reported by quantile_exact_selection (lower-nearest rank:
#: 1-indexed k = 1 + floor(q * (n - 1)) — one IEEE product per quantile,
#: identical in Python and DuckDB)
_QUANTILES = (0.25, 0.5, 0.9, 0.99)

_ORACLE = f"""
    WITH v AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem WHERE l_extendedprice IS NOT NULL),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
    r AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM v)
    SELECT qs.q, r.cents, r.cents / 100.0 AS value
    FROM (VALUES {", ".join(f"(CAST({q} AS DOUBLE))" for q in _QUANTILES)}) qs(q)
    CROSS JOIN n
    JOIN r ON r.rn = 1 + CAST(FLOOR(qs.q * (n.n - 1)) AS BIGINT)
"""

_OUT_SCHEMA = "q double, cents bigint, value double"


@query("quantile_exact_selection", oracle=_ORACLE)
def quantile_exact_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p25/p50/p90/p99 of lineitem price without a global sort:
    each quantile is an 8-pass distributed radix selection over exact
    integer cents (module docstring).  The oracle sorts — the point is
    that at oracle scale DuckDB *can* sort, while this plan's shape is
    the one that still works when the column is 100 TB.  Output: one row
    per quantile with the exact cents and the decoded money value (one
    IEEE division, bit-identical cross-engine).
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = materialize(
        li.filter(F.col("l_extendedprice").isNotNull()).select(
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents")
        )
    )
    try:
        n = cents.count()
        rows = []
        # empty column: no order statistics exist — mirror the oracle's
        # empty join result instead of asking for the 0-th smallest
        # (found by the sf0 degenerate sweep, round 11)
        if n > 0:
            for q in _QUANTILES:
                k = 1 + math.floor(q * (n - 1))
                c = kth_smallest(cents, "cents", k)
                rows.append((q, c, c / 100.0))
    finally:
        release(cents)
    return spark.createDataFrame(rows, _OUT_SCHEMA)
