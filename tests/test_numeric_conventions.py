"""Cross-engine numeric-convention pins.

The fixed-point discipline in plans/timeseries.py and its sibling family modules rests on
ONE measured fact: Spark's ``div`` and DuckDB's integer ``//`` are the
SAME operation — integer division truncated toward zero, sign included —
so replacing a ROUNDed double ratio with a single integer division leaves
no rounding boundary for the engines to disagree on.  These tests pin
that fact (and the hazards around it) so a Spark or DuckDB upgrade that
changes division semantics fails loudly here instead of as a silent
oracle drift.

Measured on this stack (pyspark 4.x / duckdb 1.x):
  Spark  ``-7 div 2``            -> -3  (truncate toward zero)
  DuckDB ``-7 // 2``             -> -3  (truncate toward zero)
  DuckDB ``CAST(-7 AS HUGEINT) // 2`` -> -3
  DuckDB ``DECIMAL // DECIMAL``  -> plain division (-3.5!)  <- hazard:
      oracles must cast to HUGEINT/BIGINT before ``//``.
"""

from __future__ import annotations

import duckdb
import pytest

CASES = [(-7, 2), (7, 2), (-7, -2), (7, -2), (-1, 3), (1, 3), (0, 5)]


def test_spark_div_equals_duckdb_intdiv(spark):
    """Spark `div` and DuckDB integer `//` truncate identically, all signs."""
    exprs = ", ".join(f"{a} div ({b}) AS c{i}" for i, (a, b) in enumerate(CASES))
    srow = spark.sql(f"SELECT {exprs}").collect()[0]
    dexprs = ", ".join(f"{a} // ({b}) AS c{i}" for i, (a, b) in enumerate(CASES))
    drow = duckdb.sql(f"SELECT {dexprs}").fetchall()[0]
    for i, (a, b) in enumerate(CASES):
        want = int(a / b)  # Python int() truncates toward zero
        assert srow[i] == want, f"Spark div changed semantics on {a}/{b}"
        assert drow[i] == want, f"DuckDB // changed semantics on {a}/{b}"


def test_spark_decimal_div_truncates(spark):
    """Spark `div` on DECIMAL operands is still integral truncation."""
    row = spark.sql(
        "SELECT CAST(-7 AS DECIMAL(38,0)) div CAST(2 AS DECIMAL(38,0)) AS c"
    ).collect()[0]
    assert row.c == -3


def test_duckdb_hugeint_intdiv_truncates():
    """The HUGEINT // path used by micro-unit oracles truncates toward zero."""
    got = duckdb.sql(
        "SELECT CAST(-7 AS HUGEINT) // CAST(2 AS HUGEINT),"
        "       CAST(7 AS HUGEINT) // CAST(2 AS HUGEINT)"
    ).fetchall()[0]
    assert got == (-3, 3)


def test_duckdb_decimal_floordiv_is_not_integer_division():
    """DECIMAL // DECIMAL in DuckDB is PLAIN division — the hazard the
    fixed-point oracles avoid by casting to HUGEINT before //.  If an
    upgrade makes this integral, the hazard note is stale (benignly), but
    if an oracle ever skips the HUGEINT cast this documents why it broke."""
    (got,) = duckdb.sql(
        "SELECT CAST(-7 AS DECIMAL(38,0)) // CAST(2 AS DECIMAL(38,0))"
    ).fetchall()[0]
    assert got in (-3.5, -3), got
    if got == -3:  # pragma: no cover - future-version signpost
        pytest.fail(
            "DuckDB DECIMAL // became integral division; update the "
            "hazard note in tests/test_numeric_conventions.py"
        )


def test_float_decimal_cast_tie_divergence_and_floor_idiom(spark):
    """A float that is an odd multiple of 2^-10 (here 0.1494140625) lands
    EXACTLY on a .5 nano boundary when quantized at 1e-9: Spark's decimal
    cast rounds the exact value HALF_UP while DuckDB multiplies in double
    and rounds — the engines disagree (found live: embedding_centroids at
    sf0.1, label 8 / dim 58 / vec_id 364).  The FLOOR(x*1e9) idiom is
    tie-free: both engines run the identical IEEE multiply then the
    identical floor.  This pins BOTH facts so an engine upgrade that
    changes either behavior is caught here, not as oracle drift."""
    import duckdb

    x = 0.1494140625  # 153/1024; x*1e9 == 149414062.5 exactly
    (s_dec,) = spark.sql(
        f"SELECT CAST(CAST({x!r} AS DOUBLE) AS DECIMAL(18,9))"
    ).collect()[0]
    (d_dec,) = duckdb.sql(
        f"SELECT CAST(CAST({x!r} AS DOUBLE) AS DECIMAL(18,9))"
    ).fetchall()[0]
    assert str(s_dec) != str(d_dec), (
        "engines now agree on the .5-nano tie — the decimal-cast hazard "
        "note is stale; re-evaluate whether the FLOOR idiom is still needed"
    )
    (s_u,) = spark.sql(
        f"SELECT CAST(FLOOR(CAST({x!r} AS DOUBLE) * 1000000000) AS BIGINT)"
    ).collect()[0]
    (d_u,) = duckdb.sql(
        f"SELECT CAST(FLOOR(CAST({x!r} AS DOUBLE) * 1000000000) AS BIGINT)"
    ).fetchall()[0]
    assert s_u == d_u == 149414062


def test_units_path_matches_decimal_convention(spark):
    """Pin the r7 integer-unit fast path (functions.numeric.units) against
    the decimal convention it replaces, on a seeded domain sweep plus the
    half-unit boundary neighborhoods.

    Three facts, each of which the TPC-H money rewrites rely on:
      1. per-row: round(x*10^s)::bigint == CAST(x AS DECIMAL(18,s)) scaled,
         in Spark, for every ≤s-dp money double (cents / basis points);
      2. the same quantization holds in DuckDB (the oracle side);
      3. sum-level: the unit finalization ((S+50) DIV 100)/1e4 reproduces
         the dec_sum_of ROUND(SUM(decimal), 4)->DOUBLE value bit-exactly
         on a revenue-shaped product.
    """
    import random

    from pyspark.sql import functions as F

    from lms_etl_pipeline_spark.functions.numeric import units

    rng = random.Random(42)
    n = 4000
    cents = [rng.randrange(0, 10**9) for _ in range(n)]
    # boundary neighborhoods: around .5-unit ties and type extremes
    cents += [0, 1, 49, 50, 51, 99, 100, 101, 10**9 - 1, 10**9]
    bps = [rng.randrange(0, 10001) for _ in range(len(cents) - 4)] + [0, 1, 9999, 10000]
    rows = [
        (c, b, c / 100.0, b / 10000.0)
        for c, b in zip(cents, bps)
    ]
    df = spark.createDataFrame(rows, "cents BIGINT, bps BIGINT, price DOUBLE, rate DOUBLE")

    # (1) Spark per-row quantization: units == expected integer == decimal cast
    mism = df.filter(
        (units("price", 2) != F.col("cents"))
        | (units("rate", 4) != F.col("bps"))
        | (
            (F.col("price").cast("DECIMAL(18,4)") * 10000).cast("bigint")
            != F.col("cents") * 100
        )
    ).count()
    assert mism == 0

    # (2) DuckDB quantizes the same doubles to the same integers
    con = duckdb.connect()
    con.execute("CREATE TABLE m AS SELECT * FROM (VALUES " +
                ",".join(f"({c}, {b}, {c/100.0!r}::DOUBLE, {b/10000.0!r}::DOUBLE)"
                         for c, b in zip(cents[:500], bps[:500])) +
                ") t(cents, bps, price, rate)")
    (bad,) = con.sql(
        """SELECT COUNT(*) FROM m
           WHERE CAST(ROUND(price*100) AS BIGINT) != cents
              OR CAST(price AS DECIMAL(18,2)) * 100 != cents
              OR CAST(ROUND(rate*10000) AS BIGINT) != bps
              OR CAST(rate AS DECIMAL(18,4)) * 10000 != bps"""
    ).fetchall()[0]
    assert bad == 0

    # (3) sum-level: unit finalization == decimal ROUND->DOUBLE, exactly
    both = (
        df.agg(
            F.sum(units("price", 2) * (F.lit(10000) - units("rate", 4))).alias("r6"),
            F.round(
                F.sum(
                    F.col("price").cast("DECIMAL(18,4)")
                    * (F.lit(1) - F.col("rate").cast("DECIMAL(18,4)"))
                ),
                4,
            )
            .cast("double")
            .alias("dec_val"),
        )
        .select(F.expr("((r6 + 50) DIV 100) / 10000.0D").alias("unit_val"), "dec_val")
        .collect()[0]
    )
    assert both.unit_val == both.dec_val


def test_signed_unit_rounding_matches_decimal_round(spark):
    """The q9 profit finalizer branches on sign because integer DIV
    truncates toward zero while decimal ROUND is half-away-from-zero.
    Pin the CASE form against Spark's decimal ROUND on both signs and on
    exact .5 boundaries (scale-6 units -> scale-4 half-up)."""
    from pyspark.sql import functions as F

    units6 = [0, 49, 50, 51, 100, 149, 150, 151, -49, -50, -51, -100, -150, -151,
              123456789, -123456789, 999999999950, -999999999950]
    df = spark.createDataFrame([(u,) for u in units6], "p6 BIGINT")
    out = df.select(
        "p6",
        F.expr(
            "CASE WHEN p6 >= 0 THEN ((p6 + 50) DIV 100) / 10000.0D"
            " ELSE -(((-p6) + 50) DIV 100) / 10000.0D END"
        ).alias("unit_val"),
        F.round(F.col("p6").cast("DECIMAL(38,6)") / 1000000, 4)
        .cast("double")
        .alias("dec_val"),
    ).collect()
    for r in out:
        assert r.unit_val == r.dec_val, (r.p6, r.unit_val, r.dec_val)


def test_hl_sums_identity_signed(spark):
    """hl_sums' pmod decomposition reconstructs the true sum for any sign
    mix: S = HL_DIV*sum(hi) + sum(lo) with lo ∈ [0, HL_DIV)."""
    import random

    from pyspark.sql import functions as F

    from lms_etl_pipeline_spark.functions.numeric import HL_DIV, hl_sums

    rng = random.Random(7)
    vals = [rng.randrange(-10**14, 10**14) for _ in range(2000)]
    vals += [0, 1, -1, HL_DIV - 1, HL_DIV, HL_DIV + 1,
             -HL_DIV + 1, -HL_DIV, -HL_DIV - 1, 10**14, -10**14]
    df = spark.createDataFrame([(v,) for v in vals], "u BIGINT")
    row = df.agg(*hl_sums("u", "s")).collect()[0]
    assert HL_DIV * row.shi + row.slo == sum(vals)
    # per-row lo stays in [0, HL_DIV) even for negatives (pmod, not %)
    lo_bad = df.select(F.pmod(F.col("u"), F.lit(HL_DIV)).alias("lo")).filter(
        (F.col("lo") < 0) | (F.col("lo") >= HL_DIV)
    ).count()
    assert lo_bad == 0


def test_hl_q9_rounding_decomposition_matches_sign_branch(spark):
    """The q9 finalizer was rewritten from the sign-branch CASE onto the
    (T = floor(S/100), r = pmod(S,100)) decomposition over hl_sums parts.
    Pin value-identity on signed .5 boundaries and random values: each
    input row is its own group, so the aggregate path IS the per-value
    path."""
    import random

    from pyspark.sql import functions as F

    from lms_etl_pipeline_spark.functions.numeric import hl_sums

    rng = random.Random(11)
    units6 = [0, 49, 50, 51, 100, 149, 150, 151, -49, -50, -51, -100, -150,
              -151, 123456789, -123456789, 999999999950, -999999999950,
              10**14 + 50, -(10**14) - 50]
    units6 += [rng.randrange(-10**14, 10**14) for _ in range(2000)]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(units6)], "gid BIGINT, p6 BIGINT"
    )
    out = (
        df.groupBy("gid")
        .agg(*hl_sums("p6", "p"), F.first("p6").alias("p6"))
        .withColumn("p6t", F.expr("phi * 10000 + plo DIV 100"))
        .withColumn("p6r", F.expr("plo % 100"))
        .select(
            "p6",
            F.expr(
                "(p6t + CASE WHEN p6r > 50 THEN 1"
                " WHEN p6r = 50 AND p6t >= 0 THEN 1 ELSE 0 END) / 10000.0D"
            ).alias("new_val"),
            F.expr(
                "CASE WHEN p6 >= 0 THEN ((p6 + 50) DIV 100) / 10000.0D"
                " ELSE -(((-p6) + 50) DIV 100) / 10000.0D END"
            ).alias("old_val"),
        )
        .collect()
    )
    for r in out:
        assert r.new_val == r.old_val, (r.p6, r.new_val, r.old_val)


def test_hl_sums_survive_where_direct_sum_aborts(spark):
    """The point of the split: a direct int64 unit sum past 2^63 ABORTS
    under ANSI; the hi/lo part-sums of the same rows succeed and
    reconstruct the true value."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import functions as F

    from lms_etl_pipeline_spark.functions.numeric import HL_DIV, hl_sums

    big = 4 * 10**18  # 3 rows sum to 1.2e19 > 2^63-1 ~ 9.2e18
    df = spark.createDataFrame([(big,), (big,), (big,)], "u BIGINT")
    with _pytest.raises((Py4JJavaError, Exception)) as exc:
        df.agg(F.sum("u")).collect()
    assert "overflow" in str(exc.value).lower() or "ARITHMETIC" in str(exc.value)
    row = df.agg(*hl_sums("u", "s")).collect()[0]
    assert HL_DIV * row.shi + row.slo == 3 * big
