"""Contract tests: the driver-facing registry in ``__spark_entry__``.

The expensive value-level differential check lives in
``tools/check_oracle.py`` (run at sf0.01); here we verify the cheap
invariants that catch 90% of contract bugs without executing plans:

- every oracle key has a query, every query builds a valid lazy plan;
- Spark plan columns == DuckDB oracle columns (the driver's comparator
  hashes by sorted column name — a mismatch is an automatic red row);
- ``entry()`` runs and returns rows at sf0.001.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_registry_nonempty_and_oracle_keys_subset():
    assert len(QUERIES) >= 50
    assert set(ORACLES) <= set(QUERIES)
    # the overwhelming majority must be oracle-checkable
    assert len(ORACLES) >= 0.8 * len(QUERIES)


def test_first_50_span_every_operator_family():
    """The driver differentially checks the FIRST 50 registered queries only;
    this pins the curated priority ordering so no family falls past the cut."""
    first50 = list(QUERIES)[:50]
    families = {QUERIES[n].__module__.rsplit(".", 1)[-1] for n in first50}
    assert {
        "relational",
        "windows",
        "streaming",
        "llm",
        "scalar",
        "multimodal",
        "etl",
    } <= families
    # every priority entry must actually exist (a rename would silently
    # demote the query past the driver's budget)
    from lms_etl_pipeline_spark.plans.catalog import _PRIORITY

    assert list(_PRIORITY) == first50
    # and all but a handful of the first 50 must be exact-oracle-checkable
    rows_only = [n for n in first50 if n not in ORACLES]
    assert len(rows_only) == 0, rows_only


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_builds_and_columns_match_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_SMOKE)  # lazy: plan analysis only
    assert df.columns, name
    if name in ORACLES:
        cur = duck.execute(f"SELECT * FROM ({ORACLES[name]}) LIMIT 0")
        duck_cols = [d[0] for d in cur.description]
        assert sorted(df.columns) == sorted(duck_cols), name


def test_hugeint_gate_fires_on_deliberate_offender(duck):
    """The round-4 driver-red class: DuckDB widens SUM(integer) to HUGEINT
    (int128), which the driver's hasher mismatches against Spark BIGINT even
    at equal values.  The gate must detect the class structurally."""
    from tools.check_oracle import hugeint_columns

    rel = duck.sql("SELECT SUM(i) AS s FROM range(10) t(i)")
    assert hugeint_columns(rel) == ["s"]
    rel_ok = duck.sql("SELECT CAST(SUM(i) AS BIGINT) AS s FROM range(10) t(i)")
    assert hugeint_columns(rel_ok) == []


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_emits_no_hugeint(duck, name):
    """No registered oracle may emit HUGEINT — binding only, no execution."""
    from tools.check_oracle import hugeint_columns

    rel = duck.sql(ORACLES[name])
    assert hugeint_columns(rel) == [], (
        f"{name}: CAST the integer aggregate(s) to BIGINT"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "revenue" in df.columns
