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


def test_first_50_follow_the_rotation_policy():
    """The driver differentially checks the FIRST 50 registered queries
    only.  Round-12 policy: the two smoke anchors stay in-window every
    round; NEVER-CERTIFIED debt comes next (VERDICT r11 next-round #1 —
    the five round-11 additions that have never had a driver row, leading
    the window so cert_ledger's debt returns to 0); then
    CHANGED-since-last-driver-row slots (pinned explicitly since plan
    changes aren't derivable from artifacts alone); the remaining slots
    re-derive mechanically from the r1-r11 artifacts as the LONGEST-STALE
    greens (oldest last-green round first, name-ordered within a round).
    The ten rows-only queries all got green driver rows in r11, so none
    re-enters — every r12 slot is exact-oracle-backed.  The baseline is
    pinned explicitly — not glob'd — because the driver writes THIS
    round's CORRECTNESS file at round end, which would otherwise shift
    the derivation during judging."""
    import json
    import os

    first50 = list(QUERIES)[:50]
    # every priority entry must actually exist (a rename would silently
    # demote the query past the driver's budget)
    from lms_etl_pipeline_spark.plans.catalog import _PRIORITY

    assert list(_PRIORITY) == first50
    anchors = ["flagship_regional_revenue", "events_session_window"]
    # never-certified debt: the round-11 PQ family + MMR, locally exact,
    # never driver-sampled (cert_ledger)
    fresh = [
        "pq_codebook_train",
        "pq_encode_codes",
        "knn_pq_adc",
        "pq_recall_eval",
        "mmr_diverse_selection",
    ]
    # changed since last driver row: sign-split-floor oracle rewrite
    # (scalar_date_funcs), FRAME-separator hardening (y4m), and the
    # scheme/content-guarded warehouse reclaim (bucketed join)
    plan_changed = [
        "scalar_date_funcs",
        "multimodal_y4m_frames_real",
        "join_bucketed_colocated",
    ]
    # every windowed query is exact-oracle-backed this round
    assert all(n in ORACLES for n in first50)

    rotation_baseline = [f"CORRECTNESS_r{r:02d}.json" for r in range(1, 12)]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last_green: dict[str, str] = {}
    for fname in rotation_baseline:
        path = os.path.join(root, fname)
        assert os.path.exists(path), f"rotation baseline artifact missing: {fname}"
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if row.get("rows_match") and row.get("hash_match") is not False:
                    last_green[name] = fname
    pinned = anchors + fresh + plan_changed
    stale_order = sorted(
        (n for n in last_green if n in ORACLES and n not in set(pinned)),
        key=lambda n: (last_green[n], n),
    )
    expected = pinned + stale_order[: 50 - len(pinned)]
    assert first50 == expected, (
        "window drifted from the re-cert policy derivation:\n"
        f"  missing: {[n for n in expected if n not in first50]}\n"
        f"  extra:   {[n for n in first50 if n not in expected]}"
    )


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


def test_decimal_gate_fires_on_deliberate_offender(duck, spark):
    """The round-10 driver-red class: a DECIMAL(38,x) output column fetches
    as decimal.Decimal, which the driver's native-type hasher mismatches
    against Spark's int even at equal values (quality_classifier_train was
    the ONLY decimal-output query among 297 oracles and the only hash-red
    row).  Both the DuckDB-side and Spark-side gates must detect it."""
    from tools.check_oracle import hugeint_columns, spark_decimal_columns

    rel = duck.sql("SELECT CAST(42 AS DECIMAL(38,0)) AS d, 1 AS ok")
    assert hugeint_columns(rel) == ["d"]
    sdf = spark.sql("SELECT CAST(42 AS DECIMAL(38,0)) AS d, 1 AS ok")
    assert spark_decimal_columns(sdf) == ["d"]
    sdf_ok = spark.sql("SELECT CAST(42 AS BIGINT) AS d, 1 AS ok")
    assert spark_decimal_columns(sdf_ok) == []


def test_native_class_gate_fires_on_planted_divergence():
    """Round 11 (VERDICT r10 #2, generalized): the comparator must flag any
    output column whose native Python cell class differs between the Spark
    and DuckDB fetch paths — int vs Decimal, date vs datetime — while
    folding the benign bytearray/bytes pair."""
    import datetime

    from tools.check_oracle import native_class_divergences

    idx = {"a": 0, "b": 1}
    s_rows = [(1, datetime.date(2020, 1, 1))]
    d_rows = [(1, datetime.datetime(2020, 1, 1))]
    out = native_class_divergences(s_rows, idx, d_rows, idx, ["a", "b"])
    assert len(out) == 1 and "'b'" in out[0]

    from decimal import Decimal

    out = native_class_divergences([(Decimal(5),)], {"c": 0}, [(5,)], {"c": 0}, ["c"])
    assert len(out) == 1 and "Decimal" in out[0]

    out = native_class_divergences(
        [(bytearray(b"x"),)], {"c": 0}, [(b"x",)], {"c": 0}, ["c"]
    )
    assert out == []
    # all-null columns are skipped (nothing to compare)
    out = native_class_divergences([(None,)], {"c": 0}, [(None,)], {"c": 0}, ["c"])
    assert out == []


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_spark_plan_emits_no_decimal(spark, name):
    """No registered Spark plan may emit a decimal-typed OUTPUT column —
    binding only, no execution (internal decimal widening is fine; the rule
    is about what reaches the driver's native-type hasher)."""
    from tools.check_oracle import spark_decimal_columns

    df = QUERIES[name](spark, SF_SMOKE)
    assert spark_decimal_columns(df) == [], (
        f"{name}: cast decimal outputs to bigint/double or split into "
        "BIGINT limbs"
    )


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


def test_rows_only_anchor_map_matches_catalog():
    """tools/cert_ledger.py's ROWS_ONLY_ANCHORS must exactly cover the
    catalog's rows-only set, with every anchor oracle-backed — so the
    approx-path coverage claim stays machine-derived as queries move."""
    from tools.cert_ledger import ROWS_ONLY_ANCHORS

    rows_only = {n for n in QUERIES if n not in ORACLES}
    assert set(ROWS_ONLY_ANCHORS) == rows_only
    for name, anchors in ROWS_ONLY_ANCHORS.items():
        assert anchors, name
        for a in anchors:
            assert a in ORACLES, f"{name}: anchor {a} is not oracle-backed"


def test_bench_steal_sample_contract():
    """bench.py's hypervisor-steal probe: two non-negative tick counters
    with steal <= total, total strictly growing between samples (it feeds
    the steal_high contention signal — a bad read must come back None,
    never a junk ratio)."""
    import bench

    s = bench.steal_sample()
    if s is None:  # non-Linux /proc layout — the signal degrades to off
        return
    steal0, total0 = s
    assert 0 <= steal0 <= total0
    import time as _time

    _time.sleep(0.05)
    steal1, total1 = bench.steal_sample()
    assert total1 > total0 and steal1 >= steal0
