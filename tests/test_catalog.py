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
    only.  Round-9 era policy (recorded r8, commit 3bdbbec): the
    never-certified debt is ZERO, so the window's value is RE-CERT
    FRESHNESS — the two smoke anchors stay in-window every round; the
    plan-changed slots come first (queries whose plan changed after their
    last driver-green row, pinned explicitly since plan changes aren't
    derivable from artifacts alone); the remaining slots re-derive
    mechanically from the r1-r9 artifacts as the LONGEST-STALE greens
    (oldest last-green round first, name-ordered within a round).  The
    baseline is pinned explicitly — not glob'd — because the driver writes
    THIS round's CORRECTNESS file at round end, which would otherwise
    shift the derivation during judging."""
    import json
    import os

    first50 = list(QUERIES)[:50]
    # every priority entry must actually exist (a rename would silently
    # demote the query past the driver's budget)
    from lms_etl_pipeline_spark.plans.catalog import _PRIORITY

    assert list(_PRIORITY) == first50
    anchors = ["flagship_regional_revenue", "events_session_window"]
    # fresh debt first (standing slot-economy rule): round-10 additions
    # with no driver row yet (deep BPE, then the GD classifier-training
    # pair in registration order)
    fresh = [
        "bpe_train_merges_deep",
        "quality_classifier_train",
        "quality_classifier_predict",
        "eval_pass_at_k",
    ]
    # changed since last driver-green: the r10 DECIMAL(38,0) widening
    # (pinball) and the iterative-operator consumers whose loop internals
    # gained the release()/cut_lineage discipline (behavior-identical in
    # the driver's local session; re-certified out of caution)
    plan_changed = [
        "pinball_loss_eval",
        "dedup_clusters",
        "kmeans_lloyd",
        "pagerank_graph",
    ]
    # all 50 must be exact-oracle-checkable
    rows_only = [n for n in first50 if n not in ORACLES]
    assert len(rows_only) == 0, rows_only

    rotation_baseline = [f"CORRECTNESS_r0{r}.json" for r in range(1, 10)]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last_green: dict[str, str] = {}
    for fname in rotation_baseline:
        path = os.path.join(root, fname)
        assert os.path.exists(path), f"rotation baseline artifact missing: {fname}"
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if row.get("rows_match") and row.get("hash_match") is not False:
                    last_green[name] = fname
    stale_order = sorted(
        (
            n
            for n in last_green
            if n in ORACLES and n not in set(anchors + fresh + plan_changed)
        ),
        key=lambda n: (last_green[n], n),
    )
    expected = (
        anchors
        + fresh
        + plan_changed
        + stale_order[: 48 - len(fresh) - len(plan_changed)]
    )
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
