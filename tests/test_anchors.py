"""Anchor-slice gating (plans/anchors.py): the ADVICE-r7 medium item.

The four historically-sliced queries must expose their narrowing
explicitly: corpus-wide DEFAULT for the two real-analytics "gate" queries,
always-bounded for the two exact-ground-truth "contract" anchors, and the
bounded mode must flip the gate queries' Spark plan AND oracle together.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from lms_etl_pipeline_spark.plans.anchors import AnchorSlice

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestAnchorSliceUnit:
    def test_gate_inactive_in_full_mode(self):
        s = AnchorSlice("event_id", 100000, kind="gate", mode="full")
        assert not s.active
        assert s.sql == "TRUE"

    def test_gate_active_in_bounded_mode(self):
        s = AnchorSlice("event_id", 100000, kind="gate", mode="bounded")
        assert s.active
        assert s.sql == "event_id < 100000"

    def test_contract_active_in_every_mode(self):
        for mode in ("full", "bounded"):
            s = AnchorSlice("doc_id", 2000, kind="contract", mode=mode)
            assert s.active
            assert s.sql == "doc_id < 2000"

    def test_bad_kind_rejected(self):
        with pytest.raises(ValueError):
            AnchorSlice("x", 1, kind="anchor")

    def test_apply_is_noop_when_inactive(self, spark):
        df = spark.range(10).withColumnRenamed("id", "event_id")
        gate = AnchorSlice("event_id", 5, kind="gate", mode="full")
        assert gate.apply(df) is df
        bounded = AnchorSlice("event_id", 5, kind="gate", mode="bounded")
        assert bounded.apply(df).count() == 5


class TestRegisteredOracles:
    """Default-mode registrations: gates corpus-wide, contracts bounded."""

    @pytest.fixture(autouse=True)
    def _catalog(self):
        import lms_etl_pipeline_spark.plans  # noqa: F401 - registers
        from lms_etl_pipeline_spark.plans.catalog import all_oracles

        self.oracles = all_oracles()

    def test_gate_queries_are_corpus_wide_by_default(self):
        assert os.environ.get("SPARK_GRAFT_ANCHOR_SLICES", "full") == "full"
        assert "event_id < 100000" not in self.oracles["attribution_linear_multitouch"]
        assert "WHERE TRUE" in self.oracles["attribution_linear_multitouch"]
        assert "l_orderkey < 150000" not in self.oracles["fifo_returns_allocation"]
        assert "WHERE TRUE" in self.oracles["fifo_returns_allocation"]

    def test_contract_anchors_stay_bounded(self):
        assert "doc_id < 2000" in self.oracles["simhash_exact_pairs"]
        assert "doc_id < 5000" in self.oracles["lsh_recall_eval"]


def test_bounded_mode_flips_gate_oracles_and_plans():
    """In a bounded-mode process the gate queries' oracle SQL carries the
    slice and the Spark plan filters on it — both sides move together, so
    the differential gate still compares like with like."""
    code = """
import os
assert os.environ["SPARK_GRAFT_ANCHOR_SLICES"] == "bounded"
import lms_etl_pipeline_spark.plans
from lms_etl_pipeline_spark.plans.catalog import all_oracles
o = all_oracles()
assert "event_id < 100000" in o["attribution_linear_multitouch"]
assert "l_orderkey < 150000" in o["fifo_returns_allocation"]
from lms_etl_pipeline_spark.plans.behavior_outcomes import _ATTR_SLICE
from lms_etl_pipeline_spark.plans.business_analytics import _FIFO_SLICE
assert _ATTR_SLICE.active and _FIFO_SLICE.active
print("BOUNDED-OK")
"""
    env = dict(os.environ, SPARK_GRAFT_ANCHOR_SLICES="bounded")
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "BOUNDED-OK" in out.stdout


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_gate_slices_are_fixture_supersets_at_driver_scales(spark, sf):
    """The invariant that makes full and bounded modes agree wherever the
    driver compares: each gate slice's id bound exceeds the fixture's max
    id, so the slice predicate selects every row.  If a future fixture
    regeneration breaks this, bounded-mode sweeps would silently change
    driver-scale results — fail here instead."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"/root/testdata/{sf}/events.parquet")
    li = spark.read.parquet(f"/root/testdata/{sf}/lineitem.parquet")
    assert ev.agg(F.max("event_id")).collect()[0][0] < 100000
    assert li.agg(F.max("l_orderkey")).collect()[0][0] < 150000
