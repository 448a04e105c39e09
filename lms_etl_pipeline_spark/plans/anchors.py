"""Explicit anchor-slice gating (ADVICE r7, medium).

Four catalog queries historically read fixed-ID slices (``event_id <
100000``, ``l_orderkey < 150000``, ``doc_id < 2000``, ``doc_id < 5000``)
whose narrowing was visible only in docstrings — and because each oracle
was narrowed in lockstep, the differential gate could never detect the
slice, and the 100 TB scale story for those queries was vacuous (a
constant-size slice).  This module makes every such slice explicit at the
call site, shared verbatim between the Spark plan and its DuckDB oracle,
and config-visible:

- ``kind="gate"`` (attribution_linear_multitouch, fifo_returns_allocation):
  real corpus-wide analytics.  Their DEFAULT is now the FULL corpus — the
  slice applies only when ``SPARK_GRAFT_ANCHOR_SLICES=bounded``, which the
  adversarial ~sf1 deep sweep sets explicitly (tools/make_sf1.py): that
  fixture's deliberate 10x duplicate amplification pushes these queries'
  result sets past the comparator's row cap.  Sweeping it unbounded still
  fails LOUDLY on the cap (check_oracle's MAX_COMPARE_ROWS probe), never
  OOMs.  At every driver fixture scale the historical slice was a superset
  of the data, so default-mode results are bit-identical to rounds 1-7.

- ``kind="contract"`` (simhash_exact_pairs, lsh_recall_eval): exact
  ground-truth anchors for rows-only approximate twins (dedup_simhash,
  near_dup_pairs_lsh).  A corpus-wide EXACT all-pairs ground truth is
  quadratic by definition — unbounded would be the wrong default at any
  scale — so the bound IS the query's contract and applies in every mode.
  The corpus-scale semantics live in the approximate twins, which are
  unbounded; COVERAGE.md's anchor table records the pairing.

The mode is read once at import because registered oracle SQL strings are
built at import; one process gets one consistent mode on both engines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MODE = os.environ.get("SPARK_GRAFT_ANCHOR_SLICES", "full")
if MODE not in ("full", "bounded"):  # pragma: no cover - config error path
    raise ValueError(
        f"SPARK_GRAFT_ANCHOR_SLICES must be 'full' or 'bounded', got {MODE!r}"
    )


class AnchorSlice:
    """An id-slice predicate applied identically to a Spark plan and its
    DuckDB oracle; when inactive it is a no-op filter / ``TRUE``."""

    def __init__(self, column: str, bound: int, *, kind: str, mode: str | None = None):
        if kind not in ("gate", "contract"):
            raise ValueError(f"kind must be 'gate' or 'contract', got {kind!r}")
        self.column = column
        self.bound = bound
        self.kind = kind
        self.active = kind == "contract" or (mode or MODE) == "bounded"

    @property
    def sql(self) -> str:
        """WHERE-clause fragment for the oracle (``TRUE`` when inactive)."""
        return f"{self.column} < {self.bound}" if self.active else "TRUE"

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(F.col(self.column) < self.bound) if self.active else df

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        state = "active" if self.active else "inactive"
        return f"AnchorSlice({self.column} < {self.bound}, {self.kind}, {state})"
