"""Driver-certification ledger: which catalog queries have a driver row.

The external driver differential-checks the FIRST 50 ``queries()``
entries each round and records the results in ``CORRECTNESS_r{N}.json``.
This tool reconciles those artifacts against the current catalog so the
per-round ``_PRIORITY`` rotation (plans/catalog.py) is mechanical:

- cumulative certified = union of green rows across every CORRECTNESS
  artifact in the repo root;
- debt = oracle-backed queries that have never occupied a window row;
- window preview = what the driver will sample THIS round, split into
  already-certified (wasted slots, minus the documented smoke anchors)
  and fresh;
- anchor chain (round 8): every rows-only query's NAMED exact anchor
  (the COVERAGE.md table, mirrored in ROWS_ONLY_ANCHORS below) is
  reconciled against the same artifacts — a rows-only query whose anchor
  was never driver-green, or with no declared anchor at all, is flagged
  and fails the ledger, so the approx-path coverage claim is
  machine-derived, not prose.

Usage: python tools/cert_ledger.py [--names]   (--names lists the debt)
Exit 1 if the anchor chain is broken.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE_ANCHORS = {"flagship_regional_revenue", "events_session_window"}

# rows-only query -> its named EXACT anchors (every one must be oracle-backed
# and driver-green somewhere).  Keep in sync with the COVERAGE.md table —
# test_catalog.py cross-checks this against the live catalog's rows-only set.
ROWS_ONLY_ANCHORS: dict[str, tuple[str, ...]] = {
    "agg_approx_count_distinct": ("agg_distinct_counts",),
    "agg_approx_percentiles": ("agg_percentiles_exact",),
    "sketch_hll_partial_merge": ("agg_distinct_counts",),
    "dedup_simhash": ("simhash_exact_pairs",),
    "knn_cosine_lsh": ("knn_cosine_exact", "ann_recall_eval"),
    "knn_cosine_ivf": ("knn_cosine_exact", "ann_recall_eval"),
    "knn_mllib_brp": ("knn_cosine_exact",),
    "near_dup_pairs_mllib": ("near_dup_pairs_lsh",),
    "sample_fraction": ("sample_stable_per_group",),
    "sample_stratified_by_priority": (
        "sample_stable_per_group",
        "systematic_sample_stratified",
    ),
}


def main() -> int:
    from lms_etl_pipeline_spark.plans import catalog  # registers via package
    import lms_etl_pipeline_spark.plans  # noqa: F401

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    certified: set[str] = set()
    green: set[str] = set()
    green_round: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path).removeprefix("CORRECTNESS_").removesuffix(".json")
        with open(path) as fh:
            doc = json.load(fh)
        for name, row in doc.items():
            certified.add(name)
            if row.get("rows_match") and row.get("hash_match") is not False:
                green.add(name)
                green_round.setdefault(name, rnd)

    queries = list(catalog.all_queries())
    oracles = set(catalog.all_oracles())
    window = queries[:50]
    debt = [n for n in queries if n in oracles and n not in certified]
    fresh = [n for n in window if n not in certified]
    wasted = [n for n in window if n in certified and n not in SMOKE_ANCHORS]

    print(f"catalog: {len(queries)} queries / {len(oracles)} oracle-backed")
    print(f"cumulative driver rows: {len(certified)} ({len(green)} green)")
    print(f"never-certified oracle-backed debt: {len(debt)}")
    print(f"current window: {len(fresh)} fresh, {len(wasted)} re-certifying "
          f"(excl. {len(SMOKE_ANCHORS)} smoke anchors)")
    if wasted:
        print("  re-certifying (candidates to rotate out):")
        for n in wasted:
            print(f"    {n}")
    if "--names" in sys.argv:
        print("debt:")
        for n in debt:
            print(f"  {n}")

    # --- anchor chain: rows-only queries -> exact anchors -> driver round ---
    rows_only = [n for n in queries if n not in oracles]
    broken: list[str] = []
    print("anchor chain (rows-only -> exact anchor @ first green round):")
    for n in rows_only:
        anchors = ROWS_ONLY_ANCHORS.get(n)
        if anchors is None:
            broken.append(f"{n}: rows-only with NO declared exact anchor")
            print(f"  {n}: NO DECLARED ANCHOR")
            continue
        parts = []
        for a in anchors:
            if a not in oracles:
                broken.append(f"{n}: anchor {a} is not oracle-backed")
                parts.append(f"{a} @ NOT-ORACLE-BACKED")
            elif a in green_round:
                parts.append(f"{a} @ {green_round[a]}")
            else:
                broken.append(f"{n}: anchor {a} never driver-green")
                parts.append(f"{a} @ UNCERTIFIED")
        print(f"  {n}: " + ", ".join(parts))
    for n in sorted(set(ROWS_ONLY_ANCHORS) - set(rows_only)):
        broken.append(f"{n}: declared in ROWS_ONLY_ANCHORS but not rows-only in the catalog")
    if broken:
        print("ANCHOR CHAIN BROKEN:")
        for b in broken:
            print(f"  - {b}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
