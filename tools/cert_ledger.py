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
  and fresh.

Usage: python tools/cert_ledger.py [--names]   (--names lists the debt)
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE_ANCHORS = {"flagship_regional_revenue", "events_session_window"}


def main() -> int:
    from lms_etl_pipeline_spark.plans import catalog  # registers via package
    import lms_etl_pipeline_spark.plans  # noqa: F401

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    certified: set[str] = set()
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            doc = json.load(fh)
        for name, row in doc.items():
            certified.add(name)
            if row.get("rows_match") and row.get("hash_match") is not False:
                green.add(name)

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
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
