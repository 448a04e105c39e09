"""Window type-pairing screen: no novel (Spark, DuckDB) column types.

The one driver-red class this repo has ever produced (round 4) was not a
value bug but a TYPE pairing the local comparator normalizes and the
external driver's hasher distinguishes (DuckDB HUGEINT vs Spark BIGINT).
The HUGEINT case is now structurally rejected at gate time
(tools/check_oracle.py); this tool generalizes the screen the rotation
has applied by hand since round 5: every (Spark column type, DuckDB
column type) pairing emitted by a DRIVER-WINDOW query must already
appear in some query that has been driver-green in a past round — a
novel pairing is not an error, but it IS untested hasher surface and
should be flagged before spending a certification slot on it.

Cheap by construction: Spark schemas come from the lazy plan (no
execution), DuckDB types from relation metadata (no fetch).

Usage: python tools/type_pairings.py [sf_dir] [--all]
Exit 1 if a window query emits a pairing no driver-green query has.
``--all`` screens the ENTIRE oracle-backed catalog instead of just the
window — the pre-clearance run for future rotations (novel pairings are
then informational, exit stays 0 unless a WINDOW query is novel).
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from lms_etl_pipeline_spark.session import get_spark

    spark = get_spark("type-pairings")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if row.get("hash_match"):
                    green.add(name)

    def pairings(name: str) -> set[tuple[str, str]] | None:
        if name not in oracles:
            return None
        sdf = qs[name](spark, sf_dir)
        stypes = dict(sdf.dtypes)
        rel = con.sql(oracles[name])
        dtypes = {c: str(t) for c, t in zip(rel.columns, rel.types)}
        return {(stypes[c], dtypes[c]) for c in stypes if c in dtypes}

    seen: set[tuple[str, str]] = set()
    for name in sorted(green):
        if name not in qs:
            continue
        try:
            p = pairings(name)
        except Exception as exc:  # noqa: BLE001
            print(f"  ! {name}: {type(exc).__name__}: {exc}")
            continue
        if p:
            seen |= p

    window = set(list(qs)[:50])
    targets = list(qs) if "--all" in sys.argv else list(window)
    failures: list[str] = []
    informational: list[str] = []
    for name in targets:
        try:
            p = pairings(name)
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
            continue
        if p is None:
            continue
        novel = p - seen
        status = "ok" if not novel else f"NOVEL {sorted(novel)}"
        print(f"  {status:60s} {name}")
        if novel and name in window:
            failures.append(f"{name}: untested type pairings {sorted(novel)}")
        elif novel:
            informational.append(f"{name}: {sorted(novel)}")

    print(f"\n{len(seen)} pairings certified driver-green; "
          f"{len(failures)} window queries with novel pairings; "
          f"{len(informational)} non-window (informational)")
    for f in failures:
        print(" -", f)
    for f in informational:
        print(" ~", f)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
