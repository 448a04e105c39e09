"""Local differential harness mimicking the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet fixtures, then compares row count, column
names, and order-insensitive values (exact, NaN-safe).  Usage:

    python tools/check_oracle.py [sf_dir] [query ...]

Exit code 0 iff every checked query matches.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            # canonicalize signed zero: -0.0 == 0.0 in SQL but reprs (and
            # hashes) differ, and WHICH zero IEEE min/max/subtraction
            # return is engine-dependent (fuzz seed 0: GREATEST(-0.0, 0.0)
            # and decimal-roundtrip means flipped the sign bit between
            # engines on four queries while every VALUE matched)
            return 0.0
        return v
    return v


def hugeint_columns(rel) -> list[str]:
    """Columns of a DuckDB relation whose native cell class diverges from
    the Spark fetch path's at equal values: int128 (HUGEINT) and ANY
    DECIMAL(p,s).

    The external driver hashes cells by native type: HUGEINT mismatches
    Spark's BIGINT, and a DECIMAL column fetches as ``decimal.Decimal``
    whose hash/repr differs from Spark's int/float even when every value
    is equal (round 10's sole red driver row, `quality_classifier_train`,
    was the one DECIMAL(38,0) output among 297 oracles).  Our fetchall()
    comparator normalizes both classes -> Python scalars and is blind to
    them, so this gate makes the defect structurally detectable: every
    integer aggregate in an oracle must be CAST(... AS BIGINT) (split
    into BIGINT limbs if the sum can exceed int64), and no query may
    emit a decimal-typed output column on either side.
    """
    return [
        c
        for c, t in zip(rel.columns, (str(t) for t in rel.types))
        if "HUGEINT" in t or "DECIMAL" in t
    ]


def spark_decimal_columns(sdf) -> list[str]:
    """Spark-side twin of the decimal rule: output DecimalType columns
    fetch as ``decimal.Decimal`` and diverge in the driver's native-type
    hashing exactly like DuckDB DECIMAL does (same defect class from the
    other engine)."""
    return [c for c, t in sdf.dtypes if t.startswith("decimal")]


# Refuse to materialize comparator inputs past this many rows.  Guards the
# harness against result sets that are quadratic in data properties (e.g.
# simhash_exact_pairs' lossless blocking on a duplicate-dense adversarial
# corpus): the gate then FAILS with a named bound instead of OOMing the
# collect.  The probe is a LIMIT bound+1, so the common case costs nothing
# extra — when under the bound, the probe IS the full result.
MAX_COMPARE_ROWS = int(os.environ.get("ORACLE_MAX_COMPARE_ROWS", "2000000"))


#: native Python classes treated as one family for the cross-engine cell
#: class check (bool is deliberately NOT folded into int)
_CLASS_FAMILIES = {"bytearray": "bytes", "bytes": "bytes"}


def _cell_family(v) -> str:
    n = type(v).__name__
    return _CLASS_FAMILIES.get(n, n)


def native_class_divergences(s_rows, s_idx, duck_rows, d_idx, cols) -> list[str]:
    """Columns whose first non-null cell has a DIFFERENT native Python
    class on the two fetch paths.

    Generalizes the HUGEINT/DECIMAL rules (round 11, VERDICT r10 #2): the
    external driver hashes cells by native type, so int-vs-Decimal,
    float-vs-Decimal, or date-vs-datetime diverge even at equal values,
    while the repr-based comparator can be blind to some of them.
    """
    out = []
    for c in cols:
        sv = next((r[s_idx[c]] for r in s_rows if r[s_idx[c]] is not None), None)
        dv = next((r[d_idx[c]] for r in duck_rows if r[d_idx[c]] is not None), None)
        if sv is None or dv is None:
            continue
        if _cell_family(sv) != _cell_family(dv):
            out.append(
                f"native cell class diverges in column {c!r}: "
                f"spark={type(sv).__name__} duck={type(dv).__name__}"
            )
    return out


def compare(name: str, spark_df, duck_rows, duck_cols) -> list[str]:
    problems: list[str] = []
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_cols)
    if s_cols != d_cols:
        return [f"schema mismatch: spark={s_cols} duck={d_cols}"]
    s_rows = spark_df.limit(MAX_COMPARE_ROWS + 1).collect()
    if len(s_rows) > MAX_COMPARE_ROWS or len(duck_rows) > MAX_COMPARE_ROWS:
        return [
            f"result exceeds the {MAX_COMPARE_ROWS}-row comparator bound "
            f"(spark>{len(s_rows) - 1 if len(s_rows) > MAX_COMPARE_ROWS else len(s_rows)}, "
            f"duck>{len(duck_rows) - 1 if len(duck_rows) > MAX_COMPARE_ROWS else len(duck_rows)}) "
            "— candidate blow-up? raise ORACLE_MAX_COMPARE_ROWS to override"
        ]
    if len(s_rows) != len(duck_rows):
        problems.append(f"rowcount mismatch: spark={len(s_rows)} duck={len(duck_rows)}")
    s_idx = {c: i for i, c in enumerate(spark_df.columns)}
    d_idx = {c: i for i, c in enumerate(duck_cols)}
    problems.extend(
        native_class_divergences(s_rows, s_idx, duck_rows, d_idx, s_cols)
    )
    s_vals = sorted(
        tuple(repr(_norm_cell(r[s_idx[c]])) for c in s_cols) for r in s_rows
    )
    d_vals = sorted(
        tuple(repr(_norm_cell(r[d_idx[c]])) for c in d_cols) for r in duck_rows
    )
    if s_vals != d_vals:
        # find first differing row for diagnostics
        for a, b in zip(s_vals, d_vals):
            if a != b:
                problems.append(f"value mismatch, first diff:\n  spark={a}\n  duck ={b}")
                break
        else:
            problems.append("value mismatch (length differs)")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from lms_etl_pipeline_spark.session import get_spark

    spark = get_spark("oracle-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        path = f"{sf_dir}/{t}.parquet"
        # driver fixtures are single files; Spark-written fixtures (the
        # synthetic deep-sweep scales under .scratch/) are directories
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            if name not in oracles:
                cnt = sdf.count()
                print(f"  ~ {name}: rows-only ({cnt} rows)")
                n_rows_only += 1
                continue
            rel = con.sql(oracles[name])
            duck_cols = list(rel.columns)
            problems = [
                f"oracle emits driver-unsafe HUGEINT/DECIMAL in column {c!r} "
                f"(CAST to BIGINT, or split into BIGINT limbs)"
                for c in hugeint_columns(rel)
            ] + [
                f"Spark plan emits driver-unsafe DECIMAL in column {c!r} "
                f"(cast to bigint/double, or split into BIGINT limbs)"
                for c in spark_decimal_columns(sdf)
            ]
            duck_rows = rel.limit(MAX_COMPARE_ROWS + 1).fetchall()
            if not problems:
                problems = compare(name, sdf, duck_rows, duck_cols)
        except Exception as exc:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(exc).__name__}: {exc}"]
        if problems:
            n_fail += 1
            print(f"  ✗ {name}")
            for p in problems:
                print(f"      {p}")
        else:
            n_pass += 1
            print(f"  ✓ {name}")

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
