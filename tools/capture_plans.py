"""Capture .explain("formatted") for headline queries into plans/r12/.

Usage: python tools/capture_plans.py <suffix> [query ...]

Writes plans/r12/<query>_<suffix>.txt for each named query (default: every
bench.py HEADLINE query). Queries whose builder executes eagerly
(dsir_importance_selection, quantile_exact_selection, mmr_diverse_selection)
still produce a file — the returned frame's plan plus a note — because the
real work happens at build time; their job structure is documented in
OPTIMIZATION_r12.md instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from lms_etl_pipeline_spark.session import get_spark

    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
