"""COVERAGE.md vs driver reality (round 11, VERDICT r10 hygiene #8).

Round 10 shipped a COVERAGE.md line marked ✅ for `quality_classifier_train`
while the driver's latest row for it was hash-red — the local gate passed
(it normalizes Decimal → int), so the bookkeeping silently overstated
certification.  This gate makes that impossible going forward:

For every query named on a ✅ COVERAGE.md line, if the query's LATEST
driver row (newest CORRECTNESS_r*.json that mentions it) is non-green
(rows/schema/hash false, or err), the line must carry the literal marker
``driver-pending`` — otherwise this gate fails and preflight refuses the
round.  Demotion is therefore forced to be explicit and named, never
implied.

Exit 0 = consistent.  Runs in milliseconds (pure artifact parse).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def latest_driver_rows() -> dict[str, tuple[str, dict]]:
    """query -> (artifact name, row) from the NEWEST artifact mentioning it."""
    latest: dict[str, tuple[str, dict]] = {}
    for path in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        try:
            doc = json.loads(path.read_text())
        except ValueError:
            continue
        for name, row in doc.items():
            if isinstance(row, dict):
                latest[name] = (path.name, row)  # sorted => newest wins
    return latest


def is_green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match") is not False
        and row.get("hash_match") is not False
        and not row.get("err")
    )


def rows_only_names() -> set[str]:
    """Queries registered with ``oracle=None`` — rows-only BY DESIGN.

    A driver row carrying ``err='no_oracle'`` for one of these is the
    EXPECTED outcome of sampling it (the driver has no SQL to diff
    against), not a defect: round 11 rotated the 10 rows-only queries
    into the window and the gate started flagging their ✅ lines.  Treat
    that specific (err='no_oracle', oracle is None) combination as green.
    """
    import sys

    sys.path.insert(0, str(ROOT))
    import __spark_entry__ as em

    registered = set(em.queries())
    with_oracle = set(em.oracle_sql())
    return registered - with_oracle


def main() -> int:
    latest = latest_driver_rows()
    rows_only = rows_only_names()
    red = {
        n
        for n, (_, row) in latest.items()
        if not is_green(row)
        and not (row.get("err") == "no_oracle" and n in rows_only)
    }
    problems: list[str] = []
    for lineno, line in enumerate(
        (ROOT / "COVERAGE.md").read_text().splitlines(), start=1
    ):
        if "✅" not in line or "driver-pending" in line:
            continue
        for name in re.findall(r"`([a-z0-9_]+)`", line):
            if name in red:
                art, row = latest[name]
                problems.append(
                    f"COVERAGE.md:{lineno}: ✅ line names `{name}` but its "
                    f"latest driver row ({art}) is non-green "
                    f"(rows={row.get('rows_match')} schema={row.get('schema_match')} "
                    f"hash={row.get('hash_match')} err={row.get('err')!r}) — "
                    "mark the line 'driver-pending' or fix the query"
                )
    for p in problems:
        print(p)
    n_checked = len(latest)
    print(
        f"coverage_gate: {len(problems)} violation(s); "
        f"{len(red)} red of {n_checked} driver-known queries"
    )
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
