#!/usr/bin/env python
"""Audit driver-correctness coverage of the query contract.

Diffs ``entry_queries.QUERIES`` (the full registered contract) against the
union of all ``CORRECTNESS_r*.json`` rows the driver has written, and prints:

  * per-round green counts,
  * the union of driver-green queries,
  * the never-checked set (no driver row at all),
  * the checked-but-red set (latest row not all-green),
  * a verification that the live registration order puts never-checked and
    red queries ahead of already-green ones (the self-maintaining rotation
    implemented by ``entry_queries._reorder_for_driver``).

Exit status is non-zero if the rotation invariant is violated, so CI or a
pre-commit hook can gate on it. Run from the repo root:

    python tools/coverage_gap.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _all_green(v) -> bool:
    return (
        isinstance(v, dict)
        and bool(v.get("rows_match"))
        and bool(v.get("schema_match"))
        and bool(v.get("hash_match"))
    )


def load_history() -> tuple[dict[str, dict], dict[str, int]]:
    """Latest driver row per query (later rounds win) + per-round green counts."""
    latest: dict[str, dict] = {}
    per_round: dict[str, int] = {}
    for f in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        rows = json.loads(f.read_text())
        per_round[f.name] = sum(1 for v in rows.values() if _all_green(v))
        latest.update(rows)
    return latest, per_round


def main() -> int:
    sys.path.insert(0, str(ROOT))
    from ocr_spark.plans import entry_queries as eq

    names = list(eq.QUERIES)
    latest, per_round = load_history()

    seen = set(latest) & set(names)
    never = [n for n in names if n not in seen]
    red = [n for n in names if n in seen and not _all_green(latest[n])]
    green = [n for n in names if n in seen and _all_green(latest[n])]
    stale = sorted(set(latest) - set(names))  # driver rows for renamed/removed queries

    print(f"contract queries : {len(names)}")
    for fname, cnt in per_round.items():
        print(f"  {fname}: {cnt} green")
    print(f"driver-green union: {len(green)}/{len(names)}")
    print(f"checked-but-red   : {len(red)}  {red if red else ''}")
    print(f"never-checked     : {len(never)}")
    if never:
        print("  " + ", ".join(never))
    if stale:
        print(f"stale driver rows (no longer registered): {stale}")

    # Rotation invariant: every red query precedes every never-checked query,
    # and every never-checked precedes every green one, in registration order.
    # Queries in entry_queries._CHANGED_THIS_ROUND are exempt: a changed
    # query grades ahead of the never-checked tier regardless of its last
    # row (its green row describes code that no longer exists).
    changed = getattr(eq, "_CHANGED_THIS_ROUND", set())
    if changed:
        print(f"changed-this-round (grade first): {sorted(changed)}")
    never = [n for n in never if n not in changed]
    green = [n for n in green if n not in changed]
    red = [n for n in red if n not in changed]
    pos = {n: i for i, n in enumerate(names)}
    ok = True
    if red and never and max(pos[n] for n in red) > min(pos[n] for n in never):
        ok = False
        print("VIOLATION: a red query registers after a never-checked one")
    if never and green and max(pos[n] for n in never) > min(pos[n] for n in green):
        ok = False
        print("VIOLATION: a never-checked query registers after a green one")
    if red and green and max(pos[n] for n in red) > min(pos[n] for n in green):
        ok = False
        print("VIOLATION: a red query registers after a green one")
    print("rotation order    :", "OK (red < never-checked < green)" if ok else "BROKEN")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
