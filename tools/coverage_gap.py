#!/usr/bin/env python
"""Audit driver-correctness coverage of the query contract.

Diffs ``entry_queries.QUERIES`` (the full registered contract) against the
union of all ``CORRECTNESS_r*.json`` rows the driver has written, and prints:

  * per-round green counts,
  * the union of driver-green queries,
  * the never-checked set (no driver row at all),
  * the checked-but-red set (latest row not all-green),
  * the changed-since-last-row set (graded before a semantics change —
    ``entry_queries._CHANGED_AFTER_ROUND``, self-expiring),
  * a verification that the live registration order puts red, changed, and
    never-checked queries ahead of already-green ones (the self-maintaining
    rotation implemented by ``entry_queries._reorder_for_driver``).

The classification REUSES entry_queries' own ``_all_green`` and
``_driver_history`` so this audit can never drift from what the rotation
actually computes. Exit status is non-zero if the rotation invariant is
violated, so CI or a pre-commit hook can gate on it. Run from the repo
root:

    python tools/coverage_gap.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def main() -> int:
    sys.path.insert(0, str(ROOT))
    from ocr_spark.plans import entry_queries as eq

    names = list(eq.QUERIES)
    seen, bad, max_round = eq._driver_history()
    seen &= set(names)

    changed = eq._changed_queries(max_round)
    never = [n for n in names if n not in seen and n not in changed]
    red = [n for n in names if n in seen and n in bad and n not in changed]
    green = [n for n in names if n in seen and n not in bad and n not in changed]

    # per-round green counts straight from the files, judged by the SHARED
    # _all_green — no duplicated criterion
    per_round = {}
    for f in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        rows = json.loads(f.read_text())
        per_round[f.name] = sum(1 for v in rows.values() if eq._all_green(v))

    print(f"contract queries : {len(names)}")
    for fname, cnt in per_round.items():
        print(f"  {fname}: {cnt} green")
    print(f"driver-green union: {len(green)}/{len(names)}")
    print(f"checked-but-red   : {len(red)}  {red if red else ''}")
    if changed:
        print(f"changed-since-row (grade first, self-expiring): {sorted(changed)}")
    print(f"never-checked     : {len(never)}")
    if never:
        print("  " + ", ".join(never))
    stale = sorted((set(max_round) - set(names)))
    if stale:
        print(f"stale driver rows (no longer registered): {stale}")

    # Rotation invariant: red and changed queries precede never-checked,
    # and never-checked precede green, in registration order.
    pos = {n: i for i, n in enumerate(names)}
    ok = True
    front = red + sorted(changed & set(names), key=pos.get)
    if front and never and max(pos[n] for n in front) > min(pos[n] for n in never):
        ok = False
        print("VIOLATION: a red/changed query registers after a never-checked one")
    if never and green and max(pos[n] for n in never) > min(pos[n] for n in green):
        ok = False
        print("VIOLATION: a never-checked query registers after a green one")
    if front and green and max(pos[n] for n in front) > min(pos[n] for n in green):
        ok = False
        print("VIOLATION: a red/changed query registers after a green one")
    print("rotation order    :", "OK (red/changed < never-checked < green)" if ok else "BROKEN")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
