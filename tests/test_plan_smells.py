"""Physical-plan regression contract: no query in the audited roster may
grow an UNREVIEWED plan smell (cartesian product, nested-loop join,
row-at-a-time Python UDF, or an unreviewed sort-merge join). The reviewed
exceptions live in tools/explain_audit.ACCEPTED with their justification;
adding a smell means either fixing the plan or arguing the shape there —
never silently shipping it."""

from __future__ import annotations

from tools.explain_audit import AUDIT, plan_of, unaccepted_smells


def test_no_unreviewed_plan_smells(spark):
    bad = {}
    for name in AUDIT:
        smells = unaccepted_smells(name, plan_of(spark, name))
        if smells:
            bad[name] = smells
    assert not bad, f"unreviewed plan smells: {bad}"
