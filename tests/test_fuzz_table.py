"""Model-based fuzz for the table layout: a seeded random sequence of
delete / merge / CDC-apply / compact / expire commits against a plain
Python dict model — after every commit the reconciling scan must equal
the model exactly, and time travel must still reproduce any retained
snapshot. The per-op invariants live in test_table; this checks their
COMPOSITION under orderings nobody hand-writes."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ocr_spark.plans import table as TBL


def _read_all(spark, path, snapshot_id=None):
    df = TBL.scan_pruned(spark, path, snapshot_id=snapshot_id)
    return {
        r["doc_id"]: (r["text"], r["lang"]) for r in df.collect()
    }


@pytest.mark.parametrize("seed", [20260818, 7])
def test_random_commit_sequences_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    langs = ["en", "ru", "de"]

    def mk_rows(ids):
        return [(i, f"body {i} v{rng.randint(0, 9)}", langs[i % 3]) for i in ids]

    model = {i: None for i in range(60)}
    rows = mk_rows(range(60))
    for i, t, lg in rows:
        model[i] = (t, lg)
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    path = str(tmp_path / f"fuzz_{seed}")
    TBL.write_partitioned(docs, path, partition_cols=("lang",), stats_col="doc_id")
    snapshots_seen = {TBL.read_manifest(path)["snapshot_id"]: dict(model)}

    ops = []
    for step in range(12):
        op = rng.choice(["delete", "merge", "cdc", "compact", "expire", "append"])
        ops.append(op)
        if op == "delete":
            lo = rng.randint(0, 80)
            hi = lo + rng.randint(0, 15)
            TBL.delete_where(spark, path, F.col("doc_id").between(lo, hi))
            for i in list(model):
                if lo <= i <= hi:
                    del model[i]
        elif op == "merge":
            ids = rng.sample(range(0, 100), rng.randint(1, 6))
            rows = mk_rows(ids)
            upd = spark.createDataFrame(rows, "doc_id long, text string, lang string")
            TBL.merge_upsert(spark, path, upd)
            for i, t, lg in rows:
                model[i] = (t, lg)
        elif op == "cdc":
            present = sorted(model)
            if not present:
                continue
            del_ids = rng.sample(present, min(len(present), rng.randint(1, 3)))
            ins_ids = rng.sample(range(100, 160), rng.randint(1, 3))
            rows = [(i, "x", "en", "delete") for i in del_ids] + [
                (i, t, lg, "upsert") for i, t, lg in mk_rows(ins_ids)
            ]
            upd = spark.createDataFrame(
                rows, "doc_id long, text string, lang string, op string"
            )
            TBL.merge_upsert(spark, path, upd, op_col="op")
            for i in del_ids:
                del model[i]
            for i, t, lg, _ in rows[len(del_ids):]:
                model[i] = (t, lg)
        elif op == "compact":
            TBL.compact(spark, path)
        elif op == "expire":
            TBL.expire_snapshots(path, keep_last=rng.randint(1, 3))
            retained = {s["snapshot_id"] for s in TBL.snapshots(path)}
            snapshots_seen = {
                k: v for k, v in snapshots_seen.items() if k in retained
            }
        else:  # append
            base = 200 + step * 10
            rows = mk_rows(range(base, base + rng.randint(1, 5)))
            extra = spark.createDataFrame(rows, "doc_id long, text string, lang string")
            TBL.append_batch(extra, path, batch_id=step, partition_cols=("lang",))
            for i, t, lg in rows:
                model[i] = (t, lg)

        got = _read_all(spark, path)
        assert got == model, f"seed={seed} step={step} ops={ops}"
        sid = TBL.read_manifest(path)["snapshot_id"]
        snapshots_seen[sid] = dict(model)

    # every retained snapshot still reproduces the state it committed
    retained = {s["snapshot_id"] for s in TBL.snapshots(path)}
    checked = 0
    for sid, want in snapshots_seen.items():
        if sid in retained:
            assert _read_all(spark, path, snapshot_id=sid) == want, (
                f"seed={seed} time travel to {sid} diverged; ops={ops}"
            )
            checked += 1
    assert checked >= 1

    # stats stay exact through the whole history
    st = TBL.table_stats(spark, path)
    assert st["rows"] == len(model)
    counts = {
        r["lang"]: r["rows"] for r in TBL.table_partition_counts(spark, path)
    }
    want_counts: dict = {}
    for t, lg in model.values():
        want_counts[lg] = want_counts.get(lg, 0) + 1
    assert counts == want_counts
