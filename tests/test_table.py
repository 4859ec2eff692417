"""Partitioned table layout + snapshot-manifest pruning (plans/table.py)."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from ocr_spark.plans import table as TBL


def _mk_docs(spark, n=240):
    langs = ["en", "ru", "de"]
    rows = [
        (i, f"document body {i} " * 3, langs[i % 3] if i % 40 != 7 else None)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def _tmp(spark, name):
    return os.path.join(
        "/tmp", f"ocr_spark_table_test_{name}_{spark.sparkContext.applicationId}"
    )


def test_roundtrip_and_pruned_scan_equal_full_filter(spark):
    docs = _mk_docs(spark)
    path = _tmp(spark, "rt")
    TBL.write_partitioned(docs, path, partition_cols=("lang",), stats_col="doc_id")

    # full round-trip (null lang lands in the hive default partition)
    back = spark.read.option("basePath", path).parquet(path)
    assert back.count() == docs.count()

    got = sorted(
        (r["doc_id"], r["lang"])
        for r in TBL.scan_pruned(
            spark, path, lo=50, hi=149, partition_eq={"lang": "en"}
        ).collect()
    )
    exp = sorted(
        (r["doc_id"], r["lang"])
        for r in docs.filter(
            (F.col("lang") == "en") & F.col("doc_id").between(50, 149)
        ).collect()
    )
    assert got == exp and got


def test_hive_partition_pruning_appears_in_plan(spark):
    docs = _mk_docs(spark)
    path = _tmp(spark, "pp")
    TBL.write_partitioned(docs, path, partition_cols=("lang",), stats_col="doc_id")
    plan = (
        spark.read.parquet(path)
        .filter(F.col("lang") == "ru")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "ru" in plan


def test_manifest_file_skipping_reads_fewer_files(spark):
    docs = _mk_docs(spark)
    path = _tmp(spark, "fs")
    m = TBL.write_partitioned(
        docs, path, partition_cols=("lang",), stats_col="doc_id", n_range_files=8
    )
    total = len(m["files"])
    picked = TBL.prune_files(m, lo=0, hi=29, partition_eq={"lang": "en"})
    assert 0 < len(picked) < total
    # every skipped en-file is genuinely out of range
    for f in m["files"]:
        if f["partition"]["lang"] == "en" and f not in picked:
            assert f["min"] > 29 or f["max"] < 0
    got = TBL.scan_pruned(spark, path, lo=0, hi=29, partition_eq={"lang": "en"})
    exp = docs.filter((F.col("lang") == "en") & F.col("doc_id").between(0, 29))
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in exp.collect()
    )


def test_empty_selection_yields_empty_frame_with_schema(spark):
    docs = _mk_docs(spark, n=30)
    path = _tmp(spark, "empty")
    TBL.write_partitioned(docs, path, partition_cols=("lang",), stats_col="doc_id")
    out = TBL.scan_pruned(spark, path, lo=10_000, hi=20_000)
    assert out.count() == 0
    assert "doc_id" in out.columns and "lang" in out.columns


def test_manifest_commit_is_atomic_rename(spark):
    docs = _mk_docs(spark, n=30)
    path = _tmp(spark, "atomic")
    TBL.write_partitioned(docs, path, partition_cols=("lang",), stats_col="doc_id")
    m = TBL.read_manifest(path)
    assert m["format_version"] == 2 and m["files"]
    # recommit a modified snapshot; the file must never be torn
    m["files"] = m["files"][:1]
    TBL.commit_manifest(path, m)
    again = TBL.read_manifest(path)
    assert len(again["files"]) == 1
    assert not os.path.exists(
        os.path.join(path, TBL.MANIFEST_DIR, TBL.MANIFEST_NAME + ".tmp")
    )
    # the manifest on disk is valid JSON end-to-end
    with open(os.path.join(path, TBL.MANIFEST_DIR, TBL.MANIFEST_NAME)) as fh:
        json.load(fh)


def test_curate_publish_table_stage(spark, tmp_path):
    """--publish-table writes the curated survivors through the layout:
    partition dirs by lang, manifest rows equal to the committed output,
    pruned scan equals a plain filter on the survivors."""
    from jobs.curate_job import run_curate

    rows = []
    sw = "the and of to in is was for".split()
    for i in range(30):
        words = [f"w{i}x{j}" if j % 3 else sw[j % len(sw)] for j in range(70)]
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    inp = str(tmp_path / "in.parquet")
    docs.write.parquet(inp)

    out = tmp_path / "cur"
    pub = str(tmp_path / "published")
    summary = run_curate(
        spark, inp, str(out), dedup_mode="exact", num_buckets=4,
        publish_table=pub,
    )
    kept = spark.read.parquet(str(out / "bucket=*"))
    assert summary["published"]["rows"] == kept.count()
    back = spark.read.option("basePath", pub).parquet(pub)
    assert back.count() == kept.count()
    got = sorted(
        r["doc_id"]
        for r in TBL.scan_pruned(spark, pub, lo=5, hi=14).collect()
    )
    exp = sorted(
        r["doc_id"] for r in kept.filter(F.col("doc_id").between(5, 14)).collect()
    )
    assert got == exp


def test_stream_to_table_commits_batches_with_manifest(spark, tmp_path):
    """Structured-Streaming ingestion: microbatches land as their own
    file_group=batch-<id> dirs, the manifest covers every committed file, pruned
    scans equal plain filters, and replaying a batch id is idempotent."""
    docs = _mk_docs(spark, n=120)
    src = str(tmp_path / "src")
    docs.filter("doc_id < 60").coalesce(1).write.mode("append").parquet(src)
    docs.filter("doc_id >= 60").coalesce(1).write.mode("append").parquet(src)

    tbl = str(tmp_path / "stream_tbl")
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        TBL.stream_to_table(stream, tbl, str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    back = spark.read.option("basePath", tbl).parquet(tbl)
    assert back.count() == 120
    assert TBL.BATCH_COL in back.columns  # one hive level per microbatch
    assert back.select(TBL.BATCH_COL).distinct().count() >= 2

    m = TBL.read_manifest(tbl)
    assert sum(f["rows"] for f in m["files"]) == 120
    got = sorted(
        r["doc_id"]
        for r in TBL.scan_pruned(
            spark, tbl, lo=20, hi=99, partition_eq={"lang": "en"}
        ).collect()
    )
    exp = sorted(
        r["doc_id"]
        for r in docs.filter(
            (F.col("lang") == "en") & F.col("doc_id").between(20, 99)
        ).collect()
    )
    assert got == exp

    # at-least-once replay: re-committing batch 0 with the same rows must
    # not duplicate anything (its directory is overwritten, not appended)
    batch0 = spark.read.parquet(src).filter("doc_id < 60")
    TBL.append_batch(batch0, tbl, 0)
    assert spark.read.option("basePath", tbl).parquet(tbl).count() == 120
    m2 = TBL.read_manifest(tbl)
    assert sum(f["rows"] for f in m2["files"]) == 120


def test_delete_where_is_copy_on_write_with_time_travel(spark, tmp_path):
    """Row delete rewrites only the files that contain matching rows;
    untouched files are carried by reference, and the pre-delete
    snapshot stays byte-readable (time travel)."""
    docs = _mk_docs(spark, n=240)
    path = str(tmp_path / "cow")
    m0 = TBL.write_partitioned(
        docs, path, partition_cols=("lang",), stats_col="doc_id", n_range_files=8
    )
    assert m0["snapshot_id"] == 0 and m0["operation"] == "overwrite"

    m1 = TBL.delete_where(spark, path, "doc_id BETWEEN 0 AND 14")
    assert m1["snapshot_id"] == 1 and m1["operation"] == "delete"
    # copy-on-write: most files are shared between the two snapshots
    f0 = {f["path"] for f in m0["files"]}
    f1 = {f["path"] for f in m1["files"]}
    assert f0 & f1, "untouched files must be carried by reference"
    assert f1 - f0, "rewritten survivors must be new files"

    head = sorted(r["doc_id"] for r in TBL.scan_pruned(spark, path).collect())
    assert head == list(range(15, 240))
    old = TBL.scan_pruned(spark, path, snapshot_id=0)
    assert old.count() == 240  # time travel to the pre-delete snapshot

    # no-match delete: no new snapshot committed
    m_same = TBL.delete_where(spark, path, "doc_id > 10000000")
    assert m_same["snapshot_id"] == 1
    log = TBL.snapshots(path)
    assert [s["snapshot_id"] for s in log] == [0, 1]
    assert [s["operation"] for s in log] == ["overwrite", "delete"]


def test_merge_upsert_replaces_matched_and_inserts_new(spark, tmp_path):
    """MERGE: matched keys replace the stored row (even across a
    partition-value change), unmatched keys insert; untouched files are
    carried by reference."""
    docs = _mk_docs(spark, n=90)
    path = str(tmp_path / "merge")
    m0 = TBL.write_partitioned(docs, path, n_range_files=6)

    updates = spark.createDataFrame(
        [
            (5, "five rewritten", "en"),   # was lang 'de' (5 % 3 == 2)
            (7, "seven rewritten", "ru"),
            (1000, "brand new", "xx"),     # insert
        ],
        ["doc_id", "text", "lang"],
    )
    m1 = TBL.merge_upsert(spark, path, updates)
    assert m1["operation"] == "merge"
    assert {f["path"] for f in m0["files"]} & {f["path"] for f in m1["files"]}

    back = {r["doc_id"]: r for r in TBL.scan_pruned(spark, path).collect()}
    assert len(back) == 91
    assert back[5]["text"] == "five rewritten" and back[5]["lang"] == "en"
    assert back[7]["text"] == "seven rewritten"
    assert back[1000]["lang"] == "xx"
    assert back[6]["text"].startswith("document body 6")  # untouched
    # pre-merge snapshot unchanged
    assert TBL.scan_pruned(spark, path, snapshot_id=0).count() == 90


def test_compact_and_expire_snapshots(spark, tmp_path):
    """Compaction folds a many-file table into few range-clustered files
    with identical content; expire_snapshots drops old manifests and
    physically removes files only dead snapshots referenced."""
    docs = _mk_docs(spark, n=120)
    path = str(tmp_path / "cmp")
    TBL.write_partitioned(docs.filter("doc_id < 60"), path, n_range_files=6)
    TBL.append_batch(docs.filter("doc_id >= 60"), path, 0, n_range_files=6)
    m_before = TBL.read_manifest(path)

    m_c = TBL.compact(spark, path, n_range_files=2)
    assert m_c["operation"] == "compact"
    assert len(m_c["files"]) < len(m_before["files"])
    got = sorted(
        (r["doc_id"], r["text"], r["lang"])
        for r in TBL.scan_pruned(spark, path).collect()
    )
    exp = sorted(
        (r["doc_id"], r["text"], r["lang"]) for r in docs.collect()
    )
    assert got == exp
    # pruned scan on the compacted table still skips files
    m = TBL.read_manifest(path)
    assert 0 < len(TBL.prune_files(m, lo=0, hi=9, partition_eq={"lang": "en"})) < len(
        m["files"]
    )
    # pre-compaction snapshots still readable
    assert TBL.scan_pruned(spark, path, snapshot_id=1).count() == 120

    res = TBL.expire_snapshots(path, keep_last=1)
    assert res["removed_manifests"] == 2 and res["removed_files"] > 0
    # HEAD unaffected; expired snapshot gone
    assert TBL.scan_pruned(spark, path).count() == 120
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        TBL.read_manifest(path, 0)
    # every file on disk is referenced by the kept snapshot
    import os as _os

    on_disk = set()
    for root, _d, names in _os.walk(path):
        if TBL.MANIFEST_DIR in root:
            continue
        on_disk.update(
            _os.path.join(root, n) for n in names if n.endswith(".parquet")
        )
    live = {TBL._local(f["path"]) for f in TBL.read_manifest(path)["files"]}
    assert on_disk == live


def test_schema_evolution_is_metadata_only(spark, tmp_path):
    """Add / rename / drop as a zero-file commit: the evolve snapshot
    carries the previous file list by reference; renamed columns resolve
    through the name mapping; added columns read as the initial default
    ONLY for rows written before the column existed; time travel to the
    pre-evolution snapshot restores the original shape."""
    docs = _mk_docs(spark, n=90)
    path = str(tmp_path / "evo")
    m0 = TBL.write_partitioned(docs, path, n_range_files=4)

    m1 = TBL.evolve_schema(
        path,
        rename={"text": "body"},
        add={"score": ("bigint", 7)},
    )
    assert m1["operation"] == "evolve"
    # metadata-only: identical file list, no new data files
    assert [f["path"] for f in m1["files"]] == [f["path"] for f in m0["files"]]

    head = TBL.scan_pruned(spark, path)
    assert head.columns == ["doc_id", "body", "lang", "score"]
    rows = {r["doc_id"]: r for r in head.collect()}
    assert rows[3]["body"].startswith("document body 3")
    assert all(r["score"] == 7 for r in rows.values())  # initial default

    # new writes carry the evolved schema; genuine nulls stay null
    updates = spark.createDataFrame(
        [(5, "five rewritten", "en", 99), (2000, "brand new", "xx", None)],
        "doc_id long, body string, lang string, score long",
    )
    TBL.merge_upsert(spark, path, updates)
    rows = {r["doc_id"]: r for r in TBL.scan_pruned(spark, path).collect()}
    assert rows[5]["score"] == 99 and rows[5]["body"] == "five rewritten"
    assert rows[2000]["score"] is None  # NOT the initial default
    assert rows[4]["score"] == 7  # old-file rows keep the default

    # delete through the renamed column name
    TBL.delete_where(spark, path, "body LIKE 'document body 1 %'")
    assert 1 not in {
        r["doc_id"] for r in TBL.scan_pruned(spark, path).collect()
    }

    # time travel to the pre-evolution snapshot: original shape and values
    old = TBL.scan_pruned(spark, path, snapshot_id=0)
    assert old.columns == ["doc_id", "text", "lang"]
    assert old.count() == 90

    # drop is also metadata-only and survives a compaction
    TBL.evolve_schema(path, drop=("score",))
    assert TBL.scan_pruned(spark, path).columns == ["doc_id", "body", "lang"]
    TBL.compact(spark, path, n_range_files=2)
    back = TBL.scan_pruned(spark, path)
    assert back.columns == ["doc_id", "body", "lang"]
    assert back.count() == 91 - 1

    import pytest as _pytest

    with _pytest.raises(ValueError):
        TBL.evolve_schema(path, rename={"doc_id": "id"})  # stats col
    with _pytest.raises(ValueError):
        TBL.evolve_schema(path, drop=("lang",))  # partition col


def test_zorder_compaction_prunes_on_both_columns(spark, tmp_path):
    """Z-order clustering: values are untouched; the manifest records
    per-file [min, max] for every clustered column, so file skipping
    works on BOTH dimensions — where range clustering on doc_id alone
    cannot skip anything for a predicate on the second column."""
    rows = [(i, (i * 37) % 1000, f"payload {i}") for i in range(4000)]
    docs = spark.createDataFrame(rows, "doc_id long, views long, text string")
    path = str(tmp_path / "zo")
    TBL.write_partitioned(
        docs, path, partition_cols=(), stats_col="doc_id", n_range_files=16
    )
    m_range = TBL.read_manifest(path)
    # range clustering on doc_id: a views-predicate skips ~nothing
    pruned_range = TBL.prune_files(m_range, ranges={"views": (0, 99)})
    assert len(pruned_range) == len(m_range["files"])  # no stats → keep all

    m_z = TBL.compact(spark, path, n_range_files=16, cluster_by=("doc_id", "views"))
    assert all("col_stats" in f for f in m_z["files"])
    pruned_z = TBL.prune_files(m_z, ranges={"views": (0, 99)})
    assert 0 < len(pruned_z) < len(m_z["files"]), "z-order must skip files on views"
    # and still skips on the first dimension too
    assert 0 < len(TBL.prune_files(m_z, ranges={"doc_id": (0, 249)})) < len(
        m_z["files"]
    )

    # correctness: pruned scan on the second column equals a plain filter
    got = sorted(
        (r["doc_id"], r["views"])
        for r in TBL.scan_pruned(spark, path, ranges={"views": (0, 99)}).collect()
    )
    exp = sorted(
        (r["doc_id"], r["views"])
        for r in docs.filter(F.col("views").between(0, 99)).collect()
    )
    assert got == exp and got
    # compaction did not change any value
    assert sorted(
        (r["doc_id"], r["views"], r["text"])
        for r in TBL.scan_pruned(spark, path).collect()
    ) == sorted(rows)


def test_zvalue_interleaves_bits():
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], "a long, b long")
    got = [r["z"] for r in df.select(TBL.zvalue("a", "b").alias("z")).collect()]

    def morton(a, b):
        z = 0
        for i in range(31):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == [morton(0, 0), morton(1, 0), morton(0, 1), morton(3, 5)]


def test_partition_spec_evolution(spark, tmp_path):
    """Partition evolution is metadata-only: old file groups keep their
    lang=... layout, post-evolution writes land under src=...; planning
    prunes new-layout files by the new partition column and keeps
    old-layout files (value unknown there — residual filter finishes);
    the scan never mixes two hive layouts in one read; compact migrates
    everything to the new spec."""
    langs, srcs = ["en", "ru", "de"], ["web", "pdf"]
    rows = [
        (i, f"body {i}", langs[i % 3], srcs[i % 2]) for i in range(120)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, src string")
    path = str(tmp_path / "pevo")
    m0 = TBL.write_partitioned(
        docs.filter("doc_id < 60"), path, partition_cols=("lang",),
        stats_col="doc_id", n_range_files=4,
    )

    m1 = TBL.evolve_partitioning(path, ("src",))
    assert m1["operation"] == "evolve-partitioning"
    assert [f["path"] for f in m1["files"]] == [f["path"] for f in m0["files"]]
    assert m1["partition_cols"] == ["src"]

    # post-evolution append lands in the new layout
    m2 = TBL.append_batch(
        docs.filter("doc_id >= 60"), path, 0, partition_cols=("src",),
        stats_col="doc_id", n_range_files=4,
    )
    new_entries = [f for f in m2["files"] if "src=" in f["path"]]
    old_entries = [f for f in m2["files"] if "lang=" in f["path"]]
    assert new_entries and old_entries

    # pruning on the NEW column: new-layout files prune, old-layout kept
    picked = TBL.prune_files(m2, partition_eq={"src": "web"})
    assert all(f in picked for f in old_entries)  # unknown -> kept
    assert 0 < len([f for f in picked if f in new_entries]) < len(new_entries)

    # full scan and partition_eq scans are exact across both generations
    got = sorted(r["doc_id"] for r in TBL.scan_pruned(spark, path).collect())
    assert got == list(range(120))
    got_web = sorted(
        r["doc_id"]
        for r in TBL.scan_pruned(spark, path, partition_eq={"src": "web"}).collect()
    )
    assert got_web == [i for i in range(120) if i % 2 == 0]
    got_en = sorted(
        r["doc_id"]
        for r in TBL.scan_pruned(spark, path, partition_eq={"lang": "en"}).collect()
    )
    assert got_en == [i for i in range(120) if i % 3 == 0]

    # CoW delete on the mixed-generation table rewrites into the new spec
    TBL.delete_where(spark, path, "doc_id % 10 = 3")
    assert sorted(
        r["doc_id"] for r in TBL.scan_pruned(spark, path).collect()
    ) == [i for i in range(120) if i % 10 != 3]

    # compact migrates the whole table to the new layout
    m_c = TBL.compact(spark, path, n_range_files=2)
    assert all("src=" in f["path"] for f in m_c["files"])
    assert all("src" in f["partition"] for f in m_c["files"])

    import pytest as _pytest

    with _pytest.raises(KeyError):
        TBL.evolve_partitioning(path, ("nope",))
    with _pytest.raises(ValueError):
        TBL.evolve_partitioning(path, ("doc_id",))


def test_merge_cdc_applies_deletes_and_upserts(spark, tmp_path):
    """op_col turns merge into a CDC apply: 'delete' rows remove their
    key, everything else upserts — one commit, only hit files rewritten."""
    docs = _mk_docs(spark, n=60)
    path = str(tmp_path / "cdc")
    TBL.write_partitioned(docs, path, n_range_files=4)

    changes = spark.createDataFrame(
        [
            (3, "three rewritten", "en", "upsert"),
            (9, None, None, "delete"),
            (700, "fresh", "xx", "insert"),
        ],
        "doc_id long, text string, lang string, _op string",
    )
    m = TBL.merge_upsert(spark, path, changes, op_col="_op")
    assert m["operation"] == "merge"
    back = {r["doc_id"]: r for r in TBL.scan_pruned(spark, path).collect()}
    assert 9 not in back
    assert back[3]["text"] == "three rewritten"
    assert back[700]["lang"] == "xx"
    assert len(back) == 60 - 1 + 1
    assert "_op" not in TBL.scan_pruned(spark, path).columns

    # all-delete batch: no replacement rows, keys gone
    only_del = spark.createDataFrame(
        [(0, None, None, "delete"), (1, None, None, "delete")],
        "doc_id long, text string, lang string, _op string",
    )
    TBL.merge_upsert(spark, path, only_del, op_col="_op")
    ids = {r["doc_id"] for r in TBL.scan_pruned(spark, path).collect()}
    assert not {0, 1} & ids and len(ids) == 58


def test_commit_conflict_detection(spark, tmp_path):
    """Optimistic concurrency: a commit planned against a snapshot that
    is no longer HEAD is rejected with CommitConflict (the other
    writer's commit wins; this one re-plans and retries)."""
    import pytest as _pytest

    docs = _mk_docs(spark, n=60)
    path = str(tmp_path / "occ")
    TBL.write_partitioned(docs, path, n_range_files=4)

    # plan a commit against snapshot 0, then let another writer land
    m0 = TBL.read_manifest(path)
    TBL.delete_where(spark, path, "doc_id = 1")  # snapshot 1 lands first
    with _pytest.raises(TBL.CommitConflict):
        TBL._commit_files(
            path,
            m0["files"],
            tuple(m0["partition_cols"]),
            m0["stats_col"],
            "compact",
            m0.get("schema"),
            expected_parent=m0["snapshot_id"],
        )
    # the losing commit left no snapshot behind
    assert [s["snapshot_id"] for s in TBL.snapshots(path)] == [0, 1]
    # and the lock is not left dangling
    import os as _os

    assert not _os.path.exists(_os.path.join(path, TBL.MANIFEST_DIR, "COMMIT_LOCK"))
    # a retry planned against the new HEAD succeeds
    m2 = TBL.compact(spark, path, n_range_files=2)
    assert m2["snapshot_id"] == 2


def test_incremental_view_maintenance(spark, tmp_path):
    """The materialized view refreshes from the snapshot diff: after CoW
    churn it equals a direct aggregate of the current table while
    reading only changed files; expire_snapshots forces the documented
    full-recompute fallback; a different aggregate refuses to merge."""
    import pytest as _pytest

    docs = _mk_docs(spark, n=180)
    path, vp = str(tmp_path / "t"), str(tmp_path / "view")
    TBL.write_partitioned(docs, path, n_range_files=6)

    def direct():
        return sorted(
            (
                (r["lang"], r["n_rows"], r["sum_doc_id"])
                for r in TBL.scan_pruned(spark, path)
                .groupBy("lang")
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum("doc_id").alias("sum_doc_id"),
                )
                .collect()
            ),
            key=repr,
        )

    def view():
        v = TBL.refresh_view(spark, path, vp, ("lang",), ("doc_id",))
        return sorted(
            ((r["lang"], r["n_rows"], r["sum_doc_id"]) for r in v.collect()),
            key=repr,
        )

    assert view() == direct()
    import json as _json
    import os as _os

    state0 = _json.load(open(_os.path.join(vp, TBL.VIEW_STATE)))
    assert state0["last_refresh_mode"] == "full"

    # CoW churn: a NARROW delete + merge (partition move), then refresh
    TBL.delete_where(
        spark, path, "doc_id BETWEEN 20 AND 29",
        candidate_ranges={"doc_id": (20, 29)},
    )
    TBL.merge_upsert(
        spark,
        path,
        spark.createDataFrame(
            [(4, "x", "ru"), (9000, "y", "xx")],
            "doc_id long, text string, lang string",
        ),
    )
    assert view() == direct()
    state1 = _json.load(open(_os.path.join(vp, TBL.VIEW_STATE)))
    assert state1["last_refresh_mode"] == "incremental"
    assert state1["files_read"] < len(TBL.read_manifest(path)["files"])

    # no-change refresh stays equal
    assert view() == direct()

    # after expire_snapshots the removed files are gone: fallback to full
    TBL.delete_where(spark, path, "doc_id % 11 = 5")  # scattered: fine here
    TBL.expire_snapshots(path, keep_last=1)
    assert view() == direct()
    state2 = _json.load(open(_os.path.join(vp, TBL.VIEW_STATE)))
    assert state2["last_refresh_mode"] == "full"

    with _pytest.raises(ValueError):
        TBL.refresh_view(spark, path, vp, ("lang",), ())  # different agg


def test_changelog_between_snapshots(spark, tmp_path):
    """CDC: changes between two snapshots read only differing files;
    rows carried unchanged through a rewrite cancel; an update appears
    as old-row deleted + new-row inserted."""
    docs = _mk_docs(spark, n=90)
    path = str(tmp_path / "cdc2")
    m0 = TBL.write_partitioned(docs, path, n_range_files=4)
    TBL.delete_where(spark, path, "doc_id BETWEEN 10 AND 14",
                     candidate_ranges={"doc_id": (10, 14)})
    TBL.merge_upsert(
        spark, path,
        spark.createDataFrame(
            [(7, "seven v2", "ru"), (500, "new doc", "xx")],
            "doc_id long, text string, lang string",
        ),
    )
    ch = TBL.changes_between(spark, path, m0["snapshot_id"])
    ins = sorted((r["doc_id"], r["text"]) for r in ch["inserted"].collect())
    dels = sorted(r["doc_id"] for r in ch["deleted"].collect())
    assert ins == [(7, "seven v2"), (500, "new doc")]
    assert dels == [7, 10, 11, 12, 13, 14]  # old version of 7 + the delete

    # self-diff is empty; unchanged rows never appear
    ch0 = TBL.changes_between(spark, path, m0["snapshot_id"], m0["snapshot_id"])
    assert ch0["inserted"].count() == 0 and ch0["deleted"].count() == 0

    # changes expressed in the TO snapshot's evolved schema
    TBL.evolve_schema(path, rename={"text": "body"})
    TBL.merge_upsert(
        spark, path,
        spark.createDataFrame([(3, "three v2", "en")],
                              "doc_id long, body string, lang string"),
    )
    ch2 = TBL.changes_between(spark, path, m0["snapshot_id"])
    assert "body" in ch2["inserted"].columns
    ins2 = {r["doc_id"]: r["body"] for r in ch2["inserted"].collect()}
    assert ins2[3] == "three v2" and ins2[7] == "seven v2"


def test_consume_changes_cursor(spark, tmp_path):
    """Polling consumer: bootstrap returns the full table as inserts;
    an uncommitted batch is re-delivered (at-least-once); a committed
    cursor yields only subsequent changes; idle polls are empty."""
    docs = _mk_docs(spark, n=60)
    path = str(tmp_path / "t")
    cur = str(tmp_path / "cursor.json")
    TBL.write_partitioned(docs, path, n_range_files=4)

    b0 = TBL.consume_changes(spark, path, cur)
    assert b0["from_snapshot"] is None and b0["inserted"].count() == 60
    # crash before commit: the same bootstrap batch is re-delivered
    b0r = TBL.consume_changes(spark, path, cur)
    assert b0r["inserted"].count() == 60
    b0r["commit"]()

    # idle poll after commit: empty
    b1 = TBL.consume_changes(spark, path, cur)
    assert b1["inserted"].count() == 0 and b1["deleted"].count() == 0
    b1["commit"]()

    TBL.delete_where(spark, path, "doc_id BETWEEN 0 AND 4",
                     candidate_ranges={"doc_id": (0, 4)})
    TBL.merge_upsert(
        spark, path,
        spark.createDataFrame([(30, "v2", "en")],
                              "doc_id long, text string, lang string"),
    )
    b2 = TBL.consume_changes(spark, path, cur)
    assert sorted(r["doc_id"] for r in b2["deleted"].collect()) == [0, 1, 2, 3, 4, 30]
    assert [r["doc_id"] for r in b2["inserted"].collect()] == [30]
    b2["commit"]()
    b3 = TBL.consume_changes(spark, path, cur)
    assert b3["inserted"].count() == 0 and b3["deleted"].count() == 0


# --- metadata-only aggregates (table_stats) ---------------------------------


def test_table_stats_unpredicated_is_pure_metadata(spark):
    docs = _mk_docs(spark)
    path = _tmp(spark, "st0")
    TBL.write_partitioned(docs, path, partition_cols=("lang",), stats_col="doc_id")
    st = TBL.table_stats(spark, path)
    assert st["rows"] == 240 and st["min"] == 0 and st["max"] == 239
    assert st["files_scanned"] == 0
    assert st["files_metadata"] == st["files_total"] > 0


def test_table_stats_range_predicate_scans_only_boundary_files(spark):
    docs = _mk_docs(spark)
    path = _tmp(spark, "st1")
    TBL.write_partitioned(docs, path, partition_cols=("lang",), stats_col="doc_id")
    # a bound no file edge aligns with: boundary files scanned, the rest
    # folded from metadata — result exact either way
    st = TBL.table_stats(spark, path, lo=31, hi=187)
    assert st["rows"] == 187 - 31 + 1
    assert (st["min"], st["max"]) == (31, 187)
    assert 0 < st["files_scanned"] < st["files_total"]

    # pruning first: files entirely outside [lo, hi] are not even boundary
    wide = TBL.table_stats(spark, path, lo=0, hi=239)
    assert wide["files_scanned"] == 0 and wide["rows"] == 240


def test_table_stats_partition_predicate(spark):
    docs = _mk_docs(spark)
    path = _tmp(spark, "st2")
    TBL.write_partitioned(docs, path, partition_cols=("lang",), stats_col="doc_id")
    n_en = docs.filter(F.col("lang") == "en").count()
    st = TBL.table_stats(spark, path, partition_eq={"lang": "en"})
    assert st["rows"] == n_en and st["files_scanned"] == 0

    combo = TBL.table_stats(spark, path, lo=100, hi=200, partition_eq={"lang": "en"})
    exp = docs.filter(
        (F.col("lang") == "en") & F.col("doc_id").between(100, 200)
    ).agg(F.count("*"), F.min("doc_id"), F.max("doc_id")).first()
    assert (combo["rows"], combo["min"], combo["max"]) == tuple(exp)


def test_table_stats_null_stats_rows_stay_exact(spark):
    # stats-column NULLs: counted without a range predicate, excluded by
    # one — rows_nonnull in the manifest keeps both exact
    rows = [(i if i % 5 else None, f"t{i}", "en") for i in range(50)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    path = _tmp(spark, "st3")
    TBL.write_partitioned(docs, path, partition_cols=("lang",), stats_col="doc_id")
    st_all = TBL.table_stats(spark, path)
    assert st_all["rows"] == 50
    st_rng = TBL.table_stats(spark, path, lo=0, hi=1000)
    assert st_rng["rows"] == 40  # the 10 NULLs never satisfy a range


def test_table_stats_exact_after_cow_churn_and_time_travel(spark):
    docs = _mk_docs(spark)
    path = _tmp(spark, "st4")
    TBL.write_partitioned(docs, path, partition_cols=("lang",), stats_col="doc_id")
    head = TBL.read_manifest(path)["snapshot_id"]
    TBL.delete_where(spark, path, F.col("doc_id").between(60, 79))
    st = TBL.table_stats(spark, path)
    assert st["rows"] == 220 and st["files_scanned"] == 0
    # the pre-delete snapshot still answers from its own manifest
    old = TBL.table_stats(spark, path, snapshot_id=head)
    assert old["rows"] == 240


def test_table_stats_partition_evolution_scans_unknown_files(spark):
    rows = [(i, f"body {i}", ["en", "ru"][i % 2], ["web", "pdf"][i % 3 == 0])
            for i in range(120)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, src string"
    )
    path = _tmp(spark, "st5")
    TBL.write_partitioned(
        docs.filter("doc_id < 60"), path, partition_cols=("lang",),
        stats_col="doc_id",
    )
    TBL.evolve_partitioning(path, ("src",))
    TBL.append_batch(
        docs.filter("doc_id >= 60"), path, 0, partition_cols=("src",)
    )
    # old-layout files never recorded a src value -> they must be
    # scanned (with the residual filter), not guessed
    st = TBL.table_stats(spark, path, partition_eq={"src": "pdf"})
    direct = TBL.scan_pruned(spark, path, partition_eq={"src": "pdf"}).count()
    assert st["rows"] == direct > 0
    assert st["files_scanned"] > 0


def test_table_stats_empty_selection(spark):
    docs = _mk_docs(spark)
    path = _tmp(spark, "st6")
    TBL.write_partitioned(docs, path, partition_cols=("lang",), stats_col="doc_id")
    st = TBL.table_stats(spark, path, lo=10_000, hi=20_000)
    assert st == {
        "rows": 0, "min": None, "max": None,
        "files_total": 0, "files_metadata": 0, "files_scanned": 0,
    }


# --- secondary Bloom index (point-lookup file skipping) ----------------------


def test_bloom_index_skips_files_and_stays_exact(spark):
    docs = _mk_docs(spark)  # text = "document body {i} " * 3
    path = _tmp(spark, "bl0")
    TBL.write_partitioned(docs, path, partition_cols=("lang",), stats_col="doc_id")
    before = TBL.read_manifest(path)
    m = TBL.add_bloom_index(spark, path, "text")
    assert m["operation"] == "add-bloom-index"
    # metadata commit: identical file list, filters attached
    assert [f["path"] for f in m["files"]] == [f["path"] for f in before["files"]]
    assert all("text" in f["bloom"] for f in m["files"])

    needle = "document body 137 " * 3
    hit = TBL.prune_files(m, point_eq={"text": needle})
    assert 0 < len(hit) < len(m["files"]), "bloom must skip most files"
    got = TBL.scan_pruned(spark, path, point_eq={"text": needle}).collect()
    assert [r["doc_id"] for r in got] == [137]

    # absent value: every file proves non-membership
    assert TBL.prune_files(m, point_eq={"text": "no such document"}) == []
    assert TBL.scan_pruned(spark, path, point_eq={"text": "no such document"}).count() == 0


def test_bloom_index_integer_column_and_combined_predicates(spark):
    docs = _mk_docs(spark)
    path = _tmp(spark, "bl1")
    TBL.write_partitioned(docs, path, partition_cols=("lang",), stats_col="doc_id")
    m = TBL.add_bloom_index(spark, path, "doc_id", m_words=64)
    hit = TBL.prune_files(m, point_eq={"doc_id": 42})
    assert 0 < len(hit) < len(m["files"])
    got = TBL.scan_pruned(
        spark, path, partition_eq={"lang": "en"}, point_eq={"doc_id": 42}
    ).collect()
    exp = docs.filter((F.col("doc_id") == 42) & (F.col("lang") == "en")).count()
    assert len(got) == exp


def test_bloom_index_never_skips_unindexed_generations(spark):
    # pre-evolution files lack the column -> no filter -> never skipped
    rows = [(i, f"body {i}", "en") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    path = _tmp(spark, "bl2")
    TBL.write_partitioned(docs, path, partition_cols=("lang",), stats_col="doc_id")
    TBL.evolve_schema(path, add={"url": ("string", None)})
    extra = spark.createDataFrame(
        [(100 + i, f"x{i}", "en", f"https://s/{i}") for i in range(10)],
        "doc_id long, text string, lang string, url string",
    )
    TBL.append_batch(extra, path, 0, partition_cols=("lang",))
    m = TBL.add_bloom_index(spark, path, "url")
    old_gen = [f for f in m["files"] if "url" not in f.get("columns", [])]
    assert old_gen and all("url" not in (f.get("bloom") or {}) for f in old_gen)
    # old-generation files are all kept (they can't prove absence)
    kept = TBL.prune_files(m, point_eq={"url": "https://s/7"})
    assert {f["path"] for f in old_gen} <= {f["path"] for f in kept}
    got = TBL.scan_pruned(spark, path, point_eq={"url": "https://s/7"}).collect()
    assert [r["doc_id"] for r in got] == [107]


def test_bloom_index_survives_time_travel_not_compaction(spark):
    docs = _mk_docs(spark)
    path = _tmp(spark, "bl3")
    TBL.write_partitioned(docs, path, partition_cols=("lang",), stats_col="doc_id")
    pre = TBL.read_manifest(path)["snapshot_id"]
    TBL.add_bloom_index(spark, path, "text")
    # pre-index snapshot has no filters; the scan still answers exactly
    assert TBL.prune_files(
        TBL.read_manifest(path, snapshot_id=pre),
        point_eq={"text": "document body 3 " * 3},
    ) == TBL.read_manifest(path, snapshot_id=pre)["files"]
    # compaction rewrites files: new entries carry no stale filters and
    # are conservatively kept until re-indexed
    TBL.compact(spark, path)
    m2 = TBL.read_manifest(path)
    assert all(not f.get("bloom") for f in m2["files"])
    got = TBL.scan_pruned(
        spark, path, point_eq={"text": "document body 3 " * 3}
    ).collect()
    assert [r["doc_id"] for r in got] == [3]


def test_table_partition_counts_metadata_and_evolution(spark):
    rows = [(i, f"body {i}", ["en", "ru"][i % 2], ["web", "pdf"][i % 3 == 0])
            for i in range(120)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, src string"
    )
    path = _tmp(spark, "pc0")
    TBL.write_partitioned(
        docs.filter("doc_id < 60"), path, partition_cols=("lang",),
        stats_col="doc_id",
    )
    got = TBL.table_partition_counts(spark, path)
    assert got == [{"lang": "en", "rows": 30}, {"lang": "ru", "rows": 30}]

    # after partition evolution, old-generation files are scanned and
    # grouped under the NEW spec; the rollup stays exact
    TBL.evolve_partitioning(path, ("src",))
    TBL.append_batch(
        docs.filter("doc_id >= 60"), path, 0, partition_cols=("src",)
    )
    got2 = {(r["src"], r["rows"]) for r in TBL.table_partition_counts(spark, path)}
    exp = {(r["src"], r["n"]) for r in
           docs.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert got2 == exp


def test_table_partition_counts_null_partition(spark):
    docs = _mk_docs(spark)  # every 40th doc has NULL lang
    path = _tmp(spark, "pc1")
    TBL.write_partitioned(docs, path, partition_cols=("lang",), stats_col="doc_id")
    got = {(r["lang"], r["rows"]) for r in TBL.table_partition_counts(spark, path)}
    exp = {(r["lang"], r["n"]) for r in
           docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got == exp and (None, 6) in got


# --- snapshot tags (named refs + GC pinning) ---------------------------------


def test_tag_resolves_and_pins_against_gc(spark):
    docs = _mk_docs(spark)
    path = _tmp(spark, "tag0")
    TBL.write_partitioned(docs, path, partition_cols=("lang",), stats_col="doc_id")
    sid = TBL.tag(path, "train-run-1")
    assert TBL.refs(path) == {"train-run-1": sid}

    # churn: delete + compact move HEAD twice
    TBL.delete_where(spark, path, F.col("doc_id").between(0, 59))
    TBL.compact(spark, path)
    assert TBL.read_manifest(path, ref="train-run-1")["snapshot_id"] == sid

    # GC with keep_last=1 would normally drop the tagged snapshot — the
    # tag pins it AND its data files
    TBL.expire_snapshots(path, keep_last=1)
    via_tag = TBL.scan_pruned(spark, path, ref="train-run-1")
    assert via_tag.count() == 240  # the corpus exactly as run-1 read it
    assert TBL.scan_pruned(spark, path).count() == 180

    # delete the tag -> next GC reclaims it
    TBL.delete_tag(path, "train-run-1")
    TBL.expire_snapshots(path, keep_last=1)
    with pytest.raises(FileNotFoundError):
        TBL.read_manifest(path, snapshot_id=sid)


def test_tag_immutability_and_errors(spark):
    docs = _mk_docs(spark)
    path = _tmp(spark, "tag1")
    TBL.write_partitioned(docs, path, partition_cols=("lang",), stats_col="doc_id")
    TBL.tag(path, "v1")
    with pytest.raises(ValueError, match="immutable"):
        TBL.tag(path, "v1")
    with pytest.raises(KeyError, match="no tag"):
        TBL.resolve_ref(path, "nope")
    with pytest.raises(KeyError, match="no tag"):
        TBL.delete_tag(path, "nope")
    with pytest.raises(FileNotFoundError):
        TBL.tag(path, "v2", snapshot_id=99999)


def test_merge_upsert_schema_evolution(spark):
    docs = _mk_docs(spark, n=60)
    path = _tmp(spark, "ms0")
    TBL.write_partitioned(docs, path, partition_cols=("lang",), stats_col="doc_id")
    upd = spark.createDataFrame(
        [(5, "updated body", "en", 9), (1000, "new row", "ru", 7)],
        "doc_id long, text string, lang string, stars long",
    )
    # unknown column refuses without opt-in
    with pytest.raises(ValueError, match="merge_schema=True"):
        TBL.merge_upsert(spark, path, upd)
    m = TBL.merge_upsert(spark, path, upd, merge_schema=True)
    assert m["operation"] == "merge"
    back = TBL.scan_pruned(spark, path)
    assert back.count() == 61
    got = {r["doc_id"]: (r["text"], r["stars"]) for r in back.collect()}
    assert got[5] == ("updated body", 9)
    assert got[1000] == ("new row", 7)
    # pre-merge rows read NULL for the evolved column, not a default value
    assert got[6][1] is None
    # updates lacking an existing table column refuse
    with pytest.raises(ValueError, match="lack table columns"):
        TBL.merge_upsert(
            spark, path,
            spark.createDataFrame([(7, "x", "en")],
                                  "doc_id long, text string, lang string"),
        )
