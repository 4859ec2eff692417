"""Resumable, manifest-checkpointed execution (north_rule Phase 5).

The 100 TB posture: a long extraction job over 10^12 documents must survive
being killed. The corpus is processed in B deterministic hash-buckets of
``doc_id``; each bucket commits independently:

    output_dir/
      bucket=NNN/ ...parquet...        (atomic: written then committed)
      _manifest/NNN.json               (commit record, written LAST)

A bucket's commit record carries **lineage** (input path, bucket spec,
config fingerprint, app id) and **metrics** (row count, byte count, wall
seconds). On restart the runner reads the manifest directory and re-runs
ONLY uncommitted buckets — an idempotent resume with exactly-once output,
the plain-parquet analog of resuming at the last committed Iceberg
snapshot (Iceberg's runtime jars are not available in this sandbox; the
commit protocol here is the same last-committed-snapshot idea with the
manifest directory as the snapshot log).

Fault injection for tests: ``fail_after`` raises after N bucket commits,
simulating a mid-job kill.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark import config


def config_fingerprint() -> str:
    """Hash of every threshold/pattern the pipeline depends on — a manifest
    written under different extraction semantics must not be resumed."""
    payload = {
        k: v
        for k, v in sorted(vars(config).items())
        if k.isupper() and isinstance(v, (int, float, str, list, dict, tuple))
    }
    return hashlib.md5(json.dumps(payload, default=str, sort_keys=True).encode()).hexdigest()


def _manifest_dir(output_dir: str) -> str:
    return os.path.join(output_dir, "_manifest")


def committed_buckets(output_dir: str) -> dict[int, dict]:
    """Read the commit log; tolerate torn/partial records (crash mid-write)."""
    mdir = _manifest_dir(output_dir)
    out: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return out
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                rec = json.load(f)
            if rec.get("status") == "committed":
                out[int(rec["bucket"])] = rec
        except (ValueError, KeyError, json.JSONDecodeError):
            continue  # torn record == uncommitted
    return out


def _commit(output_dir: str, rec: dict) -> None:
    """Atomic commit: write tmp, fsync, rename (rename is the commit point)."""
    mdir = _manifest_dir(output_dir)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".{rec['bucket']}.json.tmp")
    final = os.path.join(mdir, f"{rec['bucket']}.json")
    with open(tmp, "w") as f:
        json.dump(rec, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)


def materialize_once(
    spark: SparkSession, df: DataFrame, path: str, meta: dict | None = None
) -> DataFrame:
    """Compute ``df`` exactly once per job: write it to ``path`` (parquet)
    unless a committed copy already exists, and return the READ-BACK
    DataFrame.

    Two jobs need this: (1) a global side input consumed by every bucket
    of a checkpointed run — without materialization the side plan is
    re-executed once per bucket (a 16-bucket dedup run would execute the
    whole MinHash-LSH pipeline ~16×); (2) the resume contract — a resumed
    run re-uses the exact bytes the original run committed, so the outputs
    stay consistent even if the side plan were nondeterministic.

    Commit = parquet _SUCCESS marker + a ``<path>.meta.json`` matching
    ``meta`` (both present, meta equal). A mismatched meta (different
    mode/threshold/input) refuses, like run_checkpointed's fingerprint
    guard; a missing meta next to _SUCCESS means the commit was torn —
    recompute."""
    meta = meta or {}
    meta_path = path + ".meta.json"
    success = os.path.join(path, "_SUCCESS")
    if os.path.exists(success) and os.path.exists(meta_path):
        with open(meta_path) as f:
            committed = json.load(f)
        if committed != meta:
            raise RuntimeError(
                f"materialized side input at {path} was committed under "
                f"different parameters {committed} (this run: {meta}); "
                "refusing to resume (clear the output dir)"
            )
        return spark.read.parquet(path)
    df.write.mode("overwrite").parquet(path)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, meta_path)
    return spark.read.parquet(path)


def run_checkpointed(
    spark: SparkSession,
    docs: DataFrame,
    output_dir: str,
    transform: Callable[[DataFrame], DataFrame],
    num_buckets: int = 16,
    id_col: str = "doc_id",
    input_lineage: str = "",
    fail_after: int | None = None,
    job_params: dict | None = None,
    output_format: str = "parquet",
) -> dict:
    """Run ``transform`` over ``docs`` in resumable hash-buckets.

    Returns a summary dict {buckets_total, buckets_run, buckets_skipped,
    rows, bytes}. Call again after a crash to resume; completed buckets are
    never recomputed or rewritten.

    ``job_params`` is hashed into the recorded fingerprint: a resumed run
    whose TRANSFORM semantics differ (a new --langs, --blocklist, dedup
    mode, ...) must refuse, or committed buckets silently keep the old
    filters while fresh ones apply the new — per-bucket inconsistency,
    not resume. Pass every parameter the transform closure depends on.

    ``output_format``: ``parquet`` (default) or ``jsonl`` — line-delimited
    JSON per bucket, the reference's native response shape (S8) for
    downstream consumers that are not Spark. The format participates in
    the resume fingerprint via the manifest's bucket records.
    """
    if output_format not in ("parquet", "jsonl"):
        raise ValueError(f"unknown output format {output_format!r}")
    fp = config_fingerprint()
    if job_params:
        fp = fp + ":" + hashlib.md5(
            json.dumps(job_params, default=str, sort_keys=True).encode()
        ).hexdigest()[:12]
    done = committed_buckets(output_dir)
    for b, rec in done.items():
        if rec.get("config_fingerprint") not in (None, fp):
            raise RuntimeError(
                f"manifest bucket {b} was committed under different pipeline "
                "config; refusing to resume (clear the output dir)"
            )
        # Bucketing scheme must match too: resuming with a different
        # num_buckets/id_col would silently skip pmod-incompatible buckets
        # (old bucket 3 of 16 is NOT bucket 3 of 8) — data loss, not resume.
        if rec.get("num_buckets") not in (None, num_buckets):
            raise RuntimeError(
                f"manifest bucket {b} was committed with num_buckets="
                f"{rec.get('num_buckets')} but this run uses {num_buckets}; "
                "refusing to resume (clear the output dir)"
            )
        # Legacy records (pre-output_format) were always parquet, so a
        # missing field is compatible ONLY with parquet — accepting None
        # for jsonl would resume a parquet-bucket run into a mixed-format
        # output directory.
        if (rec.get("output_format") or "parquet") != output_format:
            raise RuntimeError(
                f"manifest bucket {b} was committed as "
                f"{rec.get('output_format') or 'parquet'} but this run writes "
                f"{output_format}; refusing to resume (clear the output dir)"
            )
        if rec.get("id_col") not in (None, id_col):
            raise RuntimeError(
                f"manifest bucket {b} was committed with id_col="
                f"{rec.get('id_col')!r} but this run uses {id_col!r}; "
                "refusing to resume (clear the output dir)"
            )

    bucket_col = F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_buckets)).cast("int")
    docs_b = docs.withColumn("__bucket", bucket_col)

    ran = skipped = 0
    total_rows = total_bytes = 0
    for b in range(num_buckets):
        if b in done:
            skipped += 1
            total_rows += done[b]["n_rows"]
            total_bytes += done[b]["n_bytes"]
            continue
        if fail_after is not None and ran >= fail_after:
            raise RuntimeError(f"injected failure after {ran} buckets")
        t0 = time.time()
        part = transform(docs_b.filter(F.col("__bucket") == b).drop("__bucket"))
        path = os.path.join(output_dir, f"bucket={b}")
        if output_format == "jsonl":
            part.write.mode("overwrite").json(path)
            # one line per row, so a text count verifies the commit in a
            # single pass — schemaless read.json would run a full
            # inference pass over the bucket before even counting.
            n_rows = spark.read.text(path).count()
            data_ext = ".json"
        else:
            part.write.mode("overwrite").parquet(path)
            n_rows = spark.read.parquet(path).count()
            data_ext = ".parquet"
        n_bytes = sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(data_ext)
        )
        _commit(
            output_dir,
            {
                "bucket": b,
                "status": "committed",
                "n_rows": n_rows,
                "n_bytes": n_bytes,
                "wall_sec": round(time.time() - t0, 3),
                "committed_at": time.time(),
                "input": input_lineage,
                "output_format": output_format,
                "num_buckets": num_buckets,
                "id_col": id_col,
                "config_fingerprint": fp,
                "app_id": spark.sparkContext.applicationId,
            },
        )
        ran += 1
        total_rows += n_rows
        total_bytes += n_bytes
    return {
        "buckets_total": num_buckets,
        "buckets_run": ran,
        "buckets_skipped": skipped,
        "rows": total_rows,
        "bytes": total_bytes,
    }
