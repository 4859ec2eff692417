"""Local simulation of the driver's correctness gate.

Runs every ``__spark_entry__.queries()[name]`` on Spark and its
``oracle_sql()[name]`` on DuckDB over the same sf directory, then compares
row count, column names, and the full (column-name-sorted, row-sorted)
value multiset. Exact equality is required for ints/strings/bools; floats
must match bit-for-bit (the whole oracle design guarantees it) — any
Decimal coming back from DuckDB is reported as a type smell.

Usage: python tools/driver_sim.py [sf_dir] [query ...]
Env:   OCR_SPARK_SIM_ANSI=1        run Spark with spark.sql.ansi.enabled=true
       OCR_SPARK_SIM_TZ=<zone>     set a non-UTC session timezone
(the session-agnostic hardening claims in README.md are validated by
running the full sweep under both knobs)
"""

from __future__ import annotations

import decimal
import math
import sys
import time

sys.path.insert(0, ".")


def norm_value(v):
    if isinstance(v, decimal.Decimal):
        return ("DECIMAL_SMELL", float(v))
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_value(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as E
    from ocr_spark.plans.derived import TABLES
    from ocr_spark.session import get_spark

    import os

    extra = {}
    if os.environ.get("OCR_SPARK_SIM_ANSI"):
        extra["spark.sql.ansi.enabled"] = "true"
    if os.environ.get("OCR_SPARK_SIM_TZ"):
        extra["spark.sql.session.timeZone"] = os.environ["OCR_SPARK_SIM_TZ"]
    spark = get_spark(
        "driver-sim", master="local[8]", shuffle_partitions=8, extra_conf=extra or None
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    from ocr_spark.operators.dedup import release_feature_caches

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: SPARK ERROR {type(ex).__name__}: {str(ex)[:300]}")
            failures.append(name)
            continue
        finally:
            # operators that persist internal side tables (minhash features,
            # the LM gram explode) must not pin one copy per swept query
            release_feature_caches()
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(s_rows)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            d_types = [str(t) for t in rel.types]
            d_rows = rel.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: DUCKDB ERROR {str(ex)[:300]}")
            failures.append(name)
            continue
        # the driver's value hash is representation-sensitive: a HUGEINT
        # (int128, e.g. SUM over BIGINT) or DECIMAL column hashes differently
        # from Spark's BIGINT/DOUBLE even when every value is equal — exactly
        # the r3 `pagerank` false-red.  Python-side fetchall() hides this
        # (HUGEINT → int), so check the declared relation types.
        type_bad = [
            (c, t)
            for c, t in zip(d_cols, d_types)
            if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL")
        ]
        if type_bad:
            print(f"FAIL  {name}: oracle output type smell {type_bad} (cast to BIGINT/DOUBLE)")
            failures.append(name)
            continue
        sc, sr = norm_rows(s_cols, s_rows)
        dc, dr = norm_rows(d_cols, d_rows)
        smell = any("DECIMAL_SMELL" in str(r) for r in dr[:5])
        if sc != dc:
            print(f"FAIL  {name}: columns {sc} vs {dc}")
            failures.append(name)
        elif len(sr) != len(dr):
            print(f"FAIL  {name}: rowcount spark={len(sr)} duck={len(dr)}")
            failures.append(name)
        elif sr != dr:
            bad = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL  {name}: {sum(1 for a, b in zip(sr, dr) if a != b)} row diffs; first: ")
            for a, b in bad:
                print(f"      spark={a}\n      duck ={b}")
            failures.append(name)
        else:
            extra = " DECIMAL-SMELL" if smell else ""
            print(f"ok    {name}: {len(sr)} rows match [{time.time()-t0:.1f}s]{extra}")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL MATCH")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
