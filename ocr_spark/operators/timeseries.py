"""Time-series operators over event streams: the as-of join.

Spark has no ASOF JOIN (SPARK-22947 open since 2017); the standard
workarounds — a theta-join on `l.ts >= r.ts` + argmax, or a range-bucketed
self-join — either materialize quadratic pair rows or hand-tune bucket
widths. The scale-correct plan is the UNION + WINDOW formulation: tag both
sides, union them, and carry the latest right-side row forward with
``last(..., ignorenulls=True)`` over a (key, ts)-ordered window — one
shuffle on the key, linear rows, no pair blowup, the same shape a
1000-executor cluster wants.

The DuckDB oracle uses its NATIVE ``ASOF LEFT JOIN`` — a genuinely
independent implementation of the semantics, not a formulation twin — so
driver parity checks the operator against a second engine's definition of
"latest right row at-or-before each left row".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    left_id_col: str = "event_id",
    value_cols: tuple[str, ...] = ("value",),
    tie_col: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach the LATEST right row with
    ``right.ts <= left.ts`` in the same key group (inclusive: an equal-ts
    right row matches, the ASOF convention). Returns
    (left_id, key, ts, ts+suffix, value+suffix...) — join other left
    columns back by the id; rows with no prior right row keep nulls
    (left-join semantics).

    ``tie_col``: when two right rows share an exact (key, ts), the one
    with the maximum tie value wins — without this the match would be
    partition-order-dependent and no two engines (or two runs) would have
    to agree. Right-side ties are deduped with one window pass BEFORE the
    union, so the carry-forward sees a total order."""
    rsel = right.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        *[F.col(c) for c in value_cols],
    )
    if tie_col is not None:
        wt = Window.partitionBy("__k", "__ts").orderBy(F.col("__tie").desc())
        rsel = (
            right.select(
                F.col(key_col).alias("__k"),
                F.col(ts_col).alias("__ts"),
                F.col(tie_col).alias("__tie"),
                *[F.col(c) for c in value_cols],
            )
            .withColumn("__rn", F.row_number().over(wt))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__tie")
        )
    rpack = rsel.select(
        "__k",
        "__ts",
        F.lit(0).alias("__side"),
        F.lit(None).cast("long").alias("__lid"),
        F.struct(
            F.col("__ts").alias("rts"), *[F.col(c).alias(c) for c in value_cols]
        ).alias("__r"),
    )
    rtype = dict(rpack.dtypes)["__r"]
    lpack = left.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.col(left_id_col).cast("long").alias("__lid"),
        F.lit(None).cast(rtype).alias("__r"),
    )
    # right rows sort before left rows at equal ts (__side 0 < 1), so an
    # equal-ts right row IS visible to the left row — inclusive semantics
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        rpack.unionByName(lpack)
        .withColumn("__c", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    return carried.select(
        F.col("__lid").alias(left_id_col),
        F.col("__k").alias(key_col),
        F.col("__ts").alias(ts_col),
        F.col("__c.rts").alias(f"{ts_col}{suffix}"),
        *[F.col(f"__c.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
