"""As-of (point-in-time) join — a temporal operator Spark lacks
natively (SURVEY §2.7: absent in the reference too; standard in
training-data pipelines for joining each observation to the most recent
state at or before its timestamp).

Spark-native composition (no ``merge_asof`` pandas fallback): tag both
sides, union, and carry the right side's columns forward with
``last(..., ignorenulls=True)`` over a (keys, ts, side) window — one
shuffle on the join keys, linear in |L| + |R|, versus the naive
range-join's |L|·|R| blowup.  At equal timestamps the right row sorts
first, so the match is inclusive (``l.ts >= r.ts``), the same tie rule
as DuckDB's native ASOF JOIN (the test oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row (per ``by``
    keys) with ``right.ts <= left.ts``; NULLs when none exists.

    ``value_cols`` defaults to every right column not in ``by`` +
    ``ts_col``; they are appended with ``suffix``.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in {*by, ts_col}]
    out_vals = [f"{c}{suffix}" for c in value_cols]

    l_tag = left.select(
        *by,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.struct(*[F.col(c) for c in left.columns]).alias("_l_row"),
    )
    r_tag = right.select(
        *by,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.lit(None)
        .cast(l_tag.schema["_l_row"].dataType)
        .alias("_l_row"),
    )
    # also carry the right ts forward so callers can see match age
    l_tag = l_tag.withColumn("_r_ts", F.lit(None).cast(left.schema[ts_col].dataType))
    r_tag = r_tag.withColumn("_r_ts", F.col(ts_col))

    unioned = l_tag.unionByName(r_tag)
    # Deterministic tie-break for duplicate-(by, ts) right rows: without
    # it, which right row's values carry forward is partition-internal
    # order — nondeterministic across runs.  xxhash64 of the right value
    # columns resolves ties identically every run (left rows hash a
    # constant all-NULL tuple, which is fine: right rows sort before
    # left at equal ts via _side, so left-vs-left order is irrelevant).
    tie = F.xxhash64(*[F.col(f"_r_{c}") for c in value_cols], F.col("_r_ts"))
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), tie.asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in value_cols
        ],
        F.last("_r_ts", ignorenulls=True).over(w).alias(f"{ts_col}{suffix}"),
    )
    out = carried.where(F.col("_side") == 1).select(
        F.col("_l_row.*"),
        *[F.col(f"_c_{c}").alias(o) for c, o in zip(value_cols, out_vals)],
        F.col(f"{ts_col}{suffix}"),
    )
    return out
