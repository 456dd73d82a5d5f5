"""Temporal joins Spark lacks as built-ins: AS-OF join and bucketed
RANGE join — re-expressed as compositions of existing DataFrame ops
(the (a) strategy: no UDFs, no mapPartitions).

AS-OF (`left` row ⟵ latest `right` row with right.ts <= left.ts, same
key): the scalable shape is NOT a join at all — tag both streams, union
them, and carry the right side's values forward with
``last(..., ignorenulls=True)`` over a per-key time-ordered window.
One shuffle on the key, no per-row probe, no skew beyond the key's own
distribution; the naive inequality join explodes quadratically per key.

RANGE join (left.ts ∈ [start, end)): a plain inequality join forces
BroadcastNestedLoop (a scan per row).  The scale path buckets time:
ranges are exploded to every bucket of width ``bucket`` they overlap,
rows join EQUI on their bucket, and the residual predicate filters —
Catalyst gets a hash join whose fan-out is (range length / bucket),
bounded and chosen by the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
) -> DataFrame:
    """Every `left` row plus the values of the latest `right` row at or
    before its timestamp (same key); nulls when no right row precedes.
    Ties on the timestamp: the right row with the LARGEST value columns'
    ordinal (last in (ts, side, row) order) wins — deterministic.
    """
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(
            "struct<" + ", ".join(
                f"{c}: {dict(right.dtypes)[c]}" for c in right_vals
            ) + ">"
        ).alias("_rvals"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ", ".join(
                f"{c}: {dict(left.dtypes)[c]}" for c in left.columns
            ) + ">"
        ).alias("_lrow"),
        F.struct(*[F.col(c) for c in right_vals]).alias("_rvals"),
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", F.col("_rvals").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn(
        "_matched", F.last("_rvals", ignorenulls=True).over(w)
    ).where(F.col("_side") == 1)
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_matched.{c}").alias(f"asof_{c}") for c in right_vals]
    return filled.select(*out_cols)


def range_join_bucketed(
    rows: DataFrame,
    ranges: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket: int,
) -> DataFrame:
    """rows ⋈ ranges on ``start <= ts < end`` via time-bucket equi-join
    (hash join + residual filter instead of BroadcastNestedLoop).
    ``ts/start/end`` are epoch numbers; ``bucket`` is the bucket width
    in the same unit — pick it near the typical range length so each
    range explodes to O(1) buckets."""
    r_exp = ranges.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket),
                F.floor((F.col(end_col) - 1) / bucket),
            )
        ),
    )
    keyed = rows.withColumn("_b", F.floor(F.col(ts_col) / bucket))
    return (
        keyed.join(r_exp, "_b")
        .where((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_b")
    )
