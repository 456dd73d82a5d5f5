"""Count-min sketch over integer keys — the streaming-friendly
frequency summary (heavy hitters, per-key counts in bounded memory).

Spark's built-in `countMinSketch` is JVM-private and not reproducible
cross-engine; this one is DETERMINISTIC BY CONSTRUCTION: row ``i``
hashes key ``k`` to column ``((k + i·STEP) · KNUTH) mod 2^32 mod w`` —
pure integer arithmetic both Spark and any SQL engine evaluate
identically, so the sketch (and every estimate) is strict-oracle-able.

Scale shape: BUILD is a map-side explode of ``depth`` (row, col) cells
per input row followed by ONE hash-aggregate over ``depth × width``
cells — the sketch is the aggregate, never the data.  ESTIMATE joins
the queried keys' cells against the (tiny, broadcastable) sketch and
takes the per-key min.  CMS guarantees estimate >= true count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph4code_spark.functions.hashing import KNUTH, M32, mulmod32

STEP = 968665207  # odd constant decorrelating the rows
_M32 = M32


def _cms_col(key: F.Column, row: int, width: int) -> F.Column:
    # pmod BEFORE adding row·STEP so the sum stays < 2^33 (no int64
    # wrap even for keys near the int64 edge); mulmod32 re-reduces.
    return mulmod32(F.pmod(key.cast("long"), F.lit(_M32)) + row * STEP) % width


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 128
) -> DataFrame:
    """(row, col, n) cells of the count-min sketch of ``key_col``."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cms_col(F.col(key_col), i, width).alias("col"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str,
    depth: int = 4, width: int = 128,
) -> DataFrame:
    """(key, estimate) — min over the key's depth cells.  ``sketch`` is
    at most depth × width rows: always broadcast."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_col(F.col(key_col), i, width).alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("n", F.lit(0))).cast("long").alias("cms_estimate"))
    )


def kmv_estimate(df: DataFrame, key_col: str, group_col: str, k: int = 64):
    """K-minimum-values distinct-count sketch per group — the
    mergeable bounded-memory cardinality estimator (HLL's order-
    statistics cousin), deterministic via the same arithmetic hash so
    the estimate is strict-oracle-able.

    h(key) maps to (0, 2^32]; with the K smallest DISTINCT hashes, the
    estimate is (k-1) / (h_k / 2^32).  Groups with fewer than k
    distinct keys report their exact count.

    Shape note: this declarative form distincts (group, hash) then
    collects the group's distinct hashes before slicing — bounded by
    per-group distinct cardinality, not by k.  When that bound is the
    problem (true HLL territory), swap the collect for a per-group
    row_number()<=k window; the estimate math is unchanged."""
    h = mulmod32(F.col(key_col)) + 1
    hashes = (
        df.select(F.col(group_col).alias("grp"), h.alias("h"))
        .distinct()
        .groupBy("grp")
        .agg(F.slice(F.sort_array(F.collect_set("h")), 1, k).alias("mins"))
    )
    kth = F.element_at("mins", k)
    est = F.when(
        F.size("mins") < k, F.size("mins").cast("double")
    ).otherwise((k - 1) / (kth / F.lit(float(_M32))))
    return hashes.select(
        "grp", F.round(est, 6).alias("kmv_estimate"),
    )
