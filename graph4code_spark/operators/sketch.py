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

KNUTH = 2654435761
STEP = 968665207  # odd constant decorrelating the rows
_M32 = 2**32


def _cms_col(key: F.Column, row: int, width: int) -> F.Column:
    return (
        ((key.cast("long") + row * STEP) * F.lit(KNUTH)) % _M32
    ) % width


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
