"""semForms-analogue expression mining (adjacent reference subsystem).

The reference's semForms extracts data-wrangling expressions from data
science code (`/root/reference/semForms/README.md`), normalizes them,
counts identical expressions across a corpus, and keeps the top-10 as
named reusable transforms — ``mine_code_for_expressions``
(`/root/reference/semForms/automl_eval/semforms.py:54-78`) builds
``code2count``, sorts by count, truncates to 10 and labels the
survivors ``expr0..expr9``.

The deep *extraction* half (tracking reads/writes of DataFrame-like
containers through real dataflow) is the WALA analysis this repo
restates in ``operators/flows.py`` (def-use over receivers, containers,
read/write edges).  This module restates the *mining* half Spark-first:

- **normalize** — receiver-variable names are noise (`houses_df`,
  `h_df`, `df2` all mean "the frame"); one `regexp_replace` canonizes
  the receiver to ``df``, entirely JVM-side (no UDF).
- **count** — one hash aggregate keyed by normalized code.  At corpus
  scale this is the classic map-side-combinable word-count shape; no
  skew concern because the key space is the expression vocabulary.
- **rank** — global top-K by (count desc, code asc).  K is tiny (10),
  so the TakeOrdered path applies — no full sort of the aggregate.
- **label** — ``expr<idx>`` in rank order, exactly the reference's
  naming loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: reference keeps the 10 most frequent normalized expressions
#: (`semforms.py:72`)
TOP_EXPRESSIONS = 10

#: a Python identifier immediately followed by a subscript read/write —
#: the receiver position in `x['col']`
_RECEIVER_RE = r"[A-Za-z_][A-Za-z0-9_]*\["


def normalize_receivers(code: F.Column) -> F.Column:
    """Canonize every subscripted receiver variable to ``df`` — the
    reference's analysis likewise abstracts the concrete frame variable
    so `houses_df['a']/houses_df['b']` from one repo and
    `h['a']/h['b']` from another count as the same transform."""
    return F.regexp_replace(code, _RECEIVER_RE, "df[")


def mine_expressions(
    code_df: DataFrame, code_col: str = "code", k: int = TOP_EXPRESSIONS
) -> DataFrame:
    """``code2count`` → top-K → ``expr<idx>`` labels.

    Input: one row per observed expression occurrence.  Output columns:
    ``expr_name`` (rank label), ``code`` (normalized), ``cnt``.
    Deterministic: ties broken by code text ascending.
    """
    counted = (
        code_df.select(normalize_receivers(F.col(code_col)).alias("code"))
        .where(F.col("code").isNotNull())
        .groupBy("code")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # orderBy+limit = TakeOrdered: per-partition top-K then a K-row
    # merge on the driver — the aggregate is never globally sorted.
    # The labeling window then runs over only K rows.
    top = counted.orderBy(F.desc("cnt"), F.asc("code")).limit(k)
    # unpartitioned window is intentional and safe: its input is ≤ k
    # rows by construction (WindowExec's warning refers to the general
    # case; a constant partition key would just be constant-folded away)
    w = Window.orderBy(F.desc("cnt"), F.asc("code"))
    return (
        top.withColumn("rk", F.row_number().over(w))
        .select(
            F.concat(F.lit("expr"), (F.col("rk") - 1).cast("string")).alias("expr_name"),
            "code",
            "cnt",
        )
    )
