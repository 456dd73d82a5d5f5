"""dataRinse-analogue dataset→script association index.

The reference's dataRinse service maps CSV datasets to the scripts that
wrangle them: it greps a script corpus for ``read_csv(...)`` mentions,
keeps datasets with **more than 10** mentioning script lines, ranks the
survivors by mention count and keeps the **top 12**, then records the
**first 5** scripts per dataset
(`/root/reference/dataRinse/scripts/python_process_csv.py:25-56`).

Deliberately NOT modeled: the reference's provenance filter also
requires the dataset to come from exactly one source archive
(``len(v['zip']) == 1``, `python_process_csv.py:46-48`).  This analogue
has no zip/archive provenance column — mention lines arrive as a plain
(script, line) corpus — so the support threshold is the only keep
condition here.

Spark-first restatement — every step is a stock relational op:

- **extract** — ``regexp_extract`` pulls the csv basename out of each
  mention line (JVM, no UDF); one row per (script, mention).
- **support filter** — hash-aggregate per dataset + ``HAVING cnt > 10``
  (the reference's ``len(scripts) > 10``).
- **rank** — top-12 datasets by (mentions desc, name asc): orderBy +
  limit = TakeOrdered, no global sort.
- **witnesses** — first-5 scripts per surviving dataset via a rank
  window partitioned by dataset (the reference's ``scripts[:5]``),
  ordered deterministically.  The window keys are the 12 surviving
  datasets only — the skew-prone full-corpus window never happens
  because the support filter and the top-12 cut run first on
  aggregates, not on rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: reference constants (`python_process_csv.py:46-48,53`)
MIN_MENTIONS = 10       # strictly-greater support threshold
TOP_DATASETS = 12
SCRIPTS_PER_DATASET = 5

#: the reference slices from `read_csv(` to `.csv` and basenames it;
#: the same capture as one regex over the mention line
READ_CSV_RE = r"read_csv\(['\"]?(?:[^'\"()]*/)?([^'\"()/]+?\.csv)"


def dataset_script_index(
    mentions: DataFrame,
    line_col: str = "line",
    script_col: str = "script",
    order_col: str = "script",
    min_mentions: int = MIN_MENTIONS,
    top_datasets: int = TOP_DATASETS,
    scripts_per_dataset: int = SCRIPTS_PER_DATASET,
    salt_buckets: int = 16,
) -> DataFrame:
    """One row per (dataset, witness script) for the association index.

    Output: ``csv`` (dataset basename), ``n_mentions`` (corpus support),
    ``script_rank`` (1-based, ≤ scripts_per_dataset), ``script``.

    The witness window runs as a salted two-phase cap (same hub defense
    as linking's `cap_per_entity`): a popular dataset (`train.csv`) is
    exactly a skewed key at corpus scale, so phase 1 ranks within
    (csv, hash(script) % S) — no task ever sees a hub's full mention
    set and each bucket keeps ≤ scripts_per_dataset rows; phase 2 ranks
    the ≤ S·k survivors per dataset.  Output identical to the unsalted
    window (tests)."""
    obs = (
        mentions.select(
            F.regexp_extract(F.col(line_col), READ_CSV_RE, 1).alias("csv"),
            F.col(script_col).alias("script"),
            F.col(order_col).alias("_ord"),
        )
        .where(F.col("csv") != "")
    )
    support = (
        obs.groupBy("csv")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .where(F.col("n_mentions") > min_mentions)
        .orderBy(F.desc("n_mentions"), F.asc("csv"))
        .limit(top_datasets)
    )
    cand = obs.join(F.broadcast(support), "csv")
    order = [F.asc("_ord"), F.asc("script")]
    if salt_buckets > 0:
        salt = F.pmod(F.xxhash64("script"), F.lit(salt_buckets))
        w1 = Window.partitionBy("csv", salt).orderBy(*order)
        cand = (
            cand.withColumn("rk", F.row_number().over(w1))
            .where(F.col("rk") <= scripts_per_dataset)
            .drop("rk")
        )
    w = Window.partitionBy("csv").orderBy(*order)
    witnesses = (
        cand.withColumn("script_rank", F.row_number().over(w))
        .where(F.col("script_rank") <= scripts_per_dataset)
    )
    return witnesses.select("csv", "n_mentions", "script_rank", "script")
