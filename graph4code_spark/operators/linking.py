"""J3/J4/W4: entity→document linking.

The reference probes an Elasticsearch index per catalog entity
(``multi_match … operator: AND`` over the entity's dotted components,
5000-hit cap, then a must-term `good_match` re-check:
`/root/reference/src/utils.py:253-343`).  The Spark-native analogue:

- **mention detection** — the catalog (small) is broadcast; a batched
  pandas UDF tokenizes each document's content once with the exact ES
  analyzer semantics (`graph4code_spark.analyzer`) and probes an inverted
  token→entities index built from the broadcast catalog.  Map-side only:
  zero shuffle, the vectorized equivalent of the ES index probe.
- **AND verification** — all required tokens present in the document's
  token set (ES ``operator: AND``).
- **scoring** — deterministic tf proxy for the ES ``most_fields`` score:
  total occurrences of required tokens (ties broken by url) — only used
  to order the per-entity cap.
- **cap** — per-entity top-5000 via a rank window (`utils.py:282`);
  this is the one shuffle, keyed by entity.  Hub entities (``fit``) are
  exactly the skewed keys; AQE skew-join/partition splitting plus the cap
  itself bound the damage, mirroring the reference's silent truncation.
- **good_match** — must-term re-check (`utils.py:300-343`), vectorized.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph4code_spark.analyzer import analyze, entity_required_tokens, good_match
from graph4code_spark.synth import entity_name, entity_type

#: reference result cap per entity query (`utils.py:282`)
ES_RESULT_CAP = 5000

MENTIONS_SCHEMA = (
    "url string, question_id string, entity string, etype string, "
    "score int, good_match boolean"
)


def build_entity_index(catalog_records: list[dict]):
    """Broadcast-side structures: per-entity required-token sets and an
    inverted index keyed by each entity's rarest (longest) token."""
    entities = []
    for rec in catalog_records:
        name = entity_name(rec)
        etype = entity_type(rec)
        if etype == "method":
            required = entity_required_tokens(rec["klass"], rec["function"])
            qualified = rec["klass"] + "." + rec["function"]
        else:
            required = entity_required_tokens(name)
            qualified = name
        if not required:
            continue
        entities.append((name, etype, qualified, required))
    index: dict[str, list[int]] = {}
    for i, (_, _, _, required) in enumerate(entities):
        probe = max(required, key=lambda t: (len(t), t))
        index.setdefault(probe, []).append(i)
    return entities, index


def detect_mentions(qa: DataFrame, catalog_records: list[dict]) -> DataFrame:
    """Question documents → candidate (document, entity) links.

    Output: one row per (url, entity) with the AND-match score and the
    `good_match` verdict. Bad matches are kept (the reference caps before
    filtering them)."""
    entities, index = build_entity_index(catalog_records)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, qid, content in zip(pdf["url"], pdf["question_id"], pdf["content"]):
                toks = analyze(content)
                counts = Counter(toks)
                tokset = set(counts)
                content_lower = content.lower()
                seen: set[int] = set()
                for t in tokset:
                    for ei in index.get(t, ()):
                        if ei in seen:
                            continue
                        seen.add(ei)
                        name, etype, qualified, required = entities[ei]
                        if required <= tokset:
                            score = sum(counts[r] for r in required)
                            out.append(
                                (url, qid, name, etype, score,
                                 good_match(content_lower, qualified))
                            )
            yield pd.DataFrame(
                out,
                columns=["url", "question_id", "entity", "etype", "score", "good_match"],
            )

    return qa.select("url", "question_id", "content").mapInPandas(
        run, schema=MENTIONS_SCHEMA
    )


def cap_per_entity(
    links: DataFrame, cap: int = ES_RESULT_CAP, salt_buckets: int = 0
) -> DataFrame:
    """Per-entity top-`cap` by score (W4) — deterministic rank window.

    At 100 TB this is the skewed shuffle: hub entities take the most rows.
    With ``salt_buckets > 0`` the cap runs in two phases over a **salted
    key** (north-rule hub defense): phase 1 ranks within
    (entity, hash(url) % S) so no single task sees a hub's full row set
    and each bucket keeps ≤ cap rows; phase 2 ranks the ≤ S·cap survivors
    per entity.  Output is identical to the unsalted window (verified by
    tests); the unsalted path additionally relies on AQE skew splitting."""
    order = [F.desc("score"), F.asc("url")]
    if salt_buckets > 0:
        salt = F.pmod(F.xxhash64("url"), F.lit(salt_buckets))
        w1 = Window.partitionBy("entity", salt).orderBy(*order)
        pre = (
            links.withColumn("rk", F.row_number().over(w1))
            .where(F.col("rk") <= cap)
            .drop("rk")
        )
    else:
        pre = links
    w = Window.partitionBy("entity").orderBy(*order)
    return (
        pre.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= cap)
        .drop("rk")
    )


def link_entities(
    qa: DataFrame, catalog_records: list[dict], cap: int = ES_RESULT_CAP,
    salt_buckets: int = 16,
) -> DataFrame:
    """Full J3+W4 path: detect → cap. `good_match` retained as a column
    (J4/F4); emission filters on it like the reference does.

    The cap runs salted by default (north-rule hub defense): at 10^12
    pages the hub entities (`fit`) dominate the entity key, and phase 1
    bounds any task to ≤ cap rows per (entity, salt) bucket.  Output is
    identical to the unsalted window; measured overhead at bench scale
    is ~1%.  Pass ``salt_buckets=0`` to fall back to the plain window
    (AQE skew splitting only)."""
    return cap_per_entity(
        detect_mentions(qa, catalog_records), cap, salt_buckets=salt_buckets
    )
