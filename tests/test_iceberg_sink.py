"""Iceberg sink (S7 Iceberg flavor): the sandbox ships no
iceberg-spark-runtime jar (verified: none under the pyspark jars dir or
anywhere on disk), so the writeTo cannot execute here — recorded in
BASELINE.md.  What IS testable offline, and is, per VERDICT r1 #8's
fallback:

1. the parquet sink produces exactly the physical layout the Iceberg
   writer declares — partitioned by (pred_name, subj_bucket) with
   identical partition values — so on a cluster the two are drop-in
   equivalents,
2. `materialize_triples_iceberg` fails with the actionable catalog hint
   on a catalog-less session (the narrowed except path), not a masked
   unrelated error.
"""

import os

import pytest
import pyspark.sql.functions as F

from graph4code_spark.materialize import (
    materialize_triples,
    materialize_triples_iceberg,
    pred_short_name,
    read_triples,
)
from graph4code_spark.schemas import TRIPLES_SCHEMA

QUADS = [
    ("http://g/s%d" % i, pred, "o%d" % i, True, None, None, "http://g/g1")
    for i in range(40)
    for pred in ("http://x/flowsTo", "http://y#label")
]


def test_parquet_layout_matches_iceberg_partition_spec(spark, tmp_path):
    df = spark.createDataFrame(QUADS, TRIPLES_SCHEMA)
    out = str(tmp_path / "t")
    metrics = materialize_triples(df, out, buckets=4)
    # physical layout: pred_name=<short>/subj_bucket=<n> directories —
    # the identical partitionedBy("pred_name", "subj_bucket") spec the
    # Iceberg writeTo declares
    preds = sorted(
        d for d in os.listdir(out) if d.startswith("pred_name=")
    )
    assert preds == ["pred_name=flowsTo", "pred_name=label"]
    for p in preds:
        buckets = sorted(os.listdir(os.path.join(out, p)))
        assert all(b.startswith("subj_bucket=") for b in buckets)
    # partition values match the declared transform: short predicate
    # name + pmod(xxhash64(subj), buckets)
    back = spark.read.parquet(out)
    mismatch = back.where(
        (F.col("pred_name") != pred_short_name(F.col("pred")))
        | (
            F.col("subj_bucket")
            != F.pmod(F.xxhash64("subj"), F.lit(4)).cast("int")
        )
    ).count()
    assert mismatch == 0
    assert metrics["n_triples"] == len(QUADS)
    # read-back in canonical column order is the identical quad set
    assert set(map(tuple, read_triples(spark, out).collect())) == set(QUADS)


def test_iceberg_sink_raises_actionable_catalog_hint(spark):
    df = spark.createDataFrame(QUADS[:4], TRIPLES_SCHEMA)
    with pytest.raises(RuntimeError, match="no Iceberg catalog"):
        materialize_triples_iceberg(df, "nosuchcatalog.db.triples")
