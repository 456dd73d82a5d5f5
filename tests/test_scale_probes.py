"""Scale probes for the corpus-hygiene/packing operators: synthetic
inputs 2-3 orders of magnitude above the driver fixtures, generated
distributed (spark.range, no driver lists), asserting shape invariants
without collecting the bulk output — the same pattern as test_cc_skew."""

from pyspark.sql import functions as F

from graph4code_spark.operators.packing import pack_sequences
from graph4code_spark.operators.scrub import drop_frequent_lines


def test_frequent_line_hub_at_200k_docs(spark):
    """200k docs all sharing one boilerplate line (the worst hub skew:
    one line key carries the whole corpus) plus a unique line each.
    The hub line must be dropped everywhere, uniques kept, and the
    count aggregate must not collapse onto one task."""
    docs = spark.range(200_000).select(
        F.col("id"),
        F.array(
            F.lit("accept all cookies"),
            F.concat(F.lit("unique line "), F.col("id").cast("string")),
        ).alias("lines"),
    )
    out = drop_frequent_lines(docs, "id", "lines", min_docs=1000)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_dropped").alias("dropped"),
        F.sum(F.size("lines_kept")).alias("kept"),
    ).first()
    assert agg["n"] == 200_000
    assert agg["dropped"] == 200_000      # exactly the hub line per doc
    assert agg["kept"] == 200_000         # exactly the unique line per doc
    sample = out.where(F.col("id") == 123).first()
    assert sample["lines_kept"] == ["unique line 123"]


def test_pack_sequences_at_1m_docs(spark):
    """1M docs through the two-level scan: the offsets must form an
    exact permutation-ordered prefix sum — checked via aggregates
    (total mass, max offset + its count) rather than a collect."""
    docs = spark.range(1_000_000).select(
        F.col("id"), ((F.col("id") % 17) + 1).alias("n")
    )
    out = pack_sequences(docs, "id", "n", seq_len=2048, n_buckets=64)
    total = docs.agg(F.sum("n")).first()[0]
    agg = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.max(F.col("global_offset") + F.col("n_tokens")).alias("end"),
        F.count_distinct("global_offset").alias("distinct_offsets"),
        F.max("seq_id").alias("max_seq"),
    ).first()
    assert agg["rows"] == 1_000_000
    assert agg["end"] == total                      # offsets tile exactly
    assert agg["distinct_offsets"] == 1_000_000     # no overlap anywhere
    assert agg["max_seq"] == (total - 1) // 2048


def test_expression_extraction_at_30k_pages(spark):
    """30k code pages through the dataflow expression extractor (the
    Arrow-batched zero-shuffle pass) + the miner: page content is
    generated DISTRIBUTED (format_string over spark.range, no driver
    lists), counts asserted via the miner's aggregate only.  Every page
    carries an aliased one-frame expression and a two-frame expression;
    field names cycle mod 4, so each (shape, field) class must count
    exactly n_pages/4."""
    from graph4code_spark.operators.expressions import (
        extract_expressions, mine_expressions,
    )
    from graph4code_spark.synth import FIXED_CATALOG

    n = 30_000
    code = F.format_string(
        "import pandas\n"
        "df%s = pandas.read_csv('a.csv')\n"
        "h%s = df%s\n"
        "out = h%s['f%s'] / df%s['g']\n"
        "u%s = pandas.read_csv('x.csv')\n"
        "w%s = pandas.read_csv('y.csv')\n"
        "out2 = u%s['f%s'] / w%s['g']\n",
        *(["id"] * 4), F.col("id") % 4, "id",
        *(["id"] * 2), "id", F.col("id") % 4, "id",
    )
    pages = spark.range(n).select(
        F.format_string("http://p/%s", "id").alias("url"),
        F.array(code).alias("codes"),
    )
    mined = mine_expressions(
        extract_expressions(pages, FIXED_CATALOG), pre_normalized=True
    ).collect()
    got = {r["code"]: r["cnt"] for r in mined}
    assert len(got) == 8  # 2 shapes x 4 field classes, nothing conflated
    for i in range(4):
        assert got[f"df0['f{i}'] / df0['g']"] == n // 4   # aliased: ONE frame
        assert got[f"df0['f{i}'] / df1['g']"] == n // 4   # two frames
