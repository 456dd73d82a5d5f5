"""The BASELINE metric, measured explicitly: triple-level precision/recall
of the Spark pipeline vs the independent reference emitters (target
P/R ≥ 0.95; both sides deterministic so the expectation is 1.0), plus the
input_hint byte-identical-extraction invariant."""

from pyspark.sql import functions as F

from graph4code_spark.emitters.docstrings import build_class_alias_map, docstring_triples
from graph4code_spark.emitters.forum import forum_triples
from graph4code_spark.html_extract import extract_text, with_extracted_text
from graph4code_spark.operators.linking import link_entities
from graph4code_spark.reference_impl.emitters import documentation_quads
from graph4code_spark.sources.qa import extract_qa
from graph4code_spark.synth import (
    FIXED_CATALOG,
    FIXED_CLASS_MAP,
    catalog_df,
    synth_pages,
)
from tests.test_forum_pipeline import PREFIX, oracle_forum_quads


def _pr(got: set, want: set) -> tuple[float, float]:
    if not got or not want:
        return 0.0, 0.0
    tp = len(got & want)
    return tp / len(got), tp / len(want)


def test_triple_precision_recall(spark):
    alias = build_class_alias_map(FIXED_CLASS_MAP)

    # documentation graph
    doc_got = {
        (r.subj, r.pred, r.obj, r.is_literal, r.graph)
        for r in docstring_triples(catalog_df(spark, FIXED_CATALOG), alias).collect()
    }
    doc_want = set()
    for rec in FIXED_CATALOG:
        doc_want |= documentation_quads(rec, alias)

    # forum graph over a synthetic corpus
    pages = synth_pages(spark, 120, seed=99)
    pages_rows = [r.asDict() for r in pages.collect()]
    qa = extract_qa(pages)
    links = link_entities(qa, FIXED_CATALOG)
    forum_got = {
        (r.subj, r.pred, r.obj, r.is_literal, r.graph)
        for r in forum_triples(links, qa, FIXED_CATALOG, PREFIX).collect()
    }
    forum_want = oracle_forum_quads(pages_rows, FIXED_CATALOG)

    got = doc_got | forum_got
    want = doc_want | forum_want
    precision, recall = _pr(got, want)
    print(f"\ntriple P/R: precision={precision:.4f} recall={recall:.4f} "
          f"(|got|={len(got)}, |want|={len(want)})")
    assert precision >= 0.95
    assert recall >= 0.95
    # deterministic emitters: expect exact match, not just the threshold
    assert precision == 1.0 and recall == 1.0


def test_byte_identical_extraction_per_url(spark):
    """input_hint invariant: the Arrow-batched extractor output equals the
    stored reference text byte-for-byte, per url, and equals the
    single-document extractor."""
    pages = synth_pages(spark, 100, seed=5)
    extracted = with_extracted_text(pages).withColumnRenamed("text", "ext_text")
    j = pages.join(extracted, "url")
    mismatches = j.where(
        (F.col("text") != F.col("ext_text")) | ~F.col("ok")
    ).count()
    assert mismatches == 0

    # Arrow path == straight-line single-doc path
    for r in pages.limit(10).collect():
        assert extract_text(bytes(r.html).decode("utf-8")) == r.text
