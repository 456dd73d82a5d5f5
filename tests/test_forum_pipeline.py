"""End-to-end forum path: synth pages → QA → linking → E4/E5 triples,
compared against a driver-side simulation of the reference's per-entity
ES search + filter + emit loop."""

from graph4code_spark.emitters.forum import forum_triples
from graph4code_spark.operators.linking import link_entities
from graph4code_spark.sources.qa import extract_qa
from graph4code_spark.synth import FIXED_CATALOG, synth_pages
from graph4code_spark.uris import PREFIXES

N_PAGES = 150
PREFIX = PREFIXES["stackoverflow3"]


def oracle_forum_quads(pages_rows, records):
    from graph4code_spark.reference_impl.emitters import forum_pipeline_quads

    return forum_pipeline_quads(pages_rows, records, PREFIX)


def test_forum_end_to_end(spark):
    pages = synth_pages(spark, N_PAGES, seed=7)
    pages_rows = [r.asDict() for r in pages.collect()]

    qa = extract_qa(pages)
    links = link_entities(qa, FIXED_CATALOG)
    got = {
        (r.subj, r.pred, r.obj, r.is_literal, r.graph)
        for r in forum_triples(links, qa, FIXED_CATALOG, PREFIX).collect()
    }
    want = oracle_forum_quads(pages_rows, FIXED_CATALOG)
    missing = want - got
    extra = got - want
    assert not missing, f"missing {len(missing)} of {len(want)}: {sorted(missing)[:4]}"
    assert not extra, f"extra {len(extra)}: {sorted(extra)[:4]}"
    assert len(got) > 100


def test_decoy_pages_fail_good_match(spark):
    pages = synth_pages(spark, 200, seed=7)
    qa = extract_qa(pages)
    links = link_entities(qa, FIXED_CATALOG).cache()
    bad = links.where("not good_match").count()
    good = links.where("good_match").count()
    assert good > 0
    assert bad > 0  # decoys present and correctly flagged
