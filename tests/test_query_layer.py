"""Query layer over pipeline output + salted-cap equivalence."""

from pyspark.sql import functions as F

from graph4code_spark.emitters.analysis import analysis_triples
from graph4code_spark.emitters.forum import forum_triples
from graph4code_spark.operators.flows import extract_flow_nodes
from graph4code_spark.operators.linking import cap_per_entity, detect_mentions, link_entities
from graph4code_spark.plans.queries import (
    flows_excluding,
    most_discussed_entities,
    next_steps_after,
    questions_about,
)
from graph4code_spark.sources.qa import extract_qa
from graph4code_spark.synth import FIXED_CATALOG, HUB_ENTITY, synth_pages
from graph4code_spark.uris import PREFIXES


def _triples(spark, n_pages=120, seed=21):
    pages = synth_pages(spark, n_pages, seed=seed)
    qa = extract_qa(pages).cache()
    links = link_entities(qa, FIXED_CATALOG)
    forum = forum_triples(links, qa, FIXED_CATALOG)
    flows = analysis_triples(extract_flow_nodes(qa, FIXED_CATALOG))
    return forum.unionByName(flows), qa


def test_query_layer_shapes(spark):
    triples, qa = _triples(spark)
    triples = triples.cache()

    qa_about = questions_about(triples, HUB_ENTITY)
    assert qa_about.count() > 0
    assert all(r.title is not None for r in qa_about.collect())

    top = most_discussed_entities(triples, k=5).collect()
    assert len(top) == 5
    py = PREFIXES["py"]
    # hub entity is planted in ~30% of pages; its class parent strictly
    # dominates it (every fit-matching page also AND-matches SVC), so the
    # hub must appear in the top 2 with the class first
    top_entities = [r["entity"] for r in top]
    assert py + HUB_ENTITY in top_entities[:2]
    assert top_entities.index(py + "sklearn.svm.SVC") < top_entities.index(py + HUB_ENTITY)

    nxt = next_steps_after(triples, "SVC", k=3).collect()
    assert len(nxt) >= 1

    ex = flows_excluding(triples, "SVC")
    assert ex.count() >= 0
    labels_of_sources = {r.src for r in ex.collect()}
    svc_sources = {
        r.subj for r in triples.where(
            (F.col("pred") == PREFIXES["rdfs"] + "label") & F.col("obj").contains("SVC")
        ).collect()
    }
    assert not (labels_of_sources & svc_sources)


def test_salted_cap_equals_unsalted(spark):
    pages = synth_pages(spark, 150, seed=33)
    qa = extract_qa(pages)
    links = detect_mentions(qa, FIXED_CATALOG).cache()
    plain = cap_per_entity(links, cap=10)
    salted = cap_per_entity(links, cap=10, salt_buckets=7)
    key = ["url", "question_id", "entity", "etype", "score", "good_match"]
    assert {tuple(r) for r in plain.select(*key).collect()} == {
        tuple(r) for r in salted.select(*key).collect()
    }
    # cap actually binds for the hub entity
    hub_count = plain.where(F.col("entity") == HUB_ENTITY).count()
    assert hub_count == 10


def test_debug_posts_values_count_and_phrase_filter(spark):
    """debug_stackoverflow.sparql semantics on a handcrafted quad set:
    hit-count per question over the VALUES list, answers filtered by
    phrase, questions without matching answers absent."""
    from graph4code_spark.plans.queries import debug_posts
    from graph4code_spark.schemas import TRIPLES_SCHEMA
    from graph4code_spark.uris import PREFIXES

    S, SIOC, RDF, PY = (PREFIXES["schema"], PREFIXES["sioc"],
                        PREFIXES["rdf"], PREFIXES["py"])
    g = "http://f/"
    rows = []

    def q(s, p, o, lit=False):
        rows.append((s, p, o, lit, None, None, g))

    for qid, ents in [("q1", ["e1", "e2"]), ("q2", ["e1"]), ("q3", ["zz"])]:
        q(qid := g + qid, RDF + "type", S + "Question")
        for e in ents:
            q(qid, S + "about", PY + e)
        q(qid, S + "name", f"title {qid}", True)
        q(qid, SIOC + "content", f"body {qid}", True)
    for aid, parent, body in [
        ("a1", g + "q1", "has the phrase inside"),
        ("a2", g + "q1", "no match here"),
        ("a3", g + "q2", "phrase again"),
        ("a4", g + "q3", "phrase but q3 not in VALUES"),
    ]:
        q(parent, S + "suggestedAnswer", g + "a/" + aid)
        q(g + "a/" + aid, RDF + "type", S + "Answer")
        q(g + "a/" + aid, SIOC + "content", body, True)

    tri = spark.createDataFrame(rows, TRIPLES_SCHEMA)
    out = [(r.q, r.a_content, r.c)
           for r in debug_posts(tri, ["e1", "e2"], "phrase").collect()]
    assert set(out) == {
        (g + "q1", "has the phrase inside", 2),  # two VALUES hits
        (g + "q2", "phrase again", 1),
    }
    # ordered by count desc
    assert out[0][2] == 2

    # find_stack_overflow_posts.sparql = same pattern, NO phrase filter:
    # every suggested answer of a VALUES-matched question comes back
    from graph4code_spark.plans.queries import find_so_posts

    all_out = [(r.q, r.a_content, r.c)
               for r in find_so_posts(tri, ["e1", "e2"]).collect()]
    assert set(all_out) == {
        (g + "q1", "has the phrase inside", 2),
        (g + "q1", "no match here", 2),
        (g + "q2", "phrase again", 1),
    }
    assert all_out[0][2] == 2


def test_class_names_reflexive_even_with_outgoing_edges(spark):
    """SPARQL `subClassOf*` is reflexive: a BASE class that itself has
    outgoing subClassOf edges must still match through the zero-length
    path (ADVICE r2: the old `+`-only closure silently excluded it)."""
    from graph4code_spark.plans.queries import classifier_class_names

    py = PREFIXES["py"]
    rdfs = PREFIXES["rdfs"]
    rows = [
        # A ⊑ Base ⊑ Mixin: Base has an OUTGOING edge
        (py + "m.A", rdfs + "subClassOf", py + "m.Base", False, None, None, "g1"),
        (py + "m.Base", rdfs + "subClassOf", py + "m.Mixin", False, None, None, "g1"),
        (py + "m.A", rdfs + "label", "m.A.", True, None, None, "g1"),
        (py + "m.Base", rdfs + "label", "m.Base.", True, None, None, "g1"),
        (py + "m.Mixin", rdfs + "label", "m.Mixin.", True, None, None, "g1"),
    ]
    triples = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, is_literal boolean, "
        "arg_pos string, arg_name string, graph string",
    )
    got = {r["name"] for r in classifier_class_names(triples, "m.Base").collect()}
    assert got == {"m.A.", "m.Base."}


def test_cap_orders_by_bm25_not_tf(spark):
    """Hub fixture where BM25 and the old tf-sum proxy disagree on the
    cap cut (VERDICT r3): doc A repeats the entity's COMMON token (high
    tf-sum, low idf) while doc B carries extra hits on the RARE token
    (lower tf-sum, higher idf weight).  ES's `most_fields` 5000-hit
    window keeps B; the tf proxy would keep A."""
    from graph4code_spark.operators.linking import corpus_token_stats

    cat = [{"module": "zlib", "klass": None, "function": "zlib.rareword"}]
    rows = [
        ("u://a", "1", "zlib zlib zlib zlib zlib rareword"),
        ("u://b", "2", "zlib rareword rareword"),
    ] + [(f"u://f{i}", str(i + 3), "zlib") for i in range(20)]
    qa = spark.createDataFrame(
        rows, "url string, question_id string, content string"
    )
    stats = corpus_token_stats(qa, cat)
    assert stats.n_docs == 22 and stats.df["zlib"] == 22 and stats.df["rareword"] == 2

    links = detect_mentions(qa, cat, stats).cache()
    kept_bm25 = [r["url"] for r in cap_per_entity(links, cap=1).collect()]
    assert kept_bm25 == ["u://b"]

    # the pre-round-4 tf ordering (no stats -> bm25 == tf) keeps A:
    # proof this fixture actually separates the two orderings
    tf_links = detect_mentions(qa, cat, None)
    kept_tf = [r["url"] for r in cap_per_entity(tf_links, cap=1).collect()]
    assert kept_tf == ["u://a"]
    links.unpersist()


def test_cross_graph_node_reuse_stress(spark):
    """VERDICT r3 #7: the same `se<n>` node URIs repeated across 120
    graphs with CONFLICTING labels/args/about-values.  Every node-level
    join in the usage queries must key on (node, graph); joining on the
    URI alone would cross-wire the even-graph ClsA facts with the
    odd-graph ClsB facts."""
    from graph4code_spark.plans.queries import (
        fit_predict_pairs,
        hyperparameter_distributions,
        single_model_fits,
    )
    from graph4code_spark.uris import PREFIXES

    py, rdfs, schema, sio = (
        PREFIXES["py"], PREFIXES["rdfs"], PREFIXES["schema"], PREFIXES["sio"]
    )
    flows = "http://purl.org/twc/graph4code/flowsTo"
    mixin = py + "sklearn.base.ClassifierMixin"
    doc_g = "http://docs"
    rows = [
        (py + "modA.ClsA", rdfs + "subClassOf", mixin, False, None, None, doc_g),
        (py + "modB.ClsB", rdfs + "subClassOf", mixin, False, None, None, doc_g),
        (py + "modA.ClsA", rdfs + "label", "modA.ClsA", True, None, None, doc_g),
        (py + "modB.ClsB", rdfs + "label", "modB.ClsB", True, None, None, doc_g),
        (mixin, rdfs + "label", "sklearn.base.ClassifierMixin", True, None, None, doc_g),
    ]
    loc = '{"firstLine": 3, "lastLine": 3}'
    for i in range(120):
        g = f"http://g/{i}"
        if i % 2 == 0:  # ClsA ctor feeding a fit call
            rows += [
                ("se1", rdfs + "label", "modA.ClsA.", True, None, None, g),
                ("se1", sio + "SIO_000230", "1", True, None, "k", g),
                ("se1", flows, "se2", False, 0, None, g),
                ("se2", schema + "about", "fit", True, None, None, g),
                ("se2", schema + "text", "m.fit(x)", True, None, None, g),
                ("se2", sio + "SIO_000061", loc, True, None, None, g),
            ]
        else:  # SAME node URIs, conflicting facts: ClsB feeding predict
            rows += [
                ("se1", rdfs + "label", "modB.ClsB.", True, None, None, g),
                ("se1", sio + "SIO_000230", "2", True, None, "k", g),
                ("se1", flows, "se2", False, 0, None, g),
                ("se2", schema + "about", "predict", True, None, None, g),
            ]
    tri = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, is_literal boolean, "
        "arg_pos int, arg_name string, graph string",
    )

    dist = {
        (r["name"], r["param"], r["value"]): r["n"]
        for r in hyperparameter_distributions(tri, "sklearn.base.ClassifierMixin").collect()
    }
    assert dist == {("modA.ClsA", "k", "1"): 60, ("modB.ClsB", "k", "2"): 60}

    fits = single_model_fits(tri, "sklearn.base.ClassifierMixin").collect()
    assert len(fits) == 60
    assert {r["cls_name"] for r in fits} == {"modA.ClsA"}
    assert {r["graph"] for r in fits} == {f"http://g/{i}" for i in range(0, 120, 2)}

    # no graph contains BOTH a fit and a predict — any row here means a
    # cross-graph wire
    assert fit_predict_pairs(tri, "sklearn.base.ClassifierMixin").count() == 0


def test_fused_link_entities_equals_two_pass_composition(spark):
    """Round-4 fused single-tokenization plan (`link_entities`) must be
    row-for-row AND bit-for-bit (bm25 doubles included) identical to the
    legacy two-pass composition `cap_per_entity(detect_mentions(qa, cat,
    corpus_token_stats(qa, cat)))` it replaced — randomized content with
    case-change/digit token boundaries, hub skew, and short docs."""
    import random

    from graph4code_spark.operators.linking import (
        cap_per_entity,
        corpus_token_stats,
        detect_mentions,
        link_entities,
    )

    rng = random.Random(1234)
    cat = [
        {"module": "pandas", "klass": None, "function": "pandas.read_csv"},
        {"module": "sklearn", "klass": "LinearSVC", "function": "fit"},
        {"module": "numpy", "klass": None, "function": "numpy.argmax"},
        {"module": "zlib", "klass": None, "function": "zlib"},
    ]
    words = ["pandas", "read_csv", "readCsv", "LinearSVC", "fit", "misfit",
             "numpy", "argmax", "zlib", "x2go", "CSVFile", "the", "a", "b2b"]
    rows = []
    for i in range(120):
        n = rng.randint(0, 40)
        rows.append((f"u://{i}", str(i), " ".join(rng.choice(words) for _ in range(n))))
    qa = spark.createDataFrame(rows, "url string, question_id string, content string")

    fused = link_entities(qa, cat, cap=7, salt_buckets=3)
    stats = corpus_token_stats(qa, cat)
    legacy = cap_per_entity(detect_mentions(qa, cat, stats), cap=7, salt_buckets=0)

    key = lambda r: (r["entity"], r["url"])
    got = sorted((tuple(r) for r in fused.collect()), key=lambda t: (t[2], t[0]))
    want = sorted((tuple(r) for r in legacy.collect()), key=lambda t: (t[2], t[0]))
    assert got == want  # exact equality: ints, bools, and float bm25 bits
