"""posts_xml scans (S1/S2/J1/J2/A1), top-modules (A2/A3/F2), multimodal
plumbing, and the flowsTo transitive closure (G10)."""

import pytest

from graph4code_spark.operators.closure import transitive_closure
from graph4code_spark.operators.multimodal import (
    extract_media_features,
    frame_sample_plan,
    synth_media,
)
from graph4code_spark.operators.topmodules import import_counts, top_modules
from graph4code_spark.sources.posts_xml import (
    assemble_questions,
    parse_posts_lines,
    parse_votes_lines,
    posts_with_votes,
)

POSTS = [
    '<row Id="1" PostTypeId="1" Title="Q one" Body="body1" Tags="&lt;python&gt;" />',
    '<row Id="2" PostTypeId="2" ParentId="1" Body="answer A" />',
    '<row Id="3" PostTypeId="2" ParentId="1" Body="answer B" />',
    '<row Id="4" PostTypeId="1" Title="Q two" Body="body2" Tags="" />',
    "garbage line",
]
VOTES = [
    '<row Id="10" PostId="1" VoteTypeId="2" />',
    '<row Id="11" PostId="1" VoteTypeId="2" />',
    '<row Id="12" PostId="1" VoteTypeId="5" />',  # filtered (S2)
    '<row Id="13" PostId="3" VoteTypeId="1" />',
]


def test_posts_pipeline(spark):
    posts = parse_posts_lines(spark.createDataFrame([(l,) for l in POSTS], "value string"))
    votes = parse_votes_lines(spark.createDataFrame([(l,) for l in VOTES], "value string"))
    assert posts.count() == 4

    pv = posts_with_votes(posts, votes)
    votes_by_id = {r.Id: r.votes for r in pv.collect()}
    assert votes_by_id["1"] == "2"   # VoteTypeId 5 excluded
    assert votes_by_id["3"] == "1"
    assert votes_by_id["4"] == ""    # missing -> '' like the reference

    qs = {r.question_id: r for r in assemble_questions(pv).collect()}
    q1 = qs["1"]
    assert [a["aid"] for a in q1.answers] == ["2", "3"]
    assert q1.content == "Q one body1 <python>answer Aanswer B"
    assert qs["4"].answers == []


def test_top_modules(spark):
    rows = [
        ("g", 1, "pandas", True), ("g", 2, "pandas", True), ("g", 3, "pandas", True),
        ("g", 4, "torch", True), ("g", 5, "os", True),   # blacklisted
        ("g", 6, "numpy", False),                         # not an import
    ]
    nodes = spark.createDataFrame(
        rows, "graph_uri string, node_number int, path_end string, is_import boolean"
    )
    got = {r.module: r.cnt for r in import_counts(nodes).collect()}
    assert got == {"pandas": 3, "torch": 1}
    parity = {r.module: r.cnt for r in import_counts(nodes, parity=True).collect()}
    assert parity == {"pandas": 2, "torch": 0}  # reference off-by-one quirk
    top = top_modules(nodes, k=1).collect()
    assert top[0]["module"] == "pandas"


def test_multimodal_features_and_frames(spark):
    media = synth_media(spark, 9)
    feats = extract_media_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 9
    assert all(len(r.features) == 64 for r in rows)
    # deterministic across runs
    again = {r.media_id: r.features for r in extract_media_features(media, fake=True).collect()}
    assert {r.media_id: r.features for r in rows} == again

    frames = frame_sample_plan(media, every_ms=500)
    assert frames.count() > 0

    with pytest.raises(Exception):
        extract_media_features(media, fake=False).collect()


def test_wav_decode_real():
    """The vendored RIFF/PCM16 parser against a hand-built 4-sample clip
    with hand-computed features, plus malformed-payload errors."""
    import struct

    from graph4code_spark.operators.multimodal import _decode_wav, synth_wav_payload

    pcm = struct.pack("<4h", 1000, -2000, 3000, -4096)
    hdr = (
        b"RIFF" + (36 + len(pcm)).to_bytes(4, "little") + b"WAVEfmt "
        + (16).to_bytes(4, "little") + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        + b"data" + len(pcm).to_bytes(4, "little")
    )
    feats = _decode_wav(hdr + pcm)
    assert len(feats) == 64
    # 32 envelope windows over n=4: each 1/8 window is empty or one sample
    assert [f for f in feats[:32] if f] == [1000, 2000, 3000, 4096]
    # histogram: |s|//2048 -> bins 0,0,1,2
    assert feats[32] == 2 and feats[33] == 1 and feats[34] == 1
    # zero crossings: 16 windows over n=4 -> sign flips land in-window only
    # when a window holds >=2 samples; with n=4 every window has <=1 sample
    assert feats[48:].sum() == 0
    # 32 alternating samples -> 2 per zc-window -> exactly 1 flip each
    one = _decode_wav(
        b"RIFF" + (36 + 64).to_bytes(4, "little") + b"WAVEfmt "
        + (16).to_bytes(4, "little") + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        + b"data" + (64).to_bytes(4, "little") + struct.pack("<32h", *([100, -100] * 16))
    )
    assert list(one[48:]) == [1.0] * 16

    with pytest.raises(ValueError):
        _decode_wav(b"OggS" + b"\x00" * 40)
    with pytest.raises(ValueError):
        _decode_wav(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt/data chunks

    # synthetic payloads round-trip through the parser deterministically
    a = _decode_wav(synth_wav_payload(42, 1))
    b = _decode_wav(synth_wav_payload(42, 1))
    assert (a == b).all() and a[:32].sum() > 0


def test_transitive_closure(spark):
    edges = spark.createDataFrame(
        [("a", "b", "g"), ("b", "c", "g"), ("c", "a", "g"),  # cycle
         ("x", "y", "g2")],
        "src string, dst string, graph string",
    )
    tc = {(r.src, r.dst): r.min_hops for r in transitive_closure(edges).collect()}
    assert tc[("a", "c")] == 2
    assert tc[("a", "a")] == 3       # cycle closes
    assert ("a", "y") not in tc      # graphs are isolated
    assert tc[("x", "y")] == 1


def test_drop_test_modules_filter(spark):
    from graph4code_spark.functions import drop_test_modules
    from graph4code_spark.schemas import API_CATALOG_SCHEMA
    from graph4code_spark.synth import catalog_df

    recs = [
        {"module": "sklearn", "klass": "sklearn.tests.test_svm.FakeCase",
         "function": None},
        {"module": "sklearn", "klass": None,
         "function": "sklearn.utils.tests.test_x.helper"},
        {"module": "sklearn", "klass": "sklearn.svm.SVC", "function": "fit"},
        {"module": "pandas", "klass": None, "function": "pandas.read_csv"},
    ]
    rows = [tuple(r.get(f.name) for f in API_CATALOG_SCHEMA.fields) for r in recs]
    df = spark.createDataFrame(rows, API_CATALOG_SCHEMA)
    kept = {(r.klass, r.function) for r in drop_test_modules(df).collect()}
    assert kept == {("sklearn.svm.SVC", "fit"), (None, "pandas.read_csv")}
    # no-op on the clean fixture catalog
    assert drop_test_modules(catalog_df(spark)).count() == catalog_df(spark).count()
