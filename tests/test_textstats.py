from pyspark.sql import functions as F

from graph4code_spark.operators.textstats import (
    bpe_token_count,
    detect_language,
    doc_fingerprint,
    quality_features,
    whitespace_token_count,
)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("hello world, it's 42 degrees!",), ("",)], "text string"
    )
    rows = df.select(
        whitespace_token_count(F.col("text")).alias("ws"),
        bpe_token_count(F.col("text")).alias("bpe"),
    ).collect()
    assert rows[0]["ws"] == 5
    # hello | world | , | it | ' | s | 42 | degrees | !
    assert rows[0]["bpe"] == 9
    assert rows[1]["ws"] == 0


def test_language_detection(spark):
    df = spark.createDataFrame(
        [
            ("the cat is in the house and it is happy",),
            ("der hund ist nicht in der wohnung und ich bin da",),
            ("xyzzy plugh qwertz",),
        ],
        "text string",
    )
    langs = [r[0] for r in df.select(detect_language(F.col("text"))).collect()]
    assert langs == ["en", "de", "und"]


def test_quality_and_fingerprint(spark):
    good = "the quick brown fox jumps over the lazy dog and keeps running for a while"
    bad = "!!! ??? ### $$$ %%%"
    df = spark.createDataFrame([(1, good), (2, bad)], "id long, text string")
    q = {r.id: r.q_score for r in quality_features(df, "text").collect()}
    assert q[1] > q[2]

    fp = df.select("id", doc_fingerprint(F.col("text")).alias("fp")).collect()
    fps = {r.id: r.fp for r in fp}
    # deterministic + distinct for different docs
    fp2 = {r.id: r.fp for r in df.select("id", doc_fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps == fp2 and fps[1] != fps[2]


def test_repetition_features(spark):
    from graph4code_spark.operators.textstats import repetition_features

    loopy = "spam spam spam spam"          # dup words, one dominant bigram
    varied = "one two three four five six"  # all distinct
    df = spark.createDataFrame([(1, loopy), (2, varied)], "id long, text string")
    out = {r.id: r for r in repetition_features(df, "text").collect()}
    # loopy: 4 words 1 distinct -> dup 0.75; 3 bigrams all "spam spam" -> 1.0
    assert abs(out[1].rep_dup_word_frac - 0.75) < 1e-9
    assert abs(out[1].rep_top_bigram_frac - 1.0) < 1e-9
    # varied: no duplicate words, every bigram unique (1/5)
    assert out[2].rep_dup_word_frac == 0.0
    assert abs(out[2].rep_top_bigram_frac - 0.2) < 1e-9
