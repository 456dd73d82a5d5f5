"""S1/S2: StackOverflow Posts.xml / Votes.xml line scans + Q/A assembly.

The reference streams the dump line by line through xmltodict
(`/root/reference/src/utils.py:104-189`).  Spark-native version: read the
dump as a text source and pull the XML attributes with `regexp_extract` —
pure JVM column expressions, the line scan parallelizes over file splits,
and predicate pushdown drops non-`<row` lines at the scan.

The Q/A assembly (J1) and vote join (J2/A1) are the canonical
hash-aggregation + left-outer-join restatement of the reference's driver
dicts; answers collapse into an array of structs per question ordered by
answer id (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ATTRS = ["Id", "PostTypeId", "ParentId", "AcceptedAnswerId", "Title", "Body", "Tags"]


def _xml_unescape(col):
    """Decode the XML entities the dumps use (xmltodict does this for the
    reference). `&amp;` must go last; numeric refs cover \\n \\r \\t."""
    c = col
    for pat, rep in [
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
        ("&#xA;", "\n"), ("&#xD;", "\r"), ("&#x9;", "\t"),
        ("&#10;", "\n"), ("&#13;", "\r"), ("&#9;", "\t"),
    ]:
        c = F.replace(c, F.lit(pat), F.lit(rep))
    return F.replace(c, F.lit("&amp;"), F.lit("&"))


def _attr(name: str):
    # XML attribute value; '' when absent (reference uses el.get(k, '')).
    # The name is boundary-anchored: an unanchored `Id="` would match the
    # tail of PostTypeId=/ParentId=/AcceptedAnswerId= when Id is absent
    # or attributes are reordered.
    return _xml_unescape(
        F.regexp_extract(F.col("value"), f'(?<![A-Za-z]){name}="([^"]*)"', 1)
    ).alias(name)


def parse_posts_lines(lines: DataFrame) -> DataFrame:
    """text lines → posts rows (Id, PostTypeId, ParentId, …)."""
    rows = lines.where(F.trim(F.col("value")).startswith("<row"))
    return rows.select(*[_attr(a) for a in _ATTRS]).where(F.col("Id") != "")


def parse_votes_lines(lines: DataFrame) -> DataFrame:
    rows = lines.where(F.trim(F.col("value")).startswith("<row"))
    return rows.select(
        F.regexp_extract("value", '(?<![A-Za-z])PostId="([^"]*)"', 1).alias("PostId"),
        F.regexp_extract("value", '(?<![A-Za-z])VoteTypeId="([^"]*)"', 1).alias("VoteTypeId"),
    ).where(F.col("PostId") != "")


# ---------------------------------------------------------------------------
# Volume-scale synthetic dump (S1/S2 at bench size; no external data).
# One straight-line worker per question id — shared by the distributed
# generator and the driver oracle, the `synth._page_record` pattern.
# ---------------------------------------------------------------------------

_TITLE_WORDS = ["pandas", "numpy", "sklearn", "spark", "csv & files",
                "dataframes", "a <tricky> title", "plotting"]


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;").replace("\n", "&#xA;")
    )


def _h_int(*parts) -> int:
    import hashlib

    m = hashlib.md5("|".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(m[:8], "big")


def question_block_lines(i: int, seed: int) -> tuple[list[str], list[str]]:
    """(post lines, vote lines) for question #i: the question row, its
    answers (0-3, ids deliberately string-sort-hostile), votes with a
    mix of counted (1/2) and ignored (other) types, plus occasional
    garbage lines and votes for nonexistent posts."""
    qid = 1_000_000 + i
    h = _h_int(seed, i)
    title = f"How to use {_TITLE_WORDS[h % len(_TITLE_WORDS)]} #{i}?"
    body = f"Line one of {i}\nwith <code>x={i}</code> & more"
    tags = f"<python><{_TITLE_WORDS[(h >> 3) % len(_TITLE_WORDS)].split(' ')[0]}>"
    n_ans = h % 4  # 0..3 answers
    # answer ids alternate 7-digit (9xxxxxx) and 8-digit (10xxxxxx)
    # ranges so STRING sort differs from numeric ("9…" > "10…");
    # unique for i < 100_000
    aids = [(9_000_000 if a % 2 else 10_000_000) + i * 10 + a for a in range(n_ans)]
    accepted = f' AcceptedAnswerId="{aids[0]}"' if aids and h % 5 == 0 else ""
    posts = [
        f'  <row Id="{qid}" PostTypeId="1"{accepted} '
        f'Title="{_xml_escape(title)}" Body="{_xml_escape(body)}" '
        f'Tags="{_xml_escape(tags)}" />'
    ]
    for a, aid in enumerate(aids):
        posts.append(
            f'  <row Id="{aid}" PostTypeId="2" ParentId="{qid}" '
            f'Body="{_xml_escape(f"Answer {a} to {i} > use idiom & care")}" />'
        )
    if h % 17 == 0:
        posts.append("  <!-- comment noise -->")
    votes = []
    vid = qid * 1000
    for v in range(h % 6):  # votes on the question, types cycle 1,2,3,5
        vtype = [1, 2, 3, 5][(h + v) % 4]
        votes.append(f'  <row Id="{vid + v}" PostId="{qid}" VoteTypeId="{vtype}" />')
    for a, aid in enumerate(aids):
        for v in range((h >> (4 + a)) % 3):
            votes.append(
                f'  <row Id="{vid + 100 + a * 10 + v}" PostId="{aid}" VoteTypeId="2" />'
            )
    if h % 13 == 0:
        votes.append(f'  <row Id="{vid + 999}" PostId="424242" VoteTypeId="2" />')
    return posts, votes


def synth_posts_lines(spark, n_questions: int, seed: int = 42):
    """Distributed deterministic Posts.xml/Votes.xml dumps as two
    line-DataFrames (value string) — spark.range → mapInPandas, no
    driver materialization, identical at any partitioning."""
    from typing import Iterator

    import pandas as pd

    def gen(which: int):
        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out: list[str] = []
                for i in pdf["id"]:
                    out.extend(question_block_lines(int(i), seed)[which])
                yield pd.DataFrame({"value": out})
        return run

    parts = max(1, min(n_questions // 500, 64))
    rng = spark.range(0, n_questions, numPartitions=parts)
    posts = rng.mapInPandas(gen(0), schema="value string")
    votes = rng.mapInPandas(gen(1), schema="value string")
    return posts, votes


def vote_counts(votes: DataFrame) -> DataFrame:
    """A1 + S2 filter: VoteTypeId ∈ {1,2} → count per post."""
    return (
        votes.where(F.col("VoteTypeId").isin("1", "2"))
        .groupBy("PostId")
        .agg(F.count(F.lit(1)).alias("votes"))
    )


def posts_with_votes(posts: DataFrame, votes: DataFrame) -> DataFrame:
    """J2: left join; missing votes → '' (reference `utils.py:176-178`)."""
    vc = vote_counts(votes)
    return posts.join(vc, posts["Id"] == vc["PostId"], "left").select(
        *_ATTRS, F.coalesce(F.col("votes").cast("string"), F.lit("")).alias("votes")
    )


def assemble_questions(posts_v: DataFrame) -> DataFrame:
    """J1: questions ⋈ answers (ParentId) → one row per question with an
    ordered answers array and the ES docContent recipe
    (`utils.py:219-238`)."""
    questions = posts_v.where(F.col("PostTypeId") == "1")
    answers = posts_v.where(F.col("PostTypeId") == "2")
    ans_agg = (
        answers.groupBy(F.col("ParentId").alias("q_id"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("Id").alias("aid"),
                        F.col("Body").alias("body"),
                        F.col("votes").alias("votes"),
                    )
                )
            ).alias("answers")
        )
    )
    j = questions.join(ans_agg, questions["Id"] == ans_agg["q_id"], "left")
    answers_col = F.coalesce(
        F.col("answers"),
        F.array().cast("array<struct<aid:string,body:string,votes:string>>"),
    )
    content = F.concat(
        F.col("Title"), F.lit(" "), F.col("Body"), F.lit(" "), F.col("Tags"),
        F.array_join(F.transform(answers_col, lambda a: a["body"]), ""),
    )
    return j.select(
        questions["Id"].alias("question_id"),
        F.col("Title").alias("title"),
        F.col("Tags").alias("tags"),
        F.col("votes").alias("q_votes"),
        F.col("Body").alias("q_body"),
        answers_col.alias("answers"),
        content.alias("content"),
    )
