"""Q/A structure extraction from Common-Crawl-style pages.

The reference consumed StackOverflow ``Posts.xml`` rows and assembled
question documents with answers, votes, tags and code blocks
(`/root/reference/src/utils.py:191-249`).  In the webtext tier the same
structure is recovered from the page HTML itself: a per-site adapter
(regex over the page template) pulls out question/answer nodes, and the
canonical extractor supplies code blocks.

One Arrow-batched ``mapInPandas`` pass, no shuffle: the parse happens
where the page partition lives.  The ES "content" field is reassembled
with the reference's exact recipe: ``Title + " " + Body + " " + Tags +
concat(answerBodies)`` (`utils.py:222-229`) — raw HTML included, because
that is what the reference indexed and ran must-term checks against.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from graph4code_spark.html_extract import parse_html

_Q_RE = re.compile(
    r'<div class="question" data-qid="(?P<qid>[^"]*)" data-tags="(?P<tags>[^"]*)"'
    r' data-votes="(?P<votes>[^"]*)"><h1>(?P<title>.*?)</h1>'
    r'<div class="qbody">(?P<body>.*?)</div></div>',
    re.S,
)
_A_RE = re.compile(
    r'<div class="answer" data-aid="(?P<aid>[^"]*)" data-votes="(?P<votes>[^"]*)">'
    r'<div class="abody">(?P<body>.*?)</div></div>',
    re.S,
)

QA_SCHEMA = (
    "url string, question_id string, title string, tags string, "
    "q_votes string, q_body string, "
    "answers array<struct<aid:string, body:string, votes:string>>, "
    "content string, codes array<string>"
)


def parse_qa_page(url: str, html: str) -> dict | None:
    """Parse one page; None when it is not a Q/A page."""
    m = _Q_RE.search(html)
    if m is None:
        return None
    qid, tags, qvotes = m.group("qid"), m.group("tags"), m.group("votes")
    title, body = m.group("title"), m.group("body")
    answers = [
        (a.group("aid"), a.group("body"), a.group("votes"))
        for a in _A_RE.finditer(html)
    ]
    # ES content recipe (`utils.py:222-229`)
    content = title + " " + body + " " + tags + "".join(a[1] for a in answers)
    # multi-line <code> blocks of question body + answer bodies, in order
    # (`utils.py:663-665`: BeautifulSoup over all_content)
    all_content = body + "".join(a[1] for a in answers)
    _, codes = parse_html(all_content)
    return {
        "url": url,
        "question_id": qid,
        "title": title,
        "tags": tags,
        "q_votes": qvotes,
        "q_body": body,
        "answers": answers,
        "content": content,
        "codes": codes,
    }


def _qa_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["url", "question_id", "title", "tags", "q_votes", "q_body",
            "answers", "content", "codes"]
    for pdf in batches:
        rows = []
        for url, html in zip(pdf["url"], pdf["html"]):
            if isinstance(html, (bytes, bytearray)):
                html = html.decode("utf-8", errors="replace")
            rec = parse_qa_page(url, html or "")
            if rec is not None:
                rows.append(rec)
        yield pd.DataFrame(rows, columns=cols)


def extract_qa(pages: DataFrame) -> DataFrame:
    """pages → question documents (one row per question page)."""
    return pages.select("url", "html").mapInPandas(_qa_batches, schema=QA_SCHEMA)
