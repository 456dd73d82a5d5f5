"""Independent QA-page parser for the digest oracles.

`sources/qa.parse_qa_page` (the Spark path's worker) extracts question/
answer structure with REGEX over the raw html and the stdlib-HTMLParser
text collector for code blocks.  This oracle recovers the same record by
a structurally different mechanism: a stdlib HTMLParser that tracks
absolute byte offsets and SLICES the original html between matching
tags, with its own nested-element bookkeeping for <code> blocks.  The
two implementations share no parsing code — VERDICT r1 flagged the
shared extraction worker as the one residual link in the
kg_pipeline_digest / kg_flow_digest oracles; this closes it.

Contract mirrored (see `utils.py:191-249,663-665` in the reference):
- content = title + " " + q_body + " " + tags + concat(answer bodies),
  all RAW html,
- codes = text of <code> elements that have exactly one text child
  (no nested elements), entity-decoded, kept only if multi-line,
  in document order over q_body + answer bodies.
"""

from __future__ import annotations

import html as _html
from html.parser import HTMLParser


class _OffsetParser(HTMLParser):
    """Tracks absolute offsets; records div.question / div.answer /
    h1 / div.qbody spans (raw inner html) and <code> spans."""

    def __init__(self, src: str) -> None:
        super().__init__(convert_charrefs=False)
        self.src = src
        self._line_starts = [0]
        for i, ch in enumerate(src):
            if ch == "\n":
                self._line_starts.append(i + 1)
        # open element stack: (tag, attrs, inner_start_offset)
        self._stack: list[tuple[str, dict, int]] = []
        # results: list of (kind, attrs, inner_html) in document order
        self.spans: list[tuple[str, dict, str]] = []
        # abody inner html keyed by the ENCLOSING answer div's inner_start
        # (first abody per answer wins) — positional zipping of two
        # independently collected span lists would silently mis-pair every
        # subsequent body once one answer lacks an abody child
        self._abody_of: dict[int, str] = {}
        # (attrs, abody_html) per closed answer div, document order
        self.answers: list[tuple[dict, str]] = []
        # open <code> bookkeeping: (inner_start, nested_flag_index)
        self._code_open: list[list] = []
        self.code_spans: list[tuple[int, str]] = []  # (start, text) doc order

    def _offset(self) -> int:
        line, col = self.getpos()
        return self._line_starts[line - 1] + col

    def handle_starttag(self, tag, attrs):
        start = self._offset()
        inner_start = start + len(self.get_starttag_text())
        for c in self._code_open:
            c[1] = True  # a tag opened inside <code> -> nested
        self._stack.append((tag, dict(attrs), inner_start))
        if tag == "code":
            self._code_open.append([inner_start, False])

    def handle_startendtag(self, tag, attrs):
        for c in self._code_open:
            c[1] = True

    def handle_endtag(self, tag):
        end = self._offset()
        # pop to the matching open tag (tolerant of mismatches)
        while self._stack:
            otag, attrs, inner_start = self._stack.pop()
            if otag == tag:
                inner = self.src[inner_start:end]
                cls = attrs.get("class", "")
                if tag == "div" and cls in ("question", "answer", "qbody", "abody"):
                    self.spans.append((cls, attrs, inner))
                    if cls == "abody":
                        # pair with the ENCLOSING answer div, still open on
                        # the stack, via its unique inner_start offset
                        for ptag, pattrs, pstart in reversed(self._stack):
                            if ptag == "div" and pattrs.get("class", "") == "answer":
                                self._abody_of.setdefault(pstart, inner)
                                break
                    elif cls == "answer":
                        self.answers.append(
                            (attrs, self._abody_of.pop(inner_start, ""))
                        )
                elif tag == "h1":
                    self.spans.append(("h1", attrs, inner))
                break
        if tag == "code" and self._code_open:
            inner_start, nested = self._code_open.pop()
            if not nested:
                raw = self.src[inner_start:end]
                if raw:
                    self.code_spans.append((inner_start, _html.unescape(raw)))


def _parse(html_src: str) -> _OffsetParser:
    p = _OffsetParser(html_src)
    try:
        p.feed(html_src)
        p.close()
    except Exception:
        pass
    return p


def oracle_parse_qa_page(url: str, html_src: str) -> dict | None:
    p = _parse(html_src)
    by_kind: dict[str, list] = {}
    for kind, attrs, inner in p.spans:
        by_kind.setdefault(kind, []).append((attrs, inner))
    if "question" not in by_kind:
        return None
    qattrs, _q_inner = by_kind["question"][0]
    title = by_kind["h1"][0][1] if by_kind.get("h1") else ""
    q_body = by_kind["qbody"][0][1] if by_kind.get("qbody") else ""
    # each abody was associated with its ENCLOSING answer div by the
    # parser's open-element stack; an answer without an abody child gets
    # "" without shifting its siblings' bodies
    answers = [
        (attrs.get("data-aid", ""), body, attrs.get("data-votes", ""))
        for attrs, body in p.answers
    ]
    tags = qattrs.get("data-tags", "")
    content = title + " " + q_body + " " + tags + "".join(a[1] for a in answers)

    # codes over q_body + answer bodies (reference: soup over all_content)
    all_content = q_body + "".join(a[1] for a in answers)
    cp = _parse(all_content)
    codes = [t for _, t in sorted(cp.code_spans) if "\n" in t]
    return {
        "url": url,
        "question_id": qattrs.get("data-qid", ""),
        "title": title,
        "tags": tags,
        "q_votes": qattrs.get("data-votes", ""),
        "q_body": q_body,
        "answers": answers,
        "content": content,
        "codes": codes,
    }
