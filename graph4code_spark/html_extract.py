"""Canonical HTML → text / code-block extraction.

This module is the engine's single source of truth for text extraction —
the per-row invariant is that the extracted ``text`` is **byte-identical
per url** between the pipeline (Arrow-batched UDF over millions of
partitions) and the straight-line single-document path used by tests.
Both call the same pure functions below.

Semantics mirror the reference's use of BeautifulSoup ``html.parser``:

- ``extract_text`` ≡ ``BeautifulSoup(html, "html.parser").get_text()`` —
  concatenation of all character data in document order, entities decoded
  (`/root/reference/src/utils.py:230-233`).
- ``extract_code_blocks`` ≡ ``[c.get_text() for c in soup.find_all("code",
  text=True) if '\\n' in c.get_text()]`` — ``<code>`` elements containing a
  single text node, kept only if multi-line
  (`/root/reference/src/utils.py:232,663-665`).

Implementation is stdlib-only (``html.parser``) so executors need no extra
packages; the parser is tolerant of broken markup the same way
BeautifulSoup's html.parser tree builder is for the constructs that occur
in forum HTML.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pandas as pd

# Elements whose content BeautifulSoup's html.parser treats as raw CDATA
# (we still include their text in get_text, as BeautifulSoup does).
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class _TextAndCode(HTMLParser):
    """One pass: collect full text + qualifying <code> blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.codes: list[str] = []
        # stack of open <code> collectors: [text_parts, saw_nested_element]
        self._code_stack: list[list] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if self._code_stack and tag not in _VOID:
            for entry in self._code_stack:
                entry[1] = True
        if tag == "code":
            self._code_stack.append([[], False])

    def handle_startendtag(self, tag: str, attrs) -> None:
        if self._code_stack:
            for entry in self._code_stack:
                entry[1] = True

    def handle_endtag(self, tag: str) -> None:
        if tag == "code" and self._code_stack:
            text_parts, saw_nested = self._code_stack.pop()
            # find_all("code", text=True): element has exactly one child
            # and it is a text node -> no nested elements, non-empty text
            text = "".join(text_parts)
            if not saw_nested and text:
                self.codes.append(text)

    def handle_data(self, data: str) -> None:
        self.parts.append(data)
        for entry in self._code_stack:
            entry[0].append(data)


def _parse_html_canonical(html: str) -> tuple[str, list[str]]:
    """The reference-semantics parser (html.parser event stream)."""
    p = _TextAndCode()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # tolerate pathological markup: whatever was collected stands
        pass
    text = "".join(p.parts)
    codes = [c for c in p.codes if "\n" in c]
    return text, codes


# ---------------------------------------------------------------------------
# Fast path.  html.parser is ~77% of the whole per-page CPU budget
# (cProfile over the synth+extract chain), and forum/template HTML is
# overwhelmingly "simple markup": no comments, doctypes, PIs, CDATA
# elements, or stray '<'.  For exactly that subset a compiled-regex
# tokenizer reproduces the html.parser event stream — BYTE-IDENTICAL
# output — at a fraction of the cost.  Any construct whose handling we
# cannot guarantee to match (markup declarations, script/style CDATA
# modes, '<' that is not a clean tag, '<' inside a quoted attribute)
# bails to the canonical parser above; a Hypothesis property test pins
# fast == canonical wherever the fast path engages.
# ---------------------------------------------------------------------------

import re as _re
from html import unescape as _unescape

# constructs the fast tokenizer refuses to reason about
_FAST_UNSAFE = _re.compile(r"<[!?]|</?(?:script|style)\b", _re.I)

# one token = a text run (never contains '<') or a complete tag whose
# attribute section may contain quoted '>'/'<' but no bare '<'/'>'
_FAST_TOKEN = _re.compile(
    r"([^<]+)"                                    # 1: text run
    r"|<(/?)"                                     # 2: end-tag slash
    r"([a-zA-Z][a-zA-Z0-9.\-_:]*)"                # 3: tag name
    r"((?:\"[^\"]*\"|'[^']*'|[^<>\"'])*?)"        # 4: attrs (quoted <> ok; lazy so the self-closing '/' stays in group 5)
    r"(/?)>"                                      # 5: self-closing slash
)


def _parse_html_fast(html: str) -> tuple[str, list[str]] | None:
    """Regex tokenizer for simple markup; None = cannot guarantee
    identity with the canonical parser, caller must fall back."""
    if _FAST_UNSAFE.search(html):
        return None
    pos = 0
    parts: list[str] = []
    codes: list[str] = []
    stack: list[list] = []  # open <code> collectors: [chunks, saw_nested]
    for m in _FAST_TOKEN.finditer(html):
        if m.start() != pos:  # stray '<' the tokenizer skipped
            return None
        pos = m.end()
        text_run = m.group(1)
        if text_run is not None:
            if "&" in text_run:
                # html.parser (convert_charrefs=True) decodes each text
                # run with html.unescape — same function, same result
                text_run = _unescape(text_run)
            parts.append(text_run)
            for entry in stack:
                entry[0].append(text_run)
            continue
        closing, tag, attrs, selfclose = (
            m.group(2), m.group(3).lower(), m.group(4), m.group(5))
        # NOTE: '<'/'>' inside QUOTED attribute values are fine — the
        # quoted alternates above consume them exactly like html.parser's
        # quoted-value regex, and only tag names affect this extractor's
        # output.  A bare '<' in the attr section fails the token match
        # and bails via the coverage check instead.
        if attrs and not (attrs[0] in " \t\n\r\f/" ):
            # html.parser's tag-name charset is broader than this
            # tokenizer's ('<code@x>' is ONE name there, not name+attrs)
            # — only a clean separator proves the name ended where ours did
            return None
        if closing:
            if selfclose or attrs.strip():
                return None  # '</x/>' or junk in an end tag: quirk zone
            # handle_endtag
            if tag == "code" and stack:
                chunks, saw_nested = stack.pop()
                text = "".join(chunks)
                if not saw_nested and text:
                    codes.append(text)
        elif selfclose:
            # handle_startendtag (overridden: marks nesting only)
            for entry in stack:
                entry[1] = True
        else:
            # handle_starttag
            if stack and tag not in _VOID:
                for entry in stack:
                    entry[1] = True
            if tag == "code":
                stack.append([[], False])
    if pos != len(html):  # trailing stray '<'
        return None
    return "".join(parts), [c for c in codes if "\n" in c]


def parse_html(html: str) -> tuple[str, list[str]]:
    """Return (full_text, multiline_code_blocks) for one document.

    Dispatches to the regex fast path when the markup is simple enough
    that identity with the canonical html.parser semantics is
    guaranteed; everything else takes the canonical path."""
    fast = _parse_html_fast(html)
    if fast is not None:
        return fast
    return _parse_html_canonical(html)


def extract_text(html: str) -> str:
    """Canonical text extraction (byte-identical contract)."""
    return parse_html(html)[0]


def extract_code_blocks(html: str) -> list[str]:
    """Multi-line ``<code>`` blocks, in document order."""
    return parse_html(html)[1]


# ---------------------------------------------------------------------------
# Vectorized (Arrow) wrappers — the pipeline entry points.
# ---------------------------------------------------------------------------

def extract_pages_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """``mapInPandas`` worker: pages(url, html binary, …) →
    (url, text, codes array<string>).

    Per-document failures are quarantined, not fatal: the reference skips
    and counts failed documents (`utils.py:471-473`); we emit ``ok=False``
    rows so a downstream filter can route them to a quarantine table.
    """
    for pdf in batches:
        urls = pdf["url"]
        htmls = pdf["html"]
        texts: list[str | None] = []
        codes: list[list[str] | None] = []
        oks: list[bool] = []
        for h in htmls:
            try:
                if isinstance(h, (bytes, bytearray)):
                    h = h.decode("utf-8", errors="replace")
                t, c = parse_html(h if h is not None else "")
                texts.append(t)
                codes.append(c)
                oks.append(True)
            except Exception:
                texts.append(None)
                codes.append(None)
                oks.append(False)
        yield pd.DataFrame(
            {"url": urls, "text": texts, "codes": codes, "ok": oks}
        )


EXTRACT_OUTPUT_SCHEMA = "url string, text string, codes array<string>, ok boolean"


def with_extracted_text(pages_df):
    """pages → (url, text, codes, ok) via a single Arrow-batched pass.

    Narrow transformation: no shuffle; the parse runs where the page
    partition lives.
    """
    cols = [c for c in ("url", "html") if c in pages_df.columns]
    return pages_df.select(*cols).mapInPandas(
        extract_pages_batches, schema=EXTRACT_OUTPUT_SCHEMA
    )
