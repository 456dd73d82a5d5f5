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


def parse_html(html: str) -> tuple[str, list[str]]:
    """Return (full_text, multiline_code_blocks) for one document."""
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
