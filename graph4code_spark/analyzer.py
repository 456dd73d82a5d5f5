"""Tokenizer reproducing the reference's Elasticsearch custom analyzer.

The reference indexes forum content with: ``whitespace`` tokenizer →
``word_delimiter`` (generate_word_parts, split_on_case_change) →
``lowercase`` (`/root/reference/src/utils.py:23-50`).  Linking fidelity
(J3/J4 in SURVEY.md §2.3) depends on matching these token boundaries
exactly, so this module is the single shared implementation used by the
vectorized linking UDFs and by the tests.

word_delimiter semantics implemented (ES defaults + the configured flags):
- split at non-alphanumeric characters (delimiters are dropped)
- split at lower→UPPER case changes (``split_on_case_change``)
- an UPPER-run followed by lowercase splits before the last upper
  (``PowerShot`` → ``Power,Shot``; ``CSVFile`` → ``CSV,File``)
- split at letter↔digit transitions (``split_on_numerics`` default true)
- trailing English possessive ``'s`` is stemmed (default true) — already
  covered by the delimiter split since ``'`` is non-alphanumeric
- ``generate_word_parts``/``generate_number_parts`` true; no catenation,
  no original preservation
"""

from __future__ import annotations

import re
from functools import lru_cache

# One findall pass emits the final token parts directly: whitespace and
# non-alphanumerics delimit; inside an alnum run the alternatives encode
# the word_delimiter boundaries (lower->upper, ACRONYM|Word, letter<->digit).
# Alternative order matters: digits; UPPER-run not followed by lowercase
# (backtracks one char so CSVFile -> CSV, File); Upper-initial word; lower run.
_PARTS = re.compile(r"[0-9]+|[A-Z]+(?![a-z])|[A-Z][a-z]*|[a-z]+")


def analyze(text: str) -> list[str]:
    """Tokenize ``text`` exactly as the reference's ES analyzer does."""
    return [p.lower() for p in _PARTS.findall(text)]


def analyze_joined(text: str) -> str:
    """``' '.join(analyze(text))`` — the must-term match string used by
    ``filter_results`` (`utils.py:309-317`)."""
    return " ".join(analyze(text))


@lru_cache(maxsize=65536)
def entity_required_tokens(name: str, key_terms: str | None = None) -> frozenset[str]:
    """Token set an ES ``multi_match … operator: AND`` query requires.

    Mirrors ``get_pure_class_or_function_query`` (`utils.py:253-295`): the
    query text is the set of dotted components of ``name`` (plus
    ``key_terms`` components for methods), analyzed; AND semantics means
    every analyzed token must occur in the document.
    """
    clauses: set[str] = set(name.split("."))
    if key_terms:
        clauses.update(key_terms.split("."))
    required: set[str] = set()
    for clause in clauses:
        required.update(analyze(clause))
    return frozenset(required)


def must_terms(qualified_name: str) -> list[str]:
    """Must-verify terms of ``filter_results`` (`utils.py:300-306`):
    the last dotted component, plus the first when the name is dotted."""
    arr = qualified_name.split(".")
    musts = [arr[-1]]
    if len(arr) > 1:
        musts.append(arr[0])
    return musts


def good_match(content_lower: str, qualified_name: str) -> bool:
    """Reference ``filter_results`` per-document check (`utils.py:322-338`):
    every must-term appears raw (lowercased) OR in analyzer-token form."""
    for must in must_terms(qualified_name):
        if must.lower() in content_lower:
            continue
        if analyze_joined(must) in content_lower:
            continue
        return False
    return True
