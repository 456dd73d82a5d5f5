"""Property tests (hypothesis) for the ES-analyzer tokenizer.

The optimized single-pass `analyze` must be extensionally equal to the
three-stage spec transcribed from the reference's analyzer definition
(`/root/reference/src/utils.py:23-50`): whitespace tokenize →
word_delimiter (split at non-alnum, lower→UPPER, ACRONYM|Word,
letter↔digit) → lowercase.  No Spark needed — pure functions.
"""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from graph4code_spark.analyzer import analyze, entity_required_tokens, must_terms

_WS = re.compile(r"\s+")
_NON_ALNUM = re.compile(r"[^0-9A-Za-z]+")
_BOUNDARIES = re.compile(
    r"(?<=[a-z])(?=[A-Z])"
    r"|(?<=[A-Z])(?=[A-Z][a-z])"
    r"|(?<=[0-9])(?=[A-Za-z])"
    r"|(?<=[A-Za-z])(?=[0-9])"
)


def spec_analyze(text: str) -> list[str]:
    """Direct transcription of the analyzer chain (the spec)."""
    tokens: list[str] = []
    for ws_tok in _WS.split(text):
        if not ws_tok:
            continue
        for run in _NON_ALNUM.split(ws_tok):
            if not run:
                continue
            for part in _BOUNDARIES.split(run):
                if part:
                    tokens.append(part.lower())
    return tokens


_TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "S", "Z", "C")
    ),
    max_size=80,
)


@settings(max_examples=500, deadline=None)
@given(_TEXT)
def test_analyze_matches_spec(text):
    assert analyze(text) == spec_analyze(text)


@settings(max_examples=200, deadline=None)
@given(st.from_regex(r"[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*){0,3}",
                     fullmatch=True))
def test_required_tokens_are_analyzer_tokens_of_components(name):
    required = entity_required_tokens(name)
    want = set()
    for comp in name.split("."):
        want |= set(spec_analyze(comp))
    assert required == frozenset(want)


def test_known_word_delimiter_cases():
    # canonical ES word_delimiter examples
    assert analyze("PowerShot") == ["power", "shot"]
    assert analyze("CSVFile") == ["csv", "file"]
    assert analyze("wi-fi") == ["wi", "fi"]
    assert analyze("SD500 card") == ["sd", "500", "card"]
    assert analyze("O'Neil's") == ["o", "neil", "s"]
    assert analyze("sklearn.svm.SVC.fit") == ["sklearn", "svm", "svc", "fit"]
    assert must_terms("sklearn.svm.SVC.fit") == ["fit", "sklearn"]
    assert must_terms("read_csv") == ["read_csv"]
