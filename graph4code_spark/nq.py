"""N-Quads serialization / parsing for the flattened quad table.

The reference materializes its graphs as .nq files (e.g.
`/root/reference/sample_graph/example1.nq`, `docstrings_sample.nq`) with
Jena, including RDF-star annotated statements:

    <s> <p> <o|"lit"> <g> .
    << <s> <p> <o|"lit"> >> <annPred> "value" <g> .

The engine flattens RDF* into nullable ``arg_pos``/``arg_name`` columns
(TRIPLES_SCHEMA); this module re-expands them:

- ``arg_pos`` is serialized under ``sio:SIO_000613`` (position),
- ``arg_name`` under ``sio:SIO_000116`` (name) — EXCEPT on
  ``g4c:read``/``g4c:write`` statements, whose annotation predicate is
  ``sio:SIO_000420`` (`PythonTurtleAnalysisEngine.java:400-414`;
  confirmed against example1.nq's `<< … g4c/read "svm" >> SIO_000420`),
- the base triple of an annotated statement is NOT separately asserted,
  matching the reference's output (and `emitters/analysis.py`).

Both directions are pure column expressions — serialization is string
concat + escape chains, parsing is `regexp_extract` — so the whole
round-trip stays inside whole-stage codegen with zero Python.  A
line-oriented text sink/source also parallelizes trivially: each
partition writes/reads its own lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph4code_spark.schemas import TRIPLE_COLS

SIO_POS = "http://semanticscience.org/resource/SIO_000613"
SIO_NAME = "http://semanticscience.org/resource/SIO_000116"
SIO_ACCESS = "http://semanticscience.org/resource/SIO_000420"

_G4C_READ = "http://purl.org/twc/graph4code/read"
_G4C_WRITE = "http://purl.org/twc/graph4code/write"

#: N-Quads literal escapes, applied in order (backslash first)
_ESCAPES = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")]


def _escape(col):
    c = col
    for raw, esc in _ESCAPES:
        c = F.replace(c, F.lit(raw), F.lit(esc))
    return c


def _unescape(col):
    # placeholder dance so '\\n' does not first become '\n' and then
    # get re-unescaped: swap '\\\\' out, unescape, swap back
    c = F.replace(col, F.lit("\\\\"), F.lit("\x00"))
    for raw, esc in [("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t"), ('"', '\\"')]:
        c = F.replace(c, F.lit(esc), F.lit(raw))
    return F.replace(c, F.lit("\x00"), F.lit("\\"))


def _term(obj, is_literal):
    return F.when(
        is_literal, F.concat(F.lit('"'), _escape(obj), F.lit('"'))
    ).otherwise(F.concat(F.lit("<"), obj, F.lit(">")))


def to_nq_lines(quads: DataFrame) -> DataFrame:
    """Quad table → one-column DataFrame ``value`` of N-Quads lines."""
    s = F.concat(F.lit("<"), F.col("subj"), F.lit(">"))
    p = F.concat(F.lit("<"), F.col("pred"), F.lit(">"))
    o = _term(F.col("obj"), F.col("is_literal"))
    g = F.concat(F.lit("<"), F.col("graph"), F.lit(">"))

    ann_pred = F.when(
        F.col("pred").isin(_G4C_READ, _G4C_WRITE), F.lit(SIO_ACCESS)
    ).otherwise(
        F.when(F.col("arg_pos").isNotNull(), F.lit(SIO_POS)).otherwise(F.lit(SIO_NAME))
    )
    ann_val = F.coalesce(F.col("arg_pos").cast("string"), F.col("arg_name"))

    plain = F.concat_ws(" ", s, p, o, g, F.lit("."))
    annotated = F.concat_ws(
        " ",
        F.lit("<<"), s, p, o, F.lit(">>"),
        F.concat(F.lit("<"), ann_pred, F.lit(">")),
        F.concat(F.lit('"'), _escape(ann_val), F.lit('"')),
        g, F.lit("."),
    )
    return quads.select(
        F.when(
            F.col("arg_pos").isNotNull() | F.col("arg_name").isNotNull(), annotated
        ).otherwise(plain).alias("value")
    )


# literal body as an "unrolled loop" — [^"\]*(?:\.[^"\]*)* — instead of
# the naive (?:[^"\]|\.)*: java.util.regex compiles alternation-in-
# quantifier to per-character recursion and StackOverflows on the
# golden's 11k-char docstring literals
_LIT = r'[^"\\]*(?:\\.[^"\\]*)*'
# object term: URI, or literal with optional ^^<datatype> suffix (the
# docstrings golden types its param_index literals as xsd:integer; the
# flattened quad table keeps the lexical value and drops the datatype)
_OBJ = rf'(<[^>]*>|"{_LIT}"(?:\^\^<[^>]*>)?)'
_PLAIN_RE = rf"^<([^>]*)> <([^>]*)> {_OBJ} <([^>]*)> \.$"
_ANN_RE = (
    rf'^<< <([^>]*)> <([^>]*)> {_OBJ} >> <([^>]*)> "({_LIT})" <([^>]*)> \.$'
)


def parse_nq_lines(lines: DataFrame, keep_cols: list[str] | None = None) -> DataFrame:
    """``value`` lines → quad table (plain + RDF*-annotated lines; the
    annotation predicate folds back into arg_pos/arg_name).

    ``keep_cols``: extra input columns carried through unchanged (e.g.
    a per-file label from ``input_file_name()``)."""
    v = F.trim(F.col("value"))
    is_ann = v.startswith("<<")

    def ext(pattern, idx):
        return F.regexp_extract(v, pattern, idx)

    subj = F.when(is_ann, ext(_ANN_RE, 1)).otherwise(ext(_PLAIN_RE, 1))
    pred = F.when(is_ann, ext(_ANN_RE, 2)).otherwise(ext(_PLAIN_RE, 2))
    raw_obj = F.when(is_ann, ext(_ANN_RE, 3)).otherwise(ext(_PLAIN_RE, 3))
    graph = F.when(is_ann, ext(_ANN_RE, 6)).otherwise(ext(_PLAIN_RE, 4))
    ann_pred = F.when(is_ann, ext(_ANN_RE, 4))
    ann_val = F.when(is_ann, _unescape(ext(_ANN_RE, 5)))

    extra = [F.col(c) for c in (keep_cols or [])]
    step1 = lines.where(v.rlike(_PLAIN_RE) | v.rlike(_ANN_RE)).select(
        *extra,
        subj.alias("subj"),
        pred.alias("pred"),
        raw_obj.alias("_raw_obj"),
        graph.alias("graph"),
        ann_pred.alias("_ann_pred"),
        ann_val.alias("_ann_val"),
    )
    uri_inner = F.expr("substring(_raw_obj, 2, length(_raw_obj) - 2)")
    lit_inner = F.regexp_extract(F.col("_raw_obj"), rf'^"({_LIT})"', 1)
    parsed = (
        step1.withColumn("is_literal", F.col("_raw_obj").startswith('"'))
        .withColumn(
            "obj",
            F.when(F.col("is_literal"), _unescape(lit_inner)).otherwise(uri_inner),
        )
        .withColumn(
            "arg_pos",
            F.when(F.col("_ann_pred") == SIO_POS, F.col("_ann_val").cast("int")),
        )
        .withColumn(
            "arg_name",
            F.when(F.col("_ann_pred").isin(SIO_NAME, SIO_ACCESS), F.col("_ann_val")),
        )
    )
    return parsed.select(*(keep_cols or []), *TRIPLE_COLS)


def write_nq(quads: DataFrame, path: str) -> None:
    """Text sink: one .nq part file per partition."""
    to_nq_lines(quads).write.mode("overwrite").text(path)


def read_nq(spark, path: str) -> DataFrame:
    return parse_nq_lines(spark.read.text(path))
