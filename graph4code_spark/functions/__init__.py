"""Column-expression helpers shared by the emitters.

Everything here is built-in `pyspark.sql.functions` — stays inside
whole-stage codegen, no Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType

from graph4code_spark.uris import URI_RLIKE

# struct field order must match schemas.TRIPLES_SCHEMA
_TRIPLE_FIELDS = ("subj", "pred", "obj", "is_literal", "arg_pos", "arg_name", "graph")


def quad(
    subj: Column | str,
    pred: Column | str,
    obj: Column | str,
    is_literal: bool | Column,
    graph: Column | str,
    arg_pos: Column | None = None,
    arg_name: Column | None = None,
) -> Column:
    """Build one quad struct (null-safe; filtered later by `valid_quads`)."""

    def c(x):
        return F.lit(x) if not isinstance(x, Column) else x

    return F.struct(
        c(subj).cast(StringType()).alias("subj"),
        c(pred).cast(StringType()).alias("pred"),
        c(obj).cast(StringType()).alias("obj"),
        c(is_literal).alias("is_literal"),
        (arg_pos if arg_pos is not None else F.lit(None).cast(IntegerType())).alias("arg_pos"),
        (arg_name if arg_name is not None else F.lit(None).cast(StringType())).alias("arg_name"),
        c(graph).cast(StringType()).alias("graph"),
    )


def explode_quads(df, quads_col: Column):
    """Explode an array<quad-struct> column into the canonical quad table,
    applying the reference's URI-validity filter
    (`create_docstrings_graph.py:140-151`): a quad is dropped when its
    subject/predicate — or a non-literal object — is not a valid URI.
    Null-object quads (absent optional fields) are dropped too.
    """
    q = df.select(F.explode(quads_col).alias("q")).select("q.*")
    is_uri_ok = lambda col: F.col(col).rlike(URI_RLIKE)  # noqa: E731
    return q.where(
        F.col("subj").isNotNull()
        & F.col("obj").isNotNull()
        & is_uri_ok("subj")
        & is_uri_ok("pred")
        & (F.col("is_literal") | is_uri_ok("obj"))
    )


def bool_lexical(col: Column) -> Column:
    """RDF lexical form of a boolean literal ('true'/'false')."""
    return F.when(col, F.lit("true")).otherwise(F.lit("false"))


def dotted_prefix(col: Column) -> Column:
    """``'.'.join(name.split('.')[:-1])`` (`create_docstrings_graph.py:367`)."""
    parts = F.split(col, r"\.")
    n = F.size(parts)
    return F.when(n > 1, F.array_join(F.slice(parts, 1, n - 1), ".")).otherwise(F.lit(""))


def path_end(col: Column) -> Column:
    """Last dotted component."""
    return F.element_at(F.split(col, r"\."), -1)


def drop_test_modules(catalog):
    """F9: skip `.tests.` submodules during catalog construction — the
    reference's walk filter `if '.tests.' in modname: continue`
    (`inspect_docstrings_per_module.py:522-523`), restated as a
    scan-time predicate over the record's qualified names (Catalyst
    pushes it into the catalog source)."""
    def has_tests(c):
        return F.coalesce(F.col(c).contains(".tests."), F.lit(False))

    return catalog.where(~(has_tests("klass") | has_tests("function")))
