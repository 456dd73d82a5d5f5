"""X5: RST/Napoleon docstring parsing — engine (docparse) vs the
independently-written straight-line oracle (reference_impl/rst_oracle),
including the reference's quirks."""

from hypothesis import given, settings
from hypothesis import strategies as st

from graph4code_spark.docparse import (
    build_param_map,
    build_return_map,
    parse_docstring,
    parse_docstrings,
    parse_rst,
)
from graph4code_spark.reference_impl.rst_oracle import (
    oracle_parse_docstring,
    oracle_parse_rst,
)


def test_type_before_param_and_multiline():
    # :type x: arrives BEFORE :param x: (but inside the field list) —
    # the reference buffers it and flushes it on the next new-param line
    doc = (
        ":param a: a doc\n:type x: int, optional\n:param x: the x\n  more\n"
        ":param y: y doc\n:returns: r\n:rtype: t"
    )
    fdoc, p2d, p2t, rmap = parse_docstring(doc)
    assert p2d == {"a": " a doc", "x": " the x\n  more", "y": " y doc"}
    assert p2t == {"x": " int, optional"}
    assert rmap == {"doc": " r", "type": " t"}
    assert parse_docstring(doc) == oracle_parse_docstring(doc)


def test_type_before_all_params_lands_in_function_doc():
    # quirk: a :type line preceding EVERY :param line is consumed by the
    # function-doc gathering phase and never parsed as a type
    doc = ":type x: int\n:param x: the x\n:returns: r\n:rtype: t"
    fdoc, p2d, p2t, rmap = parse_docstring(doc)
    assert p2t == {}
    assert ":type x: int" in fdoc
    assert parse_docstring(doc) == oracle_parse_docstring(doc)


def test_greedy_param_name_quirk():
    # a colon inside the doc makes the name regex eat up to the LAST colon
    # name regex eats up to the LAST colon, doc regex splits at the FIRST
    doc = ":param x: maps a: b pairs\n:returns: r\n:rtype: t"
    _, p2d, _, _ = parse_docstring(doc)
    assert p2d == {"x: maps a": " maps a: b pairs"}
    assert parse_docstring(doc) == oracle_parse_docstring(doc)


def test_last_param_dropped_without_returns():
    doc = ":param a: first\n:param b: second"
    _, p2d, _, rmap = parse_docstring(doc)
    assert p2d == {"a": " first"}  # quirk: b never flushed
    assert rmap is None
    assert parse_docstring(doc) == oracle_parse_docstring(doc)


def test_rtype_terminates_scan():
    doc = ":param q: doc\n:returns: out\n:rtype: int\n:param z: never"
    _, p2d, _, rmap = parse_docstring(doc)
    assert "z" not in p2d and rmap == {"doc": " out", "type": " int"}


def test_numpy_shape_dimensionality_and_optional():
    doc = (
        "Fit.\n\nParameters\n----------\n"
        "X : array-like, shape (n_samples, n_features)\n    Training.\n"
        "y : array-like, shape (n_samples,), optional\n    Target.\n\n"
        "Returns\n-------\nself : object\n    Fitted.\n"
    )
    fdoc, p2d, p2t, rmap = parse_docstring(doc)
    pm = build_param_map(p2d, p2t)
    assert pm["X"]["dimensionality"] == [2]
    assert pm["X"]["optional"] is None
    assert pm["y"]["dimensionality"] == [1]
    assert pm["y"]["optional"] is True
    assert build_return_map(rmap)["type"] == " object"
    assert parse_docstring(doc) == oracle_parse_docstring(doc)


def test_google_style():
    doc = (
        "Send.\n\nArgs:\n    url (str): the URL.\n"
        "    timeout (float, optional): seconds\n        more.\n\n"
        "Returns:\n    Response: the response.\n"
    )
    _, p2d, p2t, rmap = parse_docstring(doc)
    assert p2d == {"url": " the URL.", "timeout": " seconds\nmore."}
    assert p2t == {"url": " str", "timeout": " float, optional"}
    assert rmap == {"doc": " the response.", "type": " Response"}
    assert parse_docstring(doc) == oracle_parse_docstring(doc)


def test_empty_and_prose_only():
    assert parse_docstring(None) == (None, None, None, None)
    assert parse_docstring("") == (None, None, None, None)
    doc = "Just prose.\nTwo lines."
    assert parse_docstring(doc) == oracle_parse_docstring(doc)


_LINE = st.one_of(
    st.builds(lambda n, d: f":param {n}: {d}",
              st.sampled_from(["x", "y", "zz"]),
              st.text(alphabet="ab: c", max_size=8)),
    st.builds(lambda n, t: f":type {n}: {t}",
              st.sampled_from(["x", "y", "zz"]),
              st.sampled_from(["int", "str, optional", "array, shape (n,)"])),
    st.builds(lambda d: f":returns: {d}", st.text(alphabet="abc ", max_size=6)),
    st.builds(lambda t: f":rtype: {t}", st.sampled_from(["int", "bool"])),
    st.text(alphabet="abc :", max_size=10),  # prose / continuation / junk
    st.just(""),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_LINE, min_size=1, max_size=12))
def test_parse_rst_property_engine_equals_oracle(lines):
    # guard the reference's crash surface the same way it does: the param
    # regexes require a name char after ':param ' — those lines would
    # IndexError identically in both, so keep inputs parseable (and the
    # reference NameErrors on an empty list: parse_rst is only called
    # with non-empty lines, so min_size=1)
    lines = [l for l in lines if not l.startswith(":param :")]
    if not lines:
        return
    assert parse_rst(lines) == oracle_parse_rst(lines)


def test_catalog_roundtrip_through_raw_docstrings(spark):
    """FIXED_CATALOG → rendered raw docstrings → Arrow-batched parse →
    the parse-produced API_CATALOG_SCHEMA fields (param_doc, type,
    optional, dimensionality, return doc/type) equal the originals.
    This is the X5 integration proof: the engine can build its catalog
    from raw docstring text, not only consume a pre-parsed one."""
    from graph4code_spark.synth import FIXED_CATALOG, entity_name, render_docstring

    recs = [r for r in FIXED_CATALOG if render_docstring(r) is not None]
    df = spark.createDataFrame(
        [(i, render_docstring(r)) for i, r in enumerate(recs)],
        "id long, text string",
    )
    parsed = {r.id: r for r in parse_docstrings(df, "text", "id").collect()}
    for i, rec in enumerate(recs):
        got = parsed[i]
        pm = {k: v.asDict() for k, v in got.param_map.items()}
        assert set(pm) == set(rec["param_map"]), entity_name(rec)
        for name, orig in rec["param_map"].items():
            assert pm[name]["param_doc"] == orig["param_doc"], (entity_name(rec), name)
            assert pm[name]["type"] == orig["type"]
            assert pm[name]["optional"] == orig["optional"]
            assert pm[name]["dimensionality"] == orig["dimensionality"]
        rm = rec.get("return_map")
        if rm and rm.get("doc") and rm.get("type"):
            assert got.return_map.doc == rm["doc"]
            assert got.return_map.type == rm["type"]
        else:
            assert got.return_map is None


def test_parse_docstrings_spark_surface(spark):
    df = spark.createDataFrame(
        [(0, ":param a: doc a\n:type a: int\n:returns: r\n:rtype: t"),
         (1, None)],
        "id long, text string",
    )
    rows = {r.id: r for r in parse_docstrings(df, "text", "id").collect()}
    assert rows[0].param_map["a"].type == " int"
    assert rows[0].return_map.doc == " r"
    assert rows[1].param_map is None and rows[1].return_map is None
