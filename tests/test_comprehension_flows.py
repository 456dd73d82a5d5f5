"""Comprehension value-flow shapes (G5/G8 subset extension): WALA
compiles `[EXPR for v in xs]` into a hidden comprehension function whose
parameter binds per element of xs (the EachElementGet shape, same as the
for-statement), and the comprehension's value is a CONTAINER of the
expression's results (`PythonTurtleAnalysisEngine.java` models the body
as an ordinary call graph node; element identity is not modeled in this
honest subset, so the loop var carries the source's producers as union
members exactly like `for v in xs:`)."""

from graph4code_spark.operators.flows import (
    build_flow_catalog,
    extract_page_flow_nodes,
)
from graph4code_spark.synth import FIXED_CATALOG

CAT = build_flow_catalog(FIXED_CATALOG)


def _by_path(nodes):
    out = {}
    for n in nodes:
        out.setdefault(tuple(n["path"]), []).append(n)
    return out


def _flows(nodes):
    return {
        (n["node_number"], pos, d)
        for n in nodes
        for pos, dsts in n["flows_to"].items()
        for d in dsts
    }


def test_union_receiver_and_container_value():
    """`[m.predict(d) for m in ms]` mints ONE predict node fed DATA-0 by
    EVERY member ctor (union points-to receiver), the tracked arg flows
    at its ordinal, and the lhs holds the result as a container member a
    later for-loop consumer sees."""
    code = (
        "import sklearn.svm\n"
        "import pandas\n"
        "ms = [sklearn.svm.SVC(1), sklearn.svm.SVC(2)]\n"
        "d = pandas.read_csv('x.csv')\n"
        "ys = [m.predict(d) for m in ms]\n"
        "for y in ys:\n"
        "    pandas.concat(y)\n"
    )
    nodes = extract_page_flow_nodes("http://q/compr1", [code], CAT)
    by = _by_path(nodes)
    flows = _flows(nodes)
    svcs = by[("sklearn", "svm", "SVC")]
    assert len(svcs) == 2
    (pred,) = by[("sklearn", "svm", "SVC", "predict")]
    (csv,) = by[("pandas", "read_csv")]
    (concat,) = by[("pandas", "concat")]
    for svc in svcs:
        assert (svc["node_number"], "0", pred["node_number"]) in flows
    assert (csv["node_number"], "1", pred["node_number"]) in flows
    assert (pred["node_number"], "1", concat["node_number"]) in flows


def test_loop_var_does_not_leak():
    """The comprehension's loop var is scoped: a binding it shadows is
    restored afterwards, so a later method call on the same name still
    resolves against the ORIGINAL receiver class."""
    code = (
        "import sklearn.svm\n"
        "import pandas\n"
        "m = sklearn.svm.SVC(1)\n"
        "frames = [pandas.read_csv('a.csv'), pandas.read_csv('b.csv')]\n"
        "ys = [m.predict(f) for f in frames]\n"
        "zs = [pandas.concat(m) for m in frames]\n"
        "m.fit(1)\n"
    )
    nodes = extract_page_flow_nodes("http://q/compr2", [code], CAT)
    by = _by_path(nodes)
    flows = _flows(nodes)
    (svc,) = by[("sklearn", "svm", "SVC")]
    (fit,) = by[("sklearn", "svm", "SVC", "fit")]
    # after `m` was a comprehension loop var, `m.fit(1)` still resolves
    # against the SVC ctor as receiver
    assert (svc["node_number"], "0", fit["node_number"]) in flows
    # and inside the second comprehension, `m` meant the frames elements
    (concat,) = by[("pandas", "concat")]
    for csv in by[("pandas", "read_csv")]:
        assert (csv["node_number"], "1", concat["node_number"]) in flows


def test_element_arg_flow_and_filter_clause():
    """Elements flow into a plain cataloged call at the arg ordinal;
    an `if` filter clause and generator parens parse the same way."""
    code = (
        "import pandas\n"
        "frames = [pandas.read_csv('a.csv'), pandas.read_csv('b.csv')]\n"
        "ys = (pandas.concat(f) for f in frames if f is not None)\n"
    )
    nodes = extract_page_flow_nodes("http://q/compr3", [code], CAT)
    by = _by_path(nodes)
    flows = _flows(nodes)
    (concat,) = by[("pandas", "concat")]
    csvs = by[("pandas", "read_csv")]
    assert len(csvs) == 2
    for csv in csvs:
        assert (csv["node_number"], "1", concat["node_number"]) in flows


def test_untracked_source_is_inert():
    """A comprehension over an untracked variable derives nothing: the
    loop var stays unbound and calls on it mint no node."""
    code = (
        "import sklearn\n"
        "ys = [m.fit(x) for m in unknown_models]\n"
    )
    nodes = extract_page_flow_nodes("http://q/compr4", [code], CAT)
    assert all("fit" not in n["path"] for n in nodes)
