"""Interprocedural G3 subset (VERDICT r2 #7): flows through single-level
user-defined ``def`` blocks — call-site args into body parameter uses,
return values back to the caller — per the arg/return turtle-flow shapes
of `PythonTurtleAnalysisEngine.java:1970-2025` (honest subset: defs
precede call sites, positional wiring, `return <var>` only)."""

from graph4code_spark.operators.flows import (
    build_flow_catalog,
    extract_page_flow_nodes,
)
from graph4code_spark.synth import FIXED_CATALOG

CAT = build_flow_catalog(FIXED_CATALOG)


def _by_path(nodes):
    return {tuple(n["path"]): n for n in nodes}


def _flows(nodes):
    out = set()
    for n in nodes:
        for pos, dsts in n["flows_to"].items():
            for d in dsts:
                out.add((n["node_number"], pos, d))
    return out


def test_arg_into_body_and_returned_ctor_out():
    code = (
        "import pandas\nimport sklearn\n"
        "df = pandas.read_csv('t.csv')\n"
        "def train(d):\n"
        "    m = sklearn.svm.SVC(d)\n"
        "    return m\n"
        "clf = train(df)\n"
        "p = clf.predict(df)\n"
    )
    nodes = extract_page_flow_nodes("http://q/1", [code], CAT)
    by = _by_path(nodes)
    read = by[("pandas", "read_csv")]["node_number"]
    svc = by[("sklearn", "svm", "SVC")]["node_number"]
    pred = by[("sklearn", "svm", "SVC", "predict")]["node_number"]
    fl = _flows(nodes)
    # call-site arg df flows into the body's SVC(d) at position 1
    assert (read, "1", svc) in fl
    # returned ctor becomes clf -> receiver of .predict at position 0
    assert (svc, "0", pred) in fl
    # df also feeds predict's positional arg
    assert (read, "1", pred) in fl


def test_returned_library_value_chains_through():
    code = (
        "import pandas\nimport sklearn\n"
        "def load(path):\n"
        "    d = pandas.read_csv(path)\n"
        "    return d\n"
        "x = load('data.csv')\n"
        "m = sklearn.svm.SVC(x)\n"
        "r = m.fit(x, 2)\n"
    )
    nodes = extract_page_flow_nodes("http://q/2", [code], CAT)
    by = _by_path(nodes)
    read = by[("pandas", "read_csv")]["node_number"]
    svc = by[("sklearn", "svm", "SVC")]["node_number"]
    fit = by[("sklearn", "svm", "SVC", "fit")]["node_number"]
    fl = _flows(nodes)
    assert (read, "1", svc) in fl and (read, "1", fit) in fl
    assert (svc, "0", fit) in fl


def test_body_chain_is_separate_from_top_level():
    code = (
        "import pandas\n"
        "a = pandas.read_csv('x.csv')\n"
        "def f(q):\n"
        "    b = pandas.read_csv(q)\n"
        "    return b\n"
        "c = pandas.read_csv('y.csv')\n"
    )
    nodes = extract_page_flow_nodes("http://q/3", [code], CAT)
    nums = {n["node_number"]: n for n in nodes}
    # top-level chain: import -> a -> c skips the def body node
    reads = [n for n in nodes if n["path"] == ["pandas", "read_csv"]]
    assert len(reads) == 3
    a_node, body_node, c_node = reads
    assert c_node["node_number"] in a_node["immediately_precedes"]
    assert body_node["node_number"] not in a_node["immediately_precedes"]
    assert body_node["immediately_precedes"] == []
    # body-local variables do not leak into the top level
    assert nums[c_node["node_number"]]["flows_to"] == {}


def test_globals_visible_in_def_body():
    """Module-level tracked values stay visible inside def bodies (r5):
    `def evaluate(): m.fit(df)` over globals resolves eagerly — one
    shared body node with the global producers wired (WALA resolves
    globals through its pointer analysis; context-insensitive method
    body).  A parameter SHADOWING a global wires only the call-site
    argument, never the global."""
    code = (
        "import pandas\n"
        "import sklearn.svm\n"
        "df = pandas.read_csv('x.csv')\n"
        "m = sklearn.svm.SVC(1)\n"
        "def evaluate():\n"
        "    r = m.fit(df)\n"
        "    return r\n"
        "out = evaluate()\n"
    )
    nodes = extract_page_flow_nodes("http://q/glob1", [code], CAT)
    by = _by_path(nodes)
    flows = _flows(nodes)
    csv = by[("pandas", "read_csv")]
    svc = by[("sklearn", "svm", "SVC")]
    fit = by[("sklearn", "svm", "SVC", "fit")]
    assert (svc["node_number"], "0", fit["node_number"]) in flows
    assert (csv["node_number"], "1", fit["node_number"]) in flows

    shadow = (
        "import pandas\n"
        "df = pandas.read_csv('x.csv')\n"
        "def shadow(df):\n"
        "    q = pandas.DataFrame(df)\n"
        "d2 = pandas.read_csv('z.csv')\n"
        "shadow(d2)\n"
    )
    nodes2 = extract_page_flow_nodes("http://q/glob2", [shadow], CAT)
    reads = sorted(
        (n for n in nodes2 if n["path"] == ["pandas", "read_csv"]),
        key=lambda n: n["node_number"],
    )
    (dfr,) = [n for n in nodes2 if n["path"] == ["pandas", "DataFrame"]]
    g, d2 = reads
    f2 = _flows(nodes2)
    assert (d2["node_number"], "1", dfr["node_number"]) in f2
    assert (g["node_number"], "1", dfr["node_number"]) not in f2


def test_for_over_call_result():
    """`for v in f(...):` binds the loop targets to the iterable call's
    chain-final node as members — `for chunk in pandas.read_csv(...)`
    flows the read into the body's consumers, and a chained iterable
    (`df.iterrows()`) feeds through its turtle-extended node."""
    code = (
        "import pandas\n"
        "for chunk in pandas.read_csv('big.csv'):\n"
        "    out = pandas.DataFrame(chunk)\n"
        "df = pandas.read_csv('x.csv')\n"
        "for row in df.iterrows():\n"
        "    q = pandas.concat(row)\n"
    )
    nodes = extract_page_flow_nodes("http://q/forcall", [code], CAT)
    flows = _flows(nodes)
    (dfr,) = [n for n in nodes if n["path"] == ["pandas", "DataFrame"]]
    (it_,) = [n for n in nodes
              if n["path"] == ["pandas", "read_csv", "iterrows"]]
    (cc,) = [n for n in nodes if n["path"] == ["pandas", "concat"]]
    reads = sorted(
        (n for n in nodes if n["path"] == ["pandas", "read_csv"]),
        key=lambda n: n["node_number"],
    )
    assert (reads[0]["node_number"], "1", dfr["node_number"]) in flows
    assert (reads[1]["node_number"], "0", it_["node_number"]) in flows
    assert (it_["node_number"], "1", cc["node_number"]) in flows


def test_splat_args_flow_members():
    """`f(*xs)` / `f(**cfg)` flow the container's tracked members (or a
    tracked value's producer) into the call at the splat's source
    ordinal — per-element ordinals are statically unknowable, so this
    honest subset unions them at one position."""
    code = (
        "import pandas\nimport sklearn.svm\n"
        "a = pandas.read_csv('a.csv')\n"
        "b = pandas.read_csv('b.csv')\n"
        "parts = [a, b]\n"
        "m = sklearn.svm.SVC(*parts)\n"
        "q = pandas.DataFrame(**a)\n"
    )
    nodes = extract_page_flow_nodes("http://q/splat", [code], CAT)
    reads = sorted(
        (n for n in nodes if n["path"] == ["pandas", "read_csv"]),
        key=lambda n: n["node_number"],
    )
    (svc,) = [n for n in nodes if n["path"] == ["sklearn", "svm", "SVC"]]
    (dfr,) = [n for n in nodes if n["path"] == ["pandas", "DataFrame"]]
    flows = _flows(nodes)
    for r in reads:
        assert (r["node_number"], "1", svc["node_number"]) in flows
    assert (reads[0]["node_number"], "1", dfr["node_number"]) in flows


def test_def_without_recognized_calls_is_inert():
    code = (
        "import pandas\n"
        "def helper(z):\n"
        "    w = z + 1\n"
        "    return w\n"
        "out = helper(3)\n"
        "df = pandas.read_csv('a.csv')\n"
    )
    nodes = extract_page_flow_nodes("http://q/4", [code], CAT)
    assert [tuple(n["path"]) for n in nodes] == [("pandas",), ("pandas", "read_csv")]
    # the def contributes nothing; the only edge is the import binding's
    # DATA-0 into the call made through it (example2.json node 74)
    imp, call = nodes
    assert imp["flows_to"] == {"0": [call["node_number"]]}
    assert call["flows_to"] == {}


def test_multiple_call_sites_fan_in_context_insensitively():
    code = (
        "import pandas\nimport sklearn\n"
        "def train(d):\n"
        "    m = sklearn.svm.SVC(d)\n"
        "    return m\n"
        "a = pandas.read_csv('a.csv')\n"
        "b = pandas.read_csv('b.csv')\n"
        "c1 = train(a)\n"
        "c2 = train(b)\n"
    )
    nodes = extract_page_flow_nodes("http://q/5", [code], CAT)
    by = _by_path(nodes)
    svc = by[("sklearn", "svm", "SVC")]["node_number"]
    reads = [n["node_number"] for n in nodes if n["path"] == ["pandas", "read_csv"]]
    fl = _flows(nodes)
    # both call sites' args reach the single body node (WALA-default
    # context insensitivity: one node per body instruction)
    for r in reads:
        assert (r, "1", svc) in fl


def test_call_site_contexts_for_def_body_helpers():
    """G8 r5 slice (`PythonTurtleAnalysisEngine.java:456-486`): the same
    helper reached from two call sites keeps distinct node contexts —
    `def train(m): m.fit(d)` called with SVC() then LinearRegression()
    produces TWO fit nodes (one per receiver class) with distinct
    receiver DATA-0 edges, not one merged context."""
    code = (
        "import pandas\nimport sklearn\n"
        "def train(m, d):\n"
        "    m.fit(d, 2)\n"
        "df = pandas.read_csv('t.csv')\n"
        "s = sklearn.svm.SVC(1.0)\n"
        "r = sklearn.linear_model.LinearRegression()\n"
        "train(s, df)\n"
        "train(r, df)\n"
    )
    nodes = extract_page_flow_nodes("http://q/ctx", [code], CAT)
    by = _by_path(nodes)
    fl = _flows(nodes)
    svc = by[("sklearn", "svm", "SVC")]["node_number"]
    lin = by[("sklearn", "linear_model", "LinearRegression")]["node_number"]
    read = by[("pandas", "read_csv")]["node_number"]
    svc_fit = by[("sklearn", "svm", "SVC", "fit")]
    lin_fit = by[("sklearn", "linear_model", "LinearRegression", "fit")]
    assert svc_fit["node_number"] != lin_fit["node_number"]
    # each clone's receiver edge comes from ITS call site's ctor only
    assert (svc, "0", svc_fit["node_number"]) in fl
    assert (lin, "0", lin_fit["node_number"]) in fl
    assert (svc, "0", lin_fit["node_number"]) not in fl
    assert (lin, "0", svc_fit["node_number"]) not in fl
    # the other param re-binds per site: df feeds both clones at pos 1
    assert (read, "1", svc_fit["node_number"]) in fl
    assert (read, "1", lin_fit["node_number"]) in fl
    # constants recorded on the clones; clones chain at the call sites
    assert svc_fit["constant_positional_args"] == {"2": "2"}
    assert lin_fit["constant_positional_args"] == {"2": "2"}
    assert svc_fit["node_number"] in by[("sklearn", "linear_model",
                                         "LinearRegression")]["immediately_precedes"]
    assert lin_fit["node_number"] in svc_fit["immediately_precedes"]


def test_call_site_context_unknown_receiver_is_inert():
    """A call site whose arg has no tracked class produces no clone."""
    code = (
        "import sklearn\n"
        "def train(m):\n"
        "    m.fit(1)\n"
        "train(whatever)\n"
    )
    nodes = extract_page_flow_nodes("http://q/ctx2", [code], CAT)
    assert all("fit" not in n["path"] for n in nodes)


def test_binop_propagation_and_alias():
    # G7 subset: c = a + b then d = c — both producers reach the ctor
    code = (
        "import pandas\n"
        "a = pandas.read_csv('x.csv')\n"
        "b = pandas.read_csv('y.csv')\n"
        "c = a + b\n"
        "d = c\n"
        "out = pandas.DataFrame(d)\n"
    )
    nodes = extract_page_flow_nodes("http://q/6", [code], CAT)
    reads = [n["node_number"] for n in nodes if n["path"] == ["pandas", "read_csv"]]
    ctor = [n["node_number"] for n in nodes if n["path"] == ["pandas", "DataFrame"]][0]
    fl = _flows(nodes)
    assert len(reads) == 2
    for r in reads:
        assert (r, "1", ctor) in fl


def test_plain_alias_keeps_class_tracking():
    # d = obj aliasing keeps the receiver-class link for method calls
    code = (
        "import sklearn\n"
        "obj = sklearn.svm.SVC(x)\n"
        "clf = obj\n"
        "r = clf.fit(y, 2)\n"
    )
    nodes = extract_page_flow_nodes("http://q/7", [code], CAT)
    by = _by_path(nodes)
    svc = by[("sklearn", "svm", "SVC")]["node_number"]
    fit = by[("sklearn", "svm", "SVC", "fit")]["node_number"]
    assert (svc, "0", fit) in _flows(nodes)


def test_binop_of_untracked_vars_is_inert():
    code = (
        "import pandas\n"
        "c = x + y\n"
        "out = pandas.DataFrame(c)\n"
    )
    nodes = extract_page_flow_nodes("http://q/8", [code], CAT)
    # the binop of untracked vars contributes nothing; the only edge is
    # the import binding's DATA-0 into the call made through it
    by = _by_path(nodes)
    imp = by[("pandas",)]
    df = by[("pandas", "DataFrame")]
    assert imp["flows_to"] == {"0": [df["node_number"]]}
    assert df["flows_to"] == {}


def test_nested_call_arg_flows_into_outer():
    """`g(f(x))`: WALA evaluates the inner call first and flows its
    result into the outer at the arg's ordinal — textual numbering puts
    f AFTER g, so this edge legitimately points backward."""
    code = (
        "import pandas\n"
        "from sklearn.model_selection import train_test_split\n"
        "r = train_test_split(pandas.read_csv('x.csv'), test_size=0.3)\n"
    )
    nodes = extract_page_flow_nodes("http://q/2", [code], CAT)
    by = _by_path(nodes)
    tts = by[("sklearn", "model_selection", "train_test_split")]
    read = by[("pandas", "read_csv")]
    assert (read["node_number"], "1", tts["node_number"]) in _flows(nodes)
    assert tts["constant_named_args"] == {"test_size": "0.3"}


def test_nested_keyword_call_and_chained_inner():
    code = (
        "from sklearn.svm import SVC\n"
        "from sklearn.model_selection import train_test_split\n"
        "import pandas\n"
        "m = SVC(C=pandas.read_csv('w.csv'))\n"
        "r = train_test_split(SVC(C=1.0).fit(X))\n"
    )
    nodes = extract_page_flow_nodes("http://q/3", [code], CAT)
    fl = _flows(nodes)
    paths = [tuple(n["path"]) for n in nodes]
    svc1 = next(n for n in nodes if tuple(n["path"]) == ("sklearn", "svm", "SVC"))
    read = next(n for n in nodes if tuple(n["path"]) == ("pandas", "read_csv"))
    # keyword nested arg: read_csv result -> SVC at source-order ordinal 1
    assert (read["node_number"], "1", svc1["node_number"]) in fl
    # chained inner: the CHAIN-FINAL node (.fit) flows into the outer call
    fit = next(n for n in nodes if tuple(n["path"]) == ("sklearn", "svm", "SVC", "fit"))
    tts = next(n for n in nodes if tuple(n["path"]) == ("sklearn", "model_selection", "train_test_split"))
    assert (fit["node_number"], "1", tts["node_number"]) in fl
    # and the second ctor feeds .fit at DATA-0 (chain receiver)
    svc2 = [n for n in nodes if tuple(n["path"]) == ("sklearn", "svm", "SVC")][1]
    assert (svc2["node_number"], "0", fit["node_number"]) in fl
    assert paths.count(("sklearn", "svm", "SVC")) == 2


def test_direct_return_of_call_expression():
    """`return Ctor(p)` (no intermediate variable): the expression's
    node becomes the def's return producer, including its class so
    method calls on the caller's variable resolve."""
    code = (
        "import pandas\nimport sklearn\n"
        "def make(p):\n"
        "    return sklearn.svm.SVC(p)\n"
        "df = pandas.read_csv('t.csv')\n"
        "clf = make(df)\n"
        "r = clf.fit(df, 2)\n"
    )
    nodes = extract_page_flow_nodes("http://q/4", [code], CAT)
    by = _by_path(nodes)
    fl = _flows(nodes)
    svc = by[("sklearn", "svm", "SVC")]["node_number"]
    fit = by[("sklearn", "svm", "SVC", "fit")]["node_number"]
    read = by[("pandas", "read_csv")]["node_number"]
    assert (read, "1", svc) in fl     # call-site arg into the body ctor
    assert (svc, "0", fit) in fl      # returned ctor is fit's receiver
    assert (read, "1", fit) in fl     # df also feeds fit positionally


def test_import_aliases_resolve_calls():
    """`import pandas as pd` / `from sklearn import svm as s` /
    `from sklearn.svm import SVC as Clf`: aliased call names resolve to
    their canonical catalog entries, including constructed-class
    tracking through the alias."""
    code = (
        "import pandas as pd\n"
        "from sklearn import svm as s\n"
        "from sklearn.svm import SVC as Clf\n"
        "df = pd.read_csv('x.csv')\n"
        "m = Clf(df)\n"
        "r = m.fit(df, 1)\n"
        "q = s.SVC(2.0)\n"
    )
    nodes = extract_page_flow_nodes("http://q/5", [code], CAT)
    by = _by_path(nodes)
    fl = _flows(nodes)
    read = by[("pandas", "read_csv")]["node_number"]
    fit = by[("sklearn", "svm", "SVC", "fit")]["node_number"]
    svc_nodes = [n for n in nodes if tuple(n["path"]) == ("sklearn", "svm", "SVC")]
    assert len(svc_nodes) == 2          # Clf(df) and s.SVC(2.0)
    ctor = svc_nodes[0]["node_number"]
    assert (read, "1", ctor) in fl      # df into the aliased ctor
    assert (ctor, "0", fit) in fl       # aliased class tracked -> .fit
    assert (read, "1", fit) in fl
    assert svc_nodes[1]["constant_positional_args"] == {"1": "2.0"}


def test_multi_module_import_line():
    """`import numpy, pandas as pd`: one import node per known module,
    aliases bound as they appear."""
    code = (
        "import numpy, pandas as pd\n"
        "df = pd.read_csv('x.csv')\n"
        "a = numpy.linspace(0, 1)\n"
    )
    nodes = extract_page_flow_nodes("http://q/6", [code], CAT)
    imports = [tuple(n["path"]) for n in nodes if n["is_import"]]
    assert imports == [("numpy",), ("pandas",)]
    by = _by_path(nodes)
    assert ("pandas", "read_csv") in by and ("numpy", "linspace") in by


def test_blank_lines_do_not_break_blocks():
    """ADVICE r3: a blank line is not a statement — it must neither end
    an open def body (dedent) nor join an open if/elif chain (the old
    `line[:1] not in (' ', '\\t')` classified '' as top-level)."""
    # blank line inside the def body: the return wiring must survive
    code = (
        "import pandas\nimport sklearn\n"
        "df = pandas.read_csv('t.csv')\n"
        "def train(d):\n"
        "    m = sklearn.svm.SVC(d)\n"
        "\n"
        "    return m\n"
        "clf = train(df)\n"
        "p = clf.predict(df)\n"
    )
    nodes = extract_page_flow_nodes("http://q/b1", [code], CAT)
    by = _by_path(nodes)
    svc = by[("sklearn", "svm", "SVC")]["node_number"]
    pred = by[("sklearn", "svm", "SVC", "predict")]["node_number"]
    assert (svc, "0", pred) in _flows(nodes)

    # blank line between an if arm and its elif: arms still fork from
    # the pre-if frontier and never precede each other
    code2 = (
        "import pandas\n"
        "df = pandas.read_csv('t.csv')\n"
        "if flag:\n"
        "    a = json.load('a')\n"
        "\n"
        "elif other:\n"
        "    b = numpy.linspace(0, 1)\n"
        "out = pandas.read_csv('u.csv')\n"
    )
    nodes2 = extract_page_flow_nodes("http://q/b2", [code2], CAT)
    by_vn = {n["value_names"][0]: n for n in nodes2 if n["value_names"]}
    df2, a2, b2, out2 = (by_vn[k] for k in ("df", "a", "b", "out"))
    assert a2["node_number"] in df2["immediately_precedes"]
    assert b2["node_number"] in df2["immediately_precedes"]
    assert b2["node_number"] not in a2["immediately_precedes"]
    # no else: fall-through edge from pre-if frontier to the join
    assert out2["node_number"] in df2["immediately_precedes"]
    assert a2["immediately_precedes"] == [out2["node_number"]]
    assert b2["immediately_precedes"] == [out2["node_number"]]


def test_deferred_return_binds_per_site_clone():
    """G8 r5: `def train(m, d): return m.fit(d)` — each call site's
    assigned variable tracks THAT site's clone, and the clone's value
    flows into downstream calls."""
    code = (
        "import pandas\nimport sklearn\n"
        "def train(m, d):\n"
        "    return m.fit(d)\n"
        "df = pandas.read_csv('t.csv')\n"
        "s = sklearn.svm.SVC(1.0)\n"
        "a = train(s, df)\n"
        "parts = sklearn.model_selection.train_test_split(a)\n"
    )
    nodes = extract_page_flow_nodes("http://q/ret", [code], CAT)
    by = _by_path(nodes)
    fl = _flows(nodes)
    fit = by[("sklearn", "svm", "SVC", "fit")]["node_number"]
    split = by[("sklearn", "model_selection", "train_test_split")]["node_number"]
    assert (fit, "1", split) in fl


def test_deferred_return_via_bound_variable():
    """Same, through an intermediate body variable:
    `z = m.fit(d); return z` marks the deferred call as the return."""
    code = (
        "import pandas\nimport sklearn\n"
        "def train(m, d):\n"
        "    z = m.fit(d)\n"
        "    return z\n"
        "df = pandas.read_csv('t.csv')\n"
        "s = sklearn.svm.SVC(1.0)\n"
        "r = sklearn.linear_model.LinearRegression()\n"
        "a = train(s, df)\n"
        "b = train(r, df)\n"
        "parts = sklearn.model_selection.train_test_split(a, b)\n"
    )
    nodes = extract_page_flow_nodes("http://q/ret2", [code], CAT)
    by = _by_path(nodes)
    fl = _flows(nodes)
    svc_fit = by[("sklearn", "svm", "SVC", "fit")]["node_number"]
    lin_fit = by[("sklearn", "linear_model", "LinearRegression", "fit")]["node_number"]
    split = by[("sklearn", "model_selection", "train_test_split")]["node_number"]
    # a carries the SVC-site clone, b the LinearRegression-site clone
    assert (svc_fit, "1", split) in fl
    assert (lin_fit, "2", split) in fl


def test_depth2_arg_flows_through_helper_chain():
    """G3 depth-2 (r5): a def body calling an EARLIER helper def forwards
    its own parameter's uses one level out — `run(df)` reaches the SVC
    ctor inside `train` through `run`'s frame, and the returned ctor
    chains out two levels."""
    code = (
        "import pandas\nimport sklearn\n"
        "def train(d):\n"
        "    m = sklearn.svm.SVC(d)\n"
        "    return m\n"
        "def run(x):\n"
        "    c = train(x)\n"
        "    return c\n"
        "df = pandas.read_csv('t.csv')\n"
        "clf = run(df)\n"
        "p = clf.predict(df)\n"
    )
    nodes = extract_page_flow_nodes("http://q/d2a", [code], CAT)
    by = _by_path(nodes)
    fl = _flows(nodes)
    read = by[("pandas", "read_csv")]["node_number"]
    svc = by[("sklearn", "svm", "SVC")]["node_number"]
    pred = by[("sklearn", "svm", "SVC", "predict")]["node_number"]
    # top-level df reaches the helper body's ctor through BOTH frames
    assert (read, "1", svc) in fl
    # the returned ctor propagates out through both returns
    assert (svc, "0", pred) in fl


def test_depth2_deferred_receiver_forwards_to_outer_site():
    """G3+G8 depth-2: a helper's deferred receiver-call (`m.fit(d)`)
    forwarded through a middle def resolves per OUTER call site — two
    models through the two-level chain yield two fit clones with
    distinct receiver edges and per-site return bindings."""
    code = (
        "import pandas\nimport sklearn\n"
        "def fit_it(m, d):\n"
        "    r = m.fit(d)\n"
        "    return r\n"
        "def run(m, d):\n"
        "    out = fit_it(m, d)\n"
        "    return out\n"
        "df = pandas.read_csv('t.csv')\n"
        "s = sklearn.svm.SVC(1.0)\n"
        "r = sklearn.linear_model.LinearRegression()\n"
        "a = run(s, df)\n"
        "b = run(r, df)\n"
        "parts = sklearn.model_selection.train_test_split(a, b)\n"
    )
    nodes = extract_page_flow_nodes("http://q/d2b", [code], CAT)
    by = _by_path(nodes)
    fl = _flows(nodes)
    read = by[("pandas", "read_csv")]["node_number"]
    svc = by[("sklearn", "svm", "SVC")]["node_number"]
    lin = by[("sklearn", "linear_model", "LinearRegression")]["node_number"]
    svc_fit = by[("sklearn", "svm", "SVC", "fit")]["node_number"]
    lin_fit = by[("sklearn", "linear_model", "LinearRegression", "fit")][
        "node_number"]
    split = by[("sklearn", "model_selection", "train_test_split")][
        "node_number"]
    assert svc_fit != lin_fit
    # receiver edges stay per-site through the forwarded deferral
    assert (svc, "0", svc_fit) in fl and (lin, "0", lin_fit) in fl
    assert (svc, "0", lin_fit) not in fl and (lin, "0", svc_fit) not in fl
    # the data arg rides the forwarded spec into both clones
    assert (read, "1", svc_fit) in fl and (read, "1", lin_fit) in fl
    # per-site return bindings survive the two-level is_ret relay
    assert (svc_fit, "1", split) in fl
    assert (lin_fit, "2", split) in fl


def test_depth2_body_local_receiver_clones_at_inner_site():
    """A helper's deferred call whose receiver binds to a BODY-LOCAL
    ctor clones at the inner site, and its data arg (the outer def's
    parameter) registers as an outer param use."""
    code = (
        "import pandas\nimport sklearn\n"
        "def train(m, d):\n"
        "    m.fit(d)\n"
        "def run(d):\n"
        "    s = sklearn.svm.SVC(1.0)\n"
        "    train(s, d)\n"
        "    return s\n"
        "df = pandas.read_csv('t.csv')\n"
        "clf = run(df)\n"
        "p = clf.predict(df)\n"
    )
    nodes = extract_page_flow_nodes("http://q/d2c", [code], CAT)
    by = _by_path(nodes)
    fl = _flows(nodes)
    read = by[("pandas", "read_csv")]["node_number"]
    svc = by[("sklearn", "svm", "SVC")]["node_number"]
    fit = by[("sklearn", "svm", "SVC", "fit")]["node_number"]
    pred = by[("sklearn", "svm", "SVC", "predict")]["node_number"]
    # inner-site clone: receiver from the body ctor
    assert (svc, "0", fit) in fl
    # outer call site wires df into the clone's data position
    assert (read, "1", fit) in fl
    # returned body ctor chains out of run
    assert (svc, "0", pred) in fl


def test_depth2_self_recursion_is_inert():
    """A def calling its own (earlier) name re-binding does not wire into
    itself — recursion stays outside the honest subset."""
    code = (
        "import sklearn\n"
        "def train(m):\n"
        "    m.fit(1)\n"
        "def train(m):\n"
        "    train(m)\n"
        "s = sklearn.svm.SVC(1.0)\n"
        "train(s)\n"
    )
    nodes = extract_page_flow_nodes("http://q/d2d", [code], CAT)
    # the second (live) train body forwards nothing from the shadowed
    # one; the call site resolves against the re-binding, which defers
    # no receiver calls of its own
    assert [n["path"] for n in nodes] == [["sklearn"], ["sklearn", "svm", "SVC"]]


def test_nested_call_arg_wires_into_def_params():
    """late r5: a nested-call argument at a LOCAL-DEF call site wires
    the inner call's chain-final node into the body's parameter uses —
    `f(np.array(x))` reaches the body exactly like `v = np.array(x);
    f(v)` (WALA evaluates the inner call and flows its value into the
    callee frame like any other arg), positionally and by keyword."""
    code = (
        "import numpy\n"
        "def f(x):\n"
        "    return numpy.log(x)\n"
        "y = f(numpy.array([1]))\n"
        "z = f(x=numpy.array([2]))\n"
    )
    nodes = extract_page_flow_nodes("http://q/nestdef", [code], CAT)
    log = next(n for n in nodes if n["path"] == ["numpy", "log"])
    arrays = [n for n in nodes if n["path"] == ["numpy", "array"]]
    assert len(arrays) == 2
    for arr in arrays:
        assert log["node_number"] in arr["flows_to"].get("1", []), (
            "inner call did not reach the body's param use")
    # equivalence with the plain-variable form (same edge shape)
    var_form = (
        "import numpy\n"
        "def f(x):\n"
        "    return numpy.log(x)\n"
        "v = numpy.array([1])\n"
        "y = f(v)\n"
    )
    vnodes = extract_page_flow_nodes("http://q/nestdefv", [var_form], CAT)
    vlog = next(n for n in vnodes if n["path"] == ["numpy", "log"])
    varr = next(n for n in vnodes if n["path"] == ["numpy", "array"])
    assert vlog["node_number"] in varr["flows_to"].get("1", [])


def test_call_site_contexts_turtle_receiver():
    """G8 final r5: a param-method helper called with a TURTLE value
    (`def clean(d): return d.dropna()` with `raw = read_csv(...)`)
    clones per call site by EXTENDING the receiver's turtle path — the
    same G1 rule the direct `raw.dropna()` form applies — with distinct
    receiver edges per site, and the returned clone chains through the
    caller's binding.  Ctor-class receivers keep the catalog-resolved
    method path."""
    from graph4code_spark.operators.flows import (
        build_flow_catalog,
        extract_page_flow_nodes,
    )
    from graph4code_spark.synth import FIXED_CATALOG

    cat = build_flow_catalog(FIXED_CATALOG)
    nodes = extract_page_flow_nodes(
        "http://q/t",
        ["import pandas\n"
         "def clean(d):\n    return d.dropna()\n"
         "a = pandas.read_csv('x.csv')\n"
         "b = pandas.read_csv('y.csv')\n"
         "ca = clean(a)\n"
         "cb = clean(b)\n"
         "x = ca.head()\n"],
        cat,
    )
    reads = [n for n in nodes if n["value_names"] in (["a"], ["b"])]
    clones = [n for n in nodes
              if n["path"] == ["pandas", "read_csv", "dropna"]]
    assert len(clones) == 2  # one per call site, not one merged context
    # each site's receiver feeds ITS clone only
    ra = next(n for n in reads if n["value_names"] == ["a"])
    rb = next(n for n in reads if n["value_names"] == ["b"])
    fed_a = set(ra["flows_to"].get("0", []))
    fed_b = set(rb["flows_to"].get("0", []))
    cnums = {c["node_number"] for c in clones}
    assert fed_a & cnums and fed_b & cnums
    assert not (fed_a & fed_b & cnums)
    # the returned clone chains through the caller's binding
    head = next(n for n in nodes if n["path"][-1] == "head")
    assert head["value_names"] == ["x"]
    assert any(head["node_number"] in c["flows_to"].get("0", [])
               for c in clones)


def test_nested_call_args_at_def_call_sites():
    """`train(SVC(), df)` / `train(m=SVC(), d=df)` (final r5): a
    call-shaped argument at a USER-DEF call site hoists into a temp, so
    the binding machinery (G3 wiring + G8 receiver clones) sees a bound
    value — bit-identical to the explicit two-line form modulo the
    temp name, positionally AND by keyword."""
    from graph4code_spark.operators.flows import (
        build_flow_catalog,
        extract_page_flow_nodes,
    )
    from graph4code_spark.synth import FIXED_CATALOG

    cat = build_flow_catalog(FIXED_CATALOG)
    strip = lambda ns: [  # noqa: E731
        (tuple(n["path"]),
         tuple(sorted((k, tuple(v)) for k, v in n["flows_to"].items())))
        for n in ns
    ]
    pre = ("import sklearn\nimport pandas\n"
           "def train(m, d):\n    r = m.fit(d)\n"
           "df = pandas.read_csv('a.csv')\n")
    base = extract_page_flow_nodes(
        "http://q/1", [pre + "s = sklearn.svm.SVC()\ntrain(s, df)\n"], cat)
    for form in ("train(sklearn.svm.SVC(), df)\n",
                 "train(m=sklearn.svm.SVC(), d=df)\n"):
        got = extract_page_flow_nodes("http://q/1", [pre + form], cat)
        assert strip(got) == strip(base), form
        fit = next(n for n in got if n["path"][-1] == "fit")
        svc = next(n for n in got if n["path"][-1] == "SVC")
        assert fit["node_number"] in svc["flows_to"]["0"], form
