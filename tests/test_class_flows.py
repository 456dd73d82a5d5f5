"""User-defined CLASS subset (r5): `class X:` blocks whose methods are
single-indented defs.  WALA builds one call-graph node per method and
resolves `self` through its pointer analysis
(`PythonTurtleAnalysisEngine.java` trampoline/object-method handling);
the honest subset here mirrors the local-def machinery: __init__
self-field stores become the instance's field map (shared,
context-insensitive body nodes — allocation-site contexts are out),
instance methods dispatch through per-instance local-def aliases (arg →
param-use wiring, per-call-site deferred receiver clones, return
binding incl. `return self.f`), and whole-object rebinds invalidate
both fields and method dispatch."""

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


def test_init_stores_method_self_receiver_and_field_return():
    """__init__ field stores resolve inside later method bodies
    (receiver through `self.model`, arg through `self.data`), the
    method's `return self.model` binds the caller's lhs with the stored
    class, and instance-field reads work as top-level call args."""
    code = (
        "import pandas\n"
        "import sklearn.svm\n"
        "class Trainer:\n"
        "    def __init__(self, path):\n"
        "        self.data = pandas.read_csv(path)\n"
        "        self.model = sklearn.svm.SVC(1)\n"
        "    def fit(self):\n"
        "        self.model.fit(self.data)\n"
        "        return self.model\n"
        "t = Trainer('x.csv')\n"
        "m = t.fit()\n"
        "m.predict(t.data)\n"
    )
    nodes = extract_page_flow_nodes("http://q/cls1", [code], CAT)
    by = _by_path(nodes)
    flows = _flows(nodes)
    (csv,) = by[("pandas", "read_csv")]
    (svc,) = by[("sklearn", "svm", "SVC")]
    (fit,) = by[("sklearn", "svm", "SVC", "fit")]
    (pred,) = by[("sklearn", "svm", "SVC", "predict")]
    assert (svc["node_number"], "0", fit["node_number"]) in flows
    assert (csv["node_number"], "1", fit["node_number"]) in flows
    # `m = t.fit()` returned self.model with its ctor class, so
    # `m.predict(t.data)` resolves receiver AND the field-read arg
    assert (svc["node_number"], "0", pred["node_number"]) in flows
    assert (csv["node_number"], "1", pred["node_number"]) in flows


def test_method_return_of_body_producer():
    """A method body's tracked producer returned to the caller flows
    into downstream top-level calls (same as local-def returns)."""
    code = (
        "import pandas\n"
        "class Loader:\n"
        "    def load(self, path):\n"
        "        d = pandas.read_csv(path)\n"
        "        return d\n"
        "l = Loader()\n"
        "df = l.load('a.csv')\n"
        "pandas.concat(df)\n"
    )
    nodes = extract_page_flow_nodes("http://q/cls2", [code], CAT)
    by = _by_path(nodes)
    flows = _flows(nodes)
    (csv,) = by[("pandas", "read_csv")]
    (concat,) = by[("pandas", "concat")]
    assert (csv["node_number"], "1", concat["node_number"]) in flows


def test_call_site_arg_into_method_param_use():
    """A tracked top-level value passed to an instance method wires into
    the body's parameter uses at the recorded ordinal."""
    code = (
        "import pandas\n"
        "import sklearn.svm\n"
        "class Holder:\n"
        "    def __init__(self):\n"
        "        self.m = sklearn.svm.SVC(1)\n"
        "    def train(self, d):\n"
        "        self.m.fit(d)\n"
        "h = Holder()\n"
        "data = pandas.read_csv('x.csv')\n"
        "h.train(data)\n"
    )
    nodes = extract_page_flow_nodes("http://q/cls3", [code], CAT)
    by = _by_path(nodes)
    flows = _flows(nodes)
    (csv,) = by[("pandas", "read_csv")]
    (svc,) = by[("sklearn", "svm", "SVC")]
    (fit,) = by[("sklearn", "svm", "SVC", "fit")]
    assert (svc["node_number"], "0", fit["node_number"]) in flows
    assert (csv["node_number"], "1", fit["node_number"]) in flows


def test_deferred_receiver_clones_per_method_call_site():
    """A method body calling a method ON ITS PARAMETER defers exactly
    like a def body: each call site clones against that site's receiver
    class — two model classes through one method → two fit nodes with
    distinct receiver edges (the G8 call-site context through a class)."""
    code = (
        "import sklearn.svm\n"
        "class A:\n"
        "    def go(self, m):\n"
        "        m.fit(1)\n"
        "a = A()\n"
        "s1 = sklearn.svm.SVC(1)\n"
        "s2 = sklearn.linear_model.LinearRegression()\n"
        "a.go(s1)\n"
        "a.go(s2)\n"
    )
    nodes = extract_page_flow_nodes("http://q/cls4", [code], CAT)
    by = _by_path(nodes)
    flows = _flows(nodes)
    (svc,) = by[("sklearn", "svm", "SVC")]
    (lr,) = by[("sklearn", "linear_model", "LinearRegression")]
    (svc_fit,) = by[("sklearn", "svm", "SVC", "fit")]
    (lr_fit,) = by[("sklearn", "linear_model", "LinearRegression", "fit")]
    assert (svc["node_number"], "0", svc_fit["node_number"]) in flows
    assert (lr["node_number"], "0", lr_fit["node_number"]) in flows
    assert (svc["node_number"], "0", lr_fit["node_number"]) not in flows


def test_rebind_invalidates_fields_and_dispatch():
    """Rebinding the instance variable drops its field map AND its
    method dispatch aliases — later `b.d` / `b.load()` are inert."""
    code = (
        "import pandas\n"
        "class B:\n"
        "    def __init__(self, path):\n"
        "        self.d = pandas.read_csv(path)\n"
        "    def get(self):\n"
        "        return self.d\n"
        "b = B('x.csv')\n"
        "b = 5\n"
        "r = b.get()\n"
        "pandas.concat(b.d)\n"
    )
    nodes = extract_page_flow_nodes("http://q/cls5", [code], CAT)
    by = _by_path(nodes)
    flows = _flows(nodes)
    (csv,) = by[("pandas", "read_csv")]
    (concat,) = by[("pandas", "concat")]
    assert (csv["node_number"], "1", concat["node_number"]) not in flows


def test_init_param_store_resolves_in_later_method():
    """`__init__(self, d): self.d = d` defers the field store to the
    instantiation site; a later method body's `self.d` use wires the
    caller's tracked argument (the setter/holder pattern WALA resolves
    through its pointer analysis)."""
    code = (
        "import pandas\n"
        "import sklearn.svm\n"
        "class T:\n"
        "    def __init__(self, d):\n"
        "        self.d = d\n"
        "    def fit(self):\n"
        "        m = sklearn.svm.SVC(self.d)\n"
        "df = pandas.read_csv('x.csv')\n"
        "t = T(df)\n"
        "t.fit()\n"
    )
    nodes = extract_page_flow_nodes("http://q/cls7", [code], CAT)
    by = _by_path(nodes)
    flows = _flows(nodes)
    (csv,) = by[("pandas", "read_csv")]
    (svc,) = by[("sklearn", "svm", "SVC")]
    assert (csv["node_number"], "1", svc["node_number"]) in flows


def test_setter_method_store_then_use():
    """An explicit setter method stores the caller's value on the
    instance; a later method dispatch resolves the deferred `self.d`
    use against it."""
    code = (
        "import pandas\n"
        "import sklearn.svm\n"
        "class S:\n"
        "    def set_data(self, d):\n"
        "        self.d = d\n"
        "    def go(self):\n"
        "        m = sklearn.svm.SVC(self.d)\n"
        "s = S()\n"
        "df = pandas.read_csv('y.csv')\n"
        "s.set_data(df)\n"
        "s.go()\n"
    )
    nodes = extract_page_flow_nodes("http://q/cls8", [code], CAT)
    by = _by_path(nodes)
    flows = _flows(nodes)
    (csv,) = by[("pandas", "read_csv")]
    (svc,) = by[("sklearn", "svm", "SVC")]
    assert (csv["node_number"], "1", svc["node_number"]) in flows


def test_two_instances_keep_distinct_deferred_fields():
    """Per-instance field maps: two instances of the same class built
    from different tracked values wire their own producers into the
    (shared, context-insensitive) body node — both flow in, but each
    instance's field map stays its own (no cross-instance overwrite of
    var_fields)."""
    code = (
        "import pandas\n"
        "import sklearn.svm\n"
        "class T:\n"
        "    def __init__(self, d):\n"
        "        self.d = d\n"
        "da = pandas.read_csv('a.csv')\n"
        "db = pandas.read_csv('b.csv')\n"
        "t1 = T(da)\n"
        "t2 = T(db)\n"
        "x = sklearn.svm.SVC(t1.d)\n"
        "y = sklearn.svm.SVC(t2.d)\n"
    )
    nodes = extract_page_flow_nodes("http://q/cls9", [code], CAT)
    by = _by_path(nodes)
    flows = _flows(nodes)
    csvs = sorted(by[("pandas", "read_csv")], key=lambda n: n["node_number"])
    svcs = sorted(by[("sklearn", "svm", "SVC")], key=lambda n: n["node_number"])
    assert len(csvs) == 2 and len(svcs) == 2
    assert (csvs[0]["node_number"], "1", svcs[0]["node_number"]) in flows
    assert (csvs[1]["node_number"], "1", svcs[1]["node_number"]) in flows
    assert (csvs[0]["node_number"], "1", svcs[1]["node_number"]) not in flows


def test_chained_instantiation_dispatch():
    """`X(a).m(b)` dispatches the method against an anonymous chained
    instance: ctor args bind deferred field stores, the method's body
    resolves `self.f` against them, and the lhs tracks the METHOD's
    return (with its class), not the instance."""
    code = (
        "import pandas\n"
        "import sklearn.svm\n"
        "class Wrap:\n"
        "    def __init__(self, frame):\n"
        "        self.d = frame\n"
        "    def run(self, k):\n"
        "        w = sklearn.svm.SVC(self.d)\n"
        "        r = w.fit(k)\n"
        "        return w\n"
        "df = pandas.read_csv('x.csv')\n"
        "clf = Wrap(df).run(df)\n"
        "clf.predict(df)\n"
    )
    nodes = extract_page_flow_nodes("http://q/cls10", [code], CAT)
    by = _by_path(nodes)
    flows = _flows(nodes)
    (csv,) = by[("pandas", "read_csv")]
    (svc,) = by[("sklearn", "svm", "SVC")]
    (fit,) = by[("sklearn", "svm", "SVC", "fit")]
    (pred,) = by[("sklearn", "svm", "SVC", "predict")]
    # deferred self.d from the ctor arg feeds the body SVC at pos 1
    assert (csv["node_number"], "1", svc["node_number"]) in flows
    # run's arg k feeds the body fit at pos 1; SVC is the receiver
    assert (csv["node_number"], "1", fit["node_number"]) in flows
    assert (svc["node_number"], "0", fit["node_number"]) in flows
    # clf tracks the returned w (class SVC): predict resolves receiver
    assert (svc["node_number"], "0", pred["node_number"]) in flows


def test_classless_code_unaffected_and_class_scope_inert():
    """Class-level non-def lines (docstrings, class attributes) are
    inert, and a class block followed by top-level code leaves the
    top-level env untouched."""
    code = (
        "import pandas\n"
        "class C:\n"
        "    VERSION = 1\n"
        "    def noop(self):\n"
        "        pass\n"
        "d = pandas.read_csv('x.csv')\n"
        "d.dropna()\n"
    )
    nodes = extract_page_flow_nodes("http://q/cls6", [code], CAT)
    by = _by_path(nodes)
    flows = _flows(nodes)
    (csv,) = by[("pandas", "read_csv")]
    (drop,) = by[("pandas", "read_csv", "dropna")]
    assert (csv["node_number"], "0", drop["node_number"]) in flows


def test_single_inheritance_method_and_ctor():
    """late r5 single inheritance: a subclass of an earlier local class
    inherits its __init__ (field stores wire from the SUBCLASS ctor
    args) and its methods (shared body nodes); an own method overrides
    the inherited one."""
    code = (
        "import pandas\n"
        "import sklearn.svm\n"
        "class Base:\n"
        "    def __init__(self, d):\n"
        "        self.data = d\n"
        "    def run(self):\n"
        "        m = sklearn.svm.SVC(1)\n"
        "        m.fit(self.data)\n"
        "class Child(Base):\n"
        "    pass\n"
        "df = pandas.read_csv('x.csv')\n"
        "c = Child(df)\n"
        "c.run()\n"
    )
    nodes = extract_page_flow_nodes("http://q/inh1", [code], CAT)
    by = _by_path(nodes)
    flows = _flows(nodes)
    (csv,) = by[("pandas", "read_csv")]
    (svc,) = by[("sklearn", "svm", "SVC")]
    (fit,) = by[("sklearn", "svm", "SVC", "fit")]
    # inherited __init__ setter-pattern store: the Child ctor arg (the
    # read_csv result) reaches the inherited run body's fit arg
    assert (csv["node_number"], "1", fit["node_number"]) in flows
    assert (svc["node_number"], "0", fit["node_number"]) in flows


def test_single_inheritance_override_wins():
    """A method redefined in the subclass replaces the inherited record:
    dispatch resolves the subclass body, not the base's."""
    code = (
        "import pandas\n"
        "class Base:\n"
        "    def load(self, d):\n"
        "        x = pandas.DataFrame(d)\n"
        "class Child(Base):\n"
        "    def load(self, d):\n"
        "        y = pandas.concat(d)\n"
        "df = pandas.read_csv('x.csv')\n"
        "c = Child()\n"
        "c.load(df)\n"
    )
    nodes = extract_page_flow_nodes("http://q/inh2", [code], CAT)
    by = _by_path(nodes)
    flows = _flows(nodes)
    (csv,) = by[("pandas", "read_csv")]
    (ctor,) = by[("pandas", "DataFrame")]
    (cc,) = by[("pandas", "concat")]
    # dispatch wires the SUBCLASS body's param use, not the base's
    assert (csv["node_number"], "1", cc["node_number"]) in flows
    assert (csv["node_number"], "1", ctor["node_number"]) not in flows
