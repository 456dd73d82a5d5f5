"""J5 patch_types: class-name search inside raw type strings attaches
inferred_type (reference `inspect_docstrings_per_module.py:453-501`)."""

from graph4code_spark.operators.patch_types import (
    patch_catalog_types,
    patch_type_slots,
)
from graph4code_spark.synth import catalog_df


def test_patch_type_slots_hits(spark):
    out = {
        (r.key, r.slot): (
            list(r.additions),
            list(r.inferred_type) if r.inferred_type is not None else None,
        )
        for r in patch_type_slots(catalog_df(spark)).collect()
    }
    # no-hit slot keeps its original (null) inferred_type verbatim
    assert out[("json.load", "param:fp")] == ([], None)
    # " array-like" tokenizes to [array, like] -> base type 'array'
    assert out[("sklearn.svm.SVC.fit", "param:X")][0] == ["array"]
    # " numpy.ndarray" -> tail token 'ndarray' -> class numpy.ndarray
    adds, inf = out[("pandas.read_csv", "return")]
    assert "pandas.DataFrame" in adds
    # existing inferred_type is preserved in front of the additions
    assert inf[: len(inf) - len(adds)] == ["pandas.DataFrame"]
    # " float, optional" -> base 'float'
    assert out[("sklearn.svm.SVC", "param:C")][0] == ["float"]
    # untyped slots are absent entirely
    assert ("matplotlib.pyplot.plot", "param:args") not in out


def test_patch_catalog_types_roundtrip(spark):
    cat = catalog_df(spark)
    patched = patch_catalog_types(cat)
    assert patched.count() == cat.count()
    assert patched.columns == cat.columns

    rows = {
        (r.klass, r.function): r
        for r in patched.collect()
    }
    fit = rows[("sklearn.svm.SVC", "fit")]
    assert fit.param_map["X"].inferred_type == ["numpy.ndarray", "array"]
    # untyped param untouched (sample_weight has a type; data in DataFrame
    # ctor has ' object' -> no hits -> existing (None) stays)
    df_ctor = rows[("pandas.DataFrame", None)]
    assert df_ctor.param_map["data"].inferred_type is None
    # return normalization: boolean/integer/string -> bool/int/str on hit
    pred = rows[("sklearn.svm.SVC", "predict")]
    assert pred.return_map.inferred_type == ["numpy.ndarray", "numpy.ndarray"]
    # rows with no param_map at all pass through
    sess = rows[("requests.Session", None)]
    assert sess.param_map is None


def test_patch_types_scales_to_100k_classes(spark):
    """Scale shape probe: 100k known classes against 5k typed slots must
    stay a broadcast token join — bounded wall, no cross product."""
    import time

    import pyspark.sql.functions as F

    from graph4code_spark.schemas import API_CATALOG_SCHEMA

    # 5k records, one typed param each; type strings mention a rotating
    # class tail so ~all slots get at least one hit
    rows = []
    for i in range(5000):
        pm = {"x": {"name": "x", "param_doc": " d", "type": f" Klass{i % 997}, optional",
                    "optional": True, "inferred_type": None, "dimensionality": None}}
        rec = {"module": f"m{i}", "klass": None, "function": f"m{i}.f{i}",
               "function_docstring": None, "class_docstring": None,
               "param_names": ["x"], "param_map": pm, "return_map": None,
               "ret_types": None, "base_classes": None}
        rows.append(tuple(rec.get(f.name) for f in API_CATALOG_SCHEMA.fields))
    cat = spark.createDataFrame(rows, API_CATALOG_SCHEMA)
    extra = [f"pkg{i}.Klass{i}" for i in range(100_000)]

    from graph4code_spark.operators.patch_types import patch_type_slots

    t0 = time.time()
    out = patch_type_slots(cat, extra_classes=extra)
    got = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size("additions")).alias("hits"),
    ).first()
    elapsed = time.time() - t0
    assert got["n"] == 5000
    # each slot's token klass{i%997} equals exactly one class tail
    assert got["hits"] == 5000
    assert elapsed < 120, f"patch join degraded: {elapsed:.1f}s"
