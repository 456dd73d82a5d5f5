"""Int8 embedding quantization (`operators/quantize.py`)."""

import math

import numpy as np

from graph4code_spark.operators.quantize import quantize_int8


def _py_quant(vec):
    v = np.asarray(vec, dtype=np.float64)
    scale = float(np.max(np.abs(v))) / 127.0
    if scale > 0:
        q = np.floor(v / scale + 0.5).astype(int)
    else:
        q = np.zeros(len(v), dtype=int)
    deq = q * scale
    err = float(np.max(np.abs(v - deq)))
    denom = np.linalg.norm(v) * np.linalg.norm(deq)
    cos = float(np.dot(v, deq) / denom) if denom > 0 else 1.0
    return scale, q.tolist(), err, cos


def test_quantize_matches_numpy(spark):
    rows = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [3.0, 3.0, -3.0, 1.5]),
        (3, [1e-6, -1e-6, 5e-7, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    for r in quantize_int8(df, "v").orderBy("vec_id").collect():
        scale, q, err, cos = _py_quant(dict(rows)[r["vec_id"]])
        assert math.isclose(r["q_scale"], scale, rel_tol=1e-12)
        assert list(r["q_vec"]) == q
        assert math.isclose(r["q_max_abs_err"], err, rel_tol=1e-9, abs_tol=1e-15)
        assert math.isclose(r["q_cosine"], cos, rel_tol=1e-12)


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0])], "vec_id long, v array<double>")
    r = quantize_int8(df, "v").first()
    assert list(r["q_vec"]) == [0, 0]
    assert r["q_cosine"] == 1.0 and r["q_max_abs_err"] == 0.0


def test_quantize_range_bounded(spark):
    rng = np.random.RandomState(7)
    rows = [(i, rng.randn(16).tolist()) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = quantize_int8(df, "v").collect()
    for r in out:
        assert all(-127 <= x <= 127 for x in r["q_vec"])
        # reconstruction error is bounded by half a quantization step
        assert r["q_max_abs_err"] <= r["q_scale"] / 2 + 1e-12


def test_quantize_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, v array<double>")
    plan = quantize_int8(df, "v")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
