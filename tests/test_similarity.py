import math

from graph4code_spark.operators.similarity import brute_force_topk, lsh_topk


def _vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _queries(spark):
    return spark.createDataFrame(
        [(100, [1.0, 0.05, 0.0, 0.0])], "query_id long, query_vec array<float>"
    )


def test_brute_force_topk_order(spark):
    out = brute_force_topk(_vecs(spark), _queries(spark), k=3).collect()
    got = [(r.vec_id, r.rank) for r in sorted(out, key=lambda r: r.rank)]
    assert [v for v, _ in got] == [0, 1, 2]
    by_id = {r.vec_id: r.cosine for r in out}
    assert math.isclose(by_id[0], 1 / math.sqrt(1.0025), rel_tol=1e-6)


def test_lsh_topk_finds_same_bucket_neighbors(spark):
    out = lsh_topk(_vecs(spark), _queries(spark), dim=4, k=3, n_planes=4).collect()
    ids = [r.vec_id for r in sorted(out, key=lambda r: r.rank)]
    # the true nearest neighbor shares every hyperplane sign with the query
    assert ids[0] == 0
    # the antipodal vector can never share the bucket
    assert 4 not in ids
