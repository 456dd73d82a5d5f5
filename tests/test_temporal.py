"""AS-OF and bucketed RANGE joins (`operators/temporal.py`)."""

from pyspark.sql import functions as F

from graph4code_spark.operators.temporal import as_of_join, range_join_bucketed


def test_asof_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 5), (3, 20, 50)], "id long, k long, t long"
    )
    right = spark.createDataFrame(
        [(101, 10, 8), (102, 10, 100), (103, 20, 60)], "rid long, k long, t long"
    )
    out = {
        r["id"]: (r["asof_rid"], r["asof_t"])
        for r in as_of_join(left, right, "k", "t", "t", ["rid", "t"]).collect()
    }
    assert out[1] == (102, 100)    # exact-ts right row matches (<=)
    assert out[2] == (None, None)  # nothing at or before t=5
    assert out[3] == (None, None)  # right row at 60 is AFTER 50


def test_asof_tie_takes_largest_id(spark):
    left = spark.createDataFrame([(1, 7, 10)], "id long, k long, t long")
    right = spark.createDataFrame(
        [(201, 7, 10), (205, 7, 10), (203, 7, 10)], "rid long, k long, t long"
    )
    r = as_of_join(left, right, "k", "t", "t", ["rid"]).first()
    assert r["asof_rid"] == 205


def test_asof_plan_has_no_inequality_join(spark):
    left = spark.createDataFrame([(1, 7, 10)], "id long, k long, t long")
    right = spark.createDataFrame([(2, 7, 9)], "rid long, k long, t long")
    plan = (
        as_of_join(left, right, "k", "t", "t", ["rid"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_range_join_boundaries_and_plan(spark):
    rows = spark.createDataFrame(
        [(i, t) for i, t in enumerate([0, 99, 100, 150, 199, 200, 1000])],
        "id long, ts long",
    )
    ranges = spark.createDataFrame([(1, 100, 200)], "rid int, s long, e long")
    out = range_join_bucketed(rows, ranges, "ts", "s", "e", bucket=50)
    got = sorted(r["ts"] for r in out.collect())
    assert got == [100, 150, 199]          # inclusive start, exclusive end
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_range_join_spanning_range(spark):
    rows = spark.createDataFrame([(1, 75), (2, 225)], "id long, ts long")
    ranges = spark.createDataFrame([(9, 50, 250)], "rid int, s long, e long")
    out = range_join_bucketed(rows, ranges, "ts", "s", "e", bucket=100)
    assert sorted(r["id"] for r in out.collect()) == [1, 2]
    # no duplicate matches despite the range exploding to 3 buckets
    assert out.count() == 2


def test_cms_overestimates_never_under(spark):
    """CMS invariant: estimate >= exact for every key; equality when no
    collision. Forced narrow sketch (w=8) guarantees collisions at 50
    keys, so the >= must do real work."""
    from pyspark.sql import functions as F

    from graph4code_spark.operators.sketch import cms_build, cms_estimate

    df = spark.range(2000).select((F.col("id") % 50).alias("k"))
    sk = cms_build(df, "k", depth=3, width=8)
    est = cms_estimate(sk, df.distinct(), "k", depth=3, width=8)
    exact = df.groupBy("k").count()
    joined = est.join(exact, "k").collect()
    assert len(joined) == 50
    assert all(r["cms_estimate"] >= r["count"] for r in joined)
    assert any(r["cms_estimate"] > r["count"] for r in joined)  # collisions real
    # total sketch mass equals the input cardinality per row
    mass = sk.groupBy("row").agg(F.sum("n").alias("m")).collect()
    assert all(r["m"] == 2000 for r in mass)


def test_asof_property_random_streams(spark):
    """300-case randomized parity with a brute-force python as-of."""
    import random

    rnd = random.Random(11)
    lefts, rights = [], []
    for i in range(150):
        lefts.append((i, rnd.randint(0, 5), rnd.randint(0, 40)))
    for j in range(150):
        rights.append((1000 + j, rnd.randint(0, 5), rnd.randint(0, 40)))
    left = spark.createDataFrame(lefts, "id long, k long, t long")
    right = spark.createDataFrame(rights, "rid long, k long, t long")
    got = {
        r["id"]: r["asof_rid"]
        for r in as_of_join(left, right, "k", "t", "t", ["rid"]).collect()
    }
    for i, k, t in lefts:
        cand = [(rt, rid) for rid, rk, rt in rights if rk == k and rt <= t]
        want = max(cand)[1] if cand else None
        assert got[i] == want, (i, k, t)
