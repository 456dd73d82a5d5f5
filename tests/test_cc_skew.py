"""Skewed-CC probe (VERDICT r1 #10): the distributed
large-star/small-star path on a ~1M-edge graph with a 500k-neighbor hub
plus a 50k-node path must converge in O(log n) rounds — hub skew must
not stall convergence or blow up a single task."""

import pyspark.sql.functions as F

from graph4code_spark.operators.canonicalize import connected_components


def _name(col):
    # zero-padded names: lexicographic order == numeric order
    return F.format_string("n%09d", col)


def test_cc_hub_and_path_converges_logarithmically(spark):
    # hub component: node 0 with 500k spokes (ids 1..500000)
    hub = spark.range(1, 500_001).select(
        _name(F.lit(0)).alias("src"), _name(F.col("id")).alias("dst")
    )
    # path component: 600000 - 600000+50k chained pairwise
    path = spark.range(600_000, 650_000).select(
        _name(F.col("id")).alias("src"), _name(F.col("id") + 1).alias("dst")
    )
    # 450k mid-size components: pairs (1M+2i, 1M+2i+1)
    pairs = spark.range(0, 450_000).select(
        _name(F.col("id") * 2 + 1_000_000).alias("src"),
        _name(F.col("id") * 2 + 1_000_001).alias("dst"),
    )
    edges = hub.unionByName(path).unionByName(pairs).repartition(32)

    stats: dict = {}
    mapping = connected_components(
        edges, small_graph_threshold=0, stats=stats
    ).cache()

    assert stats["path"] == "distributed"
    # large-star/small-star halves component diameter per round: the
    # 50k path needs ~log2(50k) ≈ 16 rounds, the hub (diameter 2)
    # almost none; 20 gives slack without allowing linear behavior
    assert 1 <= stats["rounds"] <= 20, stats

    canon = {r.name: r.canon for r in mapping.where(
        F.col("name").isin(
            "n000500000",            # last hub spoke
            "n000650000",            # far end of the path
            "n001899999",            # second node of the last pair
        )
    ).collect()}
    assert canon["n000500000"] == "n000000000"
    assert canon["n000650000"] == "n000600000"
    assert canon["n001899999"] == "n001899998"

    # every non-canon node appears exactly once, components stay separate
    agg = mapping.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("canon").alias("comps"),
    ).first()
    # 500k spokes + 50k path tail + 450k pair tails
    assert agg["n"] == 500_000 + 50_000 + 450_000
    assert agg["comps"] == 1 + 1 + 450_000
    mapping.unpersist()
