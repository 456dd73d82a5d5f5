"""G10: transitive closure of flowsTo (SPARQL `flowsTo+` restated).

The reference answers `graph4code:flowsTo+` path queries in SPARQL
(`/root/reference/docs/example_queries.md:53-60`,
`usage_queries/find_next_step.sparql:22-27`).  Spark restatement:
semi-naive iteration — each round joins only the **frontier** (paths
discovered last round) against the base edges, unions into the closure,
and stops when the frontier empties.  localCheckpoint per round bounds
lineage; max_hops bounds pathological graphs (cycles are handled by the
distinct-against-closure subtraction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flows_to_edges(triples: DataFrame) -> DataFrame:
    """Extract (src, dst, graph) flowsTo edges from the quad table."""
    return triples.where(
        F.col("pred") == "http://purl.org/twc/graph4code/flowsTo"
    ).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst"), "graph"
    ).distinct()


def transitive_closure(edges: DataFrame, max_hops: int = 12) -> DataFrame:
    """(src, dst, graph, min_hops) for every reachable pair within the
    same named graph."""
    base = edges.select("src", "dst", "graph").distinct()
    closure = base.withColumn("hops", F.lit(1)).localCheckpoint(eager=True)
    frontier = closure
    for _ in range(max_hops - 1):
        hop = (
            frontier.select(
                F.col("src").alias("f_src"), F.col("dst").alias("f_dst"),
                F.col("graph").alias("graph"), F.col("hops").alias("f_hops"),
            )
            .join(
                base.select(
                    F.col("src").alias("e_src"), F.col("dst").alias("e_dst"),
                    F.col("graph").alias("e_graph"),
                ),
                on=[F.col("f_dst") == F.col("e_src"), F.col("graph") == F.col("e_graph")],
            )
            .select(
                F.col("f_src").alias("src"), F.col("e_dst").alias("dst"),
                F.col("graph"), (F.col("f_hops") + 1).alias("hops"),
            )
        )
        nxt = hop.join(
            closure.select("src", "dst", "graph"), ["src", "dst", "graph"], "left_anti"
        ).distinct()
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        closure = closure.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return closure.groupBy("src", "dst", "graph").agg(F.min("hops").alias("min_hops"))
