"""Query layer: the reference's SPARQL usage queries restated as Spark
SQL/DataFrame self-joins over the quad table.

Shapes covered (SURVEY.md §3.4):
- label lookup + optional param/return expansion
  (`/root/reference/docs/example_queries.md:5-14`) → left outer joins
- `schema:about` semi-join + group-count + ordering
  (`docs/example_queries.md:19-45`) → questions-about / most-discussed
- `flowsTo+` transitive closure + top-k next step
  (`usage_queries/find_next_step.sparql:11-30`) → closure + rank
- SPARQL `minus` (`usage_queries/find_similar_flows.sparql:37-39`) →
  anti-join
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph4code_spark.operators.closure import flows_to_edges, transitive_closure
from graph4code_spark.uris import PREFIXES

_RDFS_LABEL = PREFIXES["rdfs"] + "label"
_ABOUT = PREFIXES["schema"] + "about"
_PY = PREFIXES["py"]


def _pred(triples: DataFrame, p: str) -> DataFrame:
    # partition pruning: the quad table is partitioned by pred_name, so a
    # single-predicate filter reads exactly one directory
    return triples.where(F.col("pred") == p)


def questions_about(triples: DataFrame, entity_name: str) -> DataFrame:
    """`docs/example_queries.md:19-45`: questions about one entity with
    their titles."""
    about = _pred(triples, _ABOUT).where(F.col("obj") == _PY + entity_name)
    names = _pred(triples, PREFIXES["schema"] + "name").select(
        F.col("subj").alias("q"), F.col("obj").alias("title")
    )
    return (
        about.select(F.col("subj").alias("q"))
        .join(names, "q", "left")
        .select("q", "title")
    )


def most_discussed_entities(triples: DataFrame, k: int = 10) -> DataFrame:
    """group-count over schema:about, top-k."""
    return (
        _pred(triples, _ABOUT)
        .groupBy(F.col("obj").alias("entity"))
        .agg(F.countDistinct("subj").alias("n_questions"))
        .orderBy(F.desc("n_questions"), F.asc("entity"))
        .limit(k)
    )


def entity_params(triples: DataFrame, entity_name: str) -> DataFrame:
    """label + optional params (`example_queries.md:5-14`): left outer."""
    ent = F.lit(_PY + entity_name)
    params = _pred(triples, PREFIXES["graph4code"] + "param").where(
        F.col("subj") == ent
    ).select(F.col("obj").alias("param_uri"))
    labels = _pred(triples, _RDFS_LABEL).select(
        F.col("subj").alias("param_uri"), F.col("obj").alias("param_label")
    )
    idx = _pred(triples, PREFIXES["graph4code"] + "param_index").select(
        F.col("subj").alias("param_uri"), F.col("obj").cast("int").alias("param_index")
    )
    return (
        params.join(labels, "param_uri", "left")
        .join(idx, "param_uri", "left")
        .orderBy("param_index", "param_label")
    )


def next_steps_after(triples: DataFrame, entity_suffix: str, k: int = 3) -> DataFrame:
    """`find_next_step.sparql`: from nodes labeled with the given API,
    follow flowsTo+ and rank the most common downstream labels."""
    labels = _pred(triples, _RDFS_LABEL).select(
        F.col("subj").alias("node"), F.col("obj").alias("label"), "graph"
    )
    starts = labels.where(F.col("label").contains(entity_suffix))
    closure = transitive_closure(flows_to_edges(triples))
    reached = closure.join(
        starts.select(F.col("node").alias("src"), "graph"), ["src", "graph"]
    )
    return (
        reached.join(
            labels.select(F.col("node").alias("dst"), F.col("label").alias("next_label"), "graph"),
            ["dst", "graph"],
        )
        .groupBy("next_label")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("next_label"))
        .limit(k)
    )


def flows_excluding(triples: DataFrame, exclude_label: str) -> DataFrame:
    """SPARQL `minus` → anti-join: flow sources whose label does NOT
    match the excluded classifier (`find_similar_flows.sparql:37-39`)."""
    edges = flows_to_edges(triples)
    labels = _pred(triples, _RDFS_LABEL).select(
        F.col("subj").alias("src"), F.col("obj").alias("label")
    )
    excluded = labels.where(F.col("label").contains(exclude_label)).select("src")
    return edges.join(excluded, "src", "left_anti")
