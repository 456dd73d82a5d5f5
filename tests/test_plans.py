"""Physical-plan assertions: the plans we designed for are the plans we
get (pushdown, pruning, broadcasts, no stray shuffles on narrow paths)."""

import os

from pyspark.sql import functions as F

import __spark_entry__ as E
from graph4code_spark.html_extract import with_extracted_text
from graph4code_spark.synth import synth_pages

SF = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_column_pruning(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .where(F.col("l_shipdate") <= "1995-01-01")
        .select("l_orderkey", "l_quantity")
    )
    p = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # pruned scan: only the three referenced columns are read
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double,l_shipdate" in p


def test_mentions_join_is_broadcast(spark):
    p = _plan(E.q_kg_mentions(spark, SF))
    # terms side broadcast for the non-equi contains probe …
    assert "BroadcastNestedLoopJoin BuildRight" in p
    # … and the ntoks verification is a broadcast hash join
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_dim_joins_broadcast(spark):
    p = _plan(E.q_join_region_drilldown(spark, SF))
    assert p.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p


def test_extract_path_is_narrow(spark):
    # html→text extraction must not shuffle: one Arrow pass over the scan
    pages = synth_pages(spark, 50, seed=1)
    p = _plan(with_extracted_text(pages))
    assert "Exchange" not in p
    assert "MapInPandas" in p


def test_topk_uses_take_ordered(spark):
    p = _plan(E.q_topk_event_types(spark, SF))
    assert "TakeOrderedAndProject" in p


def test_whole_stage_codegen_on_textstats(spark):
    # quality features are pure column exprs: single Project over the
    # scan — no Python eval nodes, no aggregation shuffle (AQE hides the
    # WholeStageCodegen markers pre-execution, so assert the absence of
    # anything that would break codegen instead)
    p = _plan(E.q_text_quality(spark, SF))
    assert "MapInPandas" not in p and "BatchEvalPython" not in p
    assert "Exchange hashpartitioning" not in p
