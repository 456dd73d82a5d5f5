"""Structured-Streaming ingestion of page batches.

The reference is batch-only with pickle resume (`utils.py:104-189`); the
Spark-native upgrade is a file-source stream with
``Trigger.AvailableNow``: each run drains whatever page files have
landed, checkpoints offsets, and exits — giving incremental ingestion
with exactly-once sink semantics and the same resume story as the batch
pipeline (SURVEY.md §2.10 mapping).

`stream_extract_text` shows a stateless streaming stage (the canonical
extractor applied on the stream); stateful/windowed aggregation on page
arrivals is `pages_per_window`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph4code_spark.html_extract import EXTRACT_OUTPUT_SCHEMA, extract_pages_batches
from graph4code_spark.schemas import WEB_PAGES_SCHEMA


def read_page_stream(spark: SparkSession, in_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(WEB_PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(in_dir)
    )


def stream_extract_text(pages_stream: DataFrame) -> DataFrame:
    return pages_stream.select("url", "html").mapInPandas(
        extract_pages_batches, schema=EXTRACT_OUTPUT_SCHEMA
    )


def pages_per_window(
    pages_stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Windowed arrival counts with a watermark for late pages.

    Append-mode consumers only see a window once the watermark passes its
    end — size both to the stream's event-time density (the 1h/2h
    defaults fit crawl-scale arrival; tests use seconds)."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )


def dedup_pages_stream(
    pages_stream: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup by url, watermark-scoped
    (`dropDuplicatesWithinWatermark`): a re-crawled url arriving within
    the watermark horizon is dropped, state for older urls is evicted so
    the state store stays bounded — the streaming twin of the batch
    `operators/dedup.exact_dedup`.  At crawl scale the horizon is the
    re-crawl window; unbounded `dropDuplicates` would grow state forever.
    """
    return pages_stream.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )


def running_page_totals(pages_stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (`applyInPandasWithState`):
    cumulative page count per language across micro-batches.

    State = one long per lang key; each batch emits
    (lang, batch_pages, total_pages).  The SURVEY §2.10 demonstration
    that arbitrary keyed state works on the page stream — the same shape
    a streaming dedup or per-site rate tracker would take at scale (state
    store is RocksDB-backed per key-range partition on a cluster)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        batch = 0
        for pdf in pdfs:
            batch += len(pdf)
        total = (state.get[0] if state.exists else 0) + batch
        state.update((total,))
        yield pd.DataFrame(
            {"lang": [key[0]], "batch_pages": [batch], "total_pages": [total]}
        )

    return (
        pages_stream.select("lang", "url")
        .groupBy("lang")
        .applyInPandasWithState(
            update,
            outputStructType="lang string, batch_pages long, total_pages long",
            stateStructType="total long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_flow_triples(pages_stream: DataFrame, catalog_records: list[dict]) -> DataFrame:
    """The E6/E7 analysis-triple pipeline as a STREAMING stage: pages →
    QA parse → flow extraction → quad emission.  Every step is a narrow
    Arrow-batched map (no window, no global dedup), so the exact batch
    operators compose unchanged onto a stream — each micro-batch emits
    the quads of its pages and the availableNow checkpoint gives
    incremental, exactly-once KG construction over a landing directory.
    (The forum path's per-entity relevance cap is a global window and is
    deliberately NOT streamed; it belongs to the batch/compaction tier.)
    """
    from graph4code_spark.emitters.analysis import analysis_triples
    from graph4code_spark.operators.flows import extract_flow_nodes
    from graph4code_spark.sources.qa import extract_qa

    return analysis_triples(extract_flow_nodes(extract_qa(pages_stream), catalog_records))


def run_available_now(
    pages_stream: DataFrame, out_dir: str, checkpoint_dir: str
):
    """Drain-everything-then-stop run; offsets in `checkpoint_dir` make
    re-runs incremental (exactly-once file sink)."""
    extracted = stream_extract_text(pages_stream)
    return (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
