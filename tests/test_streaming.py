"""Structured-Streaming ingestion: AvailableNow drain + incremental
resume via checkpointed offsets."""

import os

from graph4code_spark.streaming.ingest import read_page_stream, run_available_now
from graph4code_spark.synth import synth_pages


def test_available_now_ingestion_and_resume(spark, tmp_path):
    in_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "pages_out")
    ckpt = str(tmp_path / "ckpt")

    synth_pages(spark, 40, seed=1).write.parquet(in_dir)
    q = run_available_now(read_page_stream(spark, in_dir), out_dir, ckpt)
    q.awaitTermination(120)
    first = spark.read.parquet(out_dir)
    n1 = first.count()
    assert n1 == 40
    assert set(first.columns) == {"url", "text", "codes", "ok"}
    assert first.where("not ok").count() == 0

    # drop a second batch of files; a new AvailableNow run drains ONLY them
    synth_pages(spark, 25, seed=2).write.mode("append").parquet(in_dir)
    q2 = run_available_now(read_page_stream(spark, in_dir), out_dir, ckpt)
    q2.awaitTermination(120)
    total = spark.read.parquet(out_dir).count()
    assert total == 40 + 25

    # offsets were checkpointed
    assert os.path.exists(os.path.join(ckpt, "offsets"))
