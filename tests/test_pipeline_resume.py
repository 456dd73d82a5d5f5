"""Pipeline end-to-end + checkpoint/resume invariants."""

import json
import os

from graph4code_spark.plans.pipeline import PipelineConfig, StageRunner, run_pipeline
from graph4code_spark.synth import synth_pages


def _quadset(df):
    return {
        (r.subj, r.pred, r.obj, r.is_literal, r.arg_pos, r.arg_name, r.graph)
        for r in df.collect()
    }


def test_pipeline_runs_and_resumes(spark, tmp_path):
    out = str(tmp_path / "kg")
    pages = synth_pages(spark, 60, seed=11)
    cfg = PipelineConfig(out_dir=out)

    t1 = run_pipeline(spark, pages, cfg)
    s1 = _quadset(t1)
    assert len(s1) > 500

    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert set(manifest) >= {"01_qa", "02_links", "04_forum_triples", "triples"}
    assert all(v["rows"] >= 0 for v in manifest.values())

    # simulate kill after stage 2: delete downstream outputs + manifest rows
    for stage in ["04_forum_triples", "06_flow_triples", "triples"]:
        os.system(f"rm -rf {out}/{stage}")
        manifest.pop(stage, None)
    json.dump(manifest, open(os.path.join(out, "manifest.json"), "w"))

    runner = StageRunner(spark, out, cfg.fingerprint())
    t2 = run_pipeline(spark, pages, cfg)
    assert _quadset(t2) == s1
    # upstream stages were reused, not recomputed
    manifest2 = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest2["01_qa"]["completed_at"] == manifest["01_qa"]["completed_at"]
    assert runner is not None


def test_materialize_layout_and_metrics(spark, tmp_path):
    out = str(tmp_path / "kg2")
    pages = synth_pages(spark, 40, seed=12)
    run_pipeline(spark, pages, PipelineConfig(out_dir=out))

    metrics = json.load(open(os.path.join(out, "triples", "_metrics.json")))
    assert metrics["n_triples"] > 0
    assert metrics["n_graphs"] >= 2  # docstrings + forum (+ per-page flow graphs)

    # partitioned layout: pred_name=<x>/subj_bucket=<n>
    top = os.listdir(os.path.join(out, "triples"))
    assert any(d.startswith("pred_name=") for d in top)
    lineage = spark.read.parquet(os.path.join(out, "triples_lineage"))
    assert lineage.count() == metrics["n_partitions"]

    # no duplicate quads in the final table
    t = spark.read.parquet(os.path.join(out, "triples"))
    assert t.count() == t.dropDuplicates(
        ["subj", "pred", "obj", "is_literal", "arg_pos", "arg_name", "graph"]
    ).count()


def test_corpus_pipeline_resume(spark, tmp_path):
    """Corpus-hygiene spine has the same resume contract as the KG
    spine: identical final table on rerun with ZERO recomputed stages,
    and a deleted mid-stage recomputes only itself and its downstream."""
    import shutil

    from graph4code_spark.plans.corpus import CorpusConfig, run_corpus_pipeline

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cfg = CorpusConfig(out_dir=str(tmp_path / "corpus_out"))

    s1: dict = {}
    first = run_corpus_pipeline(spark, docs, cfg, stats=s1)
    rows1 = sorted(tuple(r) for r in first.collect())
    assert s1["executed"] == [
        "01_redacted", "02_decontaminated", "03_cleaned", "04_packed",
    ]
    assert rows1

    s2: dict = {}
    second = run_corpus_pipeline(spark, docs, cfg, stats=s2)
    assert s2["executed"] == []                       # full resume
    assert sorted(tuple(r) for r in second.collect()) == rows1

    shutil.rmtree(str(tmp_path / "corpus_out" / "03_cleaned"))
    s3: dict = {}
    third = run_corpus_pipeline(spark, docs, cfg, stats=s3)
    assert s3["executed"] == ["03_cleaned", "04_packed"]
    assert sorted(tuple(r) for r in third.collect()) == rows1
