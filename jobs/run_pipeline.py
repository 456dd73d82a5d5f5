"""spark-submit entrypoint for the KG-construction pipeline (north rule:
"launched via spark-submit --py-files at N and 4N executors").

Package the library and submit — the script itself carries no logic
beyond arg parsing, so the exact same command moves to a 1000-executor
cluster by changing ``--master``/executor conf only:

    python -c "import shutil; shutil.make_archive('dist/graph4code_spark','zip',root_dir='.',base_dir='graph4code_spark')"
    spark-submit --master local[8] \
        --py-files dist/graph4code_spark.zip \
        jobs/run_pipeline.py --out-dir /tmp/kg_out --pages 32000

On a cluster: ``--master yarn --num-executors N --executor-cores C ...``
with ``--input <parquet/iceberg path>`` pointing at the real pages table
instead of the deterministic synthetic corpus.

Prints ONE JSON line with triple counts, wall time, and per-stage
resume info (stages already materialized under --out-dir are skipped —
kill/rerun resumes mid-pipeline).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser(description="graph4code-spark KG pipeline")
    ap.add_argument("--out-dir", default=None,
                    help="stage/checkpoint + output dir (required unless --bench)")
    ap.add_argument("--input", default=None,
                    help="parquet path of a pages table (url, warc_ts, html, text, lang); "
                         "default: deterministic synthetic corpus")
    ap.add_argument("--pages", type=int, default=32000,
                    help="synthetic corpus size when --input is not given")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cap", type=int, default=5000, help="per-entity result cap (W4)")
    ap.add_argument("--buckets", type=int, default=8, help="subject-hash write buckets")
    ap.add_argument("--bench", type=int, default=0, metavar="R",
                    help="throughput mode: skip the checkpointed write, run the "
                         "in-memory pipeline R times after a warm-up and report "
                         "best-of-R triples/sec (the N-vs-4N scaling probe)")
    ap.add_argument("--corpus", default=None, metavar="DOCS_PARQUET",
                    help="run the CORPUS-HYGIENE pipeline instead of the KG one: "
                         "redact -> decontaminate -> line-clean -> pack over the "
                         "given documents parquet (doc_id, text), checkpointed "
                         "under --out-dir with the same resume contract")
    args = ap.parse_args()
    if not args.bench and not args.out_dir:
        ap.error("--out-dir is required unless --bench is given")

    from pyspark.sql import SparkSession

    # master/executor topology comes from spark-submit; only analytics
    # defaults are set here (and only if unset on the command line)
    builder = SparkSession.builder.appName("g4c-kg-pipeline")
    spark = builder.getOrCreate()
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }.items():
        spark.conf.set(k, spark.conf.get(k, v))
    # size the shuffle to the actual topology unless explicitly set via
    # --conf — at local[1] the 200-partition default is pure per-task
    # overhead (an explicit non-default value always wins)
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(max(spark.sparkContext.defaultParallelism, 8)),
        )

    # imports resolve from --py-files (driver PYTHONPATH + executor ship)
    from graph4code_spark.plans.pipeline import PipelineConfig, run_pipeline
    from graph4code_spark.synth import synth_pages

    if args.corpus:
        from graph4code_spark.plans.corpus import CorpusConfig, run_corpus_pipeline

        t0 = time.time()
        docs = spark.read.parquet(args.corpus)
        stats: dict = {}
        packed = run_corpus_pipeline(
            spark, docs, CorpusConfig(out_dir=args.out_dir), stats=stats
        )
        n = packed.count()
        print(json.dumps({
            "mode": "corpus", "n_docs_packed": n,
            "wall_sec": round(time.time() - t0, 3),
            "master": spark.sparkContext.master,
            "executed": stats.get("executed", []),
        }))
        spark.stop()
        return

    if args.input:
        pages = spark.read.parquet(args.input)
    else:
        pages = synth_pages(spark, args.pages, seed=args.seed)

    if args.bench > 0:
        from graph4code_spark.emitters.forum import forum_triples
        from graph4code_spark.materialize import dedup_quads
        from graph4code_spark.operators.linking import link_entities
        from graph4code_spark.sources.qa import extract_qa
        from graph4code_spark.synth import FIXED_CATALOG

        def once() -> tuple[int, float]:
            t0 = time.time()
            qa = extract_qa(pages).cache()
            links = link_entities(qa, FIXED_CATALOG).cache()
            n = dedup_quads(forum_triples(links, qa, FIXED_CATALOG)).count()
            qa.unpersist()
            links.unpersist()
            return n, time.time() - t0

        once()  # warm: spawns workers, JITs
        best = min((once() for _ in range(args.bench)), key=lambda x: x[1])
        n, wall = best
        print(json.dumps({
            "mode": "bench", "n_triples": n, "sec": round(wall, 3),
            "triples_per_sec": round(n / wall, 1),
            "master": spark.sparkContext.master,
            "default_parallelism": spark.sparkContext.defaultParallelism,
        }))
        spark.stop()
        return

    t0 = time.time()
    cfg = PipelineConfig(out_dir=args.out_dir, cap=args.cap, buckets=args.buckets)
    stats: dict = {}
    triples = run_pipeline(spark, pages, cfg, stats=stats)
    n = triples.count()
    wall = time.time() - t0

    manifest = {}
    mpath = os.path.join(args.out_dir, "manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            manifest = json.load(f)
    result = {
        "n_triples": n,
        "wall_sec": round(wall, 3),
        "triples_per_sec": round(n / wall, 1),
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "stages": {
            k: {"rows": v.get("rows"), "wall_sec": v.get("wall_sec")}
            for k, v in sorted(manifest.items())
        },
        # stages recomputed THIS run (empty list == full manifest resume)
        "executed": stats.get("executed", []),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
