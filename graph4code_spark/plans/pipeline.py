"""End-to-end KG-construction pipeline with checkpoint/resume.

Stage graph (north_star spine):

    pages ──► qa ──► links ──► forum_triples ─┐
      │                └─► flow_nodes ─► flow_triples ─┤
      catalog ─► doc_triples ──────────────────────────┼─► triples (final)
      class_map ─► cc_mapping ─► sameas_triples ───────┘

Resumability (north rule): every stage writes parquet under
``<out_dir>/<stage>/`` and records a fingerprint + row count + wall time
in ``<out_dir>/manifest.json``.  On rerun, a stage whose output exists
with a matching fingerprint is **read back, not recomputed** — killing
the job after stage k and rerunning produces the identical final table
while skipping stages 1..k (verified by ``tests/test_pipeline_resume``).
The reference's analogue is its pickle checkpointing
(`/root/reference/src/utils.py:104-189`) and idempotent per-stage reruns.

The parquet stage boundaries double as the shuffle barriers you'd want
at 100 TB anyway: qa and links are written partitioned so downstream
joins read co-partitioned data.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from graph4code_spark.emitters.analysis import analysis_triples
from graph4code_spark.emitters.docstrings import build_class_alias_map, docstring_triples
from graph4code_spark.emitters.forum import forum_triples
from graph4code_spark.materialize import materialize_triples
from graph4code_spark.operators.canonicalize import (
    canonical_mapping,
    same_as_triples,
)
from graph4code_spark.operators.flows import extract_flow_nodes
from graph4code_spark.operators.linking import ES_RESULT_CAP, link_entities
from graph4code_spark.schemas import TRIPLE_COLS
from graph4code_spark.sources.qa import extract_qa
from graph4code_spark.synth import FIXED_CATALOG, FIXED_CLASS_MAP, catalog_df, class_map_df
from graph4code_spark.uris import PREFIXES


@dataclass
class PipelineConfig:
    out_dir: str
    forum_prefix: str = PREFIXES["stackoverflow3"]
    cap: int = ES_RESULT_CAP
    buckets: int = 8
    catalog_records: list = field(default_factory=lambda: FIXED_CATALOG)
    class_map_pairs: list = field(default_factory=lambda: FIXED_CLASS_MAP)

    def fingerprint(self) -> str:
        basis = json.dumps(
            {
                "forum_prefix": self.forum_prefix,
                "cap": self.cap,
                "n_catalog": len(self.catalog_records),
                "n_aliases": len(self.class_map_pairs),
            },
            sort_keys=True,
        )
        return hashlib.md5(basis.encode()).hexdigest()[:12]


class StageRunner:
    """Write-once-per-fingerprint stage executor."""

    def __init__(self, spark: SparkSession, out_dir: str, fingerprint: str):
        self.spark = spark
        self.out_dir = out_dir
        self.fingerprint = fingerprint
        self.manifest_path = os.path.join(out_dir, "manifest.json")
        os.makedirs(out_dir, exist_ok=True)
        self.manifest: dict = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                self.manifest = json.load(f)
        self.executed: list[str] = []

    def _save(self) -> None:
        with open(self.manifest_path, "w") as f:
            json.dump(self.manifest, f, indent=2, sort_keys=True)

    def run(
        self,
        name: str,
        build,
        partition_by: list[str] | None = None,
        deps: list[str] | None = None,
    ) -> DataFrame:
        """``deps``: upstream stage names — if any of them was RECOMPUTED
        this run, this stage's checkpoint is invalid even when its own
        fingerprint matches (a resumed downstream must never read a
        stale view of a refreshed upstream)."""
        path = os.path.join(self.out_dir, name)
        entry = self.manifest.get(name)
        if (
            entry
            and entry.get("fingerprint") == self.fingerprint
            and os.path.exists(os.path.join(path, "_SUCCESS"))
            and not any(d in self.executed for d in (deps or []))
        ):
            return self.spark.read.parquet(path)
        t0 = time.time()
        df = build()
        w = df.write.mode("overwrite").option("compression", "zstd")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        out = self.spark.read.parquet(path)
        self.manifest[name] = {
            "fingerprint": self.fingerprint,
            "rows": out.count(),
            "wall_sec": round(time.time() - t0, 3),
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self._save()
        self.executed.append(name)
        return out


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    config: PipelineConfig,
    stats: dict | None = None,
) -> DataFrame:
    """Pages → final quad table. Returns the materialized triples.

    ``stats``, when given, is filled with {"executed": [stage, ...]} —
    the stages actually recomputed this run (empty on a full resume), so
    callers can assert resume semantics directly instead of inferring
    them from wall-clock."""
    cfg = config
    runner = StageRunner(spark, cfg.out_dir, cfg.fingerprint())
    if stats is not None:
        stats["executed"] = runner.executed
    records = cfg.catalog_records

    qa = runner.run("01_qa", lambda: extract_qa(pages))
    links = runner.run("02_links", lambda: link_entities(qa, records, cfg.cap),
                       deps=["01_qa"])
    doc_t = runner.run(
        "03_doc_triples",
        lambda: docstring_triples(
            catalog_df(spark, records), build_class_alias_map(cfg.class_map_pairs)
        ),
    )
    forum_t = runner.run(
        "04_forum_triples",
        lambda: forum_triples(links, qa, records, cfg.forum_prefix),
        deps=["01_qa", "02_links"],
    )
    # fault-barrier lineage: pages the extractor dropped surface in the
    # stage's observed metrics (one bad page must never fail the stage)
    flow_nodes = runner.run(
        "05_flow_nodes",
        lambda: extract_flow_nodes(
            qa, records, error_observation="flow_extract_05"),
        deps=["01_qa"])
    flow_t = runner.run("06_flow_triples", lambda: analysis_triples(flow_nodes),
                        deps=["05_flow_nodes"])
    mapping = runner.run(
        "07_cc_mapping",
        lambda: canonical_mapping(class_map_df(spark, cfg.class_map_pairs)),
    )
    sameas_t = runner.run("08_sameas_triples", lambda: same_as_triples(mapping),
                          deps=["07_cc_mapping"])

    final_path = os.path.join(cfg.out_dir, "triples")
    entry = runner.manifest.get("triples")
    if (
        entry
        and entry.get("fingerprint") == runner.fingerprint
        and os.path.exists(os.path.join(final_path, "_SUCCESS"))
        and not any(
            d in runner.executed
            for d in ("03_doc_triples", "04_forum_triples",
                      "06_flow_triples", "08_sameas_triples")
        )
    ):
        return spark.read.parquet(final_path).select(*TRIPLE_COLS)

    t0 = time.time()
    all_t = (
        doc_t.select(*TRIPLE_COLS)
        .unionByName(forum_t.select(*TRIPLE_COLS))
        .unionByName(flow_t.select(*TRIPLE_COLS))
        .unionByName(sameas_t.select(*TRIPLE_COLS))
    )
    metrics = materialize_triples(all_t, final_path, buckets=cfg.buckets)
    runner.manifest["triples"] = {
        "fingerprint": runner.fingerprint,
        "rows": metrics["n_triples"],
        "wall_sec": round(time.time() - t0, 3),
        "metrics": metrics,
        "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    runner._save()
    runner.executed.append("triples")
    return spark.read.parquet(final_path).select(*TRIPLE_COLS)
