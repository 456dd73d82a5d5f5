"""S3 source: reference turtle-analysis JSON documents → analysis-node rows.

The reference's per-script analysis artifact is one JSON object per file
(`util/RunTurtleSingleAnalysis.java:233-259`: ``{"filename", "repo",
"repoPath", "python_version", "turtle_analysis": [node|null, ...]}``,
written pretty-printed, optionally .bz2) — `sample_graph/example1.json`
is the shipped example.  This loader parses that exact shape into
ANALYSIS_NODES_SCHEMA rows, the input of `emitters/analysis.py`, so a
user can point the engine at a directory of reference analysis output
and re-emit the reference's graphs.

Faithfulness notes (all verified against `sample_graph/example*.nq`):

- ``null`` entries in ``turtle_analysis`` are skipped
  (`PythonTurtleAnalysisEngine.java:281-283`, ``JSONObject.NULL`` guard).
- graph URI = ``http://github/{repo}/{repoPath}`` with NFKC + URI path
  encoding (`RunTurtleSingleAnalysis.java:163`, `…Engine.java:303`).
- Constant-arg values are stringified the way Java's
  ``JSONObject.get(x).toString()`` renders them when `handleArgs`
  builds the SIO_000230 literal (`…Engine.java:390-397`): booleans →
  ``true``/``false``, null → ``null``, containers → compact JSON with
  no spaces (``[]``, the empty receiver-slot array every call node
  carries at position 0), numbers via their canonical repr.
- ``reads``/``writes`` ``field`` values keep the flattened-table
  convention: the schema stores a string, and an all-digits string is
  interpreted as a node reference downstream (`emitters/analysis.py`) —
  the goldens contain no integer fields, so the string/int JSON type
  distinction is not observable there.

Scale shape: one Arrow-batched ``mapInPandas`` over
``spark.read.text(..., wholetext=True)`` — each analysis file is a
self-contained JSON document, so parsing is embarrassingly parallel and
Spark's text source handles .bz2/.gz decompression and file-listing
parallelism; no driver-side IO.
"""

from __future__ import annotations

import json
import unicodedata
from typing import Iterator
from urllib.parse import quote

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from graph4code_spark.schemas import ANALYSIS_NODES_SCHEMA

_LOC_KEYS = [
    ("first_line", "firstLine"),
    ("last_line", "lastLine"),
    ("first_col", "firstCol"),
    ("last_col", "lastCol"),
    ("first_offset", "firstOffset"),
    ("last_offset", "lastOffset"),
]


def _java_str(v) -> str:
    """Java ``Object.toString()`` of an org.json value, as `handleArgs`
    renders constant args into literals (`…Engine.java:390-397`)."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, dict)):
        return json.dumps(v, separators=(",", ":"))
    return str(v)


def _graph_uri(repo, repo_path) -> str:
    uri = f"http://github/{repo}/{repo_path}"
    return unicodedata.normalize("NFKC", quote(uri, safe=":/#?&=@%+~._-"))


def _access_rows(entries) -> list[dict] | None:
    if entries is None:
        return None
    out = []
    for r in entries:
        out.append(
            {
                "container": [int(c) for c in (r.get("container") or [])],
                "field": None if r.get("field") is None else str(r["field"]),
            }
        )
    return out


def _node_row(node: dict, graph_uri: str) -> dict:
    edges = node.get("edges") or {}
    flows = edges.get("flowsTo")
    loc = node.get("sourceLocation")
    return {
        "graph_uri": graph_uri,
        "node_number": int(node["nodeNumber"]),
        "path": [str(p) for p in (node.get("path") or [])],
        "path_end": node.get("path_end"),
        "normalized_label": node.get("normalizedLabel"),
        "is_import": bool(node.get("is_import", False)),
        "is_slice": bool(node.get("is_slice", False)),
        "flows_to": (
            None
            if flows is None
            else {str(k): [int(d) for d in v] for k, v in flows.items()}
        ),
        "immediately_precedes": (
            None
            if edges.get("immediatelyPrecedes") is None
            else [int(d) for d in edges["immediatelyPrecedes"]]
        ),
        "reads": _access_rows(node.get("reads")),
        "writes": _access_rows(node.get("writes")),
        "constant_positional_args": {
            str(k): _java_str(v)
            for k, v in (node.get("constant_positional_args") or {}).items()
        },
        "constant_named_args": {
            str(k): _java_str(v)
            for k, v in (node.get("constant_named_args") or {}).items()
        },
        "value_names": node.get("value_names"),
        "source_location": (
            None
            if loc is None
            else dict(
                {ours: loc.get(theirs) for ours, theirs in _LOC_KEYS},
                url=loc.get("url"),
            )
        ),
        "source_text": node.get("sourceText"),
        "source_lines": node.get("sourceLines"),
    }


def document_nodes(doc: str) -> list[dict]:
    """One analysis-JSON document → node-row dicts (null nodes skipped)."""
    obj = json.loads(doc)
    graph_uri = _graph_uri(obj.get("repo"), obj.get("repoPath"))
    return [
        _node_row(n, graph_uri)
        for n in obj.get("turtle_analysis") or []
        if n is not None
    ]


def load_analysis_json(spark: SparkSession, path) -> DataFrame:
    """Directory/glob/list of reference analysis-JSON files →
    ANALYSIS_NODES_SCHEMA rows."""
    paths = path if isinstance(path, list) else [path]
    raw = spark.read.text(paths, wholetext=True)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in ANALYSIS_NODES_SCHEMA.fields]
        for pdf in batches:
            rows: list[dict] = []
            for doc in pdf["value"]:
                rows.extend(document_nodes(doc))
            yield pd.DataFrame(rows, columns=cols)

    return raw.mapInPandas(run, schema=ANALYSIS_NODES_SCHEMA)
