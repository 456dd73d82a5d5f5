"""A2/A3: import-frequency counting + top-K modules.

Re-expresses `generate_top_modules.py:80-114`: count `is_import` nodes per
`path_end`, minus the builtin-module blacklist (F2), take the top K by
count descending.  The reference's counter starts at 0 on first sight
(`module_counts[pe] = 0` then `+= 1` on later hits,
`generate_top_modules.py:96-99`) so its count is occurrences-1; we keep
that quirk behind `parity=True` for byte-level comparability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: builtin blacklist (`/root/reference/src/generate_top_modules.py:6-77`)
BUILTIN_MODULES = [
    "abc", "argparse", "array", "ast", "asyncio", "base64", "bisect",
    "builtins", "calendar", "collections", "configparser", "contextlib",
    "copy", "csv", "ctypes", "datetime", "decimal", "difflib", "dis",
    "email", "enum", "errno", "functools", "gc", "getopt", "getpass",
    "glob", "gzip", "hashlib", "heapq", "html", "http", "importlib",
    "inspect", "io", "itertools", "json", "logging", "math", "mimetypes",
    "multiprocessing", "operator", "os", "pathlib", "pickle", "platform",
    "pprint", "queue", "random", "re", "shutil", "signal", "socket",
    "sqlite3", "ssl", "stat", "string", "struct", "subprocess", "sys",
    "tempfile", "threading", "time", "traceback", "types", "typing",
    "unittest", "urllib", "uuid", "warnings", "weakref", "xml", "zlib",
]


def import_counts(nodes: DataFrame, parity: bool = False) -> DataFrame:
    """(module, cnt) over is_import analysis nodes, blacklist removed."""
    counts = (
        nodes.where(F.col("is_import"))
        .where(~F.col("path_end").isin(BUILTIN_MODULES))
        .groupBy(F.col("path_end").alias("module"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if parity:
        counts = counts.withColumn("cnt", F.col("cnt") - 1)
    return counts


def top_modules(nodes: DataFrame, k: int = 500, parity: bool = False) -> DataFrame:
    """Top-K by count desc (deterministic tie-break on name) — Catalyst
    turns orderBy+limit into TakeOrderedAndProject, no full sort."""
    return import_counts(nodes, parity).orderBy(
        F.desc("cnt"), F.asc("module")
    ).limit(k)
