"""X5: RST/Napoleon docstring parsing → structured param/return maps.

Reference: `/root/reference/src/inspect_docstrings_per_module.py:27-109`
(`parse_docstring_into_restructured_text` / `parse_rst`) and the map
builders at :337-399 (`create_parameter_map`, `find_optional`,
`find_shape`).  The reference first runs sphinxcontrib-napoleon to turn
NumPy/Google-style docstrings into stylized RST ``:param:``/``:type:``/
``:returns:``/``:rtype:`` lines, then parses those lines with a small
state machine.

This module re-implements both stages in pure Python (napoleon is not in
the container; the NumPy/Google docstring conventions are public):

- :func:`napoleon_lines` — minimal NumPy/Google → RST line converter
  covering the Parameters/Args and Returns sections (the subset the
  reference's catalog construction consumes).
- :func:`parse_rst` — the state machine, matching the reference's
  observable semantics INCLUDING its quirks, each marked with
  ``# quirk:`` below: greedy-to-last-colon param names, first-colon doc
  split, type-before-param buffering, multi-line continuation appended
  to the current param doc, the final param being flushed only by a
  ``:returns`` line, ``:rtype`` terminating the scan, and return_map
  emitted only when BOTH return doc and type are present.
- :func:`build_param_map` / :func:`build_return_map` — the
  `create_parameter_map` semantics: optional = substring 'optional',
  dimensionality from 'shape' patterns.  Deviation (documented): the
  reference's ``list(set(dims))`` has nondeterministic order; we sort.

The Spark surface is :func:`parse_docstrings` — one Arrow-batched
``mapInPandas`` pass (a stateful per-line parser is the textbook case
where column expressions genuinely can't express the semantics; the
per-doc work is O(lines) and embarrassingly parallel, so the operator
scales with partitions and shuffles nothing).

An independently-written transcription lives in
``reference_impl/rst_oracle.py`` for the driver oracle; keep the two in
sync by fixing bugs in BOTH or neither.
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame

_PARAM_NAME = re.compile(r":param ([^:].*):")
_PARAM_DOC = re.compile(r":param [^:]*:(.*)")
_TYPE_NAME = re.compile(r":type([^:]*):")
_TYPE_DOC = re.compile(r":type [^:]*:(.*)")
_RETURNS = re.compile(r":returns:(.*)")
_RTYPE = re.compile(r":rtype:(.*)")


# ---------------------------------------------------------------------------
# Napoleon-subset conversion: NumPy / Google sections → stylized RST lines
# ---------------------------------------------------------------------------

_NUMPY_SECTION = re.compile(r"^\s*(Parameters|Returns|Other Parameters)\s*$")
_NUMPY_UNDERLINE = re.compile(r"^\s*-{3,}\s*$")
_GOOGLE_SECTION = re.compile(r"^(Args|Arguments|Returns)\s*:\s*$")
_NUMPY_ENTRY = re.compile(r"^(\w[\w.]*)\s*:\s*(.*)$")
_GOOGLE_ENTRY = re.compile(r"^\s+(\w[\w.]*)\s*(?:\(([^)]*)\))?\s*:\s*(.*)$")


def napoleon_lines(docstring: str) -> list[str]:
    """NumPy/Google-style docstring → reference-shaped RST lines
    (``:param x: doc`` / ``:type x: t`` / ``:returns: doc`` /
    ``:rtype: t``), pass-through for everything else.  Covers the
    Parameters/Args + Returns subset of sphinxcontrib-napoleon with
    ``napoleon_use_param=True, napoleon_use_rtype=True``."""
    src = docstring.split("\n")
    out: list[str] = []
    i = 0
    n = len(src)
    while i < n:
        line = src[i]
        # --- NumPy section: "Parameters" over a dashed underline
        if (
            _NUMPY_SECTION.match(line)
            and i + 1 < n
            and _NUMPY_UNDERLINE.match(src[i + 1])
        ):
            section = _NUMPY_SECTION.match(line).group(1)
            i += 2
            while i < n and src[i].strip():
                m = _NUMPY_ENTRY.match(src[i].strip()) if not src[i][:1].isspace() else None
                if m and section != "Returns":
                    name, typ = m.group(1), m.group(2)
                    i += 1
                    doc_lines = []
                    while i < n and src[i][:1].isspace() and src[i].strip():
                        doc_lines.append(src[i].strip())
                        i += 1
                    first = doc_lines[0] if doc_lines else ""
                    out.append(f":param {name}: {first}")
                    out.extend(doc_lines[1:])
                    if typ:
                        out.append(f":type {name}: {typ}")
                elif section == "Returns":
                    # NumPy returns: "type" or "name : type", indented doc
                    head = src[i].strip()
                    hm = _NUMPY_ENTRY.match(head)
                    rtyp = hm.group(2) if hm and hm.group(2) else head
                    i += 1
                    doc_lines = []
                    while i < n and src[i][:1].isspace() and src[i].strip():
                        doc_lines.append(src[i].strip())
                        i += 1
                    out.append(f":returns: {' '.join(doc_lines)}")
                    out.append(f":rtype: {rtyp}")
                else:
                    i += 1
            # swallow the blank line(s) terminating the section — napoleon
            # emits field lists contiguously
            while i < n and not src[i].strip():
                i += 1
            continue
        # --- Google section: "Args:" with indented entries
        if _GOOGLE_SECTION.match(line):
            section = _GOOGLE_SECTION.match(line).group(1)
            i += 1
            while i < n and (not src[i].strip() or src[i][:1].isspace()):
                if not src[i].strip():
                    i += 1
                    if i < n and not src[i][:1].isspace():
                        break
                    continue
                m = _GOOGLE_ENTRY.match(src[i])
                if m and section in ("Args", "Arguments"):
                    name, typ, doc = m.group(1), m.group(2), m.group(3)
                    i += 1
                    cont = []
                    while i < n and src[i].startswith("        ") and src[i].strip():
                        cont.append(src[i].strip())
                        i += 1
                    out.append(f":param {name}: {doc}")
                    out.extend(cont)
                    if typ:
                        out.append(f":type {name}: {typ}")
                elif section == "Returns":
                    txt = src[i].strip()
                    i += 1
                    if ":" in txt:
                        rtyp, rdoc = txt.split(":", 1)
                        out.append(f":returns: {rdoc.strip()}")
                        out.append(f":rtype: {rtyp.strip()}")
                    else:
                        out.append(f":returns: {txt}")
                else:
                    i += 1
            continue
        out.append(line)
        i += 1
    return out


# ---------------------------------------------------------------------------
# The parse_rst state machine (reference :50-109, quirk-compatible)
# ---------------------------------------------------------------------------

def parse_rst(lines: list[str]):
    """RST lines → (function_doc, param_to_doc, param_to_type,
    return_map|None).  Matches the reference's observable behavior; each
    quirk is kept deliberately so the independent oracle can verify it."""
    if not lines:
        return None, None, None, None

    # gather function doc: every line before the first ':param' prefix
    # quirk: the doc accumulates as '\n'+line, so it starts with '\n';
    # quirk: with no ':param' line at all, `index` is the LAST index and
    # the whole docstring lands in function_doc
    function_doc = ""
    index = 0
    for index, line in enumerate(lines):
        if line.startswith(":param"):
            break
        function_doc = function_doc + "\n" + line
    rest = lines[index:]

    curr_param = None
    curr_par_doc = None
    curr_type_param = None
    curr_par_type = None
    return_doc = None
    return_type = None
    param_to_doc: dict[str, str] = {}
    param_to_type: dict[str, str] = {}

    for line in rest:
        if line.startswith(":param "):
            # quirk: greedy-to-last-colon name, first-colon doc split
            new_param = _PARAM_NAME.findall(line)[0]
            if new_param != curr_param:
                if curr_param:
                    param_to_doc[curr_param.strip()] = curr_par_doc
                if curr_type_param:
                    param_to_type[curr_type_param.strip()] = curr_par_type
                curr_param = new_param
            curr_par_doc = _PARAM_DOC.findall(line)[0]
        elif line.startswith(":type "):
            curr_type_param = _TYPE_NAME.findall(line)[0]
            curr_par_type = _TYPE_DOC.findall(line)[0]
        elif line.startswith(":returns"):
            if curr_param:
                param_to_doc[curr_param.strip()] = curr_par_doc
            if curr_type_param:
                param_to_type[curr_type_param.strip()] = curr_par_type
            return_doc = _RETURNS.findall(line)[0]
        elif line.startswith(":rtype"):
            return_type = _RTYPE.findall(line)[0]
            break  # quirk: :rtype terminates the scan
        elif curr_par_doc:
            # quirk: continuation lines append to the current param doc —
            # including lines after ':returns' (harmlessly, since the
            # flushed map value is already set)
            curr_par_doc = curr_par_doc + "\n" + line

    # quirk: the final param is flushed ONLY by a ':returns' line; with
    # no returns section it is silently dropped
    if return_doc and return_type:
        return function_doc, param_to_doc, param_to_type, {
            "doc": return_doc, "type": return_type,
        }
    return function_doc, param_to_doc, param_to_type, None


def parse_docstring(docstring: str | None):
    """Full reference path: napoleon conversion then parse_rst."""
    if not docstring:
        return None, None, None, None
    lines = napoleon_lines(docstring)
    if lines:
        return parse_rst(lines)
    return None, None, None, None


# ---------------------------------------------------------------------------
# create_parameter_map / find_optional / find_shape (reference :337-399)
# ---------------------------------------------------------------------------

def find_optional(param_str: str) -> bool:
    return param_str.find("optional") > -1


def find_shape(param_str: str, first: bool = True) -> int:
    pattern = (
        r"shape\s*=?\s*[\(\[{](.*)[\)\]}]" if first else r"[\(\[{](.*)[\)\]}]"
    )
    shapes = re.findall(pattern, param_str)
    dims = 0
    if shapes:
        dimensions = shapes[0].split(",")
        dims = len(dimensions)
        if len(dimensions) > 1 and dimensions[-1] == "":
            dims -= 1
    return dims


def _dimensionality(t: str) -> list[int] | None:
    if "shape" not in t:
        return None
    shapes = []
    prev = 0
    for m in re.finditer(r"[\)\]}]", t):
        shapes.append(t[prev : m.end()])
        prev = m.end() + 1
    if len(shapes) == 1:
        return [find_shape(t)]
    if len(shapes) > 1:
        dims = []
        for i, seg in enumerate(shapes):
            d = find_shape(seg, first=(i == 0))
            if d > 0:
                dims.append(d)
        # deviation: reference returns list(set(dims)) in hash order; we
        # sort for determinism
        return sorted(set(dims))
    return None


def build_param_map(param_to_doc, param_to_type) -> dict | None:
    if not param_to_doc:
        return None
    out = {}
    for p, doc in param_to_doc.items():
        obj = {
            "name": p,
            "param_doc": doc,
            "type": None,
            "optional": None,
            "inferred_type": None,
            "dimensionality": None,
        }
        t = param_to_type.get(p)
        if t is not None:
            obj["type"] = t
            if find_optional(t):
                obj["optional"] = True
            obj["dimensionality"] = _dimensionality(t)
        out[p] = obj
    return out


def build_return_map(return_map) -> dict | None:
    if return_map is None:
        return None
    return {"doc": return_map["doc"], "type": return_map["type"],
            "inferred_type": None}


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

PARSED_SCHEMA = (
    "id long, function_doc string, "
    "param_map map<string, struct<name:string, param_doc:string, "
    "type:string, optional:boolean, inferred_type:array<string>, "
    "dimensionality:array<int>>>, "
    "return_map struct<doc:string, type:string, inferred_type:array<string>>"
)


def parse_docstrings(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, docstring) → (id, function_doc, param_map, return_map) —
    one Arrow-batched pass, shuffle-free."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, fdocs, pmaps, rmaps = [], [], [], []
            for i, text in zip(pdf["id"], pdf["text"]):
                fdoc, p2d, p2t, rmap = parse_docstring(text)
                ids.append(i)
                fdocs.append(fdoc)
                pm = build_param_map(p2d or {}, p2t or {})
                pmaps.append(
                    None if pm is None
                    else {k: v for k, v in pm.items()}
                )
                rmaps.append(build_return_map(rmap))
            yield pd.DataFrame(
                {"id": ids, "function_doc": fdocs, "param_map": pmaps,
                 "return_map": rmaps}
            )

    return (
        df.select(
            df[id_col].alias("id"), df[text_col].alias("text")
        ).mapInPandas(run, schema=PARSED_SCHEMA)
    )
