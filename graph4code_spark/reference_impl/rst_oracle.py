"""Independent straight-line oracle for X5 docstring parsing.

Transcribes the observable semantics of
`/root/reference/src/inspect_docstrings_per_module.py:50-109` (parse_rst)
and :337-399 (create_parameter_map) as directly as possible — findall
chains, index slicing — and converts NumPy/Google sections with its own
section-splitting converter, written separately from
``graph4code_spark.docparse`` (which uses a line-cursor).  The two
implementations must agree on the driver fixtures; a bug has to be made
twice, in different shapes, to slip through.
"""

from __future__ import annotations

import re


def oracle_parse_rst(lines):
    curr_param = None
    curr_par_doc = None
    curr_type_param = None
    curr_par_type = None
    return_doc = None
    return_type = None
    param_to_doc = {}
    param_to_type = {}

    function_doc = ""
    index = 0
    for index, line in enumerate(lines):
        if not line.startswith(":param"):
            function_doc = function_doc + "\n" + line
        elif line.startswith(":param"):
            break
    lines = lines[index:]

    for line in lines:
        if line.startswith(":param "):
            new_param = re.findall(":param ([^:].*):", line)[0]
            if new_param != curr_param:
                if curr_param:
                    param_to_doc[curr_param.strip()] = curr_par_doc
                if curr_type_param:
                    param_to_type[curr_type_param.strip()] = curr_par_type
                curr_param = new_param
            curr_par_doc = re.findall(":param [^:]*:(.*)", line)[0]
        elif line.startswith(":type "):
            curr_type_param = re.findall(":type([^:]*):", line)[0]
            curr_par_type = re.findall(":type [^:]*:(.*)", line)[0]
        elif line.startswith(":returns"):
            if curr_param:
                param_to_doc[curr_param.strip()] = curr_par_doc
            if curr_type_param:
                param_to_type[curr_type_param.strip()] = curr_par_type
            return_doc = re.findall(":returns:(.*)", line)[0]
        elif line.startswith(":rtype"):
            return_type = re.findall(":rtype:(.*)", line)[0]
            break
        elif curr_par_doc:
            curr_par_doc = curr_par_doc + "\n" + line

    if return_doc and return_type:
        return function_doc, param_to_doc, param_to_type, {
            "doc": return_doc, "type": return_type,
        }
    return function_doc, param_to_doc, param_to_type, None


def _numpy_params_to_rst(block: str) -> list[str]:
    """One NumPy Parameters section body → RST lines (section-splitting
    style: split on unindented entry heads)."""
    out = []
    entries = re.split(r"\n(?=\S)", block.strip("\n"))
    for e in entries:
        if not e.strip():
            continue
        head, *rest = e.split("\n")
        m = re.match(r"^(\w[\w.]*)\s*:\s*(.*)$", head.strip())
        if not m:
            continue
        name, typ = m.group(1), m.group(2)
        docs = [r.strip() for r in rest if r.strip()]
        out.append(f":param {name}: {docs[0] if docs else ''}")
        out.extend(docs[1:])
        if typ:
            out.append(f":type {name}: {typ}")
    return out


def _numpy_returns_to_rst(block: str) -> list[str]:
    lines = [l for l in block.strip("\n").split("\n") if l.strip()]
    if not lines:
        return []
    head = lines[0].strip()
    m = re.match(r"^(\w[\w.]*)\s*:\s*(.*)$", head)
    rtyp = m.group(2) if m and m.group(2) else head
    doc = " ".join(l.strip() for l in lines[1:])
    return [f":returns: {doc}", f":rtype: {rtyp}"]


def _google_args_to_rst(block: str) -> list[str]:
    out = []
    entries = re.split(r"\n(?=    \w)", block.rstrip("\n"))
    for e in entries:
        lines = [l for l in e.split("\n") if l.strip()]
        if not lines:
            continue
        m = re.match(r"^\s+(\w[\w.]*)\s*(?:\(([^)]*)\))?\s*:\s*(.*)$", lines[0])
        if not m:
            continue
        name, typ, doc = m.group(1), m.group(2), m.group(3)
        out.append(f":param {name}: {doc}")
        out.extend(l.strip() for l in lines[1:])
        if typ:
            out.append(f":type {name}: {typ}")
    return out


def _google_returns_to_rst(block: str) -> list[str]:
    txt = " ".join(l.strip() for l in block.split("\n") if l.strip())
    if ":" in txt:
        rtyp, rdoc = txt.split(":", 1)
        return [f":returns: {rdoc.strip()}", f":rtype: {rtyp.strip()}"]
    return [f":returns: {txt}"] if txt else []


def oracle_napoleon(docstring: str) -> list[str]:
    """Docstring → RST lines, by slicing section blocks out with regex
    (vs docparse's sequential cursor)."""
    numpy_sec = re.compile(
        r"^[ \t]*(Parameters|Returns|Other Parameters)[ \t]*\n[ \t]*-{3,}[ \t]*\n",
        re.M,
    )
    google_sec = re.compile(r"^(Args|Arguments|Returns)[ \t]*:[ \t]*\n", re.M)

    marks = []
    for m in numpy_sec.finditer(docstring):
        marks.append((m.start(), m.end(), m.group(1), "numpy"))
    for m in google_sec.finditer(docstring):
        marks.append((m.start(), m.end(), m.group(1), "google"))
    marks.sort()
    if not marks:
        return docstring.split("\n")

    out: list[str] = []
    pos = 0
    for i, (s, e, name, kind) in enumerate(marks):
        nxt = marks[i + 1][0] if i + 1 < len(marks) else len(docstring)
        pre = docstring[pos:s]
        if pre:
            out.extend(pre.split("\n")[:-1] if pre.endswith("\n") else pre.split("\n"))
        body = docstring[e:nxt]
        # section body ends at the first blank-line-then-unindented line
        stop = re.search(r"\n[ \t]*\n(?=\S)", body)
        tail_start = e + (stop.end() if stop else len(body))
        if stop:
            body = body[: stop.start() + 1]
        if kind == "numpy" and name != "Returns":
            out.extend(_numpy_params_to_rst(body))
        elif kind == "numpy":
            out.extend(_numpy_returns_to_rst(body))
        elif name in ("Args", "Arguments"):
            out.extend(_google_args_to_rst(body))
        else:
            out.extend(_google_returns_to_rst(body))
        pos = max(tail_start, nxt) if stop is None else tail_start
        if stop and tail_start < nxt:
            mid = docstring[tail_start:nxt]
            out.extend(mid.split("\n")[:-1] if mid.endswith("\n") else mid.split("\n"))
            pos = nxt
    tail = docstring[pos:]
    if tail and pos >= (marks[-1][0]):
        out.extend(tail.split("\n")[:-1] if tail.endswith("\n") else tail.split("\n"))
    return out


def oracle_parse_docstring(docstring):
    if not docstring:
        return None, None, None, None
    lines = oracle_napoleon(docstring)
    if lines:
        return oracle_parse_rst(lines)
    return None, None, None, None


def oracle_find_optional(param_str):
    return param_str.find("optional") > -1


def oracle_find_shape(param_str, first=True):
    if first:
        pattern = r"shape\s*=?\s*[\(\[{](.*)[\)\]}]"
    else:
        pattern = r"[\(\[{](.*)[\)\]}]"
    shapes = re.findall(pattern, param_str)
    dims = 0
    if shapes is not None and len(shapes) > 0:
        dimensions = shapes[0].split(",")
        dims = len(dimensions)
        if len(dimensions) > 1 and dimensions[len(dimensions) - 1] == "":
            dims -= 1
    return dims


def oracle_dimensionality(t):
    if "shape" not in t:
        return None
    shapes = []
    prev = 0
    for m in re.finditer(r"[\)\]}]", t):
        shapes.append(t[prev : m.end()])
        prev = m.end() + 1
    if len(shapes) == 1:
        return [oracle_find_shape(t)]
    elif len(shapes) > 1:
        dims = []
        for i, seg in enumerate(shapes):
            first = i == 0
            d = oracle_find_shape(seg, first)
            if d > 0:
                dims.append(d)
        return sorted(set(dims))
    return None
