"""Full JSONPath selector — recursive descent, wildcards, slices, filters.

Reference: ``JsonPathSelector`` (JsonPathSelector.cs:10-60) delegates to
Newtonsoft's ``SelectTokens``; the engine's existing ``jsonpath`` Field
kind covers only the ``get_json_object`` subset (child access + array
index). This module adds the rest of the practical JSONPath grammar:

- ``$`` root, ``.name`` / ``['name']`` child
- ``[n]`` index (negative ok), ``[start:end]`` slice, ``[*]`` wildcard
- ``..name`` / ``..[*]`` recursive descent
- ``[?(@.field <op> literal)]`` filters, ops ``== != > >= < <=``

Dispatch keeps the JVM fast path: ``json_path_col`` routes simple paths
to ``get_json_object`` (codegen'd, no Python) and only paths using the
extended grammar to the Arrow-batched pandas UDF evaluator. Scalar
results render exactly like ``get_json_object`` (strings unquoted,
numbers verbatim, objects/arrays as compact JSON) so the two paths are
interchangeable.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN = re.compile(
    r"""
    \.\.\[(?:'([^']*)'|"([^"]*)"|(\*)|(-?\d+))\]   # ..['x'] ..[*] ..[n]
  | \.\.([A-Za-z_][\w\-]*)                         # ..name
  | \.([A-Za-z_][\w\-]*|\*)                        # .name  .*
  | \[\s*'([^']*)'\s*\]                            # ['name']
  | \[\s*"([^"]*)"\s*\]                            # ["name"]
  | \[\s*(-?\d+)\s*\]                              # [n]
  | \[\s*(-?\d*)\s*:\s*(-?\d*)\s*\]                # [start:end]
  | \[\s*\*\s*\]                                   # [*]
  | \[\?\(\s*@\.([\w\-]+)\s*(==|!=|>=|<=|>|<)\s*(.+?)\s*\)\]  # filter
    """,
    re.VERBOSE,
)

_EXTENDED = re.compile(r"\.\.|\[\?\(|\[\s*\*\s*\]|\.\*|\[\s*-?\d*\s*:")


def _parse(path: str) -> list[tuple]:
    if not path.startswith("$"):
        raise ValueError(f"JSONPath must start with $: {path!r}")
    ops: list[tuple] = []
    pos = 1
    while pos < len(path):
        m = _TOKEN.match(path, pos)
        if m is None:
            raise ValueError(f"bad JSONPath at {path[pos:]!r}")
        g = m.groups()
        if g[0] is not None or g[1] is not None:
            ops.append(("recurse_name", g[0] if g[0] is not None else g[1]))
        elif g[2] is not None:
            ops.append(("recurse_wild",))
        elif g[3] is not None:
            ops.append(("recurse_index", int(g[3])))
        elif g[4] is not None:
            ops.append(("recurse_name", g[4]))
        elif g[5] is not None:
            ops.append(("wild",) if g[5] == "*" else ("name", g[5]))
        elif g[6] is not None:
            ops.append(("name", g[6]))
        elif g[7] is not None:
            ops.append(("name", g[7]))
        elif g[8] is not None:
            ops.append(("index", int(g[8])))
        elif g[9] is not None or g[10] is not None:
            start = int(g[9]) if g[9] else None
            end = int(g[10]) if g[10] else None
            ops.append(("slice", start, end))
        elif g[11] is not None:
            lit = g[13].strip()
            if lit.startswith(("'", '"')):
                val = lit[1:-1]
            elif lit in ("true", "false"):
                val = lit == "true"
            elif lit == "null":
                val = None
            else:
                val = float(lit) if "." in lit else int(lit)
            ops.append(("filter", g[11], g[12], val))
        else:  # [*] matched with no capturing group set
            ops.append(("wild",))
        pos = m.end()
    return ops


def _descendants(node):
    yield node
    if isinstance(node, dict):
        for v in node.values():
            yield from _descendants(v)
    elif isinstance(node, list):
        for v in node:
            yield from _descendants(v)


_CMP = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
}


def _apply(nodes: list, op: tuple) -> list:
    kind = op[0]
    out: list = []
    for n in nodes:
        if kind == "name":
            if isinstance(n, dict) and op[1] in n:
                out.append(n[op[1]])
        elif kind == "wild":
            if isinstance(n, dict):
                out.extend(n.values())
            elif isinstance(n, list):
                out.extend(n)
        elif kind == "index":
            if isinstance(n, list) and -len(n) <= op[1] < len(n):
                out.append(n[op[1]])
        elif kind == "slice":
            if isinstance(n, list):
                out.extend(n[op[1]:op[2]])
        elif kind == "recurse_name":
            for d in _descendants(n):
                if isinstance(d, dict) and op[1] in d:
                    out.append(d[op[1]])
        elif kind == "recurse_wild":
            for d in _descendants(n):
                if isinstance(d, (dict, list)):
                    out.extend(d.values() if isinstance(d, dict) else d)
        elif kind == "recurse_index":
            for d in _descendants(n):
                if isinstance(d, list) and -len(d) <= op[1] < len(d):
                    out.append(d[op[1]])
        elif kind == "filter":
            items = n if isinstance(n, list) else [n]
            for item in items:
                if isinstance(item, dict) and op[1] in item:
                    try:
                        if _CMP[op[2]](item[op[1]], op[3]):
                            out.append(item)
                    except TypeError:
                        pass
    return out


def jsonpath_eval(doc, path: str) -> list:
    """Evaluate ``path`` against a parsed JSON value; returns all matches
    (SelectTokens semantics — empty list when nothing matches)."""
    return _eval(doc, path)


def _eval(doc, path: str) -> list:
    nodes = [doc]
    for op in _parse(path):
        nodes = _apply(nodes, op)
        if not nodes:
            break
    return nodes


def _render(v) -> str | None:
    """get_json_object-compatible rendering: strings raw, scalars via
    JSON, containers as compact JSON."""
    if v is None:
        return None
    if isinstance(v, str):
        return v
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":"))
    return json.dumps(v)


def is_simple_path(path: str) -> bool:
    """True when ``get_json_object`` handles the path natively (child
    access + non-negative index only)."""
    return _EXTENDED.search(path) is None and not re.search(r"\[\s*-", path)


def json_path_udf(path: str, mode: str = "first"):
    """Arrow-batched evaluator for the extended grammar. ``mode`` is
    'first' (first match, rendered scalar-style) or 'all' (JSON array of
    every match)."""
    ops_check = _parse(path)  # fail fast on a bad path at plan time
    del ops_check

    @F.pandas_udf("string")
    def run(s: pd.Series) -> pd.Series:
        out = []
        for raw in s:
            if raw is None:
                out.append(None)
                continue
            try:
                doc = json.loads(raw)
            except (ValueError, TypeError):
                out.append(None)
                continue
            matches = _eval(doc, path)
            if mode == "all":
                out.append(json.dumps(matches, separators=(",", ":")))
            else:
                out.append(_render(matches[0]) if matches else None)
        return pd.Series(out, dtype="object")

    return run


def json_path_col(content: Column, path: str, mode: str = "first") -> Column:
    """JSONPath over a JSON string column. Simple paths stay JVM-side
    (``get_json_object``, codegen'd); recursive descent / wildcards /
    slices / filters route to the pandas evaluator."""
    if mode == "first" and is_simple_path(path):
        return F.get_json_object(content, path)
    return json_path_udf(path, mode)(content)
