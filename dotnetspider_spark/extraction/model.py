"""Entity model — attribute-declared schema compiled to a projection.

Reference: the ``[Entity]/[Field]/[Target]/[Share]`` attribute system
(ModelDefinition.cs:76-127, Field.cs:6-27) reflected at runtime and
interpreted per page by ``ModelExtractor.Extract``
(ModelExtractor.cs:18-152): row selector -> N nodes, ``Take``/
``TakeFromHead`` head/tail slice (:52-55), per-field select + formatter
chain (:132-149), ``NotNull`` row drop (:87-90), typed coercion via
``Convert.ChangeType`` (:178-233).

Spark re-expression: a model is a plain dataclass.

- ``extract()`` (single-node, one row per page) compiles into one
  ``select()`` projection — selectors become built-in expressions
  (``regexp_extract``, ``get_json_object``) or the stdlib DOM engine
  (extraction/dom.py) behind Arrow-batched pandas UDFs for
  xpath/css selection; formatters are the column factories in
  ``functions.formatters``; ``NotNull`` is a filter; ``Take`` a rank.
- ``extract_rows()`` (multi-node, the reference's row-selector path,
  ModelExtractor.cs:40-67) parses each page ONCE in a pandas UDF,
  selects the N region nodes, evaluates every DOM field relative to its
  region, and returns ``array<struct<...>>`` -> ``posexplode`` — so the
  per-page Python cost is one parse regardless of field count, and the
  result is a distributed DataFrame (no driver loop).

Supported dtypes mirror TableInfo.cs:128-167 (int/long/float/double/
decimal/bool/timestamp/string — the reference has no nested types
anywhere, SURVEY §1.4).
"""

from __future__ import annotations

import re as _re
from collections.abc import Callable
from dataclasses import dataclass
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_DTYPES = {
    "int", "bigint", "float", "double", "boolean", "string", "timestamp",
    "date", "decimal(18,6)",
}

#: Selectable.Environment time macros (Selectable.cs:83-113). Spark-side
#: expressions over current_timestamp; format mirrors the reference's
#: "yyyy/MM/dd hh:mm:ss" (12-hour, as written there).
_TIME_MACROS = {
    "now": lambda: F.date_format(F.current_timestamp(), "yyyy/MM/dd hh:mm:ss"),
    "today": lambda: F.date_format(
        F.date_trunc("day", F.current_timestamp()), "yyyy/MM/dd hh:mm:ss"
    ),
    "monday": lambda: F.date_format(
        F.date_trunc("week", F.current_timestamp()), "yyyy/MM/dd hh:mm:ss"
    ),
    "monthly": lambda: F.date_format(
        F.date_trunc("month", F.current_timestamp()), "yyyy/MM/dd hh:mm:ss"
    ),
}

#: EnviromentFields.Index (EnvironmentSelector.cs:7-9): the row's index
#: within its page's node list.
INDEX = "INDEX"


@dataclass(frozen=True)
class Field:
    """One ``[Field]`` declaration.

    kind:
      'xpath'    expr = XPath (trailing /@attr selects the attribute —
                 XPathSelector.cs:24-29); value_option applies to nodes
      'css'      expr = CSS selector; ``attr`` optionally names the
                 attribute to read (CssSelector.cs:30-34)
      'regex'    expr = pattern, uses ``group``
      'regex-count'  FieldOptions.Count analog for regex
      'jsonpath' expr = $.path (get_json_object subset)
      'env'      EnvironmentSelector: expr = property column name, time
                 macro (now/today/monday/monthly), or INDEX
      'column'   expr = existing column name
      'const'    expr = literal
    value_option: 'auto' (node -> InnerHtml), 'inner_html', 'outer_html',
      'inner_text', or 'count' (FieldOptions.Count — number of matches).
    """

    name: str
    kind: str
    expr: str
    dtype: str = "string"
    group: int = 1
    not_null: bool = False
    formatters: tuple[Callable[[Column], Column], ...] = ()
    #: selector input: None = the page content column; a column name reads
    #: that column instead (EnvironmentSelector over request properties,
    #: EnvironmentSelector.cs:20-36)
    source: str | None = None
    attr: str | None = None
    value_option: str = "auto"
    #: ExcelFormatter analog (ExcelFormatter.cs:18-46, ExcelEngine.cs):
    #: the reference lets a field run an arbitrary formula over its
    #: extracted value; the Spark-first equivalent is an arbitrary SQL
    #: expression, applied AFTER extraction/formatters/cast and before
    #: the NotNull gate. ``[value]`` refers to this field, and other
    #: field names are in scope (resolved by Catalyst, codegen'd — no
    #: per-row formula interpreter).
    sql_formula: str | None = None


@dataclass(frozen=True)
class EntityModel:
    """One ``[Entity]`` declaration over a content column.

    ``selector`` is the row selector ([Entity(Expression=...)],
    ModelDefinition.cs:29-40): when set, ``extract_rows`` emits one row
    per matched node; when None the page itself is the single row
    (ModelExtractor.cs:40,68-75).
    """

    name: str
    fields: tuple[Field, ...]
    take: int | None = None  # ModelDefinition Take (ModelDefinition.cs:76-84)
    take_from_head: bool = True  # TakeFromHead
    selector: str | None = None
    selector_kind: str = "xpath"  # 'xpath' | 'css'


_DOM_KINDS = ("xpath", "css")


def _eval_dom_field(node, f: Field):
    """Evaluate one xpath/css field against a DOM node -> str | None.
    Runs inside pandas UDFs; mirrors ModelExtractor.ExtractField
    (ModelExtractor.cs:100-152)."""
    from dotnetspider_spark.extraction import dom

    if f.kind == "xpath":
        items = dom.xpath_all(node, f.expr)
    else:
        items = dom.css_all(node, f.expr)
        if f.attr is not None:
            vals = []
            for n in items:
                v = n.attrs.get(f.attr)
                if v is not None and v.strip():
                    vals.append(v.strip())
            items = vals
    if f.value_option == "count":
        return str(len(items))
    if not items:
        return None
    return dom.node_value(items[0], f.value_option)


@lru_cache(maxsize=None)
def _dom_first_udf(kind: str, expr: str, attr: str | None, option: str):
    """Single-value DOM selection over a content column (page = context)."""
    probe = Field(name="_", kind=kind, expr=expr, attr=attr, value_option=option)

    @pandas_udf("string")
    def f(content: pd.Series) -> pd.Series:
        from dotnetspider_spark.extraction import dom

        def one(s):
            if s is None:
                return None
            return _eval_dom_field(dom.parse_html(s), probe)

        return content.map(one)

    return f


def _page_dom_udf(dom_fields: tuple):
    """Fused page-level DOM extraction: ONE parse per page evaluates
    every xpath/css field (parse dominates, so K fields at one parse
    beat K parses by ~K at scale — the design rule dom.py states)."""
    names = [f.name for f in dom_fields]
    schema = "struct<{}>".format(
        ",".join(f"{_sql_ident(n)}:string" for n in names)
    )

    @pandas_udf(schema)
    def f(content: pd.Series) -> pd.DataFrame:
        from dotnetspider_spark.extraction import dom

        rows = []
        for s in content:
            if s is None:
                rows.append({n: None for n in names})
            else:
                root = dom.parse_html(s)
                rows.append(
                    {fl.name: _eval_dom_field(root, fl) for fl in dom_fields}
                )
        return pd.DataFrame(rows, columns=names)

    return f


def _field_col(
    f: Field, content: Column, df: DataFrame, dom_raw: Column | None = None
) -> Column:
    if f.source is not None:
        content = df[f.source]
    if f.kind == "regex":
        raw = F.regexp_extract(content, f.expr, f.group)
        raw = F.when(raw == "", F.lit(None)).otherwise(raw)
    elif f.kind == "regex-count":
        raw = F.regexp_count(content, F.lit(f.expr))
    elif f.kind == "jsonpath":
        # full grammar (recursive descent / wildcards / slices / filters)
        # routes to functions.jsonpath; simple paths stay get_json_object
        from dotnetspider_spark.functions.jsonpath import json_path_col

        raw = json_path_col(content, f.expr)
    elif f.kind in _DOM_KINDS:
        raw = (
            dom_raw
            if dom_raw is not None
            else _dom_first_udf(f.kind, f.expr, f.attr, f.value_option)(content)
        )
    elif f.kind == "env":
        raw = _env_col(f, df, idx_col=None)
    elif f.kind == "css-cap":  # legacy demo selector, kept for compat
        from dotnetspider_spark.crawler.parse import extract_css_text_udf

        raw = extract_css_text_udf(content)
    elif f.kind == "column":
        raw = df[f.expr]
    elif f.kind == "const":
        raw = F.lit(f.expr)
    else:
        raise ValueError(f"unknown selector kind {f.kind!r}")
    for fmt in f.formatters:
        raw = fmt(raw)
    if f.dtype != "string" or f.kind == "regex-count":
        assert f.dtype in _DTYPES, f.dtype
        raw = raw.cast(f.dtype)
    return raw.alias(f.name)


def _env_col(f: Field, df: DataFrame, idx_col: str | None) -> Column:
    """EnvironmentSelector resolution (ModelExtractor.cs:107-126 +
    Selectable.Environment, Selectable.cs:83-113): INDEX -> row index,
    time macros -> clock expressions, else request-property column."""
    if f.expr == INDEX:
        if idx_col is None:
            return F.lit(0).cast("string")  # single-node path: index 0
        return F.col(idx_col).cast("string")
    macro = _TIME_MACROS.get(f.expr.lower())
    if macro is not None:
        return macro()
    if f.expr in df.columns:
        return df[f.expr].cast("string")
    return F.lit(None).cast("string")


def extract(
    model: EntityModel,
    pages: DataFrame,
    content_col: str = "html",
    page_key: str | None = "url",
    auto_timestamp: bool = False,
) -> DataFrame:
    """Single-node path: one output row per input page (the reference's
    behavior when the entity has no row selector, ModelExtractor.cs:68-75).

    ``NotNull`` fields drop the row when null (ModelExtractor.cs:87-90);
    ``take`` keeps the first/last N rows in page order
    (ModelExtractor.cs:52-55) — per the whole frame here, ranked by
    ``page_key`` for determinism. ``auto_timestamp`` appends
    ``creation_time`` like MySqlEntityPipeline.cs:86-89.
    """
    if model.selector is not None:
        return extract_rows(
            model, pages, content_col=content_col, auto_timestamp=auto_timestamp
        )
    content = F.col(content_col)
    # fuse all DOM fields sharing a source column into ONE parse per page
    dom_groups: dict = {}
    for f in model.fields:
        if f.kind in _DOM_KINDS:
            dom_groups.setdefault(f.source, []).append(f)
    base = pages
    dom_raws: dict = {}
    for i, (src, fls) in enumerate(dom_groups.items()):
        alias = f"__dom{i}"
        base = base.withColumn(
            alias, _page_dom_udf(tuple(fls))(F.col(src) if src else content)
        )
        for fl in fls:
            dom_raws[fl.name] = F.col(alias).getField(fl.name)
    cols = [
        _field_col(f, content, base, dom_raw=dom_raws.get(f.name))
        for f in model.fields
    ]
    if page_key is not None:
        out = base.select(F.col(page_key).alias("__pk"), *cols)
    else:
        out = base.select(F.monotonically_increasing_id().alias("__pk"), *cols)
    out = _apply_sql_formulas(out, model.fields)
    for f in model.fields:
        if f.not_null:
            out = out.filter(F.col(f.name).isNotNull())
    if model.take is not None:
        # orderBy+limit plans as TakeOrderedAndProject (per-partition
        # top-K, then a K-row merge) — no single-partition window even
        # when the extraction output is huge
        order = F.col("__pk").asc() if model.take_from_head else F.col("__pk").desc()
        out = out.orderBy(order).limit(model.take)
    out = out.drop("__pk")
    if auto_timestamp:
        out = out.withColumn("creation_time", F.current_timestamp())
    return out


def _sql_ident(name: str) -> str:
    assert _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name), name
    return name


def _apply_sql_formulas(out: DataFrame, fields) -> DataFrame:
    """Apply ``Field.sql_formula`` expressions (ExcelFormatter analog)
    over the selected entity columns; ``[value]`` = the field itself."""
    for f in fields:
        if f.sql_formula:
            out = out.withColumn(
                f.name,
                F.expr(f.sql_formula.replace("[value]", _sql_ident(f.name))),
            )
    return out


@lru_cache(maxsize=None)
def _rows_udf(model: EntityModel):
    """Per-page row extraction: parse once, select region nodes, apply
    Take to the NODE LIST (ModelExtractor.cs:52-55 — before field
    extraction), evaluate each DOM field relative to its region node.
    Returns array<struct<one string per DOM field>>."""
    dom_fields = tuple(f for f in model.fields if f.kind in _DOM_KINDS)
    regex_fields = tuple(f for f in model.fields if f.kind == "regex")
    # sourceless jsonpath fields read the REGION's inner text (embedded
    # JSON); the path itself evaluates JVM/Arrow-side downstream
    json_fields = tuple(
        f for f in model.fields if f.kind == "jsonpath" and f.source is None
    )
    names = (
        [f.name for f in dom_fields]
        + [f.name for f in regex_fields]
        + [f.name for f in json_fields]
    )
    schema = "array<struct<{}>>".format(
        ",".join(f"{_sql_ident(n)}:string" for n in names)
    )
    regexes = {f.name: _re.compile(f.expr) for f in regex_fields}

    @pandas_udf(schema)
    def f(content: pd.Series) -> pd.Series:
        from dotnetspider_spark.extraction import dom

        def one(s):
            if s is None:
                return None  # list==null -> no rows (ModelExtractor.cs:46-49)
            root = dom.parse_html(s)
            if model.selector_kind == "css":
                nodes = dom.css_all(root, model.selector)
            else:
                nodes = [
                    n
                    for n in dom.xpath_all(root, model.selector)
                    if not isinstance(n, str)
                ]
            if model.take is not None and len(nodes) > model.take:
                nodes = (
                    nodes[: model.take]
                    if model.take_from_head
                    else nodes[-model.take :]
                )
            rows = []
            for n in nodes:
                vals = {fl.name: _eval_dom_field(n, fl) for fl in dom_fields}
                outer = None
                if regex_fields:
                    outer = n.outer_html
                for fl in regex_fields:
                    m = regexes[fl.name].search(outer or "")
                    vals[fl.name] = m.group(fl.group) if m else None
                for fl in json_fields:
                    vals[fl.name] = n.inner_text
                rows.append(vals)
            return rows

        return content.map(one)

    return f


def extract_rows(
    model: EntityModel,
    pages: DataFrame,
    content_col: str = "html",
    keep_cols: tuple[str, ...] = (),
    auto_timestamp: bool = False,
) -> DataFrame:
    """Multi-node path (ModelExtractor.cs:40-67): N entity rows per page.

    One fused Arrow crossing per page batch; the explode happens JVM-side
    (posexplode over the returned array<struct>), so output rows are
    distributed and never concentrated on the driver. ``keep_cols`` are
    carried page columns (url, depth, ...). Env/column/const fields are
    evaluated Spark-side; INDEX resolves to the row's position within its
    page (EnviromentFields.Index, ModelExtractor.cs:110-115).
    """
    assert model.selector is not None, "extract_rows requires a row selector"
    raw = pages.withColumn("__rows", _rows_udf(model)(F.col(content_col)))
    # carry every page column an env/column field reads, plus keep_cols
    need = set(keep_cols)
    for f in model.fields:
        if f.kind in ("env", "column") and f.expr in pages.columns:
            need.add(f.expr)
        if f.kind == "jsonpath" and f.source in pages.columns:
            need.add(f.source)
    carried = [c for c in pages.columns if c in need]
    ex = raw.select(
        *carried, F.posexplode("__rows").alias("__idx", "__row")
    )
    cols: list[Column] = []
    for f in model.fields:
        if f.kind in _DOM_KINDS or f.kind == "regex":
            raw_col = F.col(f"__row.{f.name}")
        elif f.kind == "env":
            raw_col = _env_col(f, ex, idx_col="__idx")
        elif f.kind == "column":
            raw_col = ex[f.expr]
        elif f.kind == "const":
            raw_col = F.lit(f.expr)
        elif f.kind == "jsonpath":
            from dotnetspider_spark.functions.jsonpath import json_path_col

            src = ex[f.source] if f.source else F.col(f"__row.{f.name}")
            raw_col = json_path_col(src, f.expr)
        else:
            raise ValueError(f"unsupported kind in multi-node path: {f.kind!r}")
        for fmt in f.formatters:
            raw_col = fmt(raw_col)
        if f.dtype != "string":
            assert f.dtype in _DTYPES, f.dtype
            raw_col = raw_col.cast(f.dtype)
        cols.append(raw_col.alias(f.name))
    out = ex.select(*keep_cols, *cols)
    out = _apply_sql_formulas(out, model.fields)
    for f in model.fields:
        if f.not_null:
            out = out.filter(F.col(f.name).isNotNull())
    if auto_timestamp:
        out = out.withColumn("creation_time", F.current_timestamp())
    return out
