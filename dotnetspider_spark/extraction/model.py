"""Entity model — attribute-declared schema compiled to a projection.

Reference: the ``[Entity]/[Field]/[Target]/[Share]`` attribute system
(ModelDefinition.cs:76-127, Field.cs:6-27) reflected at runtime and
interpreted per page by ``ModelExtractor.Extract``
(ModelExtractor.cs:18-152): row selector -> N nodes, ``Take``/
``TakeFromHead`` head/tail slice (:52-55), per-field select + formatter
chain (:132-149), ``NotNull`` row drop (:87-90), typed coercion via
``Convert.ChangeType`` (:178-233).

Spark re-expression: a model is a plain dataclass; ``extract()`` compiles
it into one ``select()`` projection over a fetched-pages DataFrame —
selectors become built-in expressions (``regexp_extract``,
``get_json_object``) or the stdlib-parser pandas UDF for CSS-ish
selection; formatters are the column factories in
``functions.formatters``; ``NotNull`` is a filter; ``Take`` a per-page
rank. Supported dtypes mirror TableInfo.cs:128-167 (int/long/float/
double/decimal/bool/timestamp/string — the reference has no nested
types anywhere, SURVEY §1.4).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DTYPES = {
    "int", "bigint", "float", "double", "boolean", "string", "timestamp",
    "date", "decimal(18,6)",
}


@dataclass(frozen=True)
class Field:
    """One ``[Field]`` declaration.

    kind: 'regex' (expr=pattern, uses group), 'jsonpath' (expr=$.path),
    'css-cap' (caption-class CSS demo selector), 'column' (expr=existing
    column name), 'const' (expr=literal). ``FieldOptions.Count``
    (ModelExtractor.cs:127-129) is modeled by kind='regex-count'.
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


@dataclass(frozen=True)
class EntityModel:
    """One ``[Entity]`` declaration over a content column."""

    name: str
    fields: tuple[Field, ...]
    take: int | None = None  # ModelDefinition Take (ModelDefinition.cs:76-84)
    take_from_head: bool = True  # TakeFromHead


def _field_col(f: Field, content: Column, df: DataFrame) -> Column:
    if f.source is not None:
        content = df[f.source]
    if f.kind == "regex":
        raw = F.regexp_extract(content, f.expr, f.group)
        raw = F.when(raw == "", F.lit(None)).otherwise(raw)
    elif f.kind == "regex-count":
        raw = F.regexp_count(content, F.lit(f.expr))
    elif f.kind == "jsonpath":
        raw = F.get_json_object(content, f.expr)
    elif f.kind == "css-cap":
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


def extract(
    model: EntityModel,
    pages: DataFrame,
    content_col: str = "html",
    page_key: str | None = "url",
    auto_timestamp: bool = False,
) -> DataFrame:
    """Compile the model to a projection and run it.

    One output row per input page (the reference's row-selector multiplies
    rows per page; for page-per-row corpora the selector is the page
    itself). ``NotNull`` fields drop the row when null
    (ModelExtractor.cs:87-90); ``take`` keeps the first/last N rows in
    page order (ModelExtractor.cs:52-55) — per the whole frame here,
    ranked by ``page_key`` for determinism. ``auto_timestamp`` appends
    ``creation_time`` like MySqlEntityPipeline.cs:86-89.
    """
    content = F.col(content_col)
    cols = [_field_col(f, content, pages) for f in model.fields]
    if page_key is not None:
        out = pages.select(F.col(page_key).alias("__pk"), *cols)
    else:
        out = pages.select(F.monotonically_increasing_id().alias("__pk"), *cols)
    for f in model.fields:
        if f.not_null:
            out = out.filter(F.col(f.name).isNotNull())
    if model.take is not None:
        order = F.col("__pk").asc() if model.take_from_head else F.col("__pk").desc()
        w = Window.orderBy(order)
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= model.take)
            .drop("__rn")
        )
    out = out.drop("__pk")
    if auto_timestamp:
        out = out.withColumn("creation_time", F.current_timestamp())
    return out
