"""Crawl-result verification reports (SURVEY §2.9).

Re-expresses DotnetSpider's ``Verification`` family
(``Extension/Infrastructure/Verification.cs:160-198`` — the
``AddSqlEqual/AddSqlLarge/AddSqlLess/AddSqlRange/AddValueEqual``
rule builders — and ``:252-375`` — ``BaseSqlVerification.Verify``,
which runs ``SELECT ... AS Result`` against the sink DB, compares the
scalar with the expectation, and renders a PASS/FAILED report row) as
a rule list evaluated with ``spark.sql`` over the engine's sink tables.

Differences from the reference, by design:

* the report is a DataFrame (one row per rule) instead of an HTML
  email — downstream it lands in the metrics sink like every other
  engine artifact; :func:`to_html` renders the reference-shaped table
  for humans.
* a failing rule never throws — like the reference, an evaluation
  error becomes ``actual = <error text>`` + ``passed = false`` (the
  report must reach the operator precisely when the crawl is broken).

Scale: each rule is ONE scalar query (typically an aggregate Catalyst
fully pushes down); the report itself is a handful of driver-side rows
— there is deliberately no distributed state here.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

REPORT_SCHEMA = (
    "name string, kind string, expression string, "
    "expected string, actual string, passed boolean"
)


def _fmt(v) -> str:
    """Deterministic scalar rendering: no trailing '.0' on integral
    floats, so Spark and plain-SQL restatements agree byte-for-byte."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


@dataclass
class _Rule:
    name: str
    kind: str
    expression: str  # SQL text, or a description for value rules
    expected_repr: str
    # evaluate(actual) -> bool
    lo: object = None
    hi: object = None
    actual_value: object = None  # for value rules (no SQL run)

    def validate(self, result) -> bool:
        if result is None:
            return False
        if self.kind == "SqlEqual" or self.kind == "ValueEqual":
            return result == self.lo
        if self.kind == "SqlLarge" or self.kind == "ValueLarge":
            return result > self.lo
        if self.kind == "SqlLess" or self.kind == "ValueLess":
            return result < self.lo
        # range: inclusive both ends (Verification.cs SqlRange.Validate)
        return self.lo <= result <= self.hi


class Verifier:
    """Collects rules, then :meth:`report` evaluates them all.

    SQL rules must yield a single row with a ``result`` column, the
    direct analog of the reference's ``SELECT COUNT(*) AS Result``
    contract (case-insensitive; the first column is used when no
    ``result`` column exists, so ``SELECT count(*) FROM t`` also
    works).
    """

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._rules: list[_Rule] = []

    # ---------------------------------------------------- SQL rules

    def add_sql_equal(self, name: str, sql: str, value):
        self._rules.append(_Rule(name, "SqlEqual", sql, _fmt(value), lo=value))
        return self

    def add_sql_large(self, name: str, sql: str, value):
        self._rules.append(_Rule(name, "SqlLarge", sql, _fmt(value), lo=value))
        return self

    def add_sql_less(self, name: str, sql: str, value):
        self._rules.append(_Rule(name, "SqlLess", sql, _fmt(value), lo=value))
        return self

    def add_sql_range(self, name: str, sql: str, lo, hi):
        self._rules.append(
            _Rule(name, "SqlRange", sql, f"{_fmt(lo)}-{_fmt(hi)}", lo=lo, hi=hi)
        )
        return self

    # -------------------------------------------------- value rules

    def add_value_equal(self, name: str, actual, expected):
        self._rules.append(
            _Rule(name, "ValueEqual", "<value>", _fmt(expected),
                  lo=expected, actual_value=actual)
        )
        return self

    def add_value_large(self, name: str, actual, expected):
        self._rules.append(
            _Rule(name, "ValueLarge", "<value>", _fmt(expected),
                  lo=expected, actual_value=actual)
        )
        return self

    def add_value_less(self, name: str, actual, expected):
        self._rules.append(
            _Rule(name, "ValueLess", "<value>", _fmt(expected),
                  lo=expected, actual_value=actual)
        )
        return self

    def add_value_range(self, name: str, actual, lo, hi):
        self._rules.append(
            _Rule(name, "ValueRange", "<value>", f"{_fmt(lo)}-{_fmt(hi)}",
                  lo=lo, hi=hi, actual_value=actual)
        )
        return self

    # ------------------------------------------------------- report

    def _eval_one(self, rule: _Rule):
        if rule.kind.startswith("Value"):
            return rule.actual_value
        row = self._spark.sql(rule.expression).limit(1).collect()
        if not row:
            return None
        r = row[0]
        cols_lower = {c.lower(): c for c in r.__fields__}
        key = cols_lower.get("result", r.__fields__[0])
        return r[key]

    def _eval_rows(self) -> list[tuple]:
        """Evaluate every rule once; one report tuple each, in add
        order."""
        rows = []
        for rule in self._rules:
            try:
                actual = self._eval_one(rule)
                passed = bool(rule.validate(actual))
                actual_repr = _fmt(actual)
            except Exception as e:  # noqa: BLE001 — reference parity:
                # Verify() catches everything and reports FAILED
                actual_repr = f"error: {e}"[:200]
                passed = False
            rows.append(
                (rule.name, rule.kind, rule.expression,
                 rule.expected_repr, actual_repr, passed)
            )
        return rows

    def report(self) -> DataFrame:
        """Evaluate every rule; one report row each, in add order."""
        return self._spark.createDataFrame(self._eval_rows(), REPORT_SCHEMA)

    def passed(self, report: DataFrame | None = None) -> bool:
        """True iff every rule passes (the reference's report-level
        green; convenience for pipelines gating a publish step). Pass
        an already-built ``report`` to reuse its evaluation — rules are
        sink-table aggregates, so re-running them for the boolean would
        double the scan cost of the common report-then-gate flow."""
        if report is not None:
            return all(r["passed"] for r in report.collect())
        return all(passed for *_, passed in self._eval_rows())


def to_html(report: DataFrame) -> str:
    """Reference-shaped HTML table (Verification.cs report string):
    one <tr> per rule with a green/red PASS/FAILED cell."""
    head = (
        "<table><tr><th>name</th><th>verification</th><th>expression</th>"
        "<th>expected</th><th>actual</th><th>result</th></tr>"
    )
    import html as _html

    body = []
    for r in report.collect():
        color = "forestgreen" if r["passed"] else "orangered"
        verdict = "PASS" if r["passed"] else "FAILED"
        # escape interpolated fields: '<value>' expressions, SQL '<'
        # comparisons and error actuals would otherwise parse as tags
        # and corrupt the table
        name, kind, expr, exp, act = (
            _html.escape(str(r[c]))
            for c in ("name", "kind", "expression", "expected", "actual")
        )
        body.append(
            f"<tr><td>{name}</td><td>{kind}</td>"
            f"<td>{expr}</td><td>{exp}</td><td>{act}</td>"
            f'<td style="color:{color}"><strong>{verdict}</strong></td></tr>'
        )
    return head + "".join(body) + "</table>"
