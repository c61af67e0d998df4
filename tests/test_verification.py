"""Verification-report operator (SURVEY §2.9, Verification.cs parity)."""

from __future__ import annotations

from dotnetspider_spark.operators.verification import Verifier, to_html


def _view(spark):
    spark.createDataFrame(
        [(i, f"u{i}", i * 10) for i in range(20)],
        "id long, url string, score long",
    ).createOrReplaceTempView("vtest_items")


def test_sql_rules_pass_fail_semantics(spark):
    _view(spark)
    v = (
        Verifier(spark)
        .add_sql_equal("count-eq", "SELECT count(*) AS result FROM vtest_items", 20)
        .add_sql_equal("count-eq-bad", "SELECT count(*) AS result FROM vtest_items", 21)
        .add_sql_large("sum-large", "SELECT sum(score) AS result FROM vtest_items", 100)
        .add_sql_large("sum-large-eq-fails",
                       "SELECT sum(score) AS result FROM vtest_items", 1900)
        .add_sql_less("min-less", "SELECT min(score) AS result FROM vtest_items", 5)
        .add_sql_range("avg-range", "SELECT avg(score) AS result FROM vtest_items",
                       90, 100)
        .add_sql_range("range-inclusive-ends",
                       "SELECT max(score) AS result FROM vtest_items", 190, 190)
    )
    rep = {r["name"]: r for r in v.report().collect()}
    assert rep["count-eq"]["passed"] and rep["count-eq"]["actual"] == "20"
    assert not rep["count-eq-bad"]["passed"]
    assert rep["sum-large"]["passed"]
    # strict > like the reference's SqlLarge (result == expected fails)
    assert not rep["sum-large-eq-fails"]["passed"]
    assert rep["min-less"]["passed"]
    assert rep["avg-range"]["passed"] and rep["avg-range"]["actual"] == "95"
    assert rep["range-inclusive-ends"]["passed"]  # SqlRange is inclusive
    assert not v.passed()


def test_sql_rule_first_column_fallback_and_errors(spark):
    _view(spark)
    v = (
        Verifier(spark)
        .add_sql_equal("no-alias", "SELECT count(*) FROM vtest_items", 20)
        .add_sql_equal("bad-sql", "SELECT count(*) FROM no_such_table_xyz", 1)
        .add_sql_equal("empty-result",
                       "SELECT id AS result FROM vtest_items WHERE id < 0", 1)
    )
    rep = {r["name"]: r for r in v.report().collect()}
    assert rep["no-alias"]["passed"]
    assert not rep["bad-sql"]["passed"]
    assert rep["bad-sql"]["actual"].startswith("error:")
    assert not rep["empty-result"]["passed"]  # NULL scalar never passes


def test_value_rules(spark):
    v = (
        Verifier(spark)
        .add_value_equal("ve", 7, 7)
        .add_value_large("vl", 8, 7)
        .add_value_less("vs", 6, 7)
        .add_value_range("vr", 7, 7, 9)
        .add_value_equal("ve-bad", 7, 8)
    )
    rep = {r["name"]: r for r in v.report().collect()}
    assert all(rep[k]["passed"] for k in ("ve", "vl", "vs", "vr"))
    assert not rep["ve-bad"]["passed"]
    assert rep["ve"]["expression"] == "<value>"


def test_html_report_renders_reference_shape(spark):
    _view(spark)
    v = (
        Verifier(spark)
        .add_sql_equal("good", "SELECT count(*) AS result FROM vtest_items", 20)
        .add_value_equal("bad", 1, 2)
    )
    html = to_html(v.report())
    assert "<strong>PASS</strong>" in html and "forestgreen" in html
    assert "<strong>FAILED</strong>" in html and "orangered" in html
    assert html.count("<tr>") == 3  # header + 2 rules


def test_html_escapes_interpolated_fields(spark):
    # review fix: '<value>' expressions and SQL '<' comparisons must be
    # escaped or they parse as tags and corrupt the report table
    v = (
        Verifier(spark)
        .add_value_equal("v", 1, 1)
        .add_sql_equal("s", "SELECT 1 AS result WHERE 1 < 2", 1)
    )
    html = to_html(v.report())
    assert "&lt;value&gt;" in html and "<value>" not in html
    assert "1 &lt; 2" in html


def test_passed_reuses_prebuilt_report(spark):
    v = Verifier(spark).add_value_equal("a", 1, 1)
    rep = v.report()
    assert v.passed(rep) is True
    assert v.passed() is True
    v.add_value_equal("b", 1, 2)
    assert v.passed() is False
    # the stale prebuilt report still reflects its own evaluation
    assert v.passed(rep) is True
