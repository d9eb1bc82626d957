"""DQ rule engine: null semantics, fused single-pass plan, report shape."""

from pyspark.sql import functions as F

from polars_ad_etl_spark.operators.dq import evaluate_rules


def test_null_condition_counts_as_violation(spark):
    """A rule evaluating to NULL (unknown) must count as a violation — a DQ
    gate cannot silently pass rows it could not confirm."""
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "id bigint, amount double"
    )
    report = evaluate_rules(
        df, {"positive_amount": F.col("amount") > 0}
    ).collect()
    assert len(report) == 1
    row = report[0]
    assert row.rule_id == "positive_amount"
    assert row.n_checked == 3
    assert row.n_violations == 2  # the NULL and the negative
    assert row.violation_permille == 666


def test_rules_fuse_into_one_scan(spark):
    """N rules must compile to ONE scan + one Aggregate — the engine's whole
    point. The optimized plan may contain exactly one relation node."""
    df = spark.range(100).withColumn("x", F.col("id") % 7)
    rules = {f"r{i}": F.col("x") > i for i in range(5)}
    plan = (
        evaluate_rules(df, rules)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Range (") == 1
    assert plan.count("Aggregate") <= 2  # partial+final at most


def test_report_ordering_and_zero_violations(spark):
    df = spark.createDataFrame([(1,), (2,)], "id bigint")
    report = evaluate_rules(
        df,
        {
            "b_rule": F.col("id") > 0,
            "a_rule": F.col("id") < 100,
        },
    ).collect()
    assert [r.rule_id for r in report] == ["a_rule", "b_rule"]
    assert all(r.n_violations == 0 for r in report)
    assert all(r.violation_permille == 0 for r in report)
