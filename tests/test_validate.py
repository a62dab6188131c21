"""Data-quality check suite (operators/validate.py): violation
accounting on planted bad rows, and the one-scan shape of row-level
suites."""

from __future__ import annotations

from pyspark.sql import functions as F

from quanta_spark.operators.validate import (
    constraint_report,
    referential_check,
    uniqueness_check,
    validate_rows,
)


def test_validate_rows_counts_planted_violations(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None), (3, 200.0)],
        "id int, amount double",
    )
    got = {
        r["check_name"]: (r["n_violations"], r["n_rows"], r["passed"])
        for r in validate_rows(
            df,
            {
                "amount_not_null": F.col("amount").isNull(),
                # NULL predicate result = NOT a violation (three-valued
                # logic): a null amount fails amount_not_null, not this
                "amount_positive": ~(F.col("amount") > 0),
                "amount_under_100": F.col("amount") > 100,
            },
        ).collect()
    }
    assert got == {
        "amount_not_null": (1, 4, False),
        "amount_positive": (1, 4, False),
        "amount_under_100": (1, 4, False),
    }


def test_validate_rows_is_one_scan(spark):
    """A 3-check suite must not re-scan per check: exactly one scan
    node in the physical plan."""
    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("v"))
    report = validate_rows(
        df,
        {
            "a": F.col("v") > 5,
            "b": F.col("v") < 0,
            "c": F.col("id").isNull(),
        },
    )
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1


def test_uniqueness_and_referential_checks(spark):
    fact = spark.createDataFrame(
        [(1, 100), (2, 100), (2, 200), (3, 999)],  # dup key 2; orphan 999
        "k int, ref int",
    )
    dim = spark.createDataFrame([(100,), (200,)], "rk int")
    report = {
        r["check_name"]: (r["n_violations"], r["n_rows"], r["passed"])
        for r in constraint_report(
            [
                uniqueness_check(fact, ["k"]),
                referential_check(fact, "ref", dim, "rk"),
            ]
        ).collect()
    }
    assert report == {
        "unique_k": (1, 4, False),
        "ref_ref_in_rk": (1, 4, False),
    }


def test_referential_check_null_key_is_orphan(spark):
    fact = spark.createDataFrame([(1, 100), (2, None)], "k int, ref int")
    dim = spark.createDataFrame([(100,)], "rk int")
    row = referential_check(fact, "ref", dim, "rk").collect()[0]
    assert (row["n_violations"], row["passed"]) == (1, False)
