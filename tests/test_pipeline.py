from __future__ import annotations

from pyspark.sql import Row

from big_data_flight_analytics_spark.pipeline import run_pipeline


def test_all_ok(spark):
    steps = {
        "a": lambda: spark.createDataFrame([Row(x=1)]),
        "b": lambda: spark.createDataFrame([Row(x=2), Row(x=3)]),
    }
    report = run_pipeline(steps)
    assert report.ok and report.exit_code == 0
    assert [s.rows for s in report.steps] == [1, 2]


def test_failure_isolated_and_nonzero_exit(spark):
    steps = {
        "good": lambda: spark.createDataFrame([Row(x=1)]),
        "bad": lambda: spark.createDataFrame([Row(x=1)]).select("nope"),
        "after": lambda: spark.createDataFrame([Row(x=9)]),
    }
    report = run_pipeline(steps)
    assert not report.ok and report.exit_code == 1
    by_name = {s.name: s for s in report.steps}
    assert by_name["good"].ok
    assert not by_name["bad"].ok and "nope" in by_name["bad"].error
    assert by_name["after"].ok  # later steps still ran
    assert "FAIL bad" in report.summary()


def test_fail_fast_stops(spark):
    steps = {
        "bad": lambda: spark.createDataFrame([Row(x=1)]).select("nope"),
        "after": lambda: spark.createDataFrame([Row(x=9)]),
    }
    report = run_pipeline(steps, fail_fast=True)
    assert [s.name for s in report.steps] == ["bad"]
    assert report.exit_code == 1


def test_custom_sink(spark, tmp_path):
    out = {}
    steps = {"a": lambda: spark.createDataFrame([Row(x=1)])}
    report = run_pipeline(steps, sink=lambda name, df: out.update({name: df.count()}))
    assert report.ok and out == {"a": 1}
