"""as-of and range joins: hand-verifiable semantics on tiny frames."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dataweb_spark.operators import as_of_join, range_join


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, ts(10, 0), 100.0), (1, ts(11, 0), 101.0), (2, ts(10, 30), 50.0),
         (3, ts(9, 0), 7.0)],
        "k int, ts timestamp, px double")
    quotes = spark.createDataFrame(
        [(1, ts(9, 30), 99.5), (1, ts(10, 0), 99.9), (1, ts(10, 45), 100.8),
         (2, ts(10, 30), 49.9), (2, ts(12, 0), 51.0)],
        "k int, ts timestamp, bid double")
    return trades, quotes


def test_asof_backward_with_ties(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = as_of_join(trades, quotes, key="k", right_cols=["bid"])
    rows = {(r["k"], r["ts"]): (r["bid_right"], r["ts_right"])
            for r in out.collect()}
    assert rows[(1, ts(10, 0))] == (99.9, ts(10, 0))     # tie → <= matches
    assert rows[(1, ts(11, 0))] == (100.8, ts(10, 45))   # latest prior
    assert rows[(2, ts(10, 30))] == (49.9, ts(10, 30))   # future quote ignored
    assert (3, ts(9, 0)) not in rows                     # no match → dropped


def test_asof_tolerance(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = as_of_join(trades, quotes, key="k", right_cols=["bid"],
                     tolerance_seconds=600)
    rows = {(r["k"], r["ts"]) for r in out.collect()}
    assert (1, ts(10, 0)) in rows          # tie match, 0 s old
    assert (2, ts(10, 30)) in rows         # tie match, 0 s old
    # 10:45 quote is 900 s before the 11:00 trade → outside 600 s tolerance
    assert (1, ts(11, 0)) not in rows


def test_range_join_containment(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 150.0), (3, 250.0), (4, 99.0)],
        "pid int, x double")
    intervals = spark.createDataFrame(
        [("a", 0.0, 100.0), ("b", 90.0, 200.0), ("c", 240.0, 260.0)],
        "band string, lo double, hi double")
    out = range_join(points, intervals, "x", "lo", "hi", bucket_width=50.0)
    got = sorted((r["pid"], r["band"]) for r in out.collect())
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "a"), (4, "b")]


def test_range_join_no_cross_product_plan(spark):
    points = spark.range(100).select(F.col("id").cast("double").alias("x"))
    intervals = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 50.0, 60.0)], "band string, lo double, hi double")
    out = range_join(points, intervals, "x", "lo", "hi", bucket_width=10.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
