"""Bucketed-table co-location: the shuffle-deletion lever for repeated
joins/aggregations on a fixed key.

Plan-shape assertions, same discipline as tests/test_plan_shapes.py: at
100 TB the all-to-all Exchange is the dominant network step; a bucketed
join/aggregation must plan WITHOUT one.
"""

import pytest
from pyspark.sql import functions as F

from python_hll_spark.sources.tables import write_bucketed


@pytest.fixture()
def bucketed_pair(spark):
    left = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
    right = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("w"))
    write_bucketed(left, "bt_left", "k", n_buckets=8, sort_col="k")
    write_bucketed(right, "bt_right", "k", n_buckets=8, sort_col="k")
    yield spark.table("bt_left"), spark.table("bt_right")
    spark.sql("DROP TABLE IF EXISTS bt_left")
    spark.sql("DROP TABLE IF EXISTS bt_right")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    left, right = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = left.join(right, "k")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # and it computes the right thing
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    left, _ = bucketed_pair
    agg = left.groupBy("k").agg(F.sum("v").alias("s"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 10000


def test_unbucketed_join_needs_exchange(spark, bucketed_pair):
    """Control: the same join on plain frames plans an Exchange — the
    bucketed variant's zero-Exchange plan is the table layout, not AQE."""
    left, _ = bucketed_pair
    plain = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("w"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(left.join(plain, "k"))
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
