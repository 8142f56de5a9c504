"""Bucketed-layout contract: a join of two tables bucketed on the
join key plans with NO shuffle exchange, and returns exactly what the
shuffled join returns. This is the co-located-join scale path
(SCALE.md): at 100 TB the layout is written once and every keyed
join/aggregate after it skips both sides' shuffles."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flight_data_pipeline_spark.operators.bucketing import (
    read_bucketed,
    write_bucketed,
)
from flight_data_pipeline_spark.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketing_test "
              f"LOCATION '{warehouse}'")
    orders = load_table(spark, "orders", SF_DIR)
    customer = load_table(spark, "customer", SF_DIR)
    write_bucketed(orders, "bucketing_test.orders_b", "o_custkey", 8)
    write_bucketed(customer, "bucketing_test.customer_b", "c_custkey", 8)
    yield "bucketing_test.orders_b", "bucketing_test.customer_b"
    spark.sql("DROP DATABASE bucketing_test CASCADE")


def _joined(spark, orders_name, customer_name):
    o = read_bucketed(spark, orders_name)
    c = read_bucketed(spark, customer_name)
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


def test_bucketed_join_plans_without_exchange(spark, bucketed_pair):
    # disable broadcast so the join exercises the sort-merge path the
    # bucketing is designed to feed (broadcast would hide the shuffle
    # question entirely)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _joined(spark, *bucketed_pair)._jdf.queryExecution() \
            .executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    # no shuffle anywhere below the join: the bucket layout feeds the
    # join's partitioning requirement directly. The aggregate above the
    # join is also exchange-free: hash(o_custkey) partitioning doesn't
    # satisfy groupBy(c_mktsegment), BUT AQE plans that exchange only
    # at runtime — the compiled plan must show none under the join.
    below_join = plan[plan.index("SortMergeJoin"):]
    assert "Exchange hashpartitioning(o_custkey" not in plan
    assert "Exchange hashpartitioning(c_custkey" not in plan
    assert below_join.count("Exchange") <= 1  # only the final groupBy


def test_bucketed_join_matches_shuffled_join(spark, bucketed_pair):
    bucketed = {tuple(r) for r in _joined(spark, *bucketed_pair).collect()}
    o = load_table(spark, "orders", SF_DIR)
    c = load_table(spark, "customer", SF_DIR)
    plain = {
        tuple(r)
        for r in (
            o.join(c, o["o_custkey"] == c["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue"))
            .collect()
        )
    }
    assert bucketed == plain


def test_bucketed_groupby_key_aggregate_is_exchange_free(spark, bucketed_pair):
    orders_name, _ = bucketed_pair
    agg = (read_bucketed(spark, orders_name)
           .groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s")))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # bucket layout satisfies the agg
