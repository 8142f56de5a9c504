"""Bucketed fact-fact join (SCALE.md): writing both facts bucketed on
the join key makes the orders⋈lineitem join shuffle-free — the plan
shows a SortMergeJoin with NO Exchange on either side. This is the
100 TB co-location strategy, proven here on a local warehouse."""

from __future__ import annotations

import pytest

from flight_data_pipeline_spark.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    # external tables via .option("path") — the session's static
    # warehouse dir can't change at runtime and isn't needed
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (load_table(spark, name, SF_DIR)
         .write.mode("overwrite").bucketBy(8, key).sortBy(key)
         .option("path", str(wh / f"b_{name}"))
         .saveAsTable(f"b_{name}"))
    # at sf0.001 Catalyst rightly broadcasts the small side; disable
    # auto-broadcast to simulate the 100 TB case (neither fact fits)
    # and surface the bucketed sort-merge path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(bucketed):
    spark = bucketed
    joined = spark.table("b_orders").join(
        spark.table("b_lineitem"),
        spark.table("b_orders")["o_orderkey"] == spark.table("b_lineitem")["l_orderkey"],
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must not shuffle either fact"


def test_bucketed_join_matches_plain_join(bucketed):
    spark = bucketed
    n_bucketed = (
        spark.table("b_orders").join(
            spark.table("b_lineitem"),
            spark.table("b_orders")["o_orderkey"]
            == spark.table("b_lineitem")["l_orderkey"],
        ).count()
    )
    o = load_table(spark, "orders", SF_DIR)
    li = load_table(spark, "lineitem", SF_DIR)
    n_plain = o.join(li, o["o_orderkey"] == li["l_orderkey"]).count()
    assert n_bucketed == n_plain
