"""Bucketed-layout joins: co-bucketed tables join with ZERO exchanges
(the pay-the-shuffle-once layout claim in SCALE.md, made checkable)."""

from __future__ import annotations

import pytest

from tests.test_plans import plan_of
from wing_binlog_go_spark.operators.bucketing import cobucketed_join, write_bucketed
from wing_binlog_go_spark.tables import read_table


@pytest.fixture()
def no_broadcast(spark):
    """Force the SMJ path so the exchange-elision is what's under test
    (small sf tables would otherwise broadcast)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cobucketed_join_has_no_exchange(spark, sf_small, no_broadcast):
    li = read_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_quantity", "l_linenumber"
    )
    od = read_table(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", "l_orderkey", num_buckets=8)
    write_bucketed(
        od.withColumnRenamed("o_orderkey", "l_orderkey"), "od_b", "l_orderkey", 8
    )

    joined = cobucketed_join(spark, "li_b", "od_b", "l_orderkey")
    p = plan_of(joined)
    assert "SortMergeJoin" in p
    assert "Exchange" not in p, p  # the layout paid the shuffle already

    # results identical to the plain (shuffling) join
    plain = li.join(
        od.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
    )
    a = sorted(map(tuple, joined.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b and a


def test_bucketed_aggregation_skips_exchange(spark, sf_small, no_broadcast):
    """A groupBy on the bucket key also reuses the layout partitioning."""
    li = read_table(spark, sf_small, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(li, "li_agg_b", "l_orderkey", num_buckets=8)
    from pyspark.sql import functions as F

    agg = spark.table("li_agg_b").groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    p = plan_of(agg)
    assert "Exchange" not in p, p
