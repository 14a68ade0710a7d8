"""Bucketed co-located join: writing both fact tables bucketed by the join
key makes the lineitem-orders join shuffle-free — the 100 TB strategy for
repeated fact-fact joins (README scale stance). The plan must show a
sort-merge join with no Exchange on either side."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


def _ops(plan: str, op: str) -> int:
    return len(re.findall(rf"\(\d+\) {op}", plan))


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    # managed tables land in the session's default warehouse; dropped below
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").format("parquet").saveAsTable("li_bucketed")
    )
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").format("parquet").saveAsTable("ord_bucketed")
    )

    # disable auto-broadcast so the join strategy is driven by bucketing
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("li_bucketed")
            .join(spark.table("ord_bucketed"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert _ops(plan, "SortMergeJoin") == 1
        # no shuffle below the join: the only Exchange is the final groupBy
        join_part = plan.split("HashAggregate")[0]
        assert "Exchange" not in join_part.split("(1) Scan")[0] or True
        # strongest check: count exchanges in the whole plan — only the
        # aggregation's single shuffle may appear
        assert _ops(plan, "Exchange") == 1
        # results still correct vs the unbucketed join
        direct = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        got = {r["o_orderstatus"]: round(r["qty"], 2) for r in j.collect()}
        want = {r["o_orderstatus"]: round(r["qty"], 2) for r in direct.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS ord_bucketed")
