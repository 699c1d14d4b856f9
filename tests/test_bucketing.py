"""Bucketed tables co-locate joins: writing both join sides bucketed by
the key lets the sort-merge join run with ZERO Exchange — the 100 TB
pattern for repeated fact-fact joins (SURVEY.md §4 'explicit code')."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # warehouse dir is a static conf — use the session default (cwd
    # spark-warehouse, gitignored) and clean the tables up after
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_b")
    )
    (
        orders.withColumnRenamed("o_orderkey", "l_orderkey")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("ord_b")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def test_bucketed_join_has_no_exchange(bucketed):
    spark = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("li_b")
            .join(spark.table("ord_b"), "l_orderkey")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # join itself must not shuffle either side (bucket co-location);
        # only the final groupBy aggregation may exchange
        join_part = plan.split("HashAggregate")[-1]
        assert "Exchange" not in join_part, join_part[:800]
        # and it must still be correct
        n = joined.agg(F.sum("n")).first()[0]
        want = (
            spark.read.parquet(f"{SF}/lineitem.parquet")
            .join(
                spark.read.parquet(f"{SF}/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert n == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
