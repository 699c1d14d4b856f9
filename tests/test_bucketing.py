"""Bucketed tables co-locate their joins: writing both sides bucketed
by the join key lets a sort-merge join run with ZERO Exchange — the
standard trick for a fact table that is joined on the same key every
day (at 100 TB the avoided shuffle is most of the job). Pinned here
because it is a property of the WRITE path (sources/files has the
reader story; this is the layout story): same bucket count, same key,
spark.sql.sources.bucketing.enabled on (default)."""

import os
import sys
import uuid

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    """Two tables bucketed 8 ways by doc_id in a throwaway database."""
    db = f"bkt_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {db}")
    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("score")
    )
    stats = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 13).alias("n_dups")
    )
    for name, df in (("docs", docs), ("stats", stats)):
        (
            df.write.mode("overwrite")
            .bucketBy(8, "doc_id")
            .sortBy("doc_id")
            .saveAsTable(f"{db}.{name}")
        )
    yield db
    spark.sql(f"DROP DATABASE {db} CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    db = bucketed
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # disable broadcast so the test exercises the big-big join shape the
    # layout exists for (two 100 TB sides, neither broadcastable)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(f"{db}.docs").join(spark.table(f"{db}.stats"), "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_has_no_exchange(spark, bucketed):
    """groupBy on the bucket key reuses the layout too: partial+final
    collapse into one stage with no shuffle."""
    db = bucketed
    agg = spark.table(f"{db}.docs").groupBy("doc_id").agg(F.sum("score").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 10_000


def test_unbucketed_baseline_does_shuffle(spark):
    """Control: the identical join over plain DataFrames shuffles both
    sides (broadcast disabled to force the comparison), proving the
    bucketed layout is what removed the Exchange."""
    docs = spark.range(10_000).select(F.col("id").alias("doc_id"))
    stats = spark.range(10_000).select(F.col("id").alias("doc_id"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            docs.join(stats, "doc_id")._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange hashpartitioning" in plan
