"""operators/prefix.py: the two-pass distributed prefix sum must equal
the naive single-partition global window bit-for-bit, and its plan must
never contain a partitionBy-less window over the real data."""

import os
import sys

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark.operators.prefix import with_prefix_sum  # noqa: E402


def _naive(df, order_col, value_col, out_col):
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out_col, F.sum(value_col).over(w))


@pytest.mark.parametrize("n_rows,n_parts", [(1, 4), (7, 4), (1000, 8), (1000, 1)])
def test_matches_naive_global_window(spark, n_rows, n_parts):
    df = spark.range(n_rows).select(
        F.col("id").alias("k"),
        # signed, varied values incl. zeros
        ((F.col("id") * 37) % 11 - 3).alias("v"),
    )
    got = sorted(
        (r.k, r.cs)
        for r in with_prefix_sum(df, "k", "v", "cs", num_partitions=n_parts).collect()
    )
    want = sorted((r.k, r.cs) for r in _naive(df, "k", "v", "cs").collect())
    assert got == want


def test_null_values_contribute_nothing(spark):
    rows = [(1, 5), (2, None), (3, 2)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {r.k: r.cs for r in with_prefix_sum(df, "k", "v", "cs").collect()}
    # sum() skips nulls: row 2 carries the running total forward, even
    # when the null lands alone in a range partition (32 partitions for
    # 3 rows guarantees it does)
    assert got == {1: 5, 2: 5, 3: 7}


def test_leading_nulls_stay_null(spark):
    """The naive window returns NULL until the first non-null value;
    the two-pass version must too (all-null local frame + zero prefix
    count), not coalesce to 0."""
    rows = [(1, None), (2, None), (3, 4), (4, None)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {r.k: r.cs for r in with_prefix_sum(df, "k", "v", "cs").collect()}
    want = {r.k: r.cs for r in _naive(df, "k", "v", "cs").collect()}
    assert got == want == {1: None, 2: None, 3: 4, 4: 4}


def test_no_global_window_over_data(spark):
    """The only partitionBy-less window may run over the #partitions-row
    totals table; the data-sized window must be keyed by the partition
    id. Assert the plan splits the work: a range exchange for the data,
    a SinglePartition exchange only downstream of the tiny aggregate."""
    df = spark.range(10000).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    plan = (
        with_prefix_sum(df, "k", "v", "cs", num_partitions=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one single-partition exchange, feeding the totals window
    assert plan.count("Exchange SinglePartition") == 1
    # and the only hash exchange moves PARTIAL AGGREGATES (one row per
    # input partition), never the data: a window partitioned by the pid
    # column would re-shuffle the full dataset a second time because the
    # checkpoint exposes no outputPartitioning (the bug this pins)
    lines = plan.splitlines()
    hash_ex = [i for i, ln in enumerate(lines) if "Exchange hashpartitioning" in ln]
    assert len(hash_ex) == 1, plan
    assert "partial_sum" in lines[hash_ex[0] + 1], plan
    # the local running sum is the Arrow kernel over the in-place sort
    assert "MapInPandas" in plan
    # the only Window is the #partitions-row offsets scan
    assert plan.count("Window") == 1
