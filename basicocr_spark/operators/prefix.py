"""Distributed prefix sums — the two-pass pattern that replaces the
single-reducer global window.

`F.sum(v).over(Window.orderBy(k))` with no partitionBy collapses the
whole table into ONE window partition: at 10^12 rows that task is the
job. The classic fix (Blelloch scan, and what every MPP engine does
internally) is two passes over a range partitioning:

  1. range-partition by the order key, so partition p holds a
     contiguous key range and partitions are themselves ordered;
  2. per-partition totals (one tiny row per partition);
  3. an exclusive cumsum over those totals — #partitions rows, so the
     driver-side window is free — broadcast back as per-partition
     offsets;
  4. a partition-LOCAL cumulative window (partitionBy the partition id)
     plus the broadcast offset.

Every wide operation touches either the range exchange (unavoidable:
the result is defined by global order) or a #partitions-row table; no
task ever sees more than one partition of real data.

No reference analog (the reference is single-process; its running
totals are utils.py:104-129 accumulators) — this is the Spark-native
re-expression the corpus operators need (sequence packing, token
budget splits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__prefix_pid"
_OFF = "__prefix_off"


def with_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str | Column,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds `out_col` = inclusive prefix sum of `value_col` in global
    `order_col` order (ties must not exist: the caller orders by a key).
    The result is partitioning-independent; the range boundaries only
    decide WHERE the work runs."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    rp = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
        # checkpoint: the partition id must be IDENTICAL in the totals
        # pass and the join-back pass; without it the two plan branches
        # re-execute the range exchange independently and a lost
        # executor could re-sample different range boundaries
    )
    totals = rp.groupBy(_PID).agg(
        F.sum(val).alias("_tot"), F.count(val).alias("_cnt")
    )
    w_off = (
        Window.orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # single-partition window over #partitions rows — free by design
    offsets = totals.select(
        _PID,
        F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias(_OFF),
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias(_OFF + "_cnt"),
    )
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # exact global-window null semantics: the running sum is NULL until
    # the first non-null value ANYWHERE in the prefix (F.sum skips nulls
    # but returns NULL over an all-null frame), which the local frame
    # alone can't see — hence the prefix non-null counts
    local_sum = F.sum(val).over(w_local)
    local_cnt = F.count(val).over(w_local)
    out = F.when(local_cnt + F.col(_OFF + "_cnt") == 0, F.lit(None)).otherwise(
        F.coalesce(local_sum, F.lit(0)) + F.col(_OFF)
    )
    return (
        rp.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, out)
        .drop(_PID, _OFF, _OFF + "_cnt")
    )
