"""Distributed prefix sums — the two-pass pattern that replaces the
single-reducer global window.

`F.sum(v).over(Window.orderBy(k))` with no partitionBy collapses the
whole table into ONE window partition: at 10^12 rows that task is the
job. The classic fix (Blelloch scan, and what every MPP engine does
internally) is two passes over a range partitioning:

  1. range-partition by the order key, so partition p holds a
     contiguous key range and partitions are themselves ordered;
  2. per-partition totals + non-null counts (one tiny row per
     partition);
  3. an exclusive cumsum over those totals — #partitions rows, so the
     single-partition window is free — broadcast back as per-partition
     offsets;
  4. a partition-LOCAL running sum: sortWithinPartitions(order key),
     then one Arrow kernel pass that carries the running total across
     batches and adds the broadcast offset.

Step 4 is deliberately NOT `F.sum.over(Window.partitionBy(pid))`: the
checkpointed exchange output exposes no outputPartitioning, so Catalyst
would insert a SECOND full-data `Exchange hashpartitioning(pid)` just
to satisfy the window's required distribution (verified on the executed
plan; tests/test_prefix.py pins its absence). The broadcast join + sort
+ mapInPandas chain runs entirely within the range exchange's
partitions, so the data is shuffled exactly once.

No reference analog (the reference is single-process; its running
totals are utils.py:104-129 accumulators) — this is the Spark-native
re-expression the corpus operators need (sequence packing, token
budget splits).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PID = "__prefix_pid"
_OFF = "__prefix_off"
_VAL = "__prefix_val"


def with_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str | Column,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds `out_col` = inclusive prefix sum of `value_col` in global
    `order_col` order (ties must not exist: the caller orders by a key).
    Null semantics match the naive global window exactly: nulls
    contribute nothing, and the running sum is NULL until the first
    non-null value anywhere in the prefix. The result is
    partitioning-independent; the range boundaries only decide WHERE
    the work runs.

    Float caveat: partitioning-independence is BIT-exact for integral
    values only. For doubles, the per-partition-total + local-cumsum
    summation order can drift in the last ulp versus a single-partition
    window's strict left-to-right order — double-valued callers needing
    bit-exact parity with a global window should round at the consumer
    (current callers are all long-valued)."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    rp = (
        df.withColumn(_VAL, val)
        .repartitionByRange(n, F.col(order_col))
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
        # checkpoint: the partition id must be IDENTICAL in the totals
        # pass and the join-back pass; without it the two plan branches
        # re-execute the range exchange independently and a lost
        # executor could re-sample different range boundaries
    )
    totals = rp.groupBy(_PID).agg(
        F.sum(_VAL).alias("_tot"), F.count(_VAL).alias("_cnt")
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
    joined = rp.join(F.broadcast(offsets), _PID).sortWithinPartitions(order_col)

    integral = isinstance(
        joined.schema[_VAL].dataType, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    )
    out_field = T.StructField(out_col, T.LongType() if integral else T.DoubleType())
    out_schema = T.StructType(
        [f for f in joined.schema.fields if f.name not in (_PID, _OFF, _OFF + "_cnt", _VAL)]
        + [out_field]
    )
    keep = [f.name for f in out_schema.fields if f.name != out_col]

    def gen(batches):
        # one generator invocation == one partition; batches arrive in
        # the sortWithinPartitions order, so running state is exact
        run_sum = 0
        run_cnt = 0
        off = None
        off_cnt = None
        for pdf in batches:
            if off is None and len(pdf):
                off = pdf[_OFF].iloc[0]
                off_cnt = pdf[_OFF + "_cnt"].iloc[0]
            v = pdf[_VAL]
            mask = v.notna()
            filled = v.fillna(0)
            if integral:
                filled = filled.astype("int64")
            cs = filled.cumsum() + (run_sum + (off or 0))
            cnt_prefix = mask.cumsum() + (run_cnt + (off_cnt or 0))
            out = pd.Series(cs, dtype="Int64" if integral else "Float64")
            out[cnt_prefix == 0] = pd.NA
            run_sum += int(filled.sum()) if integral else float(filled.sum())
            run_cnt += int(mask.sum())
            res = pdf[keep].copy()
            res[out_col] = out
            yield res

    return joined.mapInPandas(gen, schema=out_schema)
