"""Structured Streaming surface for the extraction engine.

The reference is entirely batch (SURVEY.md §2.8) — its only incremental
behaviors are periodic validate/checkpoint in the training loop
(crnn_main.py:229-235). The batch extraction pipeline is embarrassingly
parallel per document, so it drops into `foreachBatch` unchanged; that
plus a watermarked windowed aggregate (for the events stream) gives the
engine a streaming story without inventing semantics the reference
doesn't have.

- `streaming_extraction(...)`: file-source stream of interleaved docs ->
  per-microbatch fused extraction -> snapshot-commit via SnapshotWriter
  (exactly-once through idempotent doc_id-anti-join + atomic commit).
- `windowed_event_counts(...)`: watermark + tumbling-window agg, the
  canonical late-data-tolerant rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas as S
from ..operators.extraction import extract_documents_fused
from ..plans.checkpoint import SnapshotWriter


def streaming_extraction(
    spark: SparkSession,
    input_dir: str,
    ckpt_root: str,
    logits_rows: list[tuple],
    dict_lines: list[str],
    stop_terms: list[str],
    stream_checkpoint_dir: str,
):
    """readStream over a parquet directory of interleaved documents;
    each microbatch runs the fused pipeline and snapshot-commits. The
    doc_id anti-join inside `pending` makes redelivered batches no-ops,
    so end-to-end semantics stay exactly-once even on replay."""
    writer = SnapshotWriter(spark, ckpt_root)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        pending = writer.pending(batch_df)
        if pending.isEmpty():
            return
        out = extract_documents_fused(pending, logits_rows, dict_lines, stop_terms)
        writer.commit(out, snapshot_id=f"epoch{epoch_id:06d}")

    stream = (
        spark.readStream.schema(S.DOCUMENTS)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", stream_checkpoint_dir)
        .outputMode("update")
        .start()
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts per event_type.

    Event time must be TIMESTAMP (not NTZ) for watermarking; with the
    session pinned to UTC the cast is instant-preserving."""
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    win = (
        F.window("ts", window) if slide is None else F.window("ts", window, slide)
    )
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(win, "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
