"""Streaming surface: foreachBatch extraction with snapshot commits, and
watermarked windowed aggregation driven to completion on file sources."""

import os

from pyspark.sql import functions as F

from basicocr_spark.fixtures import STOP_TERMS
from basicocr_spark.operators.extraction import flatten_extracted
from basicocr_spark.plans.checkpoint import SnapshotWriter
from basicocr_spark.streaming.pipeline import streaming_extraction, windowed_event_counts


def test_streaming_extraction_exactly_once(spark, fx, tmp_path):
    input_dir = str(tmp_path / "in")
    fx["documents"].repartition(6).write.mode("overwrite").parquet(input_dir)
    ckpt_root = str(tmp_path / "snap")
    logits_rows = [
        (r.media_ref, [list(x) for x in r.logits], r.gold_text)
        for r in fx["media_logits"].collect()
    ]
    q = streaming_extraction(
        spark,
        input_dir,
        ckpt_root,
        logits_rows,
        fx["dict_lines"],
        STOP_TERMS,
        str(tmp_path / "stream_ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    w = SnapshotWriter(spark, ckpt_root)
    out = w.read_committed()
    n_docs = fx["documents"].count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
    # streamed result == golden extraction, span for span
    got = flatten_extracted(out)
    gold = flatten_extracted(fx["golden"])
    assert got.exceptAll(gold).count() == 0
    assert gold.exceptAll(got).count() == 0


def test_windowed_event_counts_matches_batch(spark, tmp_path):
    from basicocr_spark import schemas  # noqa: F401

    import shutil

    ev_path = "/root/testdata/sf0.001/events.parquet"
    ev_dir = str(tmp_path / "events_stream")
    os.makedirs(ev_dir, exist_ok=True)
    shutil.copy(ev_path, os.path.join(ev_dir, "part-0.parquet"))
    batch = spark.read.parquet(ev_path)
    stream = spark.readStream.schema(batch.schema).parquet(ev_dir)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(
        "SELECT window_start, event_type, n FROM win_counts"
    ).collect()
    want = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) > 0
