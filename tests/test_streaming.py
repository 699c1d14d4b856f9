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


def test_streaming_dedup_drops_exact_duplicates(spark, tmp_path):
    """deduped_doc_stream must keep one doc per identical content
    fingerprint across microbatches, bounded-state via the watermark."""
    import os
    import shutil

    from basicocr_spark.streaming.pipeline import deduped_doc_stream

    rows = [
        ("a", [("text", "same body", None, 1)], "2024-01-01 00:00:01"),
        ("b", [("text", "same body", None, 1)], "2024-01-01 00:00:02"),  # dup of a
        ("c", [("text", "other body", None, 1)], "2024-01-01 00:00:03"),
        ("d", [("media", None, "m01", 1)], "2024-01-01 00:00:04"),
        ("e", [("media", None, "m01", 1)], "2024-01-01 00:00:05"),  # dup of d
    ]
    schema = (
        "doc_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
        "event_ts string"
    )
    batch = spark.createDataFrame(rows, schema)
    d = str(tmp_path / "docs_stream")
    os.makedirs(d, exist_ok=True)
    batch.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(batch.schema).parquet(d)
    out = deduped_doc_stream(stream, watermark="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    kept = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM dedup_stream").collect()}
    # one survivor per fingerprint group: {a,b} -> one, {c}, {d,e} -> one
    assert len(kept) == 3
    assert "c" in kept
    assert len(kept & {"a", "b"}) == 1
    assert len(kept & {"d", "e"}) == 1


def test_streaming_dedup_kind_participates_in_fingerprint(spark, tmp_path):
    """A text span whose content equals a media span's ref must NOT
    collide: canonicalization covers kind and null fields, not just a
    flattened text join."""
    import os

    from basicocr_spark.streaming.pipeline import deduped_doc_stream

    rows = [
        ("t", [("text", "m01", None, 1)], "2024-01-01 00:00:01"),
        ("m", [("media", None, "m01", 1)], "2024-01-01 00:00:02"),
        ("n", [("text", None, None, 1), ("text", "a", None, 2)], "2024-01-01 00:00:03"),
        ("o", [("text", "a", None, 1)], "2024-01-01 00:00:04"),
    ]
    schema = (
        "doc_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
        "event_ts string"
    )
    batch = spark.createDataFrame(rows, schema)
    d = str(tmp_path / "docs_stream2")
    os.makedirs(d, exist_ok=True)
    batch.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(batch.schema).parquet(d)
    q = (
        deduped_doc_stream(stream).writeStream.outputMode("append")
        .format("memory").queryName("dedup_kinds")
        .option("checkpointLocation", str(tmp_path / "ck2")).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    kept = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM dedup_kinds").collect()}
    assert kept == {"t", "m", "n", "o"}  # all four are distinct documents


def test_streaming_dedup_state_expires_after_watermark(spark, tmp_path):
    """The bounded-state contract, both directions: a duplicate arriving
    within the watermark interval is dropped; one arriving after the
    fingerprint's state has expired is re-admitted (that eviction is
    exactly what keeps state bounded at crawl scale — a batch dedup pass
    downstream catches long-range duplicates)."""
    import os

    from basicocr_spark.streaming.pipeline import deduped_doc_stream

    schema = (
        "doc_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
        "event_ts string"
    )
    d = str(tmp_path / "docs_exp")
    os.makedirs(d, exist_ok=True)
    span = [("text", "same content", None, 1)]

    def write_batch(rows):
        # each call appends one part file; maxFilesPerTrigger=1 then
        # sequences the microbatches in write order
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(d)

    # batch 1: original at t0 + an in-window duplicate
    write_batch([("orig", span, "2024-01-01 00:00:00"),
                 ("dup_in_window", span, "2024-01-01 00:10:00")])
    stream = spark.readStream.schema(
        spark.read.parquet(d).schema
    ).option("maxFilesPerTrigger", 1).parquet(d)
    q = (
        deduped_doc_stream(stream, watermark="30 minutes")
        .writeStream.outputMode("append").format("memory").queryName("dedup_exp")
        .option("checkpointLocation", str(tmp_path / "ck_exp")).start()
    )
    try:
        q.processAllAvailable()
        # batch 2: advance event time far past the watermark so the
        # fingerprint's state is evicted...
        write_batch([("advancer", [("text", "different content", None, 1)],
                      "2024-01-01 05:00:00")])
        q.processAllAvailable()
        # ...then the same content arrives again, hours later
        write_batch([("dup_after_expiry", span, "2024-01-01 06:00:00")])
        q.processAllAvailable()
    finally:
        q.stop()
    kept = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM dedup_exp").collect()}
    assert "orig" in kept and "advancer" in kept
    assert "dup_in_window" not in kept  # dropped: same fingerprint, in window
    assert "dup_after_expiry" in kept  # re-admitted: state evicted
