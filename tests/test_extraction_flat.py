"""Flat-layout extraction (repartitionByRange + sortWithinPartitions +
cumcount order — the W4 stitch) vs the golden extraction."""

from pyspark.sql import functions as F

from basicocr_spark.fixtures import STOP_TERMS
from basicocr_spark.operators.extraction import extract_spans_flat, flatten_extracted


def _flat_input(fx):
    return fx["documents"].select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )


def test_flat_extraction_matches_golden(spark, fx):
    logits_rows = [
        (r.media_ref, [list(x) for x in r.logits], r.gold_text)
        for r in fx["media_logits"].collect()
    ]
    out = extract_spans_flat(
        _flat_input(fx), logits_rows, fx["dict_lines"], STOP_TERMS, n_partitions=5
    )
    gold = flatten_extracted(fx["golden"])
    got_n, want_n = out.count(), gold.count()
    assert got_n == want_n
    assert out.exceptAll(gold.select(*out.columns)).count() == 0
    assert gold.select(*out.columns).exceptAll(out).count() == 0


def test_flat_extraction_small_batches_cross_boundary(spark, fx):
    """Force tiny Arrow batches so heavy docs straddle batch boundaries —
    the cumcount carry must keep `order` continuous."""
    logits_rows = [
        (r.media_ref, [list(x) for x in r.logits], r.gold_text)
        for r in fx["media_logits"].collect()
    ]
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        out = extract_spans_flat(
            _flat_input(fx), logits_rows, fx["dict_lines"], STOP_TERMS, n_partitions=3
        )
        gold = flatten_extracted(fx["golden"])
        assert out.exceptAll(gold.select(*out.columns)).count() == 0
        assert gold.select(*out.columns).exceptAll(out).count() == 0
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
