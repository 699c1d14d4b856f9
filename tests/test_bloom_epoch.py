"""docs_bloom_dedup (constant-space membership pre-filter for the
incremental crawl loop) and docs_epoch_shuffle (deterministic global
training-order deal) on planted fixtures: the SF tables carry almost no
exact dups, so these tests build a tiny documents.parquet where the
dup structure is known exactly."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark import queries as Q  # noqa: E402

SF = "/root/testdata/sf0.001"


def _plant(spark, tmp_path, rows):
    """rows: list of (doc_id, text). Writes a documents.parquet with the
    production schema; returns the sf_dir to point queries at."""
    df = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_bloom_no_false_negatives_and_exact_verdicts(spark, tmp_path):
    """Incoming docs (doc_id % INCR_MOD == 0) probe a filter built from
    the committed rest. Planted: two incoming docs duplicate committed
    text byte-for-byte, one duplicates another INCOMING doc (must NOT
    flag — the filter holds committed fingerprints only), the rest are
    unique. exact_dup must equal the planted committed-dup set exactly,
    and bloom_hit must cover it (a Bloom filter never false-negatives)."""
    assert Q.INCR_MOD == 5
    committed = [(i, f"committed text {i}") for i in (1, 2, 3, 4, 6, 7, 8, 9)]
    incoming = [
        (5, "committed text 1"),   # dup of committed
        (10, "committed text 7"),  # dup of committed
        (15, "only in incoming"),  # unique
        (20, "only in incoming"),  # dup of 15 — but 15 is incoming: not a dup
        (25, "fresh unique text"),
    ]
    sf_dir = _plant(spark, tmp_path, committed + incoming)
    got = {r.doc_id: r for r in Q.docs_bloom_dedup(spark, sf_dir).collect()}

    assert set(got) == {5, 10, 15, 20, 25}
    want_dup = {5: True, 10: True, 15: False, 20: False, 25: False}
    assert {i: r.exact_dup for i, r in got.items()} == want_dup
    for i, is_dup in want_dup.items():
        if is_dup:
            assert got[i].bloom_hit, f"doc {i}: Bloom false negative"
    # a non-hit can never be a dup (verification is candidate-pruned)
    for r in got.values():
        if not r.bloom_hit:
            assert not r.exact_dup


def test_bloom_matches_committed_semijoin_on_sf(spark):
    """On the real SF table the Bloom path's exact_dup must equal the
    plain committed-fingerprint semi-join it replaces (same split)."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    from basicocr_spark.functions import hash_kernels as HK

    fp = d.select(
        "doc_id",
        (F.col("doc_id") % Q.INCR_MOD == 0).alias("is_in"),
        HK.poly_hash_kernel(F.col("text")).alias("fp"),
    )
    want = {
        r.doc_id: r.dup
        for r in fp.filter("is_in")
        .join(
            fp.filter("NOT is_in").select("fp").distinct().withColumn("dup", F.lit(True)),
            "fp",
            "left",
        )
        .select("doc_id", F.coalesce("dup", F.lit(False)).alias("dup"))
        .collect()
    }
    got = {r.doc_id: r.exact_dup for r in Q.docs_bloom_dedup(spark, SF).collect()}
    assert got == want


def test_epoch_shuffle_is_a_deterministic_permutation(spark):
    rows = Q.docs_epoch_shuffle(spark, SF).collect()
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sorted(r.pos for r in rows) == list(range(1, n + 1))
    # pos order == (shuffle_key, doc_id) order: the prefix-sum rank agrees
    # with a driver-side sort of the same keys
    by_pos = [(r.shuffle_key, r.doc_id) for r in sorted(rows, key=lambda r: r.pos)]
    assert by_pos == sorted(by_pos)
    # deterministic: a second run deals the identical order
    again = {r.doc_id: r.pos for r in Q.docs_epoch_shuffle(spark, SF).collect()}
    assert again == {r.doc_id: r.pos for r in rows}


def test_epoch_shuffle_shards_are_balanced_and_scramble_the_input(spark):
    rows = Q.docs_epoch_shuffle(spark, SF).collect()
    n = len(rows)
    counts = {}
    for r in rows:
        assert r.shard == (r.pos - 1) % Q.EPOCH_SHARDS
        counts[r.shard] = counts.get(r.shard, 0) + 1
    assert set(counts) == set(range(Q.EPOCH_SHARDS))
    assert max(counts.values()) - min(counts.values()) <= 1
    # it actually shuffles: the dealt order must not be doc_id order
    by_pos = [r.doc_id for r in sorted(rows, key=lambda r: r.pos)]
    assert by_pos != sorted(by_pos)
    # ... and n/8 in-order prefix docs don't all land in shard 0
    first_ids = sorted(rows, key=lambda r: r.doc_id)[: n // Q.EPOCH_SHARDS]
    assert len({next(r.shard for r in rows if r.doc_id == fid.doc_id) for fid in first_ids}) > 1
