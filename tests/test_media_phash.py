"""Perceptual image-hash dedup over the media column: media_dhash
(Arrow-batched dHash) + hamming_ball_pairs. Pins planted near-dup
structure (clones at hamming 0, perturbed re-encodes in the <=6 ball,
distinct images unpaired, corrupt blobs skipped) and the numpy kernel
vs the pure-Python reference dHash."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark import fixture_queries as FQ  # noqa: E402
from basicocr_spark.fixture_queries import (  # noqa: E402
    _phash_fixture_reference_pairs,
    _reference_dhash,
)
from basicocr_spark.operators.multimodal import (  # noqa: E402
    build_phash_blob_table,
    media_dhash,
)


def test_kernel_matches_pure_python_reference(spark):
    blobs = build_phash_blob_table(spark)
    got = {r["media_ref"]: r["phash"] for r in media_dhash(blobs).collect()}
    want = {}
    for row in blobs.collect():
        h = _reference_dhash(bytes(row["content"]))
        if h is not None:
            want[row["media_ref"]] = h
    assert got == want
    assert "imgbad" not in got  # corrupt blob skipped


def test_planted_structure_recovered(spark):
    pairs = sorted(
        tuple(r) for r in FQ.media_phash_near_dup_fixture(spark, "unused").collect()
    )
    assert pairs == _phash_fixture_reference_pairs()
    by_pair = {(a, b): h for a, b, h in pairs}
    # every byte-exact clone is found at hamming 0
    for i in range(0, 12, 4):
        ref = f"img{i:04d}-{chr(97 + i)}{i * i + 7}"
        assert by_pair.get((ref, f"{ref}_clone")) == 0, (ref, by_pair)
    # every perturbed re-encode is found at a small nonzero distance
    for i in range(0, 12, 3):
        ref = f"img{i:04d}-{chr(97 + i)}{i * i + 7}"
        ham = by_pair.get((ref, f"{ref}_near"))
        assert ham is not None and 0 < ham <= FQ.MEDIA_PHASH_HAM_MAX, (ref, ham)
    # distinct base images never pair with each other
    for a, b in by_pair:
        base_a, base_b = a.split("_")[0], b.split("_")[0]
        assert base_a == base_b, (a, b)


def test_pairs_beyond_ball_excluded(spark):
    """A heavily corrupted variant (many rows perturbed) must leave the
    hamming ball and emit no pair."""
    from pyspark.sql import functions as F  # noqa: F401

    from basicocr_spark import queries as Q
    from basicocr_spark.operators.multimodal import (
        MEDIA_BLOB,
        encode_fake_image,
        perturb_fake_image,
    )

    base = encode_fake_image("heavy", 96, 32)
    far = perturb_fake_image(base, tuple(range(0, 32, 2)), frac=1.0)
    assert (
        bin(
            (_reference_dhash(base) ^ _reference_dhash(far)) & ((1 << 64) - 1)
        ).count("1")
        > FQ.MEDIA_PHASH_HAM_MAX
    )
    blobs = spark.createDataFrame(
        [
            ("heavy", base, "image/x-bocr", 96, 32),
            ("heavy_far", far, "image/x-bocr", 96, 32),
        ],
        schema=MEDIA_BLOB,
    )
    hashes = media_dhash(blobs).localCheckpoint()
    pairs = Q.hamming_ball_pairs(
        hashes, "phash", "media_ref", 8, FQ.MEDIA_PHASH_HAM_MAX, "ref_a", "ref_b"
    ).collect()
    assert pairs == []
