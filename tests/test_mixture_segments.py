"""Behavioral pins for the round-5 mixture/segment operators: generic
oracle parity can't tell 'both engines agree every doc is unique' from a
real detection, so plant duplicated segments and assert the verdicts,
and check the temperature weights against a hand-computed closed form."""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark import queries as Q  # noqa: E402

# 8-token duplicated run shared by three docs; doc 3 embeds the same
# words but offset by two tokens, so its single segment differs; docs
# 4/5 are shorter than one segment; doc 6 is half-duplicated (16 tokens:
# the shared run + 8 unique tokens).
SHARED = "alpha beta gamma delta epsilon zeta eta theta"
DOCS = [
    (0, SHARED, "en", "s0"),
    (1, SHARED, "en", "s0"),
    (2, SHARED + " iota kappa lamda mu nu xi omicron pi", "en", "s1"),
    (3, "intro words " + SHARED, "zh", "s1"),
    (4, "tiny doc", "zh", "s1"),
    (5, "", "zh", "s1"),
]


@pytest.fixture(scope="module")
def seg_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("seg_sf"))
    spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def test_segment_dedup_verdicts(spark, seg_dir):
    rows = {
        r["doc_id"]: r
        for r in Q.docs_segment_dedup(spark, seg_dir).collect()
    }
    assert len(rows) == len(DOCS)
    # fully duplicated single-segment docs: dropped
    for i in (0, 1):
        assert rows[i]["n_segments"] == 1
        assert rows[i]["n_dup_segments"] == 1
        assert rows[i]["dup_frac"] == 1.0
        assert rows[i]["keep"] is False
    # half-duplicated doc sits exactly at the 0.5 gate: kept
    assert rows[2]["n_segments"] == 2
    assert rows[2]["n_dup_segments"] == 1
    assert rows[2]["keep"] is True
    # offset embedding changes the segment content: unique, kept
    assert rows[3]["n_segments"] == 1
    assert rows[3]["n_dup_segments"] == 0
    assert rows[3]["keep"] is True
    # sub-segment-length and empty docs: no segments, kept
    for i in (4, 5):
        assert rows[i]["n_segments"] == 0
        assert rows[i]["dup_frac"] == 0.0
        assert rows[i]["keep"] is True


def test_temperature_mixture_closed_form(spark, seg_dir):
    rows = {
        r["lang"]: r
        for r in Q.docs_temperature_mixture(spark, seg_dir).collect()
    }
    assert set(rows) == {"en", "zh"}
    n = {"en": 3, "zh": 3}
    p_raw = {k: v / 6 for k, v in n.items()}
    z = sum(p ** Q.MIXTURE_ALPHA for p in p_raw.values())
    for lang, r in rows.items():
        assert r["n_docs"] == n[lang]
        assert r["p_raw"] == pytest.approx(p_raw[lang], abs=1e-6)
        exp = (p_raw[lang] ** Q.MIXTURE_ALPHA) / z
        assert r["p_sampled"] == pytest.approx(exp, abs=1e-6)
        assert r["boost"] == pytest.approx(exp / p_raw[lang], abs=1e-6)
    # weights normalize
    assert math.isclose(
        sum(r["p_sampled"] for r in rows.values()), 1.0, abs_tol=2e-6
    )
    # token budget only counts real tokens (doc 5 is empty)
    assert rows["zh"]["n_tokens"] == 10 + 2 + 0


def test_temperature_upsamples_low_resource(spark, tmp_path):
    """The point of the stage: a 9:1 corpus must boost the minority
    language (boost > 1) and damp the majority (boost < 1)."""
    docs = [(i, f"w{i} x y", "en" if i < 9 else "rw", "s") for i in range(10)]
    d = str(tmp_path / "skew_sf")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    rows = {r["lang"]: r for r in Q.docs_temperature_mixture(spark, d).collect()}
    assert rows["rw"]["boost"] > 1.0 > rows["en"]["boost"]
    assert rows["en"]["p_sampled"] > rows["rw"]["p_sampled"]
