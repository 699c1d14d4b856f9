"""Behavioral pins for the round-5 curation additions:

- docs_softdedup_weights: every copy of a k-duplicated text gets weight
  1/k, so total sampling mass equals the number of DISTINCT texts (the
  reweight-don't-delete invariant).
- docs_ccnet_bucket: per-language tercile assignment — repetitive
  (low-perplexity) docs land in head, gibberish in tail, and the split
  is computed independently per language.
- emb_hard_negatives: the nearest same-label vector is EXCLUDED; the
  ranking covers cross-label candidates only.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark import queries as Q  # noqa: E402

DOC_SCHEMA = "doc_id long, text string, lang string, source string"


@pytest.fixture(scope="module")
def soft_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("soft_sf"))
    docs = [
        (0, "alpha beta gamma", "en", "s0"),
        (1, "alpha beta gamma", "en", "s0"),
        (2, "alpha beta gamma", "en", "s1"),
        (3, "delta epsilon", "en", "s0"),
        (4, "delta epsilon", "en", "s1"),
        (5, "unique text here", "en", "s0"),
    ]
    spark.createDataFrame(docs, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def test_softdedup_weight_is_inverse_copy_count(spark, soft_dir):
    rows = {
        r["doc_id"]: r
        for r in Q.docs_softdedup_weights(spark, soft_dir).collect()
    }
    assert len(rows) == 6  # removal-free: every doc survives
    for i in (0, 1, 2):
        assert rows[i]["n_copies"] == 3
        assert rows[i]["weight"] == pytest.approx(1 / 3, abs=1e-6)
    for i in (3, 4):
        assert rows[i]["n_copies"] == 2
        assert rows[i]["weight"] == 0.5
    assert rows[5]["n_copies"] == 1 and rows[5]["weight"] == 1.0
    # total sampling mass == number of distinct texts
    assert sum(r["weight"] for r in rows.values()) == pytest.approx(3.0, abs=1e-5)


@pytest.fixture(scope="module")
def ccnet_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ccnet_sf"))
    # en: 6 docs with strictly ordered perplexity. The LM is self-scored
    # bigram+Laplace, so docs built from the corpus's dominant bigram
    # ("lorem ipsum") score low, docs of hapax gibberish score high.
    common = "lorem ipsum " * 30  # floods the model with one bigram
    docs = [
        (0, common.strip(), "en", "s0"),
        (1, ("lorem ipsum " * 20).strip(), "en", "s0"),
        (2, (common + "dolor sit amet").strip(), "en", "s0"),
        (3, "lorem ipsum dolor sit amet consectetur", "en", "s0"),
        (4, "qq ww ee rr tt yy uu ii", "en", "s0"),
        (5, "zz xx cc vv bb nn mm kk jj hh", "en", "s0"),
        # fr: 3 docs -> one per bucket, proving per-language terciles
        (6, ("bonjour monde " * 25).strip(), "fr", "s1"),
        (7, "bonjour monde salut terre", "fr", "s1"),
        (8, "gg ff dd ss aa pp oo ll", "fr", "s1"),
    ]
    spark.createDataFrame(docs, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def test_ccnet_buckets_split_per_language(spark, ccnet_dir):
    rows = {r["doc_id"]: r for r in Q.docs_ccnet_bucket(spark, ccnet_dir).collect()}
    assert len(rows) == 9
    en = [rows[i] for i in range(6)]
    fr = [rows[i] for i in range(6, 9)]
    # terciles: 6 en docs -> 2 per bucket, 3 fr docs -> 1 per bucket
    for group, per in ((en, 2), (fr, 1)):
        counts = {}
        for r in group:
            counts[r["bucket"]] = counts.get(r["bucket"], 0) + 1
        assert counts == {"head": per, "middle": per, "tail": per}, counts
    # the pure-dominant-bigram doc is cleanest (head), gibberish is tail
    assert rows[0]["bucket"] == "head"
    assert rows[5]["bucket"] == "tail"
    assert rows[6]["bucket"] == "head"
    assert rows[8]["bucket"] == "tail"
    # buckets are monotone in perplexity within a language
    order = {"head": 0, "middle": 1, "tail": 2}
    en_sorted = sorted(en, key=lambda r: (r["perplexity"], r["doc_id"]))
    assert [order[r["bucket"]] for r in en_sorted] == sorted(
        order[r["bucket"]] for r in en_sorted
    )


EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


@pytest.fixture(scope="module")
def hardneg_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hardneg_sf"))
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),   # probe, label 0
        (10, [1.0, 0.01, 0.0, 0.0], 0),  # nearest overall — SAME label
        (11, [1.0, 0.2, 0.0, 0.0], 1),   # nearest cross-label -> rk 1
        (12, [1.0, 0.5, 0.0, 0.0], 2),   # next cross-label   -> rk 2
        (13, [0.0, 1.0, 0.0, 0.0], 1),   # orthogonal: beyond top-2
    ]
    # ids 10+ keep the non-probe candidates out of the probe set
    # (emb_hard_negatives probes vec_id < 20, so all of these also act
    # as probes — the assertions below only inspect q_id == 0)
    spark.createDataFrame(vecs, EMB_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "embeddings.parquet"))
    return d


def test_hard_negatives_exclude_same_label(spark, hardneg_dir):
    rows = [
        r
        for r in Q.emb_hard_negatives(spark, hardneg_dir).collect()
        if r["q_id"] == 0
    ]
    assert len(rows) == 2
    by_rk = {r["rk"]: r for r in rows}
    # the globally nearest vector (10) shares the probe's label: absent
    assert all(r["vec_id"] != 10 for r in rows)
    assert by_rk[1]["vec_id"] == 11
    assert by_rk[2]["vec_id"] == 12
    assert by_rk[1]["cos"] > by_rk[2]["cos"]
