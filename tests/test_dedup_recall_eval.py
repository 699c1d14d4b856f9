"""Behavioral pins for docs_dedup_recall_eval (LSH candidate recall vs
exact sampled ground truth):

- a planted near-dup pair touching the 1-in-DEDUP_EVAL_MOD sample lands
  in the truth set and is surfaced by the LSH candidates (recall 1.0);
- true pairs NOT touching the sample are excluded from the truth scan
  (the one-sided sampling contract);
- a corpus with no near-dups reports vacuous recall 1.0 with zero truth
  pairs.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark import queries as Q  # noqa: E402

DOC_SCHEMA = "doc_id long, text string, lang string, source string"

BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "while morning fog settles across the quiet valley floor"
)


@pytest.fixture(scope="module")
def recall_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("recall_sf"))
    docs = [
        # doc 0 is IN the sample (0 % 20 == 0) and near-identical to doc 1
        (0, BASE, "en", "s0"),
        (1, BASE + " tonight", "en", "s0"),
        # docs 21/22 are a true near-dup pair NOT touching the sample
        (21, "alpha beta gamma delta epsilon zeta eta theta " * 4, "en", "s1"),
        (22, "alpha beta gamma delta epsilon zeta eta theta " * 4, "en", "s1"),
        # unrelated filler, including sample doc 20
        (20, "completely different subject matter entirely here", "en", "s2"),
        (23, "another unrelated document about separate topics", "en", "s2"),
    ]
    spark.createDataFrame(docs, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def test_planted_pair_recalled_and_offsample_excluded(spark, recall_dir):
    row = Q.docs_dedup_recall_eval(spark, recall_dir).collect()[0]
    assert row["n_sample_docs"] == 2  # docs 0 and 20
    # truth holds ONLY the sample-touching pair (0, 1); the (21, 22)
    # clone pair never enters the one-sided truth scan
    assert row["n_true"] == 1
    assert row["n_hits"] == 1
    assert row["recall"] == 1.0
    # the candidate list may contain extra sample-touching LSH pairs,
    # but must include the true one
    assert row["n_cand"] >= 1


@pytest.fixture(scope="module")
def nodup_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nodup_sf"))
    docs = [
        (0, "first entirely unique document body", "en", "s0"),
        (1, "second text sharing nothing at all", "en", "s0"),
        (20, "third sample member likewise distinct", "en", "s1"),
    ]
    spark.createDataFrame(docs, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def test_vacuous_recall_is_one(spark, nodup_dir):
    row = Q.docs_dedup_recall_eval(spark, nodup_dir).collect()[0]
    assert row["n_true"] == 0
    assert row["n_hits"] == 0
    assert row["recall"] == 1.0
