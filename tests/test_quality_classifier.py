"""Behavioral pins for docs_quality_classifier (Naive Bayes seed-corpus
quality filter):

- planted signal: docs from curated sources share a distinctive token
  vocabulary; the classifier scores held-out curated-looking text above
  crawl-looking text and thresholds at 0 correctly.
- zero-token docs are excluded (no defined score).
- the log-odds weights are symmetric: swapping the class roles negates
  the score (a linear-model sanity identity).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark import queries as Q  # noqa: E402

DOC_SCHEMA = "doc_id long, text string, lang string, source string"


@pytest.fixture(scope="module")
def clf_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("clf_sf"))
    # curated sources (src0-src2) write "encyclopedic" tokens; general
    # sources write "spam" tokens; docs 8/9 are held-out mixtures whose
    # dominant vocabulary should decide their predicted label
    docs = [
        (0, "theorem lemma proof corollary", "en", "src0"),
        (1, "theorem axiom proof lemma", "en", "src1"),
        (2, "corollary axiom lemma theorem", "en", "src2"),
        (3, "buy cheap pills now click", "en", "src5"),
        (4, "click here buy now cheap", "en", "src6"),
        (5, "pills cheap click buy here", "en", "src7"),
        (6, "   ", "en", "src0"),  # zero tokens: excluded
        (7, "", "en", "src5"),  # zero tokens: excluded
        (8, "theorem proof lemma click", "en", "src9"),  # curated-looking
        (9, "buy cheap pills theorem", "en", "src0"),  # crawl-looking
    ]
    spark.createDataFrame(docs, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def test_planted_signal_separates(spark, clf_dir):
    rows = {
        r["doc_id"]: r for r in Q.docs_quality_classifier(spark, clf_dir).collect()
    }
    # zero-token docs 6/7 excluded, everything else scored
    assert set(rows) == {0, 1, 2, 3, 4, 5, 8, 9}
    for i in (0, 1, 2):
        assert rows[i]["pred_curated"], f"doc {i} (curated source) misclassified"
        assert rows[i]["nb_log_odds"] > 0
    for i in (3, 4, 5):
        assert not rows[i]["pred_curated"], f"doc {i} (crawl source) misclassified"
        assert rows[i]["nb_log_odds"] < 0
    # held-out mixtures: dominant vocabulary decides
    assert rows[8]["nb_log_odds"] > rows[9]["nb_log_odds"]
    assert rows[8]["pred_curated"] and not rows[9]["pred_curated"]
    assert rows[0]["n_tokens"] == 4


def test_score_orders_by_curated_token_mass(spark, clf_dir):
    """More curated tokens -> higher score, monotonically, among docs of
    equal length (8 has 3 curated + 1 crawl, 9 has 1 curated + 3 crawl,
    pure docs bracket them)."""
    rows = {
        r["doc_id"]: r["nb_log_odds"]
        for r in Q.docs_quality_classifier(spark, clf_dir).collect()
    }
    assert rows[0] > rows[8] > rows[9] > rows[3]
