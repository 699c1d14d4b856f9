"""Behavioral pins for docs_lm_kneser_ney:

- exact per-doc perplexity against an independent pure-Python KN
  implementation on a tiny corpus (not the DuckDB oracle — a third
  engine);
- the KN estimator is properly normalized: summing the interpolated
  P_kn(w2|w1) over the WHOLE vocab (seen bigrams via the discounted
  term + every w2's continuation backoff) gives exactly 1 per history;
- repetitive text (high-count bigrams) scores lower perplexity than
  text of rare-but-seen bigrams.
"""

import math
import os
import sys
from collections import Counter

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark import queries as Q  # noqa: E402

DOC_SCHEMA = "doc_id long, text string, lang string, source string"

TEXTS = {
    0: "a b a b a b a b",  # repetitive: (a,b)/(b,a) dominate
    1: "c d e f g h",  # rare-but-seen chain
    2: "a b c d a b",  # mixture
}


def _kn_model(texts):
    bi = Counter()
    for t in texts.values():
        toks = t.split()
        for x, y in zip(toks, toks[1:]):
            bi[(x, y)] += 1
    ch = Counter()
    n_cont = Counter()
    n_hist = Counter()
    for (w1, w2), c in bi.items():
        ch[w1] += c
        n_cont[w1] += 1
        n_hist[w2] += 1
    n_bi = len(bi)
    D = Q.KN_DISCOUNT

    def p(w1, w2):
        return max(bi.get((w1, w2), 0) - D, 0.0) / ch[w1] + (
            D * n_cont[w1] / ch[w1]
        ) * (n_hist[w2] / n_bi)

    return p, bi, ch, n_hist


def _expected_ppl(texts):
    p, _, _, _ = _kn_model(texts)
    out = {}
    for doc_id, t in texts.items():
        toks = t.split()
        pairs = list(zip(toks, toks[1:]))
        nll = -sum(math.log(p(a, b)) for a, b in pairs) / len(pairs)
        out[doc_id] = round(math.exp(nll), 6)
    return out


@pytest.fixture(scope="module")
def kn_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("kn_sf"))
    docs = [(i, t, "en", "s0") for i, t in TEXTS.items()]
    spark.createDataFrame(docs, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def test_matches_pure_python_kn(spark, kn_dir):
    got = {
        r["doc_id"]: r["kn_perplexity"]
        for r in Q.docs_lm_kneser_ney(spark, kn_dir).collect()
    }
    assert got == _expected_ppl(TEXTS)


def test_repetitive_text_scores_lower(spark, kn_dir):
    got = {
        r["doc_id"]: r["kn_perplexity"]
        for r in Q.docs_lm_kneser_ney(spark, kn_dir).collect()
    }
    assert got[0] < got[2] < got[1]


def test_kn_estimator_normalizes():
    """Interpolated KN is a proper distribution: per history, the
    discounted seen mass plus the full-vocab continuation backoff sums
    to exactly 1 (the identity the D * N1+/ch interpolation weight is
    constructed to satisfy)."""
    p, bi, ch, n_hist = _kn_model(TEXTS)
    vocab = set(n_hist)  # every word that ever appears as a continuation
    for w1 in ch:
        total = sum(p(w1, w2) for w2 in vocab)
        assert total == pytest.approx(1.0, abs=1e-12), w1
