"""Behavioral pins for the Gopher quality ruleset: the driver corpus
trips the stop-word rule for every doc, so generic parity alone can't
show the individual rules fire. Plant one passing doc and one violator
per rule and assert the verdicts and the violated stat."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark import queries as Q  # noqa: E402

# 60 normal words incl. >= 2 stopwords, alphabetic, mean length in range
GOOD = " ".join(
    ["the", "be", "quick brown fox jumps over lazy dog near river bank".title()]
    + [f"word{i}" for i in range(48)]
)
DOCS = [
    (0, GOOD, "en", "s0"),                                    # passes all rules
    (1, "the be few words here", "en", "s0"),                 # < 50 words
    (2, " ".join(["the", "be"] + ["ab"] * 58), "en", "s0"),   # mean word len < 3
    (3, GOOD + " " + "#" * 1 + " ### ## # # # #", "en", "s1"),  # symbol ratio > 0.1
    (4, "\n".join(["- " + GOOD] + ["- bullet line"] * 19), "en", "s1"),  # >90% bullets
    (5, "\n".join([GOOD] + ["trailing off..."] * 9), "en", "s1"),        # >30% ellipsis
    (6, " ".join(["the", "be"] + ["12345"] * 58), "en", "s1"),  # alpha frac < 0.8
    (7, " ".join([f"word{i}" for i in range(60)]), "en", "s1"),  # no stopwords
    (8, "", "en", "s1"),                                         # empty
    # ellipsis ratio > 0.1 on its own (hash ratio stays 0): the two
    # symbol gates are separate, per the published rule
    (9, GOOD + " " + " ".join(f"w{i}..." for i in range(10)), "en", "s1"),
]


@pytest.fixture(scope="module")
def gopher_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("gopher_sf"))
    spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def test_gopher_rule_verdicts(spark, gopher_dir):
    rows = {r["doc_id"]: r for r in Q.docs_gopher_rules(spark, gopher_dir).collect()}
    assert len(rows) == len(DOCS)
    assert rows[0]["keep"] is True
    for i in range(1, len(DOCS)):
        assert rows[i]["keep"] is False, f"doc {i} should fail"
    # each violator trips its intended stat
    assert rows[1]["n_words"] < Q.GOPHER_MIN_WORDS
    assert rows[2]["mean_word_len"] < Q.GOPHER_MIN_MEAN_WORD_LEN
    assert rows[3]["hash_ratio"] > Q.GOPHER_MAX_SYMBOL_RATIO
    assert rows[4]["bullet_frac"] > Q.GOPHER_MAX_BULLET_FRAC
    assert rows[5]["ellipsis_frac"] > Q.GOPHER_MAX_ELLIPSIS_FRAC
    assert rows[6]["alpha_frac"] < Q.GOPHER_MIN_ALPHA_FRAC
    assert rows[7]["n_stopwords"] == 0
    assert rows[8]["n_words"] == 0
    assert rows[9]["ellipsis_ratio"] > Q.GOPHER_MAX_SYMBOL_RATIO
    assert rows[9]["hash_ratio"] == 0.0


def test_gopher_zero_shuffle_plan(spark, gopher_dir):
    plan = Q.docs_gopher_rules(spark, gopher_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
