"""Behavioral pins for exact-substring removal: plant a duplicated
passage and assert the canonical owner keeps its text, every other copy
is stripped, overlapping duplicated grams union their spans, and a
near-copy with one inserted token (no shared 10-gram) survives."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark import queries as Q  # noqa: E402

# an 11-token run: its TWO overlapping 10-grams are each duplicated, so
# removal must union the spans (11 tokens, not 10 or 20)
RUN = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11"
DOCS = [
    (0, RUN + " ownertail", "en", "s0"),            # canonical owner: untouched
    (1, "alpha " + RUN, "en", "s0"),                # copy: loses the 11-token run
    (2, "s1 s2 s3 s4 s5 X s6 s7 s8 s9 s10 s11", "en", "s1"),  # broken run: no 10-gram
    (3, RUN + " mid " + RUN, "en", "s1"),           # two occurrences: both removed
    (4, "tiny doc", "en", "s1"),                    # shorter than one gram
    (5, "", "en", "s1"),                            # empty
]


@pytest.fixture(scope="module")
def exsub_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("exsub_sf"))
    spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def test_exact_substring_removal_semantics(spark, exsub_dir):
    rows = {r["doc_id"]: r for r in Q.docs_exact_substring_removal(spark, exsub_dir).collect()}
    assert len(rows) == len(DOCS)
    # owner (min doc_id) keeps the passage intact
    assert rows[0]["n_removed"] == 0
    assert rows[0]["cleaned_text"] == RUN + " ownertail"
    # the copy loses exactly the 11-token run (overlap union, not 10 or 20)
    assert rows[1]["n_removed"] == 11
    assert rows[1]["cleaned_text"] == "alpha"
    # one inserted token breaks every shared 10-gram: untouched
    assert rows[2]["n_removed"] == 0
    assert rows[2]["cleaned_text"] == DOCS[2][1]
    # both occurrences in the same non-owner doc are removed
    assert rows[3]["n_removed"] == 22
    assert rows[3]["cleaned_text"] == "mid"
    # sub-gram-length and empty docs pass through
    assert rows[4]["n_removed"] == 0 and rows[4]["cleaned_text"] == "tiny doc"
    assert rows[5]["n_tokens"] == 0 and rows[5]["cleaned_text"] == ""
