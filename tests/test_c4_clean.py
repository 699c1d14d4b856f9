"""Behavioral pins for the C4 cleaning heuristics: the driver corpus has
no newlines or terminal punctuation, so generic parity alone would only
prove 'both engines drop everything'. Plant realistic multi-line pages
and assert each published rule fires: short lines dropped, non-terminal
lines dropped, javascript lines dropped, <3-sentence pages dropped,
curly-brace and lorem-ipsum pages dropped, and a clean page survives
with exactly its good lines."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark import queries as Q  # noqa: E402

GOOD = [
    "This is a perfectly reasonable first sentence of content.",
    "Here is another full sentence with plenty of words in it!",
    'And a third sentence that ends with a quote mark."',
]
DOCS = [
    # clean page: 3 good lines + junk lines that each violate one rule
    (0, "\n".join(GOOD + [
        "Short line.",                                   # < 5 words
        "no terminal punctuation on this line here",     # bad ending
        "Please enable JavaScript to view this page.",   # javascript
    ]), "en", "s0"),
    # only 2 sentences survive: page dropped by the min-sentence rule
    (1, "\n".join(GOOD[:2]), "en", "s0"),
    # curly brace anywhere on the ORIGINAL page kills it, lines kept
    (2, "\n".join(GOOD) + "\nfunction f() { return 1; }", "en", "s1"),
    # lorem ipsum anywhere kills it (case-insensitive)
    (3, "\n".join(GOOD) + "\nLorem Ipsum dolor sit amet.", "en", "s1"),
    # sentence counting is on the CLEANED text: one kept line with 3
    # terminal marks passes the sentence gate
    (4, "It works. It really works. Yes it does work!", "en", "s1"),
    (5, "", "en", "s1"),
]


@pytest.fixture(scope="module")
def c4_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("c4_sf"))
    spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def test_c4_rules(spark, c4_dir):
    rows = {r["doc_id"]: r for r in Q.docs_c4_clean(spark, c4_dir).collect()}
    assert len(rows) == len(DOCS)
    r0 = rows[0]
    assert r0["n_lines"] == 6 and r0["n_kept_lines"] == 3
    assert r0["cleaned_text"] == "\n".join(GOOD)
    assert r0["keep"] is True
    # two sentences is below the C4 minimum of three
    assert rows[1]["n_kept_lines"] == 2 and rows[1]["keep"] is False
    # page-level kills act on the ORIGINAL text even with clean lines kept
    assert rows[2]["n_kept_lines"] == 3 and rows[2]["keep"] is False
    assert rows[3]["n_kept_lines"] == 4 and rows[3]["keep"] is False
    # multi-sentence single line passes the sentence gate
    assert rows[4]["n_sentences"] == 3 and rows[4]["keep"] is True
    # empty page: one empty line, nothing kept
    assert rows[5]["n_lines"] == 1 and rows[5]["n_kept_lines"] == 0
    assert rows[5]["keep"] is False and rows[5]["cleaned_text"] == ""


def test_c4_zero_shuffle_plan(spark, c4_dir):
    plan = Q.docs_c4_clean(spark, c4_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
