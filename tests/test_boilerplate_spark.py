"""Boilerplate-strip column pipeline vs the frozen pure-Python spec."""

import random

from pyspark.sql import functions as F

from basicocr_spark import reference as R
from basicocr_spark.fixtures import STOP_TERMS, gen_text_span
from basicocr_spark.operators.boilerplate import block_score, extract_main_text

CASES = [
    "<p>plain paragraph with enough words to be kept by the scorer today</p>",
    '<div class="nav"><a href="/x">home</a> <a href="/y">about</a></div>',
    '<div class="footer">all rights reserved copyright</div>',
    "bare text line with a handful of words here",
    "<p>short</p>",
    '<li>list item navigation chrome</li>',
    "<p>content with advertisement inside and click here plus more words to keep it alive</p>",
    "",
    "<p>aa</p>\n<p>paragraph two has plenty of words to stay above the threshold</p>",
]


def test_extract_main_text_matches_reference(spark):
    rng = random.Random(99)
    data = CASES + [gen_text_span(rng) for _ in range(25)]
    df = spark.createDataFrame([(s,) for s in data], "raw string")
    rows = df.select("raw", extract_main_text(F.col("raw"), STOP_TERMS).alias("out")).collect()
    for r in rows:
        assert r.out == R.extract_main_text(r.raw, STOP_TERMS), repr(r.raw[:120])


def test_block_score_matches_reference(spark):
    blocks = [b for case in CASES for b in case.split("\n") if case]
    df = spark.createDataFrame([(b,) for b in blocks], "b string")
    rows = df.select("b", block_score(F.col("b")).alias("score")).collect()
    for r in rows:
        assert abs(r.score - R.boilerplate_keep_score(r.b)) < 1e-9, repr(r.b)


def test_boilerplate_plan_is_pure_jvm(spark):
    df = spark.createDataFrame([("x",)], "raw string").select(
        extract_main_text(F.col("raw"), STOP_TERMS).alias("out")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_unicode_whitespace_parity_with_reference(spark):
    """Java's default \\s is ASCII-only; the (?U)/(?s) flags keep the
    column pipeline equal to the Python oracle on NBSP/ideographic
    spaces and on link anchors containing raw \\r (re.S semantics)."""
    from basicocr_spark import reference as R
    from basicocr_spark.fixtures import STOP_TERMS

    cases = [
        "<p>Hello world more article body text here today</p>",
        "<p>ideographic\u3000space separated words in this block</p>",
        '<div><a href="/x">link\rwith\rcarriage</a> plus body words here</div>',
        "<p>line separator inside a long enough article block</p>",
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i int, raw string")
    got = {
        r.i: r.out
        for r in df.select(
            "i", extract_main_text(F.col("raw"), STOP_TERMS).alias("out")
        ).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == R.extract_main_text(c, STOP_TERMS), (i, c, got[i])
