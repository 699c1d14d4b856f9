"""CTC prefix beam search (functions/ctc_beam.py): the textbook
greedy-vs-beam divergence, CTC-rule bookkeeping (blank separation,
repeat merging), width monotonicity, twin parity, and the Spark UDF."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark import fixtures as FX  # noqa: E402
from basicocr_spark.functions.ctc import decode_ctc_numpy  # noqa: E402
from basicocr_spark.functions.ctc_beam import (  # noqa: E402
    ctc_beam_decode_np,
    ctc_beam_decode_py,
    make_ctc_beam_decode_udf,
)

# tiny alphabet: index 0 = blank, 'a' -> 1, 'b' -> 2
ALPHA = "ab"
import math  # noqa: E402


def _logit_rows(prob_rows):
    """probability rows -> logits that softmax back to those probs."""
    return [[math.log(max(p, 1e-12)) for p in r] for r in prob_rows]


def test_textbook_greedy_beam_divergence():
    """The classic two-frame case (Hannun's CTC exposition): per-frame
    argmax is blank-blank -> greedy emits '', but the mass of labeling
    'a' (paths a-a, a-blank, blank-a) exceeds the single blank-blank
    path -> beam emits 'a'."""
    probs = [
        [0.6, 0.4, 0.0],  # blank 0.6, a 0.4
        [0.6, 0.4, 0.0],
    ]
    mat = _logit_rows(probs)
    assert decode_ctc_numpy(mat, ALPHA) == ""
    # P('') = 0.36; P('a') = 0.4*0.4 + 0.4*0.6 + 0.6*0.4 = 0.64
    assert ctc_beam_decode_py(mat, ALPHA) == "a"
    assert ctc_beam_decode_np(mat, ALPHA) == "a"


def test_repeat_needs_blank_separation():
    # a a collapses to 'a'; a blank a stays 'aa' — the CTC rule the
    # (p_blank, p_nonblank) split exists to track
    peak = lambda k: _logit_rows([[8.0 if j == k else 0.0 for j in range(3)]])[0]
    assert ctc_beam_decode_py([peak(1), peak(1)], ALPHA) == "a"
    assert ctc_beam_decode_py([peak(1), peak(0), peak(1)], ALPHA) == "aa"


def test_empty_and_blank_only():
    assert ctc_beam_decode_py([], ALPHA) == ""
    assert ctc_beam_decode_np(None, ALPHA) == ""
    blank = _logit_rows([[0.9, 0.05, 0.05]])[0]
    assert ctc_beam_decode_py([blank, blank], ALPHA) == ""


def test_wide_beam_refines_toward_exhaustive():
    """On soft evidence a wider beam must never LOSE probability mass:
    the W=8 winner's labeling equals the exhaustive (W=3^T) winner on a
    short sequence; W=1 (greedy-over-prefixes) may differ."""
    rows = FX.gen_soft_logits(4, FX.SEED, t_total=5)
    for _, lg in rows:
        wide = ctc_beam_decode_py(lg, beam_width=64)
        exhaustive = ctc_beam_decode_py(lg, beam_width=10**6)
        assert wide == exhaustive


def test_agrees_with_greedy_on_peaky_fixture_logits():
    # unambiguous evidence: the best alignment dominates every other
    # path, so beam and greedy must read the same text
    for _, lg, gold in FX.gen_media_logits(24, FX.SEED):
        assert ctc_beam_decode_py(lg) == gold


def test_py_np_parity_on_soft_fixture_logits():
    for _, lg in FX.gen_soft_logits(24, FX.SEED):
        assert ctc_beam_decode_py(lg) == ctc_beam_decode_np(lg)


def test_spark_udf_matches_kernel(spark):
    rows = FX.gen_soft_logits(12, FX.SEED)
    df = spark.createDataFrame(rows, schema="media_ref string, logits array<array<float>>")
    got = {
        r["media_ref"]: r["decoded"]
        for r in df.select(
            "media_ref", make_ctc_beam_decode_udf()(F.col("logits")).alias("decoded")
        ).collect()
    }
    want = {ref: ctc_beam_decode_py(lg) for ref, lg in rows}
    assert got == want
