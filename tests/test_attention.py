"""Attention greedy decode (functions/attention.py): region segmentation,
emission rules, CTC agreement/divergence, and the py/np twin parity."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark import fixtures as FX  # noqa: E402
from basicocr_spark import schemas as S  # noqa: E402
from basicocr_spark.functions.attention import (  # noqa: E402
    attention_greedy_decode_np,
    attention_greedy_decode_py,
    make_attention_decode_udf,
)
from basicocr_spark.functions.ctc import decode_ctc_numpy  # noqa: E402

# tiny alphabet: index 0 = blank, 'a' -> 1, 'b' -> 2, 'c' -> 3
ALPHA = "abc"


def _frame(k, nclass=4, hi=5.0):
    """A frame whose argmax is class k (peaky logits)."""
    row = [0.0] * nclass
    row[k] = hi
    return row


BLANK = _frame(0)


def test_empty_and_none_logits_decode_to_empty():
    assert attention_greedy_decode_py([], ALPHA) == ""
    assert attention_greedy_decode_np([], ALPHA) == ""
    assert attention_greedy_decode_py(None, ALPHA) == ""
    assert attention_greedy_decode_np(None, ALPHA) == ""


def test_blank_separated_chars_agree_with_ctc():
    # a . b . c  (blank gaps between every char): both decoders read 'abc'
    mat = [_frame(1), BLANK, _frame(2), BLANK, _frame(3)]
    assert attention_greedy_decode_py(mat, ALPHA) == "abc"
    assert decode_ctc_numpy(mat, ALPHA) == "abc"


def test_repeated_char_across_blank_gap_survives():
    # a . a : two regions -> 'aa' (same as CTC collapse with the blank)
    mat = [_frame(1), BLANK, _frame(1)]
    assert attention_greedy_decode_py(mat, ALPHA) == "aa"
    assert decode_ctc_numpy(mat, ALPHA) == "aa"


def test_gapless_pair_merges_into_one_attended_region():
    # a b with NO blank between: CTC emits 'ab'; the attention decode has
    # ONE region (one step) and emits the region's attention-weighted
    # winner — the documented alignment-failure divergence.
    mat = [_frame(1), _frame(1), _frame(2)]  # two a-frames, one b-frame
    assert decode_ctc_numpy(mat, ALPHA) == "ab"
    got = attention_greedy_decode_py(mat, ALPHA)
    assert len(got) == 1
    assert got == "a"  # the majority content of the region wins


def test_all_blank_decodes_to_empty():
    mat = [BLANK, BLANK, BLANK]
    assert attention_greedy_decode_py(mat, ALPHA) == ""
    assert attention_greedy_decode_np(mat, ALPHA) == ""


def test_blank_never_emitted_even_when_context_is_blank_heavy():
    # region frames argmax to 'a' but carry substantial blank mass:
    # emission vocabulary excludes class 0, so 'a' still comes out
    mat = [[4.0, 4.5, 0.0, 0.0], [4.0, 4.2, 0.0, 0.0]]
    assert attention_greedy_decode_py(mat, ALPHA) == "a"


def test_py_np_parity_on_seeded_fixture_logits():
    rows = FX.gen_media_logits(24, FX.SEED)
    for _, lg, _ in rows:
        assert attention_greedy_decode_py(lg) == attention_greedy_decode_np(lg)


def test_spark_udf_matches_kernel(spark):
    rows = FX.gen_media_logits(12, FX.SEED)
    df = spark.createDataFrame(rows, schema=S.MEDIA_LOGITS)
    got = {
        r["media_ref"]: r["decoded"]
        for r in df.select(
            "media_ref", make_attention_decode_udf()(F.col("logits")).alias("decoded")
        ).collect()
    }
    want = {ref: attention_greedy_decode_py(lg) for ref, lg, _ in rows}
    assert got == want
