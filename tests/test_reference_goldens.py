"""Pinned golden values from the reference's own unit suite
(contrib/crnn/test/test_utils.py) against our pure-Python oracle."""

import pytest

from basicocr_spark import reference as R

ALPHA = R.TEST_ALPHABET  # 'abcdefghijklmnopqrstuvwxyz' (test_utils.py:32)


def test_encode_single():
    assert R.encode(["efa"], ALPHA) == ([5, 6, 1], [3])  # test_utils.py:36-38


def test_encode_batch():
    assert R.encode(["efa", "ab"], ALPHA) == ([5, 6, 1, 1, 2], [3, 2])  # :41-43


def test_decode_single():
    assert R.decode_batch([5, 6, 1], [3], alphabet=ALPHA) == ["efa"]  # :47-50


def test_ctc_collapse_golden():
    assert R.decode_batch([5, 5, 0, 1], [4], alphabet=ALPHA) == ["ea"]  # :53-56


def test_length_mismatch_raises():
    with pytest.raises(AssertionError):  # :58-62
        R.decode_batch([5, 5, 0, 1], [3], alphabet=ALPHA)


def test_decode_batch_mode():
    assert R.decode_batch([5, 6, 1, 1, 2], [3, 2], alphabet=ALPHA) == ["efa", "ab"]  # :65-68


def test_raw_decode_blank_sentinel():
    # utils.py:29,83 — blank renders '-' via alphabet[-1]
    assert R.decode_single([5, 0, 1], raw=True, alphabet=ALPHA) == "e-a"


def test_uniform_q2b():
    # full-width ASCII + ideographic space normalize; CJK untouched
    assert R.uniform("ＡＢｃ１　中") == "abc1 中"
    # U+FF00 -> space (code-0xFEE0 lands exactly on 0x20)
    assert R.uniform("＀") == " "


def test_string2list_reference_quirk():
    # trailing append inside the loop => prefixes + duplicated full run
    assert R.string2list_reference("ab c") == ["a", "ab", "ab", "c"]
    assert R.string2list_reference("a  b") == ["a", "a", "b"]
    assert R.string2list_reference(".a") == ["a"]
    assert R.segment_runs("ab c.d") == ["ab", "c", "d"]


def test_correct_word_tie_break():
    entries = R.load_dictionary(["cat 5", "cap 9", "dog 2", "cata 50"])
    # dist0 -> exact word
    assert R.correct_word("cat", entries, 1) == "cat"
    # 'cax': min dist 1 to both cat(line0) and cap(line1); len('cax')==len('cat')
    # -> first min-dist candidate by line order
    assert R.correct_word("cax", entries, 1) == "cat"
    # 'caxx': min dist 2 to cat/cap/cata; words_min[0]='cat' and
    # len('caxx') != len('cat'), so the quirky first-iteration return
    # falls through to max-freq among the min-dist set -> cata (freq 50)
    cands = R.search_dictionary("caxx", 2, entries)
    assert {e.word for e, _ in cands} == {"cat", "cap", "cata"}
    assert R.correct_word("caxx", entries, 2) == "cata"

def test_correct_word_freq_fallback():
    entries = R.load_dictionary(["aaaa 5", "bbbb 9"])
    # 'aab': dist to aaaa=2, bbbb=3 (within k=3); min unique -> aaaa
    assert R.correct_word("aab", entries, 3) == "aaaa"


def test_correct_word_identity_fallback():
    entries = R.load_dictionary(["zzzz 1"])
    assert R.correct_word("qqqqqqqqqqqq", entries, 1) == "qqqqqqqqqqqq"


def test_correct_word_retry_widens():
    entries = R.load_dictionary(["abcdefgh 1"])
    # dist('abc','abcdefgh')=5 > k=1 but <= k+3=4? no (5>4) -> identity
    assert R.correct_word("abc", entries, 1) == "abc"
    # dist 4 <= 1+3 -> retry finds it
    assert R.correct_word("abcd", entries, 1) == "abcdefgh"
