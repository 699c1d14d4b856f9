"""Property-based tests for the Arrow hash kernels and the PDF parser.

The hash kernels' referee here is DuckDB — the independent engine the
driver's correctness gate uses — evaluating the exact oracle formulas
from queries.py over randomized unicode inputs (no Spark session needed,
so hypothesis can run hundreds of examples cheaply). The PDF tests check
build -> parse roundtrip over randomized layouts and string contents
(parens, backslashes, control chars)."""

import os
import sys

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark.functions import hash_kernels as HK  # noqa: E402
from basicocr_spark.functions.textstats import MOD  # noqa: E402
from basicocr_spark.operators import pdfparse as P  # noqa: E402

# BMP-only text (the corpus contract: Spark's split-by-char walks UTF-16
# units, so astral chars are out of scope for hash parity), no lone
# surrogates.
bmp_char = st.characters(
    min_codepoint=1, max_codepoint=0xFFFD, blacklist_categories=("Cs",)
)
bmp_text = st.text(alphabet=bmp_char, min_size=0, max_size=60)


def _duck_poly(strings):
    con = duckdb.connect()
    out = []
    for s in strings:
        lit = s.replace("'", "''")
        (h,) = con.execute(
            f"SELECT list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform(regexp_split_to_array('{lit}', ''), "
            f"c -> CAST(ascii(c) AS BIGINT))), (acc, x) -> (acc * 31 + x) % {MOD})"
        ).fetchone()
        out.append(h)
    return out


@given(st.lists(bmp_text, min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_poly_hash_matches_duckdb(strings):
    # regexp_split_to_array(s, '') yields [] for '', whose reduce is the
    # prepended 0 — matching the kernel's empty-string hash of 0
    got = HK.poly_hash_flat(strings).tolist()
    want = _duck_poly(strings)
    assert got == want


@given(st.lists(bmp_text, min_size=1, max_size=6))
@settings(max_examples=40, deadline=None)
def test_simhash_zero_iff_no_tokens(texts):
    sims = HK.simhash_batch(texts)
    for t, s in zip(texts, sims):
        if not HK._tokens(t):
            assert s == 0
        assert 0 <= s < (1 << 32)


@given(st.lists(bmp_text, min_size=1, max_size=6))
@settings(max_examples=40, deadline=None)
def test_minhash_signature_invariants(texts):
    sig = HK.minhash_batch(texts, 16, 3)
    assert sig.shape == (len(texts), 16)
    # identical texts -> identical signatures (dedup soundness)
    sig2 = HK.minhash_batch(list(texts), 16, 3)
    assert (sig == sig2).all()
    from basicocr_spark.functions.textstats import MINHASH_PRIME

    assert (sig >= 0).all() and (sig < MINHASH_PRIME).all()


pdf_text = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0xFF),
    min_size=0,
    max_size=40,
)
pdf_run = st.tuples(
    st.floats(min_value=0, max_value=600, allow_nan=False).map(lambda v: round(v, 1)),
    st.floats(min_value=0, max_value=780, allow_nan=False).map(lambda v: round(v, 1)),
    pdf_text,
)


@given(st.lists(st.lists(pdf_run, min_size=0, max_size=6), min_size=1, max_size=3))
@settings(max_examples=60, deadline=None)
def test_pdf_roundtrip_random_layouts(pages):
    blocks = P.extract_pdf_text_blocks(P.build_pdf_bytes(pages))
    got = [(b["page"], b["x"], b["y"], b["text"]) for b in blocks]
    want = [(p, x, y, t) for p, runs in enumerate(pages) for x, y, t in runs]
    assert got == want


@given(st.lists(pdf_run, min_size=1, max_size=10))
@settings(max_examples=40, deadline=None)
def test_reading_order_is_permutation_invariant(runs):
    import random as _random

    blocks = [{"page": 0, "x": x, "y": y, "text": t} for x, y, t in runs]
    shuffled = list(blocks)
    _random.Random(7).shuffle(shuffled)
    # same multiset of runs -> same reading order, regardless of stream order
    assert P.reading_order_text(blocks) == P.reading_order_text(shuffled)


# Mixed latin/CJK text for the segmenter parity property. \x0b excluded:
# Python/Java class \s includes vertical tab, RE2's does not — a known
# cross-engine divergence the corpora never exercise.
cjk_mixed_text = st.text(
    alphabet=list("abc xy\t\n.,!") + list("一中文大数据表格处理"),
    min_size=0,
    max_size=60,
)


@given(st.lists(cjk_mixed_text, min_size=1, max_size=6))
@settings(max_examples=60, deadline=None)
def test_cjk_tokens_match_duckdb(texts):
    """The Python CJK segmenter (what the Arrow kernels tokenize with)
    must equal the DuckDB oracle expression on arbitrary mixed text —
    the cross-engine seam every CJK query's green row depends on."""
    import duckdb

    from basicocr_spark.functions.hash_kernels import _cjk_tokens
    from basicocr_spark.queries import _duck_cjk_tokens_expr

    con = duckdb.connect()
    expr = _duck_cjk_tokens_expr("text")
    for t in texts:
        want = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS text)", [t]
        ).fetchone()[0]
        assert _cjk_tokens(t) == list(want), repr(t)
