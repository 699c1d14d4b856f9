"""Property-based tests (hypothesis) over the pure-Python reference
semantics — the invariants the Spark operators inherit by equality."""

from hypothesis import given, settings
from hypothesis import strategies as st

from basicocr_spark import reference as R

ALPHA = R.TEST_ALPHABET
alpha_text = st.text(alphabet=ALPHA, min_size=0, max_size=12)
idx_seq = st.lists(st.integers(min_value=0, max_value=len(ALPHA)), min_size=0, max_size=40)


@given(st.lists(alpha_text.filter(lambda s: len(s) > 0), min_size=1, max_size=6))
@settings(max_examples=200, deadline=None)
def test_encode_decode_roundtrip(texts):
    flat, lengths = R.encode(texts, ALPHA)
    assert R.decode_batch(flat, lengths, raw=True, alphabet=ALPHA) == texts
    # non-raw decode of an encoding collapses repeats — it equals the
    # original iff the original has no equal adjacent chars
    decoded = R.decode_batch(flat, lengths, raw=False, alphabet=ALPHA)
    for orig, dec in zip(texts, decoded):
        squashed = "".join(c for i, c in enumerate(orig) if i == 0 or orig[i - 1] != c)
        assert dec == squashed


@given(idx_seq)
@settings(max_examples=200, deadline=None)
def test_collapse_idempotent_and_blank_free(t):
    once = R.decode_single(t, raw=False, alphabet=ALPHA)
    # re-encoding the collapsed string and collapsing again is a no-op
    # when the string has no adjacent repeats (guaranteed by collapse
    # only removing, never merging distinct neighbors... note collapse CAN
    # produce adjacent repeats across a blank: [1,0,1] -> 'aa')
    assert "-" not in once  # blank sentinel never leaks into decode


@given(idx_seq)
@settings(max_examples=200, deadline=None)
def test_collapse_subsequence(t):
    out = R.decode_single(t, raw=False, alphabet=ALPHA)
    raw = R.decode_single(t, raw=True, alphabet=ALPHA)
    # collapsed text is a subsequence of the raw rendering
    it = iter(raw)
    assert all(c in it for c in out)


@given(st.text(min_size=0, max_size=30), st.text(min_size=0, max_size=30))
@settings(max_examples=200, deadline=None)
def test_levenshtein_metric_properties(a, b):
    d = R.levenshtein(a, b)
    assert d == R.levenshtein(b, a)
    assert (d == 0) == (a == b)
    assert d <= max(len(a), len(b))
    assert d >= abs(len(a) - len(b))


@given(st.text(min_size=0, max_size=30), st.text(min_size=0, max_size=30), st.text(min_size=0, max_size=30))
@settings(max_examples=100, deadline=None)
def test_levenshtein_triangle(a, b, c):
    assert R.levenshtein(a, c) <= R.levenshtein(a, b) + R.levenshtein(b, c)


@given(st.text(min_size=0, max_size=40))
@settings(max_examples=300, deadline=None)
def test_uniform_idempotent(s):
    assert R.uniform(R.uniform(s)) == R.uniform(s)


@given(st.text(min_size=0, max_size=40))
@settings(max_examples=300, deadline=None)
def test_q2b_only_shrinks_to_ascii(s):
    u = R.uniform(s)
    assert len(u) == len(s)  # char-for-char mapping, never drops
    for orig, mapped in zip(s, u):
        if orig != mapped.upper() and orig != mapped:
            # changed chars must have come from the full-width block or
            # be case-lowered
            assert 0xFF00 <= ord(orig) <= 0xFF5E or ord(orig) == 0x3000 or orig.lower() == mapped


@given(st.text(min_size=0, max_size=25))
@settings(max_examples=300, deadline=None)
def test_string2list_reference_invariants(s):
    out = R.string2list_reference(s)
    runs = R.segment_runs(s)
    # every emitted token is a prefix of some maximal run, and every
    # maximal run is emitted at least once
    for tok in out:
        assert any(r.startswith(tok) or tok in r for r in runs), (s, tok)
    for r in runs:
        assert r in out, (s, r)


@given(st.lists(st.floats(min_value=-5, max_value=5, allow_nan=False), min_size=2, max_size=8).map(tuple))
@settings(max_examples=100, deadline=None)
def test_correct_word_returns_dict_word_or_identity(_):
    entries = R.load_dictionary(["cat 5", "cap 9", "dog 2", "cata 50"])
    words = {e.word for e in entries}
    import random as _r

    rng = _r.Random(hash(_) & 0xFFFF)
    tok = "".join(rng.choice("catpdog") for _ in range(rng.randint(1, 8)))
    out = R.correct_word(tok, entries, 2)
    assert out in words or out == R.uniform(tok)
