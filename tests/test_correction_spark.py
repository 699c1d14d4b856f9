"""Broadcast-levenshtein correction pipeline vs reference.correct_word.

Token sample is adversarial: exact dictionary words, distance-1/2
perturbations (tie-break paths), full-width/uppercase variants
(normalization), gibberish (identity fallback), and short tokens near
many candidates (min-dist ties + freq fallback).
"""

import random

from pyspark.sql import functions as F

from basicocr_spark import reference as R
from basicocr_spark.fixtures import gen_dictionary
from basicocr_spark.operators.correction import correct_tokens

_ALPHA_LOWER = R.uniform(R.DEFAULT_ALPHABET)


def _sample_tokens(entries, seed=5, n=80):
    rng = random.Random(seed)
    toks = []
    words = [e.word for e in entries]
    for _ in range(n):
        w = rng.choice(words)
        mode = rng.random()
        if mode < 0.2:
            toks.append(w)  # exact hit
        elif mode < 0.5 and len(w) > 2:
            i = rng.randrange(len(w))
            toks.append(w[:i] + rng.choice(_ALPHA_LOWER) + w[i + 1 :])  # subst
        elif mode < 0.7:
            toks.append(w + rng.choice(_ALPHA_LOWER))  # insert
        elif mode < 0.8:
            toks.append(w[:-1] or w)  # delete
        elif mode < 0.9:
            toks.append(w.upper())  # case normalization path
        else:
            toks.append("qqqq" + str(rng.randrange(100)))  # identity fallback
    return sorted(set(toks))


def test_correct_tokens_matches_reference(spark, fx):
    entries = R.load_dictionary(fx["dict_lines"])
    toks = _sample_tokens(entries)
    tokens_df = spark.createDataFrame([(t,) for t in toks], "token string")
    out = correct_tokens(tokens_df, fx["dictionary"], max_cost=3)
    got = {r.token: r.corrected for r in out.collect()}
    for t in toks:
        norm = R.uniform(t)
        assert got[norm] == R.correct_word(t, entries, 3), (t, norm, got[norm])


def test_correction_uses_broadcast_join(spark, fx):
    tokens_df = spark.createDataFrame([("abc",), ("def",)], "token string")
    out = correct_tokens(tokens_df, fx["dictionary"], max_cost=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_correction_band_predicate_precedes_levenshtein(spark, fx):
    """The sargable length-band predicate must sit in the same
    conjunction as (and to the left of) the levenshtein filter, so the
    O(len^2) DP only evaluates for the ~1/10th of the broadcast grid
    inside the band — the minimum lexicon-scale fix of VERDICT r2."""
    from basicocr_spark.operators.correction import correction_candidates

    tokens_df = spark.createDataFrame([("abc",), ("defg",)], "token string")
    plan = (
        correction_candidates(tokens_df, fx["dictionary"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    join_lines = [ln for ln in plan.splitlines() if "Join" in ln and "abs(" in ln]
    assert join_lines, plan
    # within the join's conjunction the cheap band predicate is the left
    # operand, so the DP short-circuits for out-of-band pairs
    assert join_lines[0].index("abs(") < join_lines[0].index("levenshtein("), join_lines[0]


def _big_dict(n=50_000, seed=11):
    """Deterministic 50k-entry lexicon (the reference's published
    correction config scale, crnn.md:148) with intentional near-miss
    families so radius queries have real work."""
    rng = random.Random(seed)
    entries = []
    for i in range(n):
        length = rng.randrange(3, 10)
        w = "".join(rng.choice("abcdefgh") for _ in range(length))
        entries.append((w, float(i % 97), i))
    return entries


def test_bktree_candidates_match_band_join_at_lexicon_scale(spark):
    """The BK-tree kernel route must produce EXACTLY the broadcast band
    join's candidate set and the identical resolved corrections on a
    generated 50k-word lexicon — same per-token effective radius, same
    tie-breaks."""
    from basicocr_spark.operators.correction import (
        CORRECTION_INDEX_THRESHOLD,
        correction_candidates,
        correction_candidates_indexed,
        resolve_candidates,
    )

    entries = _big_dict()
    assert len(entries) >= CORRECTION_INDEX_THRESHOLD
    rng = random.Random(3)
    words = [w for w, _, _ in entries]
    toks = set()
    for _ in range(25):
        w = rng.choice(words)
        toks.add(w)  # exact
        i = rng.randrange(len(w))
        toks.add(w[:i] + rng.choice("abcdefghz") + w[i + 1 :])  # subst
        toks.add(w + "zz")  # dist 2
    toks.add("zzzzzzzzzzzzzzzz")  # no candidate at any radius
    tokens_df = spark.createDataFrame([(t,) for t in sorted(toks)], "token string")

    dict_df = spark.createDataFrame(
        [(lid, w, fr) for (w, fr, lid) in entries], "line_id long, word string, freq double"
    )
    band = correction_candidates(tokens_df, dict_df)
    indexed = correction_candidates_indexed(tokens_df, entries)
    key = lambda r: (r["token"], r["word"], r["dist"], r["freq"], r["line_id"])
    assert sorted(map(key, indexed.collect())) == sorted(map(key, band.collect()))

    res_band = {(r["token"], r["corrected"]) for r in resolve_candidates(band).collect()}
    res_idx = {(r["token"], r["corrected"]) for r in resolve_candidates(indexed).collect()}
    assert res_idx == res_band


def test_bktree_degenerate_charset_lexicon_is_safe(spark):
    """Review finding: a single-character charset lexicon (all pairwise
    levenshtein 1 — the reference's own CJK domain) used to chain the
    BK-tree O(n) deep: cloudpickle of the nested nodes blew the
    recursion limit at task-serialization time and build was O(n^2).
    The flat-node + depth-capped layout must pickle fine, divert the
    chain tail to the overflow bucket, and answer queries identically
    to a linear scan."""
    import pickle

    from basicocr_spark.operators.correction import BKTree
    from basicocr_spark.reference import levenshtein

    entries = [(chr(0x4E00 + i), float(i % 97), i) for i in range(2000)]
    tree = BKTree(entries)
    assert tree.overflow, "depth cap never engaged on the chain lexicon"
    blob = pickle.dumps(tree)  # the closure-capture path Spark takes
    tree2 = pickle.loads(blob)

    for term, radius in [("中", 1), ("中文", 2), ("xyz", 3), (chr(0x4E00), 0)]:
        want = sorted(
            (e, levenshtein(term, e[0]))
            for e in entries
            if levenshtein(term, e[0]) <= radius
        )
        assert sorted(tree.query(term, radius)) == want, (term, radius)
        assert sorted(tree2.query(term, radius)) == want, (term, radius)


def test_correct_tokens_routes_large_dicts_through_bktree(spark):
    """correct_tokens with >= threshold driver-side entries must take the
    kernel route (MapInPandas in the plan, no levenshtein expression) and
    still return identity fallbacks for unmatched tokens."""
    entries = _big_dict()
    tokens_df = spark.createDataFrame(
        [(entries[7][0],), ("zzzzzzzzzzzzzzzz",)], "token string"
    )
    out = correct_tokens(tokens_df, None, max_cost=3, dict_entries=entries)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "levenshtein" not in plan
    got = {r.token: r.corrected for r in out.collect()}
    assert got[entries[7][0]] == entries[7][0]
    assert got["zzzzzzzzzzzzzzzz"] == "zzzzzzzzzzzzzzzz"
