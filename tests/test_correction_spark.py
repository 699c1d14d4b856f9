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
