"""Dictionary correction as a broadcast levenshtein theta-join.

Reference: contrib/trietree/src/trietree_correct.py. The trie's
branch-and-bound DP walk (searchRecursive, :168-199) is an *index*; the
semantics are "all dictionary words within edit distance k, else k+3,
else identity; then the postProcessing tie-break (:202-242)". At Spark
scale the idiomatic equivalent is a broadcast nested-loop join with a
band predicate on Catalyst's built-in `levenshtein`, so the dictionary is
shipped once per executor and the probe side streams — no shuffle of the
(big) token side at all; only the final dedup-by-token is a hash agg.

Tie-break pinning (SURVEY.md §7 hard part #1): candidate order is
dictionary file order (`line_id`). The rule, reproduced exactly from
postProcessing including its first-iteration-return quirk:
  c0       := first candidate by (dist asc, line_id asc)
  min-dist set := candidates at min dist
  result   := c0.word                     if c0.dist == 0
           |  c0.word                     if |min-dist set| == 1
           |  c0.word                     if len(c0.word) == len(target)
           |  argmax-freq (first, by line_id) over min-dist set
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textnorm import uniform


def correction_candidates(
    tokens_df: DataFrame,
    dict_df: DataFrame,
    token_col: str = "token",
    max_cost: int = 3,
    retry_extra: int = 3,
) -> DataFrame:
    """All (token, word, dist, freq, line_id) candidates within the
    *effective* radius: max_cost when any candidate is inside it, else
    max_cost + retry_extra (the escalating-retry of trietree_correct.py
    :255-258, done in ONE pass by computing distance once and choosing
    the radius per token afterwards — the broadcast is reused, which is
    exactly what two sequential joins would AQE-cache anyway)."""
    d = F.levenshtein(F.col(token_col), F.col("word"))
    cands = (
        tokens_df.crossJoin(F.broadcast(dict_df))
        .withColumn("dist", d)
        .filter(F.col("dist") <= max_cost + retry_extra)
    )
    w = Window.partitionBy(token_col)
    return (
        cands.withColumn("min_dist_all", F.min("dist").over(w))
        .withColumn(
            "eff_cost",
            F.when(F.col("min_dist_all") <= max_cost, max_cost).otherwise(
                max_cost + retry_extra
            ),
        )
        .filter(F.col("dist") <= F.col("eff_cost"))
        .drop("min_dist_all", "eff_cost")
    )


def resolve_candidates(cands: DataFrame, token_col: str = "token") -> DataFrame:
    """postProcessing tie-break over a candidate set -> (token, corrected)."""
    w = Window.partitionBy(token_col)
    w_first = w.orderBy(F.col("dist").asc(), F.col("line_id").asc())
    w_freq = w.orderBy(F.col("freq").desc(), F.col("line_id").asc())

    scored = (
        cands.withColumn("min_dist", F.min("dist").over(w))
        .filter(F.col("dist") == F.col("min_dist"))
        .withColumn("rn", F.row_number().over(w_first))
        .withColumn("n_min", F.count(F.lit(1)).over(w))
        .withColumn("best_freq_word", F.first("word").over(w_freq))
    )
    return (
        scored.filter(F.col("rn") == 1)
        .select(
            F.col(token_col),
            F.when(
                (F.col("min_dist") == 0)
                | (F.col("n_min") == 1)
                | (F.length("word") == F.length(token_col)),
                F.col("word"),
            )
            .otherwise(F.col("best_freq_word"))
            .alias("corrected"),
        )
    )


def correct_tokens(
    tokens_df: DataFrame,
    dict_df: DataFrame,
    token_col: str = "token",
    max_cost: int = 3,
    normalize: bool = True,
) -> DataFrame:
    """Distinct-token correction map: (token, corrected).

    Tokens absent from the dictionary even at the widened radius fall back
    to identity (trietree_correct.py:258-259). Correcting DISTINCT tokens
    (not occurrences) keeps the nested-loop probe proportional to
    vocabulary, not corpus, then a broadcast map-join rehydrates
    occurrences — at 100 TB the distinct-token side is what you want
    flowing through the levenshtein band join.
    """
    toks = tokens_df.select(token_col).distinct()
    if normalize:
        toks = toks.select(uniform(F.col(token_col)).alias(token_col)).distinct()
    cands = correction_candidates(toks, dict_df, token_col, max_cost)
    resolved = resolve_candidates(cands, token_col)
    return toks.join(resolved, token_col, "left").select(
        F.col(token_col),
        F.coalesce("corrected", F.col(token_col)).alias("corrected"),
    )
