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

# At/above this many dictionary entries the broadcast band join's
# O(vocab x dict) levenshtein grid stops being acceptable (the
# reference's published lexicon config is 50k words with a BK-tree,
# docs/yangmiao/CRNN/crnn.md:148) and the driver-built BK-tree kernel
# route is taken instead — the same size-thresholded routing pattern as
# boilerplate.AC_TERM_THRESHOLD.
CORRECTION_INDEX_THRESHOLD = 10_000


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
    exactly what two sequential joins would AQE-cache anyway).

    The sargable length-band predicate |len(token) - len(word)| <= radius
    runs BEFORE levenshtein (edit distance is lower-bounded by the length
    difference, so the band loses nothing): Catalyst short-circuits the
    conjunction, so the O(len^2) DP only evaluates for the ~1/10th of the
    grid inside the band."""
    radius = max_cost + retry_extra
    band = (
        F.abs(F.length(F.col(token_col)) - F.length(F.col("word"))) <= radius
    )
    # thresholded levenshtein (early-exit banded DP): returns -1 when the
    # distance exceeds `radius`, so keep the >= 0 guard in the filter
    d = F.levenshtein(F.col(token_col), F.col("word"), radius)
    cands = (
        tokens_df.crossJoin(F.broadcast(dict_df))
        .filter(band)
        .withColumn("dist", d)
        .filter(F.col("dist") >= 0)
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


class BKTree:
    """BK-tree over levenshtein — the Spark-side analog of the
    reference's branch-and-bound trie walk (trietree_correct.py:153-199;
    its published lexicon config is 50k words, crnn.md:148). Built once
    on the driver, shipped to executors via closure capture; a query at
    radius r visits only subtrees whose edge distance lies within
    [d - r, d + r] (triangle inequality), turning the O(dict) scan into
    a small fraction of the lexicon per token.

    Robustness (both found by review, both with tests):
    - Nodes live in ONE flat list with integer child references, not
      nested lists — a nested representation pickles recursively and a
      chain-shaped tree (see below) blows the interpreter recursion
      limit exactly when Spark cloudpickles the mapInPandas closure.
    - Tiny-diameter lexicons (e.g. a single-character OCR charset: all
      pairwise distances 1) degenerate a BK-tree into a chain, making
      build O(n^2). Inserts whose walk exceeds _MAX_DEPTH divert to a
      linear overflow bucket instead (scanned exhaustively at query
      time — for such lexicons nearly everything is within radius
      anyway, so the scan IS the answer, and build cost stays
      O(n * _MAX_DEPTH))."""

    __slots__ = ("nodes", "overflow")

    _MAX_DEPTH = 256

    def __init__(self, entries: list[tuple]):
        """entries: (word, freq, line_id) tuples (dictionary file order
        preserved in line_id — the tie-break key downstream)."""
        # node: [word, [entries...], {dist: child_index}]
        self.nodes: list[list] = []
        self.overflow: list[tuple] = []
        for e in entries:
            self._add(e)

    def _add(self, e: tuple) -> None:
        from ..reference import levenshtein

        if not self.nodes:
            self.nodes.append([e[0], [e], {}])
            return
        idx = 0
        for _ in range(self._MAX_DEPTH):
            node = self.nodes[idx]
            d = levenshtein(e[0], node[0])
            if d == 0:
                node[1].append(e)  # duplicate words share one node
                return
            child = node[2].get(d)
            if child is None:
                self.nodes.append([e[0], [e], {}])
                node[2][d] = len(self.nodes) - 1
                return
            idx = child
        self.overflow.append(e)  # degenerate chain: cap the walk

    def query(self, term: str, radius: int) -> list[tuple]:
        """All (entry, dist) with levenshtein(term, word) <= radius."""
        from ..reference import levenshtein

        out: list[tuple] = []
        if self.nodes:
            stack = [0]
            while stack:
                word, payload, children = self.nodes[stack.pop()]
                d = levenshtein(term, word)
                if d <= radius:
                    out.extend((e, d) for e in payload)
                lo, hi = d - radius, d + radius
                stack.extend(c for dist, c in children.items() if lo <= dist <= hi)
        for e in self.overflow:
            d = levenshtein(term, e[0])
            if d <= radius:
                out.append((e, d))
        return out


def correction_candidates_indexed(
    tokens_df: DataFrame,
    dict_entries: list[tuple],
    token_col: str = "token",
    max_cost: int = 3,
    retry_extra: int = 3,
) -> DataFrame:
    """BK-tree route of correction_candidates for lexicon-scale
    dictionaries (>= CORRECTION_INDEX_THRESHOLD): identical output
    contract — (token, word, dist, freq, line_id) at the per-token
    effective radius — but candidate generation is a driver-built
    BK-tree probed per distinct token inside one mapInPandas pass,
    instead of an O(vocab x dict) broadcast levenshtein grid. The
    per-token eff_cost choice (escalate to max_cost + retry_extra only
    when nothing sits within max_cost) is applied in-kernel: the tree
    query returns the token's FULL candidate set, so no window is
    needed. tokens_df must be the single-column distinct-token frame
    (what correct_tokens probes with)."""
    import pandas as pd
    from pyspark.sql import types as T

    tree = BKTree(dict_entries)
    radius = max_cost + retry_extra
    schema = T.StructType(
        [
            T.StructField(token_col, T.StringType()),
            T.StructField("word", T.StringType()),
            T.StructField("dist", T.IntegerType()),
            T.StructField("freq", T.DoubleType()),
            T.StructField("line_id", T.LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            toks, words, dists, freqs, lids = [], [], [], [], []
            for tok in pdf[token_col]:
                if tok is None:
                    continue
                cands = tree.query(tok, radius)
                if not cands:
                    continue
                min_d = min(d for _, d in cands)
                eff = max_cost if min_d <= max_cost else radius
                for (word, freq, line_id), d in cands:
                    if d <= eff:
                        toks.append(tok)
                        words.append(word)
                        dists.append(d)
                        freqs.append(freq)
                        lids.append(line_id)
            if toks:
                yield pd.DataFrame(
                    {
                        token_col: toks,
                        "word": words,
                        "dist": pd.array(dists, dtype="int32"),
                        "freq": freqs,
                        "line_id": lids,
                    }
                )

    return tokens_df.select(token_col).mapInPandas(gen, schema=schema)


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
    dict_entries: list[tuple] | None = None,
) -> DataFrame:
    """Distinct-token correction map: (token, corrected).

    Tokens absent from the dictionary even at the widened radius fall back
    to identity (trietree_correct.py:258-259). Correcting DISTINCT tokens
    (not occurrences) keeps the nested-loop probe proportional to
    vocabulary, not corpus, then a broadcast map-join rehydrates
    occurrences — at 100 TB the distinct-token side is what you want
    flowing through the levenshtein band join.

    Dictionary routing: the default is the Catalyst broadcast band join
    (JVM-side, zero Python — right at dict.txt scale). When the caller
    holds the dictionary driver-side (it is broadcast-sized by
    definition), pass `dict_entries` as (word, freq, line_id) tuples:
    at >= CORRECTION_INDEX_THRESHOLD entries the BK-tree kernel route is
    taken (the reference's own 50k-lexicon configuration, crnn.md:148),
    below it the entries are ignored in favor of the band join.
    """
    toks = tokens_df.select(token_col).distinct()
    if normalize:
        toks = toks.select(uniform(F.col(token_col)).alias(token_col)).distinct()
    if dict_entries is not None and len(dict_entries) >= CORRECTION_INDEX_THRESHOLD:
        cands = correction_candidates_indexed(toks, dict_entries, token_col, max_cost)
    else:
        cands = correction_candidates(toks, dict_df, token_col, max_cost)
    resolved = resolve_candidates(cands, token_col)
    return toks.join(resolved, token_col, "left").select(
        F.col(token_col),
        F.coalesce("corrected", F.col(token_col)).alias("corrected"),
    )
