"""HTML boilerplate stripping as pure Catalyst column math.

New logic mandated by the north rule (the reference has no HTML
handling; its closest analogs are the AC-automaton stop-content stripper,
contrib/acautomata Test.java:60-81, and the stop-word anti-join,
contrib/trietree/wordFrequency/readData.py:23-28). The frozen algorithm
lives in basicocr_spark.reference (boilerplate_keep_score /
extract_main_text) — this module is its set-level expression: split into
blocks, score each with text-density / link-density / Readability-style
class weights, keep positive blocks, then strip stop-content terms.

Everything is higher-order functions + regexp over one string column:
whole-stage codegen'd, zero Python, zero shuffle — at 100 TB this stage
is a pure map over the scan.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

TAG_RE = "<[^>]*>"
# (?s): the reference compiles this with re.S, so '.' must cross \r /
# U+2028; (?U) on whitespace: Java's \s is ASCII-only by default while
# Python's is Unicode-aware — without the flag the column pipeline and
# the Python oracle/Arrow kernels disagree on NBSP/ideographic spaces
A_INNER_RE = r"(?s)<a\b[^>]*>(.*?)</a>"
WS_RE = r"(?U)\s+"
NEG_CLASS_RE = r'class="(?:nav|footer|sidebar)"'


def _tagless(block: Column) -> Column:
    return F.trim(F.regexp_replace(F.regexp_replace(block, TAG_RE, ""), WS_RE, " "))


def _word_count(tagless: Column) -> Column:
    return F.when(tagless == "", F.lit(0)).otherwise(F.size(F.split(tagless, WS_RE)))


def _link_len(block: Column) -> Column:
    inners = F.regexp_extract_all(block, F.lit(A_INNER_RE), 1)
    return F.aggregate(
        F.transform(inners, lambda s: F.length(_tagless(s))),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def block_score(block: Column) -> Column:
    """score = word_count + class_bonus - 50 * link_density (frozen spec;
    see reference.boilerplate_keep_score)."""
    tl = _tagless(block)
    ld = _link_len(block) / F.greatest(F.length(tl), F.lit(1)).cast("double")
    bonus = (
        F.when(block.contains("<p>") | block.contains('class="content"'), 25).otherwise(0)
        - F.when(block.contains("<li>") | (F.regexp_count(block, F.lit(NEG_CLASS_RE)) > 0), 25).otherwise(0)
    )
    return _word_count(tl).cast("double") + bonus - F.lit(50.0) * ld


def stop_content_pattern(terms: list[str]) -> str:
    """Longest-first alternation — the canonicalized AC-automaton
    replace-all (Test.java:60-81). Delegates to the reference builder so
    the Spark pattern can never drift from the oracle's."""
    from .. import reference as R

    return R.stop_term_pattern(terms)


def strip_stop_content(col: Column, terms: list[str]) -> Column:
    if not terms:
        return col
    return F.regexp_replace(col, stop_content_pattern(terms), "")


def strip_stop_content_df(df, terms: list[str], text_col: str = "text", out_col: str = "clean"):
    """J6 at dictionary scale (Test.java:64-66 double-array-trie AC):
    small dictionaries stay on the whole-stage-codegen'd regexp column
    (zero Python, the common case); at/above AC_TERM_THRESHOLD terms the
    broadcast Aho-Corasick automaton takes over in one mapInPandas pass —
    O(text) per document independent of dictionary size, where the
    compiled alternation re-tries the whole dictionary at every scan
    position. Both paths produce identical output (leftmost-longest;
    pinned by tests/test_aho.py)."""
    from ..functions.aho import AC_TERM_THRESHOLD, strip_terms_ac_df

    if len(terms) >= AC_TERM_THRESHOLD:
        return strip_terms_ac_df(df, terms, text_col, out_col)
    return df.withColumn(out_col, strip_stop_content(F.col(text_col), terms))


def extract_main_text(col: Column, stop_terms: list[str]) -> Column:
    """Full text-span pipeline: blocks -> score -> keep -> tagless ->
    join -> stop-strip -> whitespace-normalize."""
    blocks = F.split(col, "\n")
    kept = F.filter(blocks, lambda b: block_score(b) > 0)
    joined = F.array_join(F.filter(F.transform(kept, _tagless), lambda t: t != ""), " ")
    return F.trim(F.regexp_replace(strip_stop_content(joined, stop_terms), WS_RE, " "))
