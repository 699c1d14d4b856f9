"""The BPE-ish pre-tokenizer pattern must count identically in Spark
(Java regex) and DuckDB (RE2) — and the driver corpus is punct-free
(whitespace count == subword count there), so this pins the interesting
cases (contractions, punctuation runs, digits, CJK, hyphens) by hand."""

import os
import sys

import duckdb
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark.queries import BPE_TOKEN_PATTERN  # noqa: E402

CASES = [
    ("don't stop! 123 go-go", 8),  # don | 't | _stop | ! | _123 | _go | - | go
    ("hello world", 2),
    ("", 0),
    ("a1b2", 4),  # a | 1 | b | 2
    ("...", 1),
    ("price: $4.99", 6),  # price | : | _$ | 4 | . | 99
    ("中文 text", 2),  # \p{L} covers CJK: 中文 | _text
]


def test_bpe_counts_pinned_and_cross_engine(spark):
    df = spark.createDataFrame([(t,) for t, _ in CASES], "text string")
    got = [
        r[0]
        for r in df.select(
            F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_TOKEN_PATTERN), F.lit(0)))
        ).collect()
    ]
    assert got == [n for _, n in CASES], list(zip([t for t, _ in CASES], got))

    con = duckdb.connect()
    pat = BPE_TOKEN_PATTERN.replace("'", "''")
    for text, n in CASES:
        lit = text.replace("'", "''")
        (dn,) = con.execute(
            f"SELECT len(regexp_extract_all('{lit}', '{pat}'))"
        ).fetchone()
        assert dn == n, (text, dn, n)


def test_bpe_apply_merge_is_greedy_left_to_right(spark):
    """The JVM fold in queries._bpe_apply_merge must equal the reference
    greedy scan on the adversarial shapes: overlapping pairs (aaa + (a,a)
    merges left pair only), repeated non-overlapping pairs, merged
    symbols as pair members, and no-op when the pair is absent."""
    from basicocr_spark.queries import _bpe_apply_merge

    cases = [
        (["a", "a", "a"], ("a", "a"), ["aa", "a"]),
        (["a", "a", "a", "a"], ("a", "a"), ["aa", "aa"]),
        (["a", "b", "a", "b"], ("a", "b"), ["ab", "ab"]),
        (["ab", "a", "b"], ("ab", "a"), ["aba", "b"]),
        (["x", "y"], ("a", "b"), ["x", "y"]),
        (["q"], ("q", "q"), ["q"]),
        ([], ("a", "b"), []),
    ]
    df = spark.createDataFrame(
        [(i, syms) for i, (syms, _, _) in enumerate(cases)],
        "i long, syms array<string>",
    )
    for i, (syms, (a, b), want) in enumerate(cases):
        got = (
            df.filter(F.col("i") == i)
            .select(_bpe_apply_merge(F.col("syms"), a, b).alias("m"))
            .collect()[0][0]
        )
        assert got == want, (syms, (a, b), got, want)


def test_bpe_merges_match_pure_python_trainer(spark):
    """docs_bpe_merges (the distributed trainer loop) vs an in-process
    reference trainer on a tiny planted corpus with a known merge
    sequence."""
    import tempfile
    from collections import Counter

    from basicocr_spark.queries import N_BPE_MERGES, docs_bpe_merges

    texts = [
        "low low low lower lowest",
        "new newer newest low",
        "wider wide widest new new",
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        ).write.parquet(f"{d}/documents.parquet")
        got = [tuple(r) for r in docs_bpe_merges(spark, d).collect()]

    vocab = Counter(w for t in texts for w in t.split())
    state = {w: tuple(w) for w in vocab}
    ref = []
    for rk in range(1, N_BPE_MERGES + 1):
        stats = Counter()
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += vocab[w]
        if not stats:
            break
        (a, b), total = min(stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        ref.append((rk, a, b, total))
        for w, syms in state.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            state[w] = tuple(out)
    assert got == ref


def test_bpe_trainer_merge_exhaustion_matches_oracle(spark, tmp_path):
    """A corpus whose pair supply dies before N_BPE_MERGES: the Spark
    trainer breaks early; the oracle's remaining rounds must be identity
    (LEFT JOIN ON TRUE against the empty argmax), not a vocab-killing
    cross join. Both the merge lists and the encoded subword counts must
    agree."""
    import duckdb

    from basicocr_spark.queries import (
        DOCS_BPE_MERGES_SQL,
        DOCS_BPE_SUBWORD_SQL,
        docs_bpe_merges,
        docs_bpe_subword_counts,
    )

    d = str(tmp_path)
    spark.createDataFrame(
        [(0, "ab ab ab"), (1, "cd cd")], "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    got_m = [tuple(r) for r in docs_bpe_merges(spark, d).collect()]
    got_s = [tuple(r) for r in docs_bpe_subword_counts(spark, d).collect()]
    assert len(got_m) == 2  # (a,b) then (c,d), then exhaustion

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    want_m = sorted(con.execute(DOCS_BPE_MERGES_SQL).fetchall())
    want_s = sorted(con.execute(DOCS_BPE_SUBWORD_SQL).fetchall(), key=lambda r: r[2])
    assert sorted(got_m) == [tuple(r) for r in want_m]
    assert got_s == [tuple(r) for r in want_s]
