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
