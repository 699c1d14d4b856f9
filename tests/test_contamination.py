"""Benchmark decontamination (docs_benchmark_contamination): corpus docs
sharing any exact 13-token gram with the benchmark/eval slice get flagged
(GPT-3 appendix C; Lee et al. 2022). Planted-overlap tests pin the gram
width boundary (13 hits, 12 doesn't), the benchmark-side df cap (shared
chrome never flags), and multi-benchmark-doc counting."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark import queries as Q  # noqa: E402
from basicocr_spark.functions import textstats as TS  # noqa: E402

SF = "/root/testdata/sf0.001"

# a distinctive 20-token benchmark passage (the "eval answer")
PASSAGE = [f"bench{i}" for i in range(20)]
# a second benchmark doc sharing a 13-token window with the first
SHARED13 = PASSAGE[3:16]
# navigation chrome: a 13-gram present in MANY benchmark docs
CHROME = [f"nav{i}" for i in range(13)]


def _toks_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, toks array<string>")


def test_planted_contamination_flags_and_boundaries(spark):
    filler = lambda tag, n: [f"{tag}{i}" for i in range(n)]
    bench = _toks_df(
        spark,
        [
            (1, PASSAGE),
            (8, filler("b8u", 5) + SHARED13 + filler("b8v", 5)),
        ]
        # 11 chrome-carrying benchmark docs: the chrome gram's bench df
        # (11) exceeds CONTAM_BENCH_DF_CAP (10) -> dropped pre-broadcast
        + [(15 + 7 * i, CHROME + filler(f"bc{i}", 4)) for i in range(11)],
    )
    corpus = _toks_df(
        spark,
        [
            # verbatim 13-token lift from PASSAGE positions 2..14
            (100, filler("x", 6) + PASSAGE[2:15] + filler("y", 6)),
            # only 12 consecutive tokens shared: below the gram width
            (101, filler("p", 6) + PASSAGE[2:14] + filler("q", 6)),
            # SHARED13 appears in BOTH benchmark docs 1 and 8
            (102, SHARED13 + filler("r", 3)),
            # chrome-only overlap: capped away, must NOT flag
            (103, CHROME + filler("s", 4)),
            # no overlap at all
            (104, filler("z", 30)),
        ],
    )
    got = {
        r["doc_id"]: (r["n_contam_grams"], r["n_bench_docs"])
        for r in Q.benchmark_contamination(corpus, bench).collect()
    }
    assert got == {
        100: (1, 1),  # exactly one 13-gram window fits in a 13-token lift
        102: (1, 2),  # the shared gram implicates both benchmark docs
    }, got


def test_longer_lift_counts_every_gram_window(spark):
    # an 16-token verbatim lift contains 16-13+1 = 4 distinct 13-grams
    bench = _toks_df(spark, [(1, PASSAGE)])
    corpus = _toks_df(spark, [(200, PASSAGE[2:18])])
    (row,) = Q.benchmark_contamination(corpus, bench).collect()
    assert (row["doc_id"], row["n_contam_grams"], row["n_bench_docs"]) == (200, 4, 1)


def test_catalog_entry_matches_duckdb_oracle(spark, tmp_path):
    """The (spark, sf_dir) entry over a synthetic documents.parquet with
    planted cross-slice overlaps must match the DuckDB oracle SQL."""
    import duckdb

    long_a = " ".join(PASSAGE + [f"tailA{i}" for i in range(5)])
    rows = [
        # doc 8 (% 7 == 1): benchmark slice, carries PASSAGE
        (8, long_a, "en", "s0"),
        # doc 10: corpus, lifts 14 tokens of PASSAGE -> flagged (2 grams)
        (10, " ".join([f"c{i}" for i in range(4)] + PASSAGE[1:15]), "en", "s1"),
        # doc 11: corpus, 12-token overlap only -> clean
        (11, " ".join(PASSAGE[1:13] + [f"d{i}" for i in range(8)]), "en", "s1"),
        # doc 12: corpus, no overlap
        (12, " ".join(f"e{i}" for i in range(25)), "en", "s2"),
        # doc 15 (% 7 == 1): second benchmark doc, also carries PASSAGE
        # (so doc 10's grams implicate two bench docs)
        (15, " ".join([f"f{i}" for i in range(3)] + PASSAGE), "en", "s0"),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    got = sorted(
        tuple(r) for r in Q.docs_benchmark_contamination(spark, d).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(Q.DOCS_CONTAMINATION_SQL).fetchall())
    assert got == want
    assert [r[0] for r in got] == [10], got  # only the >=13-token lift flags


def test_driver_corpus_has_contamination_rows(spark):
    """The deterministic benchmark slice must actually flag docs on the
    driver corpus (planted cross-doc duplications cross the slice) —
    a vacuously-empty result would make the driver row meaningless."""
    n = Q.docs_benchmark_contamination(spark, SF).count()
    assert n > 0


def test_bench_gram_side_is_broadcast(spark):
    """Scale shape: the benchmark gram table must broadcast — the corpus
    gram projection joins map-side, never shuffling the corpus by gh."""
    df = Q.docs_benchmark_contamination(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
