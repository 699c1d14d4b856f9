"""Behavioral pin for the pipeline funnel: plant a corpus where each
gate has a DIFFERENT survivor set (the driver corpus zeroes two gates,
so parity alone can't show the per-gate counts are independent) and
assert every count, including the intersection."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark import queries as Q  # noqa: E402

# a page that passes C4 (3 terminal-punctuated >=5-word lines) AND
# Gopher (>=50 words, stopwords, alphabetic) AND is unique AND has no
# duplicated 8-token segments
CLEAN = "\n".join(
    [
        "The quick brown fox jumps over the lazy dog near the river bank today.",
        "Be sure to have that report ready with all of the figures included soon!",
        " ".join(f"unique{i}" for i in range(30)) + " and the rest of this text is fine.",
    ]
)
SEG_DUP = " ".join(["the be"] + [f"seg{i}" for i in range(6)])  # one 8-token segment
DOCS = [
    (0, CLEAN, "en", "s0"),                        # passes everything
    (1, CLEAN, "en", "s0"),                        # exact duplicate: fails k_exact (and k_seg)
    (2, "no punctuation here at all", "en", "s1"),  # fails c4 + gopher, unique
    (3, SEG_DUP + " " + SEG_DUP.replace("seg", "tail"), "en", "s1"),  # shares segs w/ 4
    (4, SEG_DUP + " " + SEG_DUP.replace("seg", "other"), "en", "s1"),
]


@pytest.fixture(scope="module")
def funnel_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("funnel_sf"))
    spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def test_funnel_counts(spark, funnel_dir):
    row = Q.docs_pipeline_funnel(spark, funnel_dir).collect()[0]
    assert row["n_docs"] == 5
    # docs 0 and 1 are the only C4/Gopher passers (identical clean text)
    assert row["n_pass_c4"] == 2
    assert row["n_pass_gopher"] == 2
    # doc 1 is the exact dup of 0
    assert row["n_pass_exact"] == 4
    # docs 0/1 are fully mutually duplicated segments (dup_frac 1.0);
    # docs 3/4 share exactly one of their two segments (0.5, kept);
    # doc 2 has no full segment (kept)
    assert row["n_pass_segment"] == 3
    # only doc 0's twin fails exact, doc 1 fails seg too, 2 fails
    # quality, 3/4 fail quality: nothing passes all gates but doc 0
    # fails segment (fully duplicated vs doc 1) -> intersection is 0
    assert row["n_pass_all"] == 0
