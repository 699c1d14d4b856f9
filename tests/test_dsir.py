"""Behavioral pins for DSIR importance resampling: generic oracle
parity can't tell 'both engines agree on arbitrary weights' from a real
domain-selection signal, so plant a corpus where one off-target doc is
written in the target domain's words and assert it outranks every other
off-target doc; also pin the selection plan to TakeOrderedAndProject
(per-partition top-k, never a global window)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark import queries as Q  # noqa: E402

TARGET_TEXTS = [
    "parliament voted on the treaty amendment today",
    "the committee published its treaty report",
    "voted amendment carried by the parliament",
    "treaty report published by the committee",
]
OFFDOMAIN_TEXTS = [
    "zorp blag frumious borogove mimsy outgrabe",
    "frumious zorp mimsy blag borogove snicker",
    "borogove outgrabe snicker frumious blag zorp",
]
DOCS = (
    # target slice: lang='en', domain-A wording
    [(i, t, "en", "s0") for i, t in enumerate(TARGET_TEXTS)]
    # off-target slice in its own wording
    + [(10 + i, t, "xx", "s1") for i, t in enumerate(OFFDOMAIN_TEXTS)]
    # the doc DSIR exists to find: off-target lang, target-domain words
    + [(20, TARGET_TEXTS[0], "xx", "s1")]
    # degenerate rows: excluded (no features)
    + [(30, "", "xx", "s1"), (31, "   ", "xx", "s1")]
)


@pytest.fixture(scope="module")
def dsir_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dsir_sf"))
    spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def test_dsir_ranks_target_like_docs_first(spark, dsir_dir):
    rows = {r["doc_id"]: r for r in Q.docs_dsir_sample(spark, dsir_dir).collect()}
    # K=50 > corpus, so every featured doc is returned; empty docs are not
    assert set(rows) == {0, 1, 2, 3, 10, 11, 12, 20}
    # the target-worded off-target doc outweighs every off-domain doc
    off = [rows[i]["log_w"] for i in (10, 11, 12)]
    assert rows[20]["log_w"] > max(off)
    # identical text => identical importance weight regardless of lang
    assert rows[20]["log_w"] == rows[0]["log_w"]
    # but distinct Gumbel keys (per-doc hash noise differs)
    assert rows[20]["sample_key"] != rows[0]["sample_key"]
    # off-domain docs score below the corpus-likeness baseline of the
    # target slice (their features are raw-only: ct=0 buckets)
    assert max(off) < min(rows[i]["log_w"] for i in (0, 1, 2, 3))


def test_dsir_selection_is_take_ordered(spark, dsir_dir):
    plan = Q.docs_dsir_sample(spark, dsir_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
