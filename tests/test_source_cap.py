"""Behavioral pins for docs_source_cap_sample (per-source doc caps):

- a source with more than SOURCE_CAP docs keeps exactly SOURCE_CAP;
  smaller sources keep everything;
- the pick is deterministic (two runs agree) and content-free (keyed on
  doc_id, so re-ordering input rows cannot change the kept set);
- ranks within a source are 1..k with no gaps.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark import queries as Q  # noqa: E402

DOC_SCHEMA = "doc_id long, text string, lang string, source string"


@pytest.fixture(scope="module")
def cap_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cap_sf"))
    docs = [(i, f"text body {i}", "en", "big") for i in range(Q.SOURCE_CAP + 17)]
    docs += [
        (1000 + i, f"other text {i}", "en", "small") for i in range(5)
    ]
    spark.createDataFrame(docs, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def test_cap_binds_only_above_cap(spark, cap_dir):
    rows = Q.docs_source_cap_sample(spark, cap_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src["big"]) == Q.SOURCE_CAP
    assert len(by_src["small"]) == 5  # under the cap: everything kept
    for src, grp in by_src.items():
        assert sorted(r["rk"] for r in grp) == list(range(1, len(grp) + 1))


def test_pick_is_deterministic(spark, cap_dir):
    a = {(r["doc_id"], r["rk"]) for r in Q.docs_source_cap_sample(spark, cap_dir).collect()}
    b = {(r["doc_id"], r["rk"]) for r in Q.docs_source_cap_sample(spark, cap_dir).collect()}
    assert a == b
