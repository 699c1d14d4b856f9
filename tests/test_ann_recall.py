"""Behavioral pin for the ANN recall evaluation: on the driver corpus
the labels are uncorrelated with L2 structure, so recall is genuinely
low — which means parity alone can't show the operator rewards a good
index. Build 10 well-separated clusters of 3 members whose labels ARE
the metric structure: each probe's exact top-2 is forced to be its two
cluster-mates as a SET (robust to intra-cluster quantization ties), the
coarse router maps each probe to its own cell, and recall must be 1.0
for every probe."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark import queries as Q  # noqa: E402

DIM = 64
N_CLUSTERS = 10
MEMBERS = 3


def _vec(label: int, j: int) -> list[float]:
    # cluster center: 5.0 on the dims where d % N_CLUSTERS == label
    # (>= 6 separating dims, inter-cluster d2 >= 2 * 6 * 25 = 300);
    # member offset: 0.25 on one member-specific dim (intra d2 ~ 0.125)
    v = [5.0 if d % N_CLUSTERS == label else 0.0 for d in range(DIM)]
    v[(label * MEMBERS + j) % DIM] += 0.25 * (j + 1)
    return v


EMB = [
    (label * MEMBERS + j, _vec(label, j), label)
    for label in range(N_CLUSTERS)
    for j in range(MEMBERS)
]


@pytest.fixture(scope="module")
def clustered_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann_sf"))
    spark.createDataFrame(
        EMB, "vec_id long, embedding array<float>, label long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet")
    )
    return d


def test_recall_is_perfect_on_clustered_index(spark, clustered_dir):
    rows = Q.emb_ann_recall(spark, clustered_dir).collect()
    assert len(rows) == N_CLUSTERS * MEMBERS  # every vector is a probe
    by_q = {r["q_id"]: r for r in rows}
    for q_id, r in by_q.items():
        assert r["n_hits"] == 2, f"probe {q_id}: {r}"
        assert r["recall_at_2"] == 1.0
