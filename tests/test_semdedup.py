"""SemDeDup (emb_semdedup / Q.semdedup): semantic dedup within coarse
cells. Planted-geometry tests pin the three rules that make the verdict:
(1) a near-dup pair (cos >= tau) keeps exactly the member with the LOWER
cosine to its cell centroid (the paper's keep-the-least-typical rule),
(2) the pair join is cell-local — identical vectors in different cells
never see each other, (3) the id tie-break on equal centroid-cosine is
deterministic (lower vec_id survives)."""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basicocr_spark import queries as Q  # noqa: E402

SCHEMA = "vec_id long, embedding array<float>, label int"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["vec_id"]: r for r in Q.semdedup(df).collect()}


def test_near_dup_pair_keeps_the_least_typical(spark):
    # cell 0 centroid is pulled toward (1, 0): v1 and v2 are near-dups
    # of each other (cos = 1.0 > tau) but v1 sits closer to the
    # centroid than v2 does... use distinct magnitudes with the same
    # direction so cent_cos ties are impossible via the third vector.
    rows = [
        # two same-direction near-dups; a third vector skews the centroid
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [2.0, 0.0, 0.0, 0.0], 0),  # same direction: cos(v1, v2) = 1.0
        (3, [0.0, 1.0, 0.0, 0.0], 0),  # orthogonal: cos to both = 0 < tau
    ]
    got = _run(spark, rows)
    assert len(got) == 3
    # v1 and v2 have identical cent_cos (same direction) -> id tie-break:
    # v1 (lower id) keeps, v2 drops
    assert got[1]["cent_cos"] == got[2]["cent_cos"]
    assert got[1]["keep"] is True
    assert got[2]["keep"] is False
    # the orthogonal vector has no near-dup: keeps
    assert got[3]["keep"] is True


def test_keep_rule_prefers_low_centroid_cosine(spark):
    # centroid of cell 0 = mean of the three vectors, dominated by the
    # two near-dups around (1, 0.1) — the third is off-axis. Between the
    # two near-dups, the one LESS aligned with the centroid survives.
    a = [1.0, 0.00, 0.0, 0.0]
    b = [1.0, 0.30, 0.0, 0.0]  # cos(a, b) ~ 0.958 > tau; b is nearer the
    # centroid iff centroid leans positive on dim 1 — plant a puller:
    puller = [0.0, 1.0, 0.0, 0.0]
    got = _run(spark, [(10, a, 0), (11, b, 0), (12, puller, 0)])
    # centroid ~ (0.667, 0.433, 0, 0): cent_cos(b) > cent_cos(a)
    assert got[10]["cent_cos"] < got[11]["cent_cos"]
    assert got[10]["keep"] is True  # least typical survives
    assert got[11]["keep"] is False
    assert got[12]["keep"] is True  # cos(puller, a/b) < tau: not a dup


def test_pair_join_is_cell_local(spark):
    # identical vectors in DIFFERENT cells: never compared, both keep
    v = [0.5, 0.5, 0.5, 0.5]
    got = _run(spark, [(20, v, 0), (21, v, 1)])
    assert got[20]["keep"] is True
    assert got[21]["keep"] is True
    # and within one cell the same geometry drops the higher id
    got2 = _run(spark, [(30, v, 2), (31, v, 2)])
    assert got2[30]["keep"] is True
    assert got2[31]["keep"] is False


def test_decision_table_covers_every_vector(spark):
    rows = [(i, [float(i + 1), 1.0, 0.0, 0.0], i % 3) for i in range(12)]
    got = _run(spark, rows)
    assert sorted(got) == list(range(12))
    for r in got.values():
        assert r["keep"] in (True, False)
        assert -1.0 <= r["cent_cos"] <= 1.0 and not math.isnan(r["cent_cos"])
