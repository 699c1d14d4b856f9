"""Vector math over array<float>/array<double> embedding columns.

Pure higher-order-function arithmetic (zip_with/aggregate) — stays in the
JVM, vectorizes under whole-stage codegen, and has exact DuckDB list-op
oracles. Inputs are cast to double before accumulation so Spark and the
oracle agree to float64 ULPs; ranking outputs round to 6 decimals to keep
cross-engine top-k stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d == 0, F.lit(0.0)).otherwise(dot(a, b) / d)


def cosine_rounded(a: Column, b: Column, scale: int = 6) -> Column:
    return F.round(cosine(a, b), scale)


def hyperplane_sign_bucket(a: Column, num_planes: int = 8, plane_offset: int = 0) -> Column:
    """Deterministic LSH bucket id: sign bits against `num_planes` fixed
    pseudo-random hyperplanes h_j[i] = (((i+1)*(j+1)*2654435761) % 1000)
    / 499.5 - 1 — pure arithmetic, reproducible in any SQL engine.
    `plane_offset` selects a disjoint plane family (j starts there), so
    banded LSH reuses the same formula with per-band offsets."""
    bucket = F.lit(0).cast("long")
    for j in range(plane_offset, plane_offset + num_planes):
        proj = F.aggregate(
            F.transform(
                a,
                lambda v, i: v.cast("double")
                * (
                    ((((i + 1) * F.lit(j + 1) * F.lit(2654435761)) % F.lit(1000)).cast("double"))
                    / F.lit(499.5)
                    - F.lit(1.0)
                ),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket * 2 + F.when(proj >= 0, 1).otherwise(0)
    return bucket
