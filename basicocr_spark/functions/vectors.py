"""Vector math over array<float>/array<double> embedding columns.

Pure higher-order-function arithmetic (zip_with/aggregate) — stays in the
JVM, vectorizes under whole-stage codegen, and has exact DuckDB list-op
oracles. Inputs are cast to double before accumulation so Spark and the
oracle agree to float64 ULPs; ranking outputs round to 6 decimals to keep
cross-engine top-k stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


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


def _cosine_seq_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine whose float64 summation ORDER is the sequential
    left-to-right fold of the expression form (np.cumsum is an inclusive
    sequential prefix scan), so results are bit-identical to
    cosine(a, b) — pinned by tests/test_hash_kernels.py. Exists because
    a per-pair F.aggregate lambda evaluates interpreted: on a
    probes x corpus scoring join the arithmetic is ~100x the FLOPs cost."""

    def stack(s: pd.Series) -> np.ndarray:
        return np.stack([np.asarray(v, dtype=np.float64) for v in s])

    A, B = stack(a), stack(b)
    dot = np.cumsum(A * B, axis=1)[:, -1]
    na = np.sqrt(np.cumsum(A * A, axis=1)[:, -1])
    nb = np.sqrt(np.cumsum(B * B, axis=1)[:, -1])
    d = na * nb
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(d == 0.0, 0.0, dot / d)
    return pd.Series(out)


def cosine_seq_kernel(a: Column, b: Column) -> Column:
    """pandas-UDF wrapper for _cosine_seq_batch, created per call — the
    DDL return-type parse needs an active SparkSession, so module-import
    time (driver contract loads before any session exists) is too early."""
    return pandas_udf(_cosine_seq_batch, "double")(a, b)


def cosine_rounded_fast(a: Column, b: Column, scale: int = 6) -> Column:
    """Drop-in replacement for cosine_rounded on scoring joins (the
    rounding stays a Spark-side F.round so tie behavior is unchanged)."""
    return F.round(cosine_seq_kernel(a, b), scale)


def group_vector_sums_df(df, group_col: str = "label", vec_col: str = "embedding"):
    """Per-partition per-group element-wise vector sum + count, Arrow-
    batched: ONE partial row per (input partition, group) instead of the
    n x d row explosion a posexplode-based centroid build shuffles (at
    100 TB of embeddings that explode IS the job). The tiny partial
    table (partitions x labels rows) is what flows into the final
    per-dimension combine. Requires fixed-dimension vectors within a
    group (the embedding-table contract; ragged vectors would need the
    posexplode form, which remains the oracle)."""
    import pandas as pd

    gt = df.schema[group_col].dataType.simpleString()
    schema = f"{group_col} {gt}, n long, sums array<double>"

    def gen(batches):
        acc: dict = {}
        for pdf in batches:
            for g, vecs in pdf.groupby(group_col, sort=False, dropna=False)[vec_col]:
                M = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
                s = M.sum(axis=0)
                prev = acc.get(g)
                if prev is None:
                    acc[g] = [len(vecs), s]
                else:
                    prev[0] += len(vecs)
                    prev[1] = prev[1] + s
        if acc:
            yield pd.DataFrame(
                {
                    group_col: list(acc.keys()),
                    "n": [v[0] for v in acc.values()],
                    "sums": [v[1] for v in acc.values()],
                }
            )

    return df.select(group_col, vec_col).mapInPandas(gen, schema=schema)


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
