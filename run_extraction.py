#!/usr/bin/env python
"""Production extraction driver — the spark-submit surface.

    spark-submit --master <cluster> --py-files basicocr_spark.zip \
        run_extraction.py --input <parquet dir of interleaved docs> \
        --output <snapshot root> [--batch-size 100000] [--max-spans 64]

Runs the full north-rule job: ingest -> range-partition by doc_id ->
salt heavy docs -> fused zero-shuffle extraction -> merge salted slices
-> snapshot-commit (data + per-partition lineage manifest, atomic
marker) in doc_id-batched snapshots, resuming idempotently: on restart
only doc_ids absent from committed snapshots are processed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F

from basicocr_spark import fixtures as FX
from basicocr_spark import schemas as S
from basicocr_spark.operators.extraction import extract_documents_fused_arrow
from basicocr_spark.operators.salting import (
    merge_salted_extraction,
    salt_heavy_docs,
    salt_key,
    split_salt_key,
)
from basicocr_spark.plans.checkpoint import SnapshotWriter


def load_recognizer(spec: str | None, model_path: str | None):
    """CLI resolution of the resolve_recognizer seam. Exactly one of:
    --recognizer-model <path>: a TorchScript CRNN checkpoint, adapted via
    crnn_forward_from_torchscript. --recognizer <module>:<attr>: attr is
    a ZERO-ARG FACTORY returning the forward callable (list[media_ref]
    -> list[logits|None]); a factory (not the callable itself) so user
    config rides module state instead of CLI plumbing. Neither: None —
    the fused kernels use the broadcast fixture-logits default."""
    if model_path and spec:
        raise SystemExit("--recognizer and --recognizer-model are exclusive")
    if model_path:
        from basicocr_spark.operators.extraction import crnn_forward_from_torchscript

        return crnn_forward_from_torchscript(model_path)
    if spec is None:
        return None
    import importlib

    mod, sep, attr = spec.partition(":")
    if not sep or not attr:
        raise SystemExit(f"--recognizer must be <module>:<factory>, got {spec!r}")
    return getattr(importlib.import_module(mod), attr)()


def run(
    spark: SparkSession,
    input_dir: str,
    output_root: str,
    batch_size: int = 100_000,
    max_spans: int = 64,
    n_partitions: int | None = None,
    catalog_table: str | None = None,
    recognizer=None,
) -> dict:
    n_parts = n_partitions or spark.sparkContext.defaultParallelism * 2
    docs = spark.read.schema(S.DOCUMENTS).parquet(input_dir)
    writer = SnapshotWriter(spark, output_root, catalog_table=catalog_table)
    pending = writer.pending(docs).repartitionByRange(n_parts, "doc_id")

    # recognition + dictionary sides (fixture-driven in this build; a real
    # deployment broadcasts model weights the same way)
    logits_rows = FX.gen_media_logits(64, FX.SEED)
    dict_lines = FX.gen_dictionary(FX.SEED)

    stats = {"snapshots": [], "docs": 0, "spans": 0, "wall_sec": 0.0}
    t_start = time.perf_counter()
    while True:
        batch = pending.limit(batch_size)
        salted = salt_heavy_docs(batch, max_spans=max_spans)
        keyed = salted.select(
            salt_key(F.col("doc_id"), F.col("salt")).alias("doc_id"), "spans"
        )
        extracted = extract_documents_fused_arrow(
            keyed, logits_rows, dict_lines, FX.STOP_TERMS, recognizer=recognizer
        )
        did, salt = split_salt_key(F.col("doc_id"))
        merged = merge_salted_extraction(
            extracted.select(did.alias("doc_id"), salt.alias("salt"), "spans")
        )
        info = writer.commit(merged)
        n_docs = sum(d for d, _ in info["partitions"].values())
        n_spans = sum(sp for _, sp in info["partitions"].values())
        if n_docs == 0:
            break
        stats["snapshots"].append(info["snapshot_id"])
        stats["docs"] += n_docs
        stats["spans"] += n_spans
        pending = writer.pending(docs).repartitionByRange(n_parts, "doc_id")
        if n_docs < batch_size:
            break
    stats["wall_sec"] = round(time.perf_counter() - t_start, 3)
    stats["docs_per_sec"] = round(stats["docs"] / stats["wall_sec"], 1) if stats["wall_sec"] else 0.0
    return stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--batch-size", type=int, default=100_000)
    ap.add_argument("--max-spans", type=int, default=64)
    ap.add_argument(
        "--recognizer",
        default=None,
        help="module:factory - zero-arg factory returning the model forward "
        "(list[media_ref] -> list[logits|None]); replaces the fixture-logits "
        "default (see operators.extraction.resolve_recognizer)",
    )
    ap.add_argument(
        "--recognizer-model",
        default=None,
        help="TorchScript CRNN checkpoint path, adapted via "
        "crnn_forward_from_torchscript (requires torch on executors)",
    )
    ap.add_argument(
        "--catalog-table",
        default=None,
        help="Iceberg table name (e.g. cat.db.extracted): snapshots commit "
        "via writeTo() to <name>/<name>_docids/<name>_manifest instead of "
        "the --output directory model (requires the Iceberg runtime + "
        "configured catalog; fails fast at startup otherwise)",
    )
    args = ap.parse_args()
    spark = (
        SparkSession.builder.appName("basicocr_extraction")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    try:
        stats = run(
            spark,
            args.input,
            args.output,
            args.batch_size,
            args.max_spans,
            catalog_table=args.catalog_table,
            recognizer=load_recognizer(args.recognizer, args.recognizer_model),
        )
        print(json.dumps(stats))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
