#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The flagship measurement is end-to-end extraction throughput (docs/sec)
over an interleaved corpus derived from the documents table (replicated
deterministically so the corpus is large enough to measure — the driver
tables cap at 500 docs). Relational/corpus/embedding headliners run
after it. Use bench_scaling.py for the N-vs-4N parallelism criterion.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 120x -> 600k docs: the arrow kernel clears 200k docs in under 2s at
# 32 threads, which is too short a timed region for a stable headline
REPLICATION = int(os.environ.get("SPARK_GRAFT_BENCH_REPL", "120"))


N_BENCH_PARTITIONS = int(os.environ.get("SPARK_GRAFT_BENCH_PARTS", "128"))

# Bump whenever replicated_interleaved's generation logic changes: the
# version is part of the corpus cache path, so a logic change can never
# silently reuse a stale materialized corpus and benchmark the wrong
# input.
CORPUS_GEN_VERSION = 2


def materialize_corpus(spark, sf_dir: str, k: int, n_partitions: int = N_BENCH_PARTITIONS) -> str:
    """Write the replicated interleaved corpus to a local parquet dir
    (once — reused across runs and parallelism levels). Benchmarks then
    time scan -> extract -> aggregate, the production end-to-end shape;
    timing against an in-memory cache distorts both ways (cache
    eviction/GC pressure at big replications, free scan at small)."""
    import tempfile

    path = os.path.join(
        tempfile.gettempdir(),
        f"basicocr_bench_corpus_v{CORPUS_GEN_VERSION}_"
        f"{os.path.basename(sf_dir.rstrip('/'))}_x{k}_p{n_partitions}",
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        replicated_interleaved(spark, sf_dir, k, n_partitions).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def replicated_interleaved(spark, sf_dir: str, k: int, n_partitions: int = N_BENCH_PARTITIONS):
    """Deterministically expand the flat documents table k× and lift it to
    the interleaved (doc_id, spans) shape — pure column ops, no collect.

    The explicit repartitionByRange on doc_id matters: the source parquet
    is a handful of row groups, and the explode inherits that partition
    count — without the repartition, a 32-core run executes ~4 tasks and
    scaling flatlines. Range partitioning on doc_id is also the layout
    the extraction contract wants (docs never straddle partitions).
    Partition count is fixed (not core-derived) so different parallelism
    levels execute the identical plan."""
    from pyspark.sql import functions as F

    from __spark_entry__ import interleave_documents

    flat = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = flat.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("rep")
    ).withColumn("doc_id", F.col("doc_id") * k + F.col("rep"))
    return interleave_documents(rep.drop("rep")).repartitionByRange(
        n_partitions, "doc_id"
    )


def _bench_streaming_dedup(spark, sf_dir: str, n_epochs: int = 4) -> tuple[int, float]:
    """Epoch-throughput of the streaming crawl-loop dedup
    (streaming_incremental_dedup): the documents table split into
    n_epochs file-batches, each epoch verdicted against the committed
    SketchStore and committing its own sketches (fp + bands + kmv). The
    timed region is the whole stream run — per-epoch planning, the
    batch x committed joins, verdict writes, and sketch commits — i.e.
    the recurring-crawl cost the batch catalog doesn't measure. Returns
    (docs_processed, seconds); input prep is untimed."""
    import glob
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from basicocr_spark.streaming.pipeline import streaming_incremental_dedup

    root = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        in_dir = os.path.join(root, "in")
        os.makedirs(in_dir)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        n_docs = docs.count()
        for i in range(n_epochs):
            out = os.path.join(root, f"b{i}")
            docs.filter(F.col("doc_id") % n_epochs == i).coalesce(1).write.mode(
                "overwrite"
            ).parquet(out)
            (part,) = glob.glob(os.path.join(out, "part-*.parquet"))
            shutil.copy(part, os.path.join(in_dir, f"batch{i}.parquet"))
        t0 = time.perf_counter()
        q = streaming_incremental_dedup(
            spark,
            in_dir,
            "doc_id long, text string",
            os.path.join(root, "sketches"),
            os.path.join(root, "verdicts"),
            os.path.join(root, "ckpt"),
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        dt = time.perf_counter() - t0
        return n_docs, dt
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _calibrate_host(n_workers: int = 8, seconds: float = 1.0) -> float:
    """Busy-loop Mops/s across n_workers processes — a ~1s probe of what
    the host can actually compute RIGHT NOW. This box's deliverable
    throughput swings several-x minute to minute under external load
    (identical bench runs measured 6.8s and 42s for the same query), so
    every emitted result carries this number: compare bench values
    across rounds via (value x calibration) rather than raw seconds."""
    import multiprocessing as mp

    with mp.Pool(n_workers) as p:
        t0 = time.perf_counter()
        total = sum(p.map(_spin, [seconds] * n_workers))
        dt = time.perf_counter() - t0
    return round(total / dt / 1e6, 1)


def _spin(seconds: float) -> int:
    # module-level: multiprocessing pickles the callable by reference
    t0 = time.perf_counter()
    x = 0
    while time.perf_counter() - t0 < seconds:
        for _ in range(10000):
            x += 1
    return x


def run(parallelism: int = CPUS, sf_dir: str = SF_DIR, emit: bool = True) -> dict:
    from basicocr_spark.session import get_spark

    spark = get_spark(parallelism=parallelism, app_name=f"bench_local{parallelism}")
    try:
        import __spark_entry__ as E
        from basicocr_spark import fixtures as FX
        from basicocr_spark.operators.extraction import extract_documents_fused_arrow

        timings: dict[str, float] = {}

        # -- flagship: fused extraction over the replicated interleaved corpus.
        # Methodology matches bench_scaling.py: the synthetic corpus is
        # materialized to parquet once (in production the input is an
        # Iceberg/parquet scan, not a replication expression), the timed
        # region is scan -> extract -> aggregate, and one warm-up pass
        # absorbs JIT/Arrow-worker spin-up so the timed pass measures
        # steady-state end-to-end throughput.
        corpus_path = materialize_corpus(spark, sf_dir, REPLICATION)
        docs = spark.read.parquet(corpus_path)
        n_docs = docs.count()
        logits_rows = FX.gen_media_logits(E.N_ENTRY_MEDIA, FX.SEED)
        dict_lines = FX.gen_dictionary(FX.SEED)
        extract_documents_fused_arrow(
            docs, logits_rows, dict_lines, FX.STOP_TERMS
        ).write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        out = extract_documents_fused_arrow(docs, logits_rows, dict_lines, FX.STOP_TERMS)
        n_spans = out.selectExpr("sum(size(spans)) AS n").collect()[0]["n"]
        t_extract = time.perf_counter() - t0
        timings["extraction_fused"] = round(t_extract, 3)
        docs_per_sec = n_docs / t_extract if t_extract > 0 else 0.0

        # -- headline operator queries (throughput-meaningful at sf_dir)
        headliners = [
            "q1_pricing_summary",
            "q5_region_revenue",
            "q3_top_orders",
            "events_sessionization",
            "events_running_sum",
            "docs_minhash_lsh_pairs",
            "docs_minhash_lsh_pairs_cjk",
            "docs_simhash",
            "docs_near_dup_verified",
            "docs_fingerprint",
            "docs_ngram_counts",
            "docs_strip_large_dict",
            "emb_cosine_topk",
            # the operators an LLM training-data pipeline ships, tracked
            # round over round per VERDICT r2
            "docs_pii_scrub",
            "events_asof_join",
            "docs_dedup_keep_best",
            "docs_boilerplate_extract",
            "docs_repetition_stats",
            # round-4 additions (VERDICT r3 missing #2/#3): iterative BPE
            # trainer (20 serialized argmax rounds — driver-loop fixed
            # cost dominates at sandbox scale, like docs_dedup_keep_best)
            # and the bigram-LM perplexity scorer
            "docs_bpe_merges",
            "docs_lm_perplexity",
            "emb_pq_topk",
            "docs_quality_lm_filter",
            # round-5 addition: the CCNet-style sub-document dedup stage
            # (corpus-sized segment shuffle keyed by int64 fingerprints)
            "docs_segment_dedup",
            # round-5 additions: exact-substring REMOVAL (positional-gram
            # corpus shuffle + in-row strip) and DSIR importance
            # resampling (hashed-feature models + Gumbel top-k)
            "docs_exact_substring_removal",
            "docs_dsir_sample",
            # round-5 additions: the composed C4/Gopher/dedup funnel
            # report (four gates + intersection in one pass) and the
            # CCNet perplexity-tercile bucketer (rides the memoized LM —
            # its marginal cost over docs_lm_perplexity is the
            # threshold agg + broadcast compare, which is the number
            # this row tracks since the LM memo is already warm here)
            "docs_pipeline_funnel",
            "docs_ccnet_bucket",
            # round-5 additions: the per-epoch global training-order deal
            # (range-partitioned prefix-sum rank — the one corpus-wide
            # total-order cost a pretraining run pays) and the Bloom
            # membership pre-filter (build-side groupBy to <=16k words,
            # broadcast probe, zero incoming-slice shuffle)
            "docs_epoch_shuffle",
            "docs_bloom_dedup",
            # the trained NB quality classifier: one corpus tokenization
            # + the model-first scoring join — tracks the quality-filter
            # stage's throughput alongside the LM rows
            "docs_quality_classifier",
        ]
        # tiny seeded-fixture correctness queries (24-doc scale): their
        # runtime is Catalyst stage/broadcast fixed cost, not throughput —
        # timed separately so they can't read as "the slowest query" in
        # the headline total
        fixture_queries = ["ctc_decode", "extraction_e2e"]
        qmap = E.queries()
        # one untimed warm-up through the codegen + Python-worker +
        # window machinery: whichever query runs first otherwise pays
        # ~10s of one-time session lazy initialization (measured — the
        # same query is ~1.6s on its second session call), which would
        # land on an arbitrary headliner's number instead of measuring
        # its steady-state operator cost. The warm-up query is NOT a
        # headliner (a headliner warming itself would record a warm
        # second run while its peers time cold)
        qmap["docs_word_freq"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        # ...and one tiny scalar-pandas-udf call: ArrowEvalPython is a
        # separate eval path from MapInPandas with its own one-time
        # serializer/worker init (~0.8s measured), which would otherwise
        # land on the first headliner that uses a scalar kernel
        # (docs_fingerprint) instead of on session setup where it belongs
        from pyspark.sql import functions as F

        from basicocr_spark.functions.hash_kernels import poly_hash_kernel

        spark.range(8).select(
            poly_hash_kernel(F.lit("warm-up string")).alias("h")
        ).write.format("noop").mode("overwrite").save()
        for name in headliners:
            t0 = time.perf_counter()
            df = qmap[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        fixture_timings: dict[str, float] = {}
        for name in fixture_queries:
            t0 = time.perf_counter()
            df = qmap[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            fixture_timings[name] = round(time.perf_counter() - t0, 3)

        # streaming crawl-loop headliner: epochs/sec through the
        # SketchStore-backed incremental dedup (VERDICT r4 item #8)
        stream_docs, stream_sec = _bench_streaming_dedup(spark, sf_dir)
        timings["streaming_incremental_dedup"] = round(stream_sec, 3)

        total = round(sum(timings.values()), 3)
        result = {
            "metric": "total_runtime",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "fixture_queries_sec": fixture_timings,  # excluded from value
            "sf": sf_dir.rstrip("/").split("sf")[-1],
            "extraction_docs": n_docs,
            "extraction_spans": int(n_spans),
            "extraction_docs_per_sec": round(docs_per_sec, 1),
            "streaming_dedup_docs_per_sec": round(
                stream_docs / stream_sec if stream_sec > 0 else 0.0, 1
            ),
            "parallelism": parallelism,
            # host-state context: busy-loop Mops/s at run time (see
            # _calibrate_host) — normalizes cross-round comparisons on
            # this noisy-neighbor box
            "host_calibration_mops": _calibrate_host(),
        }
        if emit:
            print(json.dumps(result))
        return result
    finally:
        spark.stop()


if __name__ == "__main__":
    run()
