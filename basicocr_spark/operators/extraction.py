"""End-to-end interleaved-document extraction — the flagship pipeline.

Input (north rule `input_hint`):
    documents(doc_id string,
              spans array<struct<kind,text,media_ref,offset>>)

text spans  -> boilerplate strip + stop-content removal
media spans -> recognition (CTC greedy decode of per-ref logits — the
               deterministic stand-in for the CRNN forward,
               reference: contrib/crnn/demo.py:26-41) -> per-token
               dictionary correction (trietree semantics)
stitch      -> spans re-emitted in (doc_id, offset-rank) order; output
               tuple (kind, text, media_ref, order) is the north-rule
               equality surface.

Three implementations, cross-checked span-for-span in tests:

1. `extract_documents_sql` — the declarative Catalyst pipeline:
   posexplode -> route by kind -> broadcast-join logits -> pure-SQL CTC
   decode -> broadcast levenshtein correction -> re-aggregate with
   array_sort. Every dictionary-sized side is broadcast; the only
   shuffle is the final groupBy(doc_id) re-aggregation.

2. `extract_documents_fused` — the zero-shuffle production shape: one
   mapInPandas pass; recognition + correction happen inside the Arrow
   batch (as they would with a real model forward), the span array never
   leaves its row, docs never straddle partitions. Linear scan =>
   scaling efficiency ~1 by construction.

3. `extract_documents_fused_arrow` — same single-pass shape via
   mapInArrow: the list<struct> span column is processed as flat Arrow
   child arrays (numpy repeat/lexsort/cumcount, no per-span Python
   dicts). ~2x the pandas kernel's steady-state throughput; this is the
   flagship path benched for the N vs 4N criterion.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import reference as R
from ..functions.ctc import ctc_greedy_decode, decode_ctc_numpy
from ..functions.textnorm import uniform
from .boilerplate import extract_main_text
from .correction import correct_tokens

EXTRACTED_SPAN_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,order:int>>"
)

# Per-Python-worker memo store, keyed by a per-job token closed over by
# the kernel. Spark reuses worker processes across a job's partitions,
# so decode+correct memos (and the compiled boilerplate extractor)
# survive partition boundaries — rebuilding them per partition costs
# ~0.23 s x n_partitions of pure recompute at 128 partitions. Bounded:
# entries are per distinct media_ref / decoded token; cleared when a new
# job token first appears (previous job's cache is then dead weight).
_WORKER_CACHE: dict[str, dict] = {}


def _job_cache(token: str, builder):
    cache = _WORKER_CACHE.get(token)
    if cache is None:
        _WORKER_CACHE.clear()
        cache = _WORKER_CACHE[token] = builder()
    return cache


def _broadcast_sides(df: DataFrame, logits_rows, dict_lines, stop_terms):
    """Broadcast the dictionary-sized sides once + mint the per-job
    worker-cache token. Shared by all three fused kernels."""
    import uuid

    sc = df.sparkSession.sparkContext
    return (
        sc.broadcast({ref: lg for ref, lg, *_ in logits_rows}),
        sc.broadcast(dict_lines),
        sc.broadcast(list(stop_terms)),
        uuid.uuid4().hex,
    )


def resolve_recognizer(recognizer=None):
    """Recognizer-forward resolution — the model seam mirroring
    multimodal.resolve_decoder (reference: models/crnn.py:23-79 forward,
    demo.py:26-41). The protocol is `forward(refs: list[str | None]) ->
    list[logits | None]`: one batched call per Arrow batch's memo-missed
    refs, each result a (T, C) per-timestep class-score array (anything
    decode_ctc_numpy accepts) or None for an undecodable ref (which
    recognizes to '' — the reference's skip semantics, dataset.py:51-55).
    The engine keeps CTC greedy decode + dictionary correction
    downstream of the seam, so a production model supplies ONLY the
    forward pass.

    An explicitly injected callable wins; else None, meaning the fused
    kernels fall back to the broadcast fixture-logits lookup (the
    default implementation — it rides a Spark broadcast rather than
    being captured here, so the corpus-sized side is shipped once per
    executor, not pickled per task). Unlike resolve_decoder there is no
    import-probe tier: a recognition forward needs a trained checkpoint
    — deployment config, not an importable library — so the real-model
    path is always an explicit injection (see
    crnn_forward_from_torchscript for the torch adapter factory)."""
    if recognizer is not None and not callable(recognizer):
        raise TypeError(
            "recognizer must be a callable list[ref] -> list[logits|None]"
        )
    return recognizer


def crnn_forward_from_torchscript(model_path: str, fetch_decode=None):
    """Adapter factory: a TorchScript CRNN checkpoint -> the
    resolve_recognizer forward protocol. `fetch_decode(ref) ->
    (w, h, gray_bytes) | None` supplies pixels for a media_ref (defaults
    through multimodal.resolve_decoder on the ref treated as a local
    path — production injects its blob-store fetch). The returned
    forward loads the model LAZILY once per executor process (the
    factory itself is pickled into task closures, so nothing heavy may
    load at construction). Gated on torch being importable; this
    container ships no torch, so the factory raises at call time there —
    the protocol contract itself is tested with a fake forward
    (test_extraction_e2e.py)."""
    state: dict = {}

    def forward(refs):
        import numpy as np

        if "model" not in state:
            try:
                import torch
            except ImportError as e:  # pragma: no cover - no torch here
                raise RuntimeError(
                    "crnn_forward_from_torchscript needs torch installed "
                    "on the executors"
                ) from e
            state["torch"] = torch
            state["model"] = torch.jit.load(model_path).eval()
            if fetch_decode is None:
                from .multimodal import resolve_decoder

                dec = resolve_decoder()

                def _fetch(ref):
                    with open(ref, "rb") as fh:  # no leaked fds on workers
                        return dec(fh.read())

                state["fetch"] = _fetch
            else:
                state["fetch"] = fetch_decode
        torch, model, fetch = state["torch"], state["model"], state["fetch"]
        out: list = []
        for ref in refs:  # pragma: no cover - exercised only with torch
            px = fetch(ref) if ref is not None else None
            if px is None:
                out.append(None)
                continue
            w, h, buf = px
            img = np.frombuffer(buf, dtype=np.uint8).reshape(h, w)
            x = torch.from_numpy(img.astype(np.float32) / 127.5 - 1.0)[None, None]
            with torch.no_grad():
                y = model(x).cpu().numpy()
            # (T, C) for the decoder: collapse the singleton batch/channel
            # dims ONLY — a bare squeeze() would also drop T when T == 1
            # and the decoder's argmax(axis=1) dies on a 1-D array
            out.append(y.reshape(-1, y.shape[-1]))
        return out

    return forward


def _worker_recognizer(
    b_logits, b_dict, b_stop, job_token, alphabet, max_cost, forward=None
):
    """Executor-side: (vectorized text extractor, memoized batched
    recognize_batch). One definition for all three fused kernels
    — the decode+correct memo semantics are part of the
    cross-implementation equality surface, so they must not drift
    between kernels. `forward` is the resolve_recognizer seam; None
    means the broadcast fixture-logits lookup."""
    from .boilerplate_vec import make_vectorized_extractor

    cache = _job_cache(
        job_token,
        lambda: {
            "entries": R.load_dictionary(b_dict.value),
            "extract": make_vectorized_extractor(b_stop.value),
            "corr": {},
            "media": {},
        },
    )
    entries = cache["entries"]
    corr_memo: dict[str, str] = cache["corr"]
    media_memo: dict = cache["media"]

    if forward is None:
        logits_by_ref = b_logits.value

        def forward(refs):
            return [logits_by_ref.get(r) for r in refs]

    def _decode_correct(lg) -> str:
        raw = decode_ctc_numpy(lg, alphabet) if lg is not None else ""
        if not raw:
            return ""
        txt = corr_memo.get(raw)
        if txt is None:
            txt = corr_memo[raw] = R.correct_word(raw, entries, max_cost)
        return txt

    def recognize_batch(refs) -> dict:
        """One model forward per kernel batch over the memo MISSES only
        (deduped, order-preserving) — the north rule's batch-decoded,
        batch-recognized shape. Returns {ref: text} covering `refs`."""
        seen: set = set()
        misses = [
            r
            for r in refs
            if r not in media_memo and not (r in seen or seen.add(r))
        ]
        if misses:
            got = list(forward(misses))
            if len(got) != len(misses):
                # fail AT the seam with the contract named — zip would
                # silently truncate and surface later as a bare KeyError
                raise ValueError(
                    "recognizer forward returned "
                    f"{len(got)} results for {len(misses)} refs; the "
                    "protocol is list[ref] -> list[logits|None], "
                    "same length, same order"
                )
            for r, lg in zip(misses, got):
                media_memo[r] = _decode_correct(lg)
        return {r: media_memo[r] for r in refs}

    return cache["extract"], recognize_batch


def recognizer_from_batch_fn(batch_fn):
    """Lift a plain model-forward callable `list[media_ref] -> list[str]`
    into the recognize_media recognizer protocol: the engine wraps it in
    an Arrow-batched scalar pandas UDF (the Spark side — batching,
    schema, column wiring — is handled here; the user writes ONLY the
    forward pass, e.g. a torch CRNN batch inference keyed by ref or by
    fetched bytes). Contract-tested against the logits-join path with
    the fixture codec (test_multimodal.py)."""

    def apply(media_spans: DataFrame) -> DataFrame:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        udf = pandas_udf(
            lambda refs: pd.Series(batch_fn(refs.tolist()), dtype="object"),
            "string",
        )
        return media_spans.withColumn("raw_text", udf(F.col("media_ref")))

    return apply


def recognize_media(
    media_spans: DataFrame,
    logits_df: DataFrame = None,
    alphabet: str = R.DEFAULT_ALPHABET,
    recognizer=None,
) -> DataFrame:
    """(.., media_ref) join broadcast logits -> raw recognized text via the
    pure-JVM CTC decode expression. Refs missing from the logits table
    decode to '' (the reference skips undecodable samples,
    dataset.py:51-55 — here: empty recognition, row preserved).

    `recognizer` is the real-model seam (reference: models/crnn.py:23-79
    forward + demo.py:26-41): any callable `DataFrame -> DataFrame`
    that appends `raw_text`; when given it REPLACES the logits join, so
    a production CRNN plugs in with zero engine edits (see
    recognizer_from_batch_fn for the convenience lift from a plain
    batch-forward function)."""
    if recognizer is not None:
        return recognizer(media_spans)
    if logits_df is None:
        raise ValueError(
            "recognize_media needs either a logits_df (fixture-logit CTC "
            "path) or a recognizer= callable (real-model path)"
        )
    return (
        media_spans.join(
            F.broadcast(logits_df.select("media_ref", "logits")), "media_ref", "left"
        )
        .withColumn(
            "raw_text",
            F.when(F.col("logits").isNull(), F.lit("")).otherwise(
                ctc_greedy_decode(F.col("logits"), alphabet)
            ),
        )
        .drop("logits")
    )


def _stitch_spans(unioned: DataFrame, docs: DataFrame) -> DataFrame:
    """Shared re-aggregation stitch for the SQL pipelines: array_sort on
    the composite key (offset, kind, media_ref-or-'', text-or-'')
    restores in-doc order deterministically regardless of shuffle
    arrival order (order is carried by data, not partition layout, so
    the plan stays correct under AQE re-planning); the rank-index
    becomes `order`; zero-span docs dropped by the explode are restored
    with empty arrays (fused pipelines and the oracle preserve them).
    This is the cross-implementation equality surface — single source
    of truth so the sort key cannot silently diverge between the SQL
    variants."""
    agg = unioned.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("offset"),
                    # null-kind contract: out-of-contract null kind sorts
                    # as '' (data passes through untouched below) — same
                    # `p[1] or ""` key as the reference and both kernels.
                    # The isNotNull flags then break null-vs-'' ties
                    # (null first, False < True) so the struct comparison
                    # never reaches the raw data fields and the order is
                    # identical to the kernels' explicit flag keys —
                    # without them, Spark's nulls-first raw-field
                    # comparison diverged from the kernels' stable sorts
                    # on pathological same-key/different-nullness ties
                    F.coalesce("kind", F.lit("")).alias("kind_key"),
                    F.coalesce("media_ref", F.lit("")).alias("mref_key"),
                    F.coalesce("out_text", F.lit("")).alias("text_key"),
                    F.col("kind").isNotNull().alias("kind_nn"),
                    F.col("media_ref").isNotNull().alias("mref_nn"),
                    F.col("out_text").isNotNull().alias("text_nn"),
                    F.col("kind"),
                    F.col("out_text"),
                    F.col("media_ref"),
                )
            )
        ).alias("sorted_spans")
    )
    stitched = agg.select(
        "doc_id",
        F.transform(
            F.col("sorted_spans"),
            lambda s, i: F.struct(
                s["kind"].alias("kind"),
                s["out_text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                i.cast("int").alias("order"),
            ),
        ).alias("spans"),
    )
    return (
        docs.select("doc_id")
        .join(stitched, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                "spans",
                F.array().cast(
                    "array<struct<kind:string,text:string,media_ref:string,order:int>>"
                ),
            ).alias("spans"),
        )
    )


def extract_documents_sql(
    docs: DataFrame,
    logits_df: DataFrame,
    dict_df: DataFrame,
    stop_terms: list[str],
    alphabet: str = R.DEFAULT_ALPHABET,
    max_cost: int = 3,
) -> DataFrame:
    """Declarative Catalyst implementation. Returns EXTRACTED schema."""
    spans = docs.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )

    # null text normalizes to '' (oracle: `sp["text"] or ""`)
    text_done = spans.filter(F.col("kind") == "text").withColumn(
        "out_text", extract_main_text(F.coalesce(F.col("text"), F.lit("")), stop_terms)
    )

    # routing is text vs non-text; out-of-contract kinds take the media
    # leg with their kind preserved (matches reference.extract_document).
    # eqNullSafe: schema declares kind non-null but parquet reads don't
    # enforce it — a null kind must route to the media leg like the
    # fused kernels and the reference do, not vanish (plain != is null)
    media = spans.filter(~F.col("kind").eqNullSafe("text"))
    recognized = recognize_media(media, logits_df, alphabet)
    # Correction operates on the distinct recognized vocabulary, then a
    # broadcast map-join rehydrates occurrences. Decoded text over this
    # alphabet is a single token (no whitespace in the alphabet).
    vocab = recognized.select(F.col("raw_text").alias("token")).filter(F.col("token") != "")
    corrections = correct_tokens(vocab, dict_df, max_cost=max_cost)
    media_done = (
        recognized.withColumn("token", uniform(F.col("raw_text")))
        .join(F.broadcast(corrections), "token", "left")
        .withColumn("out_text", F.coalesce("corrected", F.col("token")))
        .drop("token", "corrected", "raw_text")
    )

    unioned = text_done.select("doc_id", "kind", "out_text", "media_ref", "offset").unionByName(
        media_done.select("doc_id", "kind", "out_text", "media_ref", "offset")
    )

    return _stitch_spans(unioned, docs)


def extract_documents_with_pdf_sql(
    docs: DataFrame,
    logits_df: DataFrame,
    dict_df: DataFrame,
    stop_terms: list[str],
    pdf_blobs: DataFrame,
    alphabet: str = R.DEFAULT_ALPHABET,
    max_cost: int = 3,
) -> DataFrame:
    """The full north-rule triad in one extraction: text spans ->
    boilerplate strip, media spans -> CTC recognition + correction,
    kind='pdf' spans -> broadcast-join the blob table -> Arrow layout
    parse -> reading-order text. Same composite-key array_sort stitch
    as extract_documents_sql; pdf spans whose ref is missing from the
    blob table (or whose blob doesn't parse) emit '' like unknown media
    refs do (dataset.py:51-55 skip-semantics analog)."""
    from .pdfparse import pdf_documents_text

    spans = docs.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )

    text_done = spans.filter(F.col("kind") == "text").withColumn(
        "out_text", extract_main_text(F.coalesce(F.col("text"), F.lit("")), stop_terms)
    )

    pdf_spans = spans.filter(F.col("kind") == "pdf")
    pdf_texts = pdf_documents_text(pdf_blobs)  # (media_ref, text)
    # no broadcast hint: unlike the dictionary/logits sides, a PDF blob
    # corpus has no dictionary-size contract — forcing it past the
    # broadcast limit is a driver OOM at scale. AQE picks broadcast when
    # the parsed table is actually small.
    pdf_done = pdf_spans.drop("text").join(
        pdf_texts.withColumnRenamed("text", "parsed"), "media_ref", "left"
    ).withColumn("out_text", F.coalesce("parsed", F.lit(""))).drop("parsed")

    # null-safe routing: null/unknown kinds take the media leg (see
    # extract_documents_sql)
    media = spans.filter(
        ~(F.col("kind").eqNullSafe("text") | F.col("kind").eqNullSafe("pdf"))
    )
    recognized = recognize_media(media, logits_df, alphabet)
    vocab = recognized.select(F.col("raw_text").alias("token")).filter(F.col("token") != "")
    corrections = correct_tokens(vocab, dict_df, max_cost=max_cost)
    media_done = (
        recognized.withColumn("token", uniform(F.col("raw_text")))
        .join(F.broadcast(corrections), "token", "left")
        .withColumn("out_text", F.coalesce("corrected", F.col("token")))
        .drop("token", "corrected", "raw_text")
    )

    cols = ["doc_id", "kind", "out_text", "media_ref", "offset"]
    unioned = (
        text_done.select(*cols)
        .unionByName(pdf_done.select(*cols))
        .unionByName(media_done.select(*cols))
    )
    return _stitch_spans(unioned, docs)


def extract_documents_fused(
    docs: DataFrame,
    logits_rows: list[tuple],
    dict_lines: list[str],
    stop_terms: list[str],
    alphabet: str = R.DEFAULT_ALPHABET,
    max_cost: int = 3,
    recognizer=None,
) -> DataFrame:
    """Zero-shuffle fused pipeline: one mapInPandas over the documents
    scan. The logits/dictionary fixtures ride a Spark broadcast (in
    production the recognition model plugs in via `recognizer=`, the
    resolve_recognizer forward protocol — one batched ref->logits call
    per pandas batch's memo misses); per-batch memoization makes
    correction cost proportional to the batch's distinct vocabulary."""
    sides = _broadcast_sides(docs, logits_rows, dict_lines, stop_terms)
    fwd = resolve_recognizer(recognizer)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        extract_text_vec, recognize_batch = _worker_recognizer(
            *sides, alphabet, max_cost, forward=fwd
        )

        for pdf in batches:
            # flatten the batch's spans; the text side runs through the
            # vectorized pandas kernel, media through the memoized decode
            doc_ix: list[int] = []
            offs: list[int] = []
            kinds: list[str] = []
            raw_texts: list[str | None] = []
            refs: list[str | None] = []
            for i, spans in enumerate(pdf["spans"]):
                for sp in spans:
                    doc_ix.append(i)
                    offs.append(sp["offset"])
                    kinds.append(sp["kind"])
                    raw_texts.append(sp["text"])
                    refs.append(sp["media_ref"])

            n = len(doc_ix)
            out_text: list[str | None] = [None] * n
            kinds_arr = kinds
            text_pos = [k for k in range(n) if kinds_arr[k] == "text"]
            if text_pos:
                series = pd.Series([raw_texts[k] for k in text_pos], dtype=object)
                extracted = extract_text_vec(series)
                for k, v in zip(text_pos, extracted.to_numpy()):
                    out_text[k] = v
            media_pos = [k for k in range(n) if kinds_arr[k] != "text"]
            if media_pos:  # non-text -> media leg, ONE forward per batch
                lookup = recognize_batch([refs[k] for k in media_pos])
                for k in media_pos:
                    out_text[k] = lookup[refs[k]]

            # group back per doc; same composite order as the SQL
            # pipeline's array_sort: (offset, kind, media_ref-or-'', text-or-'')
            per_doc: list[list] = [[] for _ in range(len(pdf))]
            for k in range(n):
                per_doc[doc_ix[k]].append(
                    (offs[k], kinds_arr[k], out_text[k], refs[k])
                )
            out_spans = []
            for processed in per_doc:
                processed.sort(key=lambda p: (p[0], p[1] or "", p[3] or "", p[2] or "",
                                  p[1] is not None, p[3] is not None,
                                  p[2] is not None))
                out_spans.append(
                    [
                        {"kind": kind, "text": txt, "media_ref": mref, "order": rank}
                        for rank, (_, kind, txt, mref) in enumerate(processed)
                    ]
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "spans": out_spans})

    return docs.mapInPandas(kernel, EXTRACTED_SPAN_SCHEMA)


def extract_documents_fused_arrow(
    docs: DataFrame,
    logits_rows: list[tuple],
    dict_lines: list[str],
    stop_terms: list[str],
    alphabet: str = R.DEFAULT_ALPHABET,
    max_cost: int = 3,
    recognizer=None,
) -> DataFrame:
    """mapInArrow twin of extract_documents_fused (same output, pinned
    by tests/test_extraction_e2e.py): the nested list<struct> span
    column is decomposed into flat Arrow child arrays — no Python dicts
    are ever materialized for the spans, the per-span flatten/regroup
    loops of the pandas kernel become numpy repeat/lexsort/cumcount, and
    the output list<struct> is rebuilt from offsets. Same zero-shuffle
    single-pass shape; this exists because the nested-struct dict
    marshalling is the pandas kernel's dominant cost at scale."""
    import numpy as np
    import pyarrow as pa

    sides = _broadcast_sides(docs, logits_rows, dict_lines, stop_terms)
    fwd = resolve_recognizer(recognizer)

    out_type = pa.struct(
        [("kind", pa.string()), ("text", pa.string()), ("media_ref", pa.string()), ("order", pa.int32())]
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        extract_text_vec, recognize_batch = _worker_recognizer(
            *sides, alphabet, max_cost, forward=fwd
        )

        for rb in batches:
            doc_ids = rb.column(rb.schema.get_field_index("doc_id"))
            spans = rb.column(rb.schema.get_field_index("spans"))
            if isinstance(spans, pa.ChunkedArray):  # defensive; batches are single-chunk
                spans = spans.combine_chunks()
            n_docs = len(spans)
            # list offsets are relative to the (possibly sliced) values
            offs64 = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            start, stop = offs64[0], offs64[-1]
            counts = np.diff(offs64)
            values = spans.values[start:stop]  # StructArray of the batch's spans
            total = len(values)

            if total == 0:
                empty = pa.ListArray.from_arrays(
                    pa.array(np.zeros(n_docs + 1, dtype=np.int32)),
                    pa.array([], type=out_type),
                )
                yield pa.RecordBatch.from_arrays([doc_ids, empty], ["doc_id", "spans"])
                continue

            kind = values.field("kind").to_pandas()
            text = values.field("text").to_pandas()
            mref = values.field("media_ref").to_pandas()
            offset = values.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)
            doc_ix = np.repeat(np.arange(n_docs, dtype=np.int64), counts)

            out_text = pd.Series([None] * total, dtype=object)
            text_mask = (kind == "text").to_numpy()
            if text_mask.any():
                out_text[text_mask] = extract_text_vec(text[text_mask]).to_numpy()
            media_mask = ~text_mask
            if media_mask.any():  # ONE forward per Arrow batch
                refs = mref[media_mask]
                lookup = recognize_batch(list(pd.unique(refs)))
                out_text[media_mask] = refs.map(lookup).to_numpy()

            # same composite order as the pandas kernel / SQL array_sort:
            # (doc, offset, kind-or-'', media_ref-or-'', text-or-'',
            #  then null-presence flags breaking null-vs-'' ties, null
            #  first — keeps all four implementations in lockstep on
            #  pathological same-key ties)
            text_key = out_text.fillna("").to_numpy()
            mref_key = mref.fillna("").to_numpy()
            kind_key = kind.fillna("").to_numpy()
            kind_nn = kind.notna().to_numpy()
            mref_nn = mref.notna().to_numpy()
            text_nn = out_text.notna().to_numpy()
            perm = np.lexsort(
                (text_nn, mref_nn, kind_nn, text_key, mref_key, kind_key, offset, doc_ix)
            )
            doc_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            order = (np.arange(total) - np.repeat(doc_starts, counts)).astype(np.int32)

            struct = pa.StructArray.from_arrays(
                [
                    pa.array(kind.to_numpy()[perm], type=pa.string()),
                    pa.array(out_text.to_numpy()[perm], type=pa.string()),
                    pa.array(mref.to_numpy()[perm], type=pa.string()),
                    pa.array(order, type=pa.int32()),
                ],
                fields=list(out_type),
            )
            new_offsets = pa.array(np.concatenate([[0], np.cumsum(counts)]).astype(np.int32))
            out_spans = pa.ListArray.from_arrays(new_offsets, struct)
            yield pa.RecordBatch.from_arrays([doc_ids, out_spans], ["doc_id", "spans"])

    return docs.mapInArrow(kernel, EXTRACTED_SPAN_SCHEMA)


def flatten_extracted(extracted: DataFrame) -> DataFrame:
    """(doc_id, span...) rows for equality comparison / downstream SQL."""
    return extracted.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.order").alias("order"),
    )


FLAT_SCHEMA = "doc_id string, kind string, text string, media_ref string, order int"


def extract_spans_flat(
    spans_flat: DataFrame,
    logits_rows: list[tuple],
    dict_lines: list[str],
    stop_terms: list[str],
    alphabet: str = R.DEFAULT_ALPHABET,
    max_cost: int = 3,
    n_partitions: int | None = None,
    recognizer=None,
) -> DataFrame:
    """Flat-layout twin of the fused pipeline for corpora stored with one
    row PER SPAN (doc_id, offset, kind, text, media_ref) instead of the
    nested array shape. This is the W4 stitch exactly as surveyed:
    repartitionByRange(doc_id) so no document straddles a partition,
    sortWithinPartitions(doc_id, offset) so each partition arrives
    doc-contiguous and offset-ordered, then one mapInPandas computes
    `order` as a vectorized per-doc cumcount and processes every span
    through the same vectorized kernels. No nested Arrow structs cross
    the Python boundary, which is the nested variant's main marshalling
    cost. Requires the input contract (offsets unique per doc).
    """
    sides = _broadcast_sides(spans_flat, logits_rows, dict_lines, stop_terms)
    fwd = resolve_recognizer(recognizer)
    n = n_partitions or spans_flat.sparkSession.sparkContext.defaultParallelism * 2

    arranged = spans_flat.repartitionByRange(n, "doc_id").sortWithinPartitions(
        "doc_id", "offset"
    )

    def kernel(batches):
        extract_text_vec, recognize_batch = _worker_recognizer(
            *sides, alphabet, max_cost, forward=fwd
        )

        prev_doc = None  # doc spanning the batch boundary within a partition
        prev_count = 0

        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.reset_index(drop=True)
            # order = cumcount per doc; batches arrive doc-contiguous and
            # offset-sorted, so carry the running count across batches
            order = pdf.groupby("doc_id", sort=False).cumcount()
            first_doc = pdf["doc_id"].iat[0]
            last_doc = pdf["doc_id"].iat[-1]
            n_last = int((pdf["doc_id"] == last_doc).sum())
            if prev_doc == first_doc:
                order.loc[pdf["doc_id"] == first_doc] += prev_count
                if last_doc == first_doc:
                    n_last += prev_count
            prev_doc, prev_count = last_doc, n_last

            text_mask = pdf["kind"] == "text"
            out_text = pd.Series([""] * len(pdf), dtype=object)
            if text_mask.any():
                out_text[text_mask] = extract_text_vec(pdf.loc[text_mask, "text"]).to_numpy()
            media_mask = ~text_mask
            if media_mask.any():  # ONE forward per pandas batch
                refs = pdf.loc[media_mask, "media_ref"]
                lookup = recognize_batch(list(pd.unique(refs)))
                out_text[media_mask] = refs.map(lookup).to_numpy()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "text": out_text,
                    "media_ref": pdf["media_ref"],
                    "order": order.astype("int32"),
                }
            )

    return arranged.mapInPandas(kernel, FLAT_SCHEMA)
