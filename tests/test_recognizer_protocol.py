"""resolve_recognizer contract: the media_ref -> logits forward seam
(reference: models/crnn.py:23-79 forward, demo.py:26-41) must flow
through all three fused extraction kernels — fixture parity when the
injected forward replays fixture logits, visibly custom output when it
doesn't, batched invocation (one forward per kernel batch, misses only),
and zero engine edits either way."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from basicocr_spark.fixtures import STOP_TERMS
from basicocr_spark.operators.extraction import (
    extract_documents_fused,
    extract_documents_fused_arrow,
    extract_spans_flat,
    flatten_extracted,
    resolve_recognizer,
)


def _logits_rows(fx):
    return [
        (r.media_ref, [list(x) for x in r.logits], r.gold_text)
        for r in fx["media_logits"].collect()
    ]


def _flat_input(fx):
    return fx["documents"].select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )


def _replay_forward(logits_rows, calls_acc=None):
    """A custom forward that replays the fixture logits — stands in for a
    real CRNN whose checkpoint reproduces the fixtures. Counts batched
    invocations through a Spark accumulator when given one."""
    by_ref = {ref: np.asarray(lg, dtype=np.float32) for ref, lg, *_ in logits_rows}

    def forward(refs):
        assert isinstance(refs, list)  # batch protocol, never a bare ref
        if calls_acc is not None:
            calls_acc.add(1)
        return [by_ref.get(r) for r in refs]

    return forward


def _runs(fx, logits_rows, recognizer):
    """(name, flat extracted DataFrame) for all three fused kernels."""
    yield "fused", flatten_extracted(
        extract_documents_fused(
            fx["documents"], [], fx["dict_lines"], STOP_TERMS, recognizer=recognizer
        )
    )
    yield "arrow", flatten_extracted(
        extract_documents_fused_arrow(
            fx["documents"], [], fx["dict_lines"], STOP_TERMS, recognizer=recognizer
        )
    )
    yield "flat", extract_spans_flat(
        _flat_input(fx), [], fx["dict_lines"], STOP_TERMS,
        n_partitions=3, recognizer=recognizer,
    ).select("doc_id", "kind", "text", "media_ref", "order")


def test_custom_forward_matches_fixture_path_in_all_kernels(fx):
    """Injecting a forward that reproduces the fixture logits must yield
    EXACTLY the golden extraction in every kernel — the engine's CTC
    decode + correction stay downstream of the seam. Note logits_rows
    is EMPTY on the engine side: all logits come through the seam."""
    rows = _logits_rows(fx)
    gold = flatten_extracted(fx["golden"])
    for name, out in _runs(fx, rows, _replay_forward(rows)):
        assert out.exceptAll(gold.select(*out.columns)).count() == 0, name
        assert gold.select(*out.columns).exceptAll(out).count() == 0, name


def test_custom_forward_output_actually_routes(fx):
    """A forward that recognizes nothing (all None -> '') must blank
    every media span in every kernel — proving the injected callable is
    the one running, not a silent fixture fallback."""
    rows = _logits_rows(fx)

    def blind(refs):
        return [None for _ in refs]

    for name, out in _runs(fx, rows, blind):
        got = out.filter(F.col("kind") != "text")
        n_media = got.count()
        assert n_media > 0, name
        assert got.filter(F.col("text") == "").count() == n_media, name


def test_forward_is_batched_not_per_ref(spark, fx):
    """The kernels must call the forward ONCE per batch over memo
    misses, never per ref: total invocations stay at or below the
    partition count (one batch per partition at fixture scale), far
    below the media-span count."""
    rows = _logits_rows(fx)
    n_media = (
        fx["documents"].select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") != "text").count()
    )
    acc = spark.sparkContext.accumulator(0)
    out = extract_documents_fused(
        fx["documents"].repartition(2), [], fx["dict_lines"], STOP_TERMS,
        recognizer=_replay_forward(rows, acc),
    )
    flatten_extracted(out).count()
    assert n_media > 10
    assert 0 < acc.value <= 4, f"{acc.value} forward calls for {n_media} media spans"


def test_resolve_recognizer_rejects_non_callable():
    with pytest.raises(TypeError):
        resolve_recognizer(recognizer="not-a-callable")
    assert resolve_recognizer(None) is None
    f = lambda refs: [None] * len(refs)  # noqa: E731
    assert resolve_recognizer(f) is f


def test_short_forward_return_fails_at_the_seam(fx):
    """A forward returning fewer results than refs must raise a
    descriptive contract error inside the kernel, not a bare KeyError
    later."""
    def broken(refs):
        return [None for _ in refs][:-1]  # off-by-one short

    out = extract_documents_fused(
        fx["documents"], [], fx["dict_lines"], STOP_TERMS, recognizer=broken
    )
    with pytest.raises(Exception, match="recognizer forward returned"):
        flatten_extracted(out).count()
