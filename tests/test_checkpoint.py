"""Snapshot checkpoint / idempotent resume semantics."""

import os

from basicocr_spark.fixtures import STOP_TERMS
from basicocr_spark.operators.extraction import extract_documents_fused
from basicocr_spark.plans.checkpoint import SnapshotWriter, committed_snapshots


def _extract(fx, docs):
    logits_rows = [
        (r.media_ref, [list(x) for x in r.logits], r.gold_text)
        for r in fx["media_logits"].collect()
    ]
    return extract_documents_fused(docs, logits_rows, fx["dict_lines"], STOP_TERMS)


def test_resume_processes_only_pending(spark, fx, tmp_path):
    root = str(tmp_path / "ckpt")
    w = SnapshotWriter(spark, root)
    docs = fx["documents"]
    total = docs.count()

    # batch 1: first half by doc_id
    half = docs.filter(docs.doc_id < "d00000020")
    out1 = _extract(fx, w.pending(half))
    info1 = w.commit(out1)
    assert committed_snapshots(root) == [info1["snapshot_id"]]
    n1 = w.read_committed().count()
    assert n1 == half.count()

    # batch 2: full input — pending() must exclude committed docs
    pend = w.pending(docs)
    assert pend.count() == total - n1
    out2 = _extract(fx, pend)
    w.commit(out2)
    final = w.read_committed()
    assert final.count() == total
    assert final.select("doc_id").distinct().count() == total

    # batch 3: nothing pending — idempotent re-run is a no-op
    assert w.pending(docs).count() == 0


def test_uncommitted_data_is_invisible(spark, fx, tmp_path):
    root = str(tmp_path / "ckpt2")
    w = SnapshotWriter(spark, root)
    out = _extract(fx, fx["documents"])
    # simulate a crash: write data WITHOUT the commit marker
    out.write.mode("overwrite").parquet(os.path.join(root, "data", "snapshot=s000000"))
    assert committed_snapshots(root) == []
    assert w.read_committed() is None
    assert w.pending(fx["documents"]).count() == fx["documents"].count()


def test_manifest_lineage_totals(spark, fx, tmp_path):
    root = str(tmp_path / "ckpt3")
    w = SnapshotWriter(spark, root)
    info = w.commit(_extract(fx, fx["documents"]))
    m = w.read_manifest()
    rows = m.collect()
    assert sum(r.doc_count for r in rows) == fx["documents"].count()
    span_total = sum(r.span_count for r in rows)
    assert span_total == sum(
        len(r.spans) for r in fx["golden"].collect()
    )
    for r in rows:
        assert r.text_span_count + r.media_span_count == r.span_count
        assert r.min_doc_id <= r.max_doc_id
        assert r.wall_time_sec > 0
    assert info["partitions"]


def test_commit_is_idempotent_for_replayed_sid(spark, tmp_path, fx):
    """Re-committing an epoch id (streaming replay after crash) must be
    a no-op that returns the existing stats — never an overwrite of a
    visible snapshot's files."""
    from basicocr_spark.plans.checkpoint import SnapshotWriter

    root = str(tmp_path / "snap_replay")
    w = SnapshotWriter(spark, root)
    first = w.commit(fx["golden"].limit(10), snapshot_id="epoch000000")
    n_before = w.read_committed().count()
    replay = w.commit(fx["golden"].limit(3), snapshot_id="epoch000000")
    assert replay.get("replayed") is True
    assert replay["snapshot_id"] == "epoch000000"
    assert w.read_committed().count() == n_before  # data untouched
    assert replay["partitions"] == first["partitions"]


def test_stale_tmp_marker_is_not_a_committed_snapshot(spark, tmp_path, fx):
    """A crash between the marker tmp-write and rename must not create a
    phantom committed snapshot."""
    import os

    from basicocr_spark.plans.checkpoint import SnapshotWriter, committed_snapshots

    root = str(tmp_path / "snap_tmp")
    w = SnapshotWriter(spark, root)
    w.commit(fx["golden"].limit(5), snapshot_id="s000000")
    # simulate the crash artifact
    with open(os.path.join(root, "_commits", "s000001.tmp"), "w") as f:
        f.write("s000001")
    assert committed_snapshots(root) == ["s000000"]
    assert w.read_committed().count() == 5
    # next auto-numbered commit reuses s000001 (the attempt never committed)
    out = w.commit(fx["golden"].limit(2))
    assert out["snapshot_id"] == "s000001"


def test_cli_run_preserves_multichar_doc_ids(spark, tmp_path):
    """End-to-end CLI run(): composite doc_id#salt keys must round-trip
    multi-character doc ids exactly (the SALT_SEP constant exists
    because an invisible inline separator was once mistaken for an
    empty string — an empty separator silently truncates every id to
    its first character)."""
    import run_extraction as RX
    from basicocr_spark import schemas as S
    from basicocr_spark.plans.checkpoint import SnapshotWriter

    ids = [str(100 + i) for i in range(8)]
    docs = spark.createDataFrame(
        [(d, [("text", f"<p>hello world number {d} content</p>", None, 1)]) for d in ids],
        schema=S.DOCUMENTS,
    )
    inp = str(tmp_path / "cli_in")
    out = str(tmp_path / "cli_out")
    docs.write.mode("overwrite").parquet(inp)
    stats = RX.run(spark, inp, out, batch_size=5)
    assert stats["docs"] == 8
    got = {r.doc_id for r in SnapshotWriter(spark, out).read_committed().collect()}
    assert got == set(ids)


def test_iceberg_flag_raises_clearly_without_jars(spark, tmp_path):
    """The sandbox has no Iceberg runtime: iceberg_available must say so,
    and opting into catalog_table must fail AT CONSTRUCTION with the
    directory fallback named — never mid-job."""
    import pytest

    from basicocr_spark.plans.checkpoint import SnapshotWriter, iceberg_available

    assert iceberg_available(spark) is False
    with pytest.raises(RuntimeError, match="directory snapshot model"):
        SnapshotWriter(spark, str(tmp_path / "root"), catalog_table="cat.db.extracted")
    # default construction is unaffected by the flag's existence
    assert SnapshotWriter(spark, str(tmp_path / "root")).catalog_table is None


class _FakeCatalogIO:
    """In-memory stand-in for _CatalogIO: stores each table as collected
    rows + schema, records write calls in order, and can inject a crash
    after the Nth write — lets the commit protocol (manifest-last
    visibility, idempotent retry, resume filtering) run without an
    Iceberg runtime."""

    def __init__(self, spark, fail_after_writes=None):
        self.spark = spark
        self.tables = {}
        self.writes = []
        self.fail_after_writes = fail_after_writes

    def _store(self, df, name, replace_sid=None):
        if self.fail_after_writes is not None and len(self.writes) >= self.fail_after_writes:
            raise RuntimeError("injected catalog outage")
        rows = df.collect()
        schema = df.schema
        if replace_sid is None:
            self.tables[name] = (schema, list(rows))
        else:
            old_schema, old_rows = self.tables[name]
            kept = [r for r in old_rows if r["snapshot_id"] != replace_sid]
            self.tables[name] = (old_schema, kept + list(rows))
        self.writes.append((("create" if replace_sid is None else "overwrite"), name))

    def exists(self, name):
        return name in self.tables

    def read(self, name):
        schema, rows = self.tables[name]
        return self.spark.createDataFrame(rows, schema=schema)

    def create_partitioned(self, df, name):
        self._store(df, name)

    def overwrite_snapshot(self, df, name, sid):
        self._store(df, name, replace_sid=sid)


def _mk_writer_catalog(spark, io):
    from basicocr_spark.plans.checkpoint import SnapshotWriter

    return SnapshotWriter(spark, root="/nonexistent", catalog_table="cat.db.ext", catalog_io=io)


def _batch(spark, ids):
    from basicocr_spark import schemas as S

    return spark.createDataFrame(
        [(str(d), [("text", f"body {d}", None, 1)]) for d in ids], schema=S.DOCUMENTS
    )


def test_catalog_commit_protocol_manifest_last_and_distinct_sids(spark):
    io = _FakeCatalogIO(spark)
    w = _mk_writer_catalog(spark, io)
    s1 = w.commit(_batch(spark, [1, 2, 3]))
    s2 = w.commit(_batch(spark, [4, 5]))
    # auto sids advance (manifest-derived, not directory-derived)
    assert (s1["snapshot_id"], s2["snapshot_id"]) == ("s000000", "s000001")
    # per-commit write order: data, docids, manifest LAST (visibility point)
    names = [n for _, n in io.writes]
    assert names[:3] == ["cat.db.ext", "cat.db.ext_docids", "cat.db.ext_manifest"]
    assert names[3:6] == ["cat.db.ext", "cat.db.ext_docids", "cat.db.ext_manifest"]
    got = {r["doc_id"] for r in w.read_committed().collect()}
    assert got == {"1", "2", "3", "4", "5"}
    assert w.read_manifest().count() >= 2


def test_catalog_replayed_sid_is_noop(spark):
    io = _FakeCatalogIO(spark)
    w = _mk_writer_catalog(spark, io)
    first = w.commit(_batch(spark, [1, 2]), snapshot_id="e7")
    n_writes = len(io.writes)
    again = w.commit(_batch(spark, [1, 2]), snapshot_id="e7")
    assert again["replayed"] is True
    assert again["partitions"] == first["partitions"]
    assert len(io.writes) == n_writes  # zero new writes
    assert w.read_committed().count() == 2  # no duplicates


def test_catalog_crash_before_manifest_stays_invisible_and_retry_is_exact(spark):
    # crash after data+docids writes, BEFORE the manifest (write #3)
    io = _FakeCatalogIO(spark, fail_after_writes=2)
    w = _mk_writer_catalog(spark, io)
    try:
        w.commit(_batch(spark, [7, 8]), snapshot_id="sX")
        raise AssertionError("expected injected outage")
    except RuntimeError as e:
        assert "injected" in str(e)
    # orphan data rows exist but the snapshot is NOT visible anywhere
    assert w.read_committed() is None
    assert w.processed_doc_ids() is None
    assert w.pending(_batch(spark, [7, 8])).count() == 2  # resume redoes the batch
    # retry overwrites the orphan partition — no duplicate rows
    io.fail_after_writes = None
    w.commit(_batch(spark, [7, 8]), snapshot_id="sX")
    assert [r["doc_id"] for r in w.read_committed().orderBy("doc_id").collect()] == ["7", "8"]
    assert w.pending(_batch(spark, [7, 8, 9])).count() == 1


def test_catalog_guard_requires_configured_catalog(spark, tmp_path):
    """Even if the jar were present, an unconfigured catalog name must
    fail at construction (the session has no spark.sql.catalog.cat)."""
    import pytest

    from basicocr_spark.plans.checkpoint import SnapshotWriter

    with pytest.raises(RuntimeError, match="directory snapshot model"):
        SnapshotWriter(spark, str(tmp_path), catalog_table="cat.db.ext")


def test_auto_sid_skips_explicitly_committed_ids(spark, tmp_path):
    """Auto sid generation must not collide with a previously committed
    EXPLICIT snapshot_id — a collision reads as a replayed epoch and
    silently drops the new batch. Both legs."""
    from basicocr_spark.plans.checkpoint import SnapshotWriter

    # directory leg
    w = SnapshotWriter(spark, str(tmp_path / "root"))
    w.commit(_batch(spark, [1]), snapshot_id="s000000")
    out = w.commit(_batch(spark, [2]))  # auto: must pick s000001, not replay
    assert out["snapshot_id"] == "s000001" and "replayed" not in out
    assert {r["doc_id"] for r in w.read_committed().collect()} == {"1", "2"}

    # catalog leg
    io = _FakeCatalogIO(spark)
    wc = _mk_writer_catalog(spark, io)
    wc.commit(_batch(spark, [1]), snapshot_id="s000000")
    out = wc.commit(_batch(spark, [2]))
    assert out["snapshot_id"] == "s000001" and "replayed" not in out
    assert {r["doc_id"] for r in wc.read_committed().collect()} == {"1", "2"}
