"""Recurring-crawl incremental dedup backed by a committed sketch store.

`docs_incremental_dedup` (queries.py) demonstrates the two-sided
batch x committed join shape, but recomputes the committed side's
fingerprints/signatures from the corpus on every run. This module is the
production loop: each ingest batch commits its dedup SKETCHES
(fingerprints + banded minhash signatures) as an immutable snapshot with
the same marker-last atomic visibility as plans/checkpoint.SnapshotWriter,
and the NEXT batch's verdicts join against the committed sketch tables —
the corpus text is never re-read or re-hashed for dedup after its batch
commits. At 10^12 docs the committed store is the (tiny relative to text)
sketch table, partitioned by snapshot so each crawl round appends one
partition and reads pruned parquet.

Reference analog: the crawl/ingest loop around basicOCR's batch jobs
(docs/yangzhanku/n-gram/language-model.md's batch-counts -> merge cycle);
the snapshot/commit discipline mirrors plans/checkpoint.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hash_kernels as HK


def _queries():
    # lazy: queries.py imports operators lazily too; keeps the band
    # scheme single-sourced without a module-level cycle
    from .. import queries as Q

    return Q


class SketchStore:
    """Directory-model committed store for dedup sketches, one snapshot
    per ingested batch. Layout under `root`:

        fp/snapshot=<sid>/      (doc_id, fp)          parquet
        bands/snapshot=<sid>/   (doc_id, band, sig)   parquet
        _commits/<sid>          marker file — visibility point
        _compacted/<sid>        tombstone — sid folded into a compaction

    Both tables write BEFORE the marker lands (atomic rename), so a
    mid-commit crash leaves orphan files that every read ignores:
    readers union only marker-committed snapshot dirs. Committing an
    already-committed sid is an exactly-once no-op, same as
    SnapshotWriter.commit. Tombstones keep compacted-away sids
    recognizable as committed (`is_committed`) so a replayed stream
    epoch whose sketches were folded into a compacted snapshot still
    skips instead of re-running against a store that already contains
    its own rows."""

    def __init__(self, spark: SparkSession, root: str):
        # the directory model below lists/markers via the LOCAL
        # filesystem; on an hdfs://, s3a://, ... root every listing
        # would silently come back empty and every batch would verdict
        # 'new' — a silent dedup loss. Fail loudly instead; a real
        # cluster deployment routes the store through an object-store
        # filesystem abstraction (or Iceberg tables, like
        # plans/checkpoint.SnapshotWriter's catalog leg).
        if "://" in root:
            scheme, _, rest = root.partition("://")
            if scheme != "file":
                raise ValueError(
                    f"SketchStore requires a local filesystem root; got scheme "
                    f"{scheme!r}. Use an Iceberg/object-store-backed store for "
                    f"non-local roots."
                )
            from urllib.parse import unquote

            root = unquote(rest)
            if not root.startswith("/"):
                root = "/" + root
        self.spark = spark
        self.root = root

    def committed_snapshots(self) -> list[str]:
        # reuse checkpoint.committed_snapshots: it excludes "<sid>.tmp"
        # leftovers from a crash between the tmp write and the rename —
        # a raw listdir would count the phantom as committed
        from ..plans.checkpoint import committed_snapshots

        return sorted(committed_snapshots(self.root))

    def superseded_snapshots(self) -> list[str]:
        """Sids folded into a compacted snapshot (tombstoned). Their data
        and markers are gone but their CONTENT is committed — replay
        guards must treat them as committed."""
        from ..plans.checkpoint import _fs_ls

        return sorted(
            s
            for s in _fs_ls(os.path.join(self.root, "_compacted"))
            if not s.endswith(".tmp")
        )

    def is_committed(self, sid: str) -> bool:
        """True iff this sid's sketches are visible in the store — either
        live (marker present) or folded into a compaction (tombstone).
        The replay guard for stream epochs: a tombstoned epoch must NOT
        re-run, or it would verdict against a store already containing
        its own sketches and mark every doc a dup."""
        return (
            os.path.exists(os.path.join(self.root, "_commits", sid))
            or os.path.exists(os.path.join(self.root, "_compacted", sid))
        )

    def _read(self, table: str) -> DataFrame | None:
        paths = [
            os.path.join(self.root, table, f"snapshot={s}")
            for s in self.committed_snapshots()
        ]
        paths = [p for p in paths if os.path.isdir(p)]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def committed_fingerprints(self) -> DataFrame | None:
        """(doc_id, fp) across committed batches, None when empty."""
        return self._read("fp")

    def committed_bands(self) -> DataFrame | None:
        """(doc_id, band, sig) across committed batches, None when empty."""
        return self._read("bands")

    def committed_phash(self) -> DataFrame | None:
        """(media_ref, phash) union of committed perceptual-hash
        sketches (media crawl-dedup), None when no batch committed one."""
        return self._read("phash")

    def commit_media_batch(
        self, phash_df: DataFrame, snapshot_id: str | None = None
    ) -> dict:
        """Commit a MEDIA batch's perceptual-hash sketches (media_ref,
        phash) as a snapshot — same marker-last visibility and
        exactly-once replay semantics as commit_batch; media and text
        batches share one sid namespace (a media snapshot simply has no
        fp/bands dirs, which readers skip)."""
        from ..plans.checkpoint import next_free_sid

        taken = sorted(
            set(self.committed_snapshots()) | set(self.superseded_snapshots())
        )
        sid = snapshot_id or next_free_sid(taken)
        if sid in taken:  # replayed epoch: exactly-once no-op
            return {"snapshot_id": sid, "replayed": True}
        phash_df.select("media_ref", "phash").write.mode("overwrite").parquet(
            os.path.join(self.root, "phash", f"snapshot={sid}")
        )
        os.makedirs(os.path.join(self.root, "_commits"), exist_ok=True)
        marker = os.path.join(self.root, "_commits", sid)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(sid)
        os.rename(tmp, marker)
        return {"snapshot_id": sid, "replayed": False}

    def committed_kmv(self) -> DataFrame | None:
        """(h) union of committed per-batch KMV token sketches, None when
        no batch has committed one. Snapshots committed before the KMV
        table existed simply have no kmv dir — _read skips them."""
        return self._read("kmv")

    def commit_batch(
        self,
        fp_df: DataFrame,
        banded_df: DataFrame,
        snapshot_id: str | None = None,
        kmv_df: DataFrame | None = None,
    ) -> dict:
        """Write this batch's sketches, then drop the marker LAST.
        `kmv_df` (optional, column `h`) is the batch's k-minimum-values
        distinct-token sketch — committing it makes cross-crawl distinct
        telemetry incremental too (corpus_distinct_estimate)."""
        from ..plans.checkpoint import next_free_sid

        sids = self.committed_snapshots()
        # auto sids must dodge tombstoned sids too: a collision with a
        # compacted-away sid would read as a replayed epoch below and
        # silently discard the new batch's sketches
        taken = sorted(set(sids) | set(self.superseded_snapshots()))
        sid = snapshot_id or next_free_sid(taken)
        if sid in taken:  # replayed epoch: exactly-once no-op
            return {"snapshot_id": sid, "replayed": True}
        fp_df.select("doc_id", "fp").write.mode("overwrite").parquet(
            os.path.join(self.root, "fp", f"snapshot={sid}")
        )
        banded_df.select("doc_id", "band", "sig").write.mode("overwrite").parquet(
            os.path.join(self.root, "bands", f"snapshot={sid}")
        )
        if kmv_df is not None:
            kmv_df.select("h").write.mode("overwrite").parquet(
                os.path.join(self.root, "kmv", f"snapshot={sid}")
            )
        os.makedirs(os.path.join(self.root, "_commits"), exist_ok=True)
        marker = os.path.join(self.root, "_commits", sid)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(sid)
        os.rename(tmp, marker)  # atomic on POSIX
        return {"snapshot_id": sid, "replayed": False}

    def compact(self) -> dict:
        """Merge every committed snapshot into ONE (full-row distinct on
        both tables), for read-amplification control on a long-running
        crawl: a year of hourly epochs is ~9k snapshot dirs per read
        otherwise. Order of operations makes every crash window safe:

          1. write the compacted fp/bands dirs under a fresh sid
          2. tombstone every superseded sid in _compacted/ (so replay
             guards keep recognizing those epochs as committed — see
             is_committed; without this, a stream epoch replayed after
             compaction would re-run against a store that already holds
             its own sketches and verdict every doc a dup)
          3. drop the new marker (visibility point, atomic rename)
          4. delete superseded markers, then their data dirs

        A crash between 3 and 4 leaves old + compacted snapshots BOTH
        visible — duplicated sketch rows, which the verdict semantics
        tolerate by construction (the fp store feeds a left-semi join,
        the band join counts DISTINCT committed doc ids); re-running
        compact() afterwards converges. A crash between 2 and 3 leaves
        stale tombstones for still-live markers — harmless, is_committed
        is a union. At 10^12 docs this is the same maintenance story as
        Iceberg's rewrite_data_files."""
        old = self.committed_snapshots()
        if len(old) <= 1:
            return {"snapshot_id": old[0] if old else None, "compacted": 0}
        from ..plans.checkpoint import next_free_sid

        sid = next_free_sid(sorted(set(old) | set(self.superseded_snapshots())))
        # every table is optional: a media-only store has no fp/bands,
        # a pre-kmv store no kmv — fold whatever is present
        fp = self.committed_fingerprints()
        if fp is not None:
            fp.distinct().write.mode("overwrite").parquet(
                os.path.join(self.root, "fp", f"snapshot={sid}")
            )
        bands = self.committed_bands()
        if bands is not None:
            bands.distinct().write.mode("overwrite").parquet(
                os.path.join(self.root, "bands", f"snapshot={sid}")
            )
        kmv = self.committed_kmv()
        if kmv is not None:
            # KMV union = k smallest of the union — compaction loses nothing
            Q = _queries()
            kmv.distinct().orderBy(F.col("h").asc()).limit(Q.KMV_K).write.mode(
                "overwrite"
            ).parquet(os.path.join(self.root, "kmv", f"snapshot={sid}"))
        ph = self.committed_phash()
        if ph is not None:
            ph.distinct().write.mode("overwrite").parquet(
                os.path.join(self.root, "phash", f"snapshot={sid}")
            )
        os.makedirs(os.path.join(self.root, "_compacted"), exist_ok=True)
        for s in old:
            stone = os.path.join(self.root, "_compacted", s)
            tmp = stone + ".tmp"
            with open(tmp, "w") as f:
                f.write(sid)  # tombstone records which snapshot absorbed it
            os.rename(tmp, stone)
        marker = os.path.join(self.root, "_commits", sid)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(sid)
        os.rename(tmp, marker)
        import shutil

        for s in old:
            os.remove(os.path.join(self.root, "_commits", s))
        for s in old:
            for table in ("fp", "bands", "kmv", "phash"):
                shutil.rmtree(
                    os.path.join(self.root, table, f"snapshot={s}"),
                    ignore_errors=True,
                )
        return {"snapshot_id": sid, "compacted": len(old)}


def batch_sketches(batch_docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """ONE fingerprint kernel pass and ONE signature kernel pass over the
    incoming batch: (fp_df, banded_df), both lazily checkpointed — each
    is consumed twice (verdict join + store commit), and the lazy
    localCheckpoint makes the second consumer a cheap re-read instead of
    a second kernel execution over the batch."""
    Q = _queries()
    fp_df = batch_docs.select(
        "doc_id", HK.poly_hash_kernel(F.col("text")).alias("fp")
    ).localCheckpoint(eager=False)
    banded_df = Q._banded_sigs(
        HK.minhash_signatures_df(batch_docs, num_hashes=Q.N_MINHASH, k=3), "doc_id"
    ).localCheckpoint(eager=False)
    return fp_df, banded_df


def batch_kmv_sketch(batch_docs: DataFrame) -> DataFrame:
    """The batch's KMV distinct-token sketch: the KMV_K smallest distinct
    spread token hashes (column `h`), exactly docs_token_kmv_distinct's
    sketch restricted to one batch. KMV sketches union by taking the k
    smallest of the union, so per-batch sketches committed to the store
    merge into the EXACT full-corpus sketch without ever rescanning a
    committed batch's text (corpus_distinct_estimate)."""
    Q = _queries()
    from ..functions import textstats as TS

    toks = batch_docs.select(
        F.explode(TS.tokens(F.col("text"))).alias("word")
    ).distinct()
    spread = (
        F.lit(Q.KMV_MULT) * TS.char_poly_hash(F.col("word")) + F.lit(Q.KMV_ADD)
    ) % F.lit(Q.MINHASH_PRIME)
    return toks.select(spread.alias("h")).distinct().orderBy(F.col("h").asc()).limit(
        Q.KMV_K
    )


def corpus_distinct_estimate(
    store: SketchStore, extra_kmv: DataFrame | None = None
) -> dict:
    """Cross-crawl distinct-token estimate from COMMITTED KMV sketches
    (optionally unioned with an in-flight batch's sketch): the global
    k-min merge reads only the store's tiny kmv parquet — no committed
    batch's corpus text is rescanned. Returns
    {"k", "n_sketch", "est_distinct"}; est = (k-1) * M / h_k, the same
    estimator (and constants) as docs_token_kmv_distinct, so an estimate
    over batches 1..N equals the single-query estimate over their union
    exactly."""
    Q = _queries()
    kmv = store.committed_kmv()
    if extra_kmv is not None:
        kmv = extra_kmv if kmv is None else kmv.unionByName(extra_kmv)
    if kmv is None:
        return {"k": Q.KMV_K, "n_sketch": 0, "est_distinct": 0.0}
    kmin = kmv.distinct().orderBy(F.col("h").asc()).limit(Q.KMV_K)
    row = kmin.agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("hk")).collect()[0]  # sanctioned-collect: 1-row sketch aggregate
    n, hk = int(row["n"]), row["hk"]
    if n < Q.KMV_K:
        est = float(n)  # sketch not full: it IS the distinct set
    else:
        est = round((Q.KMV_K - 1) * float(Q.MINHASH_PRIME) / hk, 2)
    return {"k": Q.KMV_K, "n_sketch": n, "est_distinct": est}


def _phash_byte_bands(vals: DataFrame, out: str) -> DataFrame:
    """Explode DISTINCT 64-bit perceptual hashes into 8 byte bands —
    the pigeonhole candidate scheme of queries.hamming_ball_pairs,
    reused here for the incoming x committed two-sided join."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("phash"), 8 * b).bitwiseAND(F.lit(255)).alias("sig"),
            )
            for b in range(8)
        ]
    )
    return vals.select("phash", F.explode(bands).alias("bb")).select(
        F.col("phash").alias(out),
        F.col("bb.band").alias("band"),
        F.col("bb.sig").alias("sig"),
    )


def incremental_media_dedup_batch(
    blobs: DataFrame, store: SketchStore
) -> tuple[DataFrame, DataFrame]:
    """Verdicts for one incoming MEDIA batch against the committed
    perceptual-hash store — the media column's recurring-crawl dedup,
    composing media_dhash with the SketchStore: exact_dup (an identical
    dHash is committed), near_dup_candidate (a committed hash within the
    <= MEDIA_PHASH_HAM_MAX hamming ball), else new. Returns (verdicts,
    phash_df); callers commit the batch's sketches after ingest:

        verdicts, ph = incremental_media_dedup_batch(blobs, store)
        ... ingest the 'new' blobs ...
        store.commit_media_batch(ph)

    Scale shape: both the exact semi-join and the near candidate join
    run over DISTINCT hash VALUES (clone-class collapse — a flood of
    identical frames is one row), the near join is the byte-band
    pigeonhole scheme (exact for the ball, never all-pairs), and the
    committed side is the store's tiny phash parquet — media bytes are
    never re-decoded after their batch commits. Undecodable blobs emit
    no sketch row and no verdict (P1/P2 skip semantics)."""
    from .multimodal import MEDIA_PHASH_HAM_MAX, media_dhash

    phash_df = media_dhash(blobs).localCheckpoint(eager=False)
    com = store.committed_phash()
    if com is None:
        verdicts = phash_df.select(
            "media_ref",
            F.lit(0).cast("long").alias("n_near_matches"),
            F.lit("new").alias("verdict"),
        )
        return verdicts, phash_df
    com_vals = com.select("phash").distinct().localCheckpoint(eager=False)
    exact = (
        phash_df.join(com_vals, "phash", "left_semi")
        .select("media_ref")
        .withColumn("is_exact", F.lit(1))
    )
    cand = (
        _phash_byte_bands(phash_df.select("phash").distinct(), "ph_i")
        .join(_phash_byte_bands(com_vals, "ph_c"), ["band", "sig"])
        .select("ph_i", "ph_c")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("ph_i").bitwiseXOR(F.col("ph_c"))).cast("long"),
        )
        .filter((F.col("hamming") >= 1) & (F.col("hamming") <= MEDIA_PHASH_HAM_MAX))
    )
    near = (
        cand.groupBy(F.col("ph_i").alias("phash"))
        .agg(F.count(F.lit(1)).alias("n_near_matches"))
    )
    verdict = (
        F.when(F.col("is_exact") == 1, "exact_dup")
        .when(F.col("n_near_matches") > 0, "near_dup_candidate")
        .otherwise("new")
    )
    verdicts = (
        phash_df.join(exact, "media_ref", "left")
        .join(near, "phash", "left")
        .select(
            "media_ref",
            F.coalesce(F.col("n_near_matches"), F.lit(0)).alias("n_near_matches"),
            verdict.alias("verdict"),
        )
    )
    return verdicts, phash_df


def incremental_dedup_batch(
    batch_docs: DataFrame, store: SketchStore
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Verdicts for one incoming batch against the COMMITTED sketch
    store: returns (verdicts, fp_df, banded_df). Verdict precedence
    exact_dup > near_dup_candidate > new, same as
    queries.docs_incremental_dedup — but the committed side here is the
    store's parquet, not a recomputation of the corpus. Callers commit
    the returned sketches after the batch's ingest succeeds:

        verdicts, fp, bands = incremental_dedup_batch(batch, store)
        ... ingest the 'new' docs ...
        store.commit_batch(fp, bands)

    Scale shape: the only wide ops are the fingerprint semi-join and the
    two-sided band equi-join, both batch x committed (never a corpus
    self-join); with an empty store every verdict is 'new' with zero
    joins."""
    fp_df, banded_df = batch_sketches(batch_docs)
    com_fp = store.committed_fingerprints()
    com_bands = store.committed_bands()
    incoming = fp_df.select("doc_id")
    if com_fp is None or com_bands is None:
        verdicts = incoming.select(
            "doc_id",
            F.lit(0).cast("long").alias("n_band_matches"),
            F.lit("new").alias("verdict"),
        )
        return verdicts, fp_df, banded_df
    exact = (
        fp_df.join(com_fp.select("fp").distinct(), "fp", "left_semi")
        .select("doc_id")
        .withColumn("is_exact", F.lit(1))
    )
    near = (
        banded_df.alias("i")
        .join(com_bands.alias("c"), ["band", "sig"])
        .groupBy(F.col("i.doc_id").alias("doc_id"))
        .agg(F.countDistinct(F.col("c.doc_id")).alias("n_band_matches"))
    )
    verdict = (
        F.when(F.col("is_exact") == 1, "exact_dup")
        .when(F.col("n_band_matches") > 0, "near_dup_candidate")
        .otherwise("new")
    )
    verdicts = (
        incoming.join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_band_matches"), F.lit(0)).alias("n_band_matches"),
            verdict.alias("verdict"),
        )
    )
    return verdicts, fp_df, banded_df
