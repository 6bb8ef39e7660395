"""Incremental near-dup detection over the CDC change stream.

Batch MinHash/LSH dedup (pipeline.dedup.minhash_lsh_pairs) recomputes
signatures for the WHOLE corpus every run — at 10^10 documents that is the
wrong shape for a table that changes by ~0.1%/epoch. This module maintains
the LSH band index as a **CDC-derived secondary table** and touches only
the changed documents per epoch, exactly how the engine's primary tables
are maintained:

  corpus  LakeTable(doc_id -> text)                 the document table
  sigs    LakeTable(doc_id -> content_md5, bands)   signature per live doc
  bands   LakeTable(bkey   -> band_pfx, doc_id, content_md5)
          one row per (band, doc); band_pfx = "band_id:band_hash" and
          key = "band_pfx:doc_id";
          BUCKETED BY band_pfx (LakeTable bucket_col) so every band's rows
          are co-located — a probe shuffles only the BATCH, never the store

Per epoch (insert / update / delete events, LWW-collapsed like any CDC
batch):
  1. merge the batch into corpus (idempotent epoch commit)
  2. tombstone the OLD band rows of every touched doc — derived from the
     stored signature (the CDC pre-image; no old text needed) — and insert
     the new ones; merge sigs the same way
  3. probe: the batch's band rows equi-join the band store on band_pfx,
     reading ONLY the buckets the batch's bands hash to
  4. verify candidates with exact n-gram Jaccard against corpus text
     (bucket-pruned reads), append verified pairs to a per-epoch pair log

Pair-log liveness: each pair row carries the content_md5 of both sides at
detection time; `live_pairs()` keeps a row only while BOTH docs still have
that exact content (join against sigs). Invariant (tested): after any
sequence of inserts/updates/deletes and any epoch redelivery,

    live_pairs() == minhash_lsh_pairs(current corpus)

because signatures are a pure function of a doc's own text — band
collisions and verified Jaccards computed incrementally equal the batch
ones, and the md5 liveness join retires every pair whose either side has
since changed.

Scale shape per epoch: O(batch) signature work, O(batch x B) band upserts,
a probe that shuffles O(batch x B) rows into the band store's buckets, and
verify joins proportional to the candidate set. Nothing rescans the corpus.

Reference analog: this is TiCDC's own pattern of downstream tables kept
consistent by the change stream (SURVEY.md §2.2), applied to a derived
search index instead of a mirror table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake.table import LakeTable
from ..model import OP_DELETE, OP_INSERT, SYS_DELETED
from .dedup import BANDS, N_PERMS, band_hash_exprs, minhash_signatures, shingles



def collapse_lww_batch(changes: DataFrame, key_col: str) -> DataFrame:
    """One winner per key per epoch, same total order the lake applies:
    (commit_ts, seq, delete < put)."""
    rank = F.struct(
        F.col("commit_ts"),
        F.col("seq"),
        (F.col("op") != OP_DELETE).cast("int").alias("_op_rank"),
    )
    payload = [c for c in changes.columns if c != key_col]
    return (
        changes.groupBy(key_col)
        .agg(F.max_by(F.struct(*payload), rank).alias("_w"))
        .select(key_col, *[F.col(f"_w.{c}").alias(c) for c in payload])
    )


def _rows_for_ids(table: LakeTable, ids: DataFrame, id_col: str) -> DataFrame:
    """Bucket-pruned read of `table` restricted to the ids in `ids`:
    collect the (≤ n_buckets) bucket-id set — never the keys themselves —
    read only those buckets, then inner-join back. The join-based sibling
    of LakeTable.lookup for id sets too large to ship to the driver."""
    ids = ids.select(F.col(id_col).alias(table.key_col)).distinct()
    bks = sorted(
        int(r["b"])
        for r in ids.select(table._bucket_expr(table.key_col).alias("b"))
        .distinct()
        .collect()
    )
    if not bks:
        return table.read().limit(0)
    live = (
        table.read_raw(buckets=bks)
        .filter(~F.col(SYS_DELETED))
        .select(*[f["name"] for f in table.current_fields])
    )
    return live.join(ids, table.key_col)


class IncrementalLSHDeduper:
    """Maintains corpus + signature + band-index tables from a CDC change
    stream and emits verified near-dup pairs per epoch. See module doc."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n: int = 3,
        n_perms: int = N_PERMS,
        bands: int = BANDS,
        threshold: float = 0.7,
        n_buckets: int = 8,
        band_buckets: int = 16,
        id_type: str = "string",
    ):
        self.spark = spark
        self.root = root
        self.n = n
        self.n_perms = n_perms
        self.bands_n = bands
        self.threshold = threshold
        self.id_type = id_type
        self._ctor = dict(
            n=n, n_perms=n_perms, bands=bands, threshold=threshold,
            n_buckets=n_buckets, band_buckets=band_buckets, id_type=id_type,
        )
        self._pair_schema = (
            f"doc_a {id_type}, doc_b {id_type}, jaccard double, "
            "md5_a string, md5_b string"
        )
        self.pairs_dir = os.path.join(root, "pairs")
        self.corpus = self._open_or_create(
            os.path.join(root, "corpus"),
            [
                {"id": 1, "name": "doc_id", "type": id_type, "nullable": False},
                {"id": 2, "name": "text", "type": "string"},
            ],
            n_buckets=n_buckets,
        )
        self.sigs = self._open_or_create(
            os.path.join(root, "sigs"),
            [
                {"id": 1, "name": "doc_id", "type": id_type, "nullable": False},
                {"id": 2, "name": "content_md5", "type": "string"},
                {"id": 3, "name": "bands", "type": "array<string>"},
            ],
            n_buckets=n_buckets,
        )
        self.band_index = self._open_or_create(
            os.path.join(root, "bands"),
            [
                {"id": 1, "name": "bkey", "type": "string", "nullable": False},
                {"id": 2, "name": "band_pfx", "type": "string"},
                {"id": 3, "name": "doc_id", "type": id_type},
                {"id": 4, "name": "content_md5", "type": "string"},
            ],
            n_buckets=band_buckets,
            key_col="bkey",
            bucket_col="band_pfx",
        )

    def _open_or_create(self, root: str, fields, n_buckets, **kw) -> LakeTable:
        if os.path.exists(os.path.join(root, "_manifests", "CURRENT")):
            return LakeTable(self.spark, root)
        return LakeTable.create(
            self.spark, root, fields=fields, n_buckets=n_buckets, **kw
        )

    # ------------------------------------------------------------------
    def _collapse_batch(self, changes: DataFrame) -> DataFrame:
        return collapse_lww_batch(changes, "doc_id")

    def _sig_bands(self, puts: DataFrame) -> DataFrame:
        """(doc_id, content_md5, bands array<string>) for the batch's live
        docs; docs with zero shingles get an empty band array (their sigs
        row still updates so stale pairs retire via the md5 liveness join)."""
        sig = minhash_signatures(puts, self.n, self.n_perms)
        # band prefix = "band_id:band_hash" — the id keeps probe semantics
        # IDENTICAL to the batch join on (band_id, band_hash); hash-only
        # keys would admit cross-band hash collisions as extra candidates
        banded = sig.select(
            "doc_id",
            F.array(
                *[
                    F.concat_ws(":", F.lit(str(i)), h)
                    for i, h in enumerate(band_hash_exprs(self.n_perms, self.bands_n))
                ]
            ).alias("bands"),
        )
        return (
            puts.select("doc_id", F.md5(F.col("text")).alias("content_md5"))
            .join(banded, "doc_id", "left")
            .select(
                "doc_id",
                "content_md5",
                F.coalesce(F.col("bands"), F.array().cast("array<string>")).alias("bands"),
            )
        )

    def process_epoch(self, changes: DataFrame, epoch_id: str) -> DataFrame:
        """Apply one epoch of (doc_id, op, commit_ts, seq, text) changes and
        return this epoch's newly detected verified pairs. Idempotent: table
        merges are epoch-committed; the pair log overwrites its epoch dir;
        a redelivered epoch re-probes against the CURRENT store, which can
        only re-emit pairs that are valid detections (the equivalence
        invariant survives arbitrary redelivery — tested)."""
        b = self._collapse_batch(
            changes.select("doc_id", "op", "commit_ts", "seq", "text")
        ).localCheckpoint(eager=True)  # reused 5x below; keep one materialization

        self.corpus.merge_epoch(b, f"{epoch_id}-corpus", assume_deduped=True)

        puts = b.filter(F.col("op") != OP_DELETE)
        new_sigs = self._sig_bands(puts).localCheckpoint(eager=True)

        # CDC pre-image: the stored signature of every touched doc yields
        # its old band keys — tombstone them (update/delete both retire the
        # old index entries; ties with re-inserted identical bands resolve
        # put-over-delete at equal (commit_ts, seq), as everywhere else)
        stamped = b.select("doc_id", "commit_ts", "seq")
        old = _rows_for_ids(self.sigs, b.select("doc_id"), "doc_id")
        old_tomb = (
            old.join(stamped, "doc_id")
            .select(
                "doc_id",
                "commit_ts",
                "seq",
                F.explode("bands").alias("band_pfx"),
            )
            .select(
                F.concat_ws(":", "band_pfx", "doc_id").alias("bkey"),
                "band_pfx",
                "doc_id",
                F.lit(None).cast("string").alias("content_md5"),
                F.lit(OP_DELETE).alias("op"),
                "commit_ts",
                "seq",
            )
        )
        new_band_rows = (
            new_sigs.join(stamped, "doc_id")
            .select(
                "doc_id",
                "content_md5",
                "commit_ts",
                "seq",
                F.explode("bands").alias("band_pfx"),
            )
            .select(
                F.concat_ws(":", "band_pfx", "doc_id").alias("bkey"),
                "band_pfx",
                "doc_id",
                "content_md5",
                F.lit(OP_INSERT).alias("op"),
                "commit_ts",
                "seq",
            )
            .localCheckpoint(eager=True)  # reused by merge AND probe
        )
        self.band_index.merge_epoch(
            old_tomb.unionByName(new_band_rows), f"{epoch_id}-bands"
        )

        sig_changes = (
            new_sigs.join(stamped, "doc_id")
            .withColumn("op", F.lit(OP_INSERT))
            .unionByName(
                b.filter(F.col("op") == OP_DELETE).select(
                    "doc_id",
                    F.lit(None).cast("string").alias("content_md5"),
                    F.lit(None).cast("array<string>").alias("bands"),
                    "commit_ts",
                    "seq",
                    "op",
                )
            )
        )
        self.sigs.merge_epoch(sig_changes, f"{epoch_id}-sigs", assume_deduped=True)

        # probe: batch bands vs the post-merge store, reading only the
        # buckets the batch's band prefixes hash to
        probe = new_band_rows.select("band_pfx", F.col("doc_id").alias("probe_doc"))
        bks = sorted(
            int(r["b"])
            for r in probe.select(
                self.band_index._bucket_expr("band_pfx").alias("b")
            )
            .distinct()
            .collect()
        )
        if not bks:
            self._write_pairs(self.spark.createDataFrame([], self._pair_schema), epoch_id)
            return self._read_pairs(epoch_id)
        store = (
            self.band_index.read_raw(buckets=bks)
            .filter(~F.col(SYS_DELETED))
            .select("band_pfx", "doc_id")
        )
        cand = (
            probe.join(store, "band_pfx")
            .filter(F.col("doc_id") != F.col("probe_doc"))
            .select(
                F.least("doc_id", "probe_doc").alias("doc_a"),
                F.greatest("doc_id", "probe_doc").alias("doc_b"),
            )
            .distinct()
            .localCheckpoint(eager=True)  # feeds ids + the inter join
        )

        # exact-Jaccard verify on candidate docs only (bucket-pruned text
        # fetch; same formula/rounding as the batch path so results match).
        # texts is referenced by FOUR join branches (sh_a, sh_b, md5_a,
        # md5_b) — without materialization each branch re-reads and
        # re-collapses the corpus buckets (measured 4x the verify cost)
        ids = cand.select(F.col("doc_a").alias("doc_id")).unionByName(
            cand.select(F.col("doc_b").alias("doc_id"))
        )
        texts = _rows_for_ids(self.corpus, ids, "doc_id").localCheckpoint(eager=True)
        sh = shingles(texts, self.n)
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
        sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        sh_b = sh.select(F.col("doc_id").alias("doc_b2"), F.col("shingle").alias("shingle_b"))
        inter = (
            cand.join(sh_a, "doc_a")
            .join(
                sh_b,
                (F.col("doc_b") == F.col("doc_b2"))
                & (F.col("shingle") == F.col("shingle_b")),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_inter"))
        )
        sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
        sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
        md5s = texts.select("doc_id", F.md5("text").alias("m"))
        out = (
            inter.join(sa, "doc_a")
            .join(sb, "doc_b")
            .withColumn(
                "jaccard",
                F.round(
                    F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                    6,
                ),
            )
            .filter(F.col("jaccard") >= self.threshold)
            .join(md5s.select(F.col("doc_id").alias("doc_a"), F.col("m").alias("md5_a")), "doc_a")
            .join(md5s.select(F.col("doc_id").alias("doc_b"), F.col("m").alias("md5_b")), "doc_b")
            .select("doc_a", "doc_b", "jaccard", "md5_a", "md5_b")
        )
        self._write_pairs(out, epoch_id)
        # hand back the WRITTEN rows, not the live plan: a caller's
        # count()/collect() then re-scans a few parquet files instead of
        # re-executing the whole candidate-verify join a second time
        return self._read_pairs(epoch_id)

    def _write_pairs(self, pairs: DataFrame, epoch_id: str) -> None:
        path = os.path.join(self.pairs_dir, f"epoch={epoch_id}")
        pairs.write.mode("overwrite").parquet(path)

    def _read_pairs(self, epoch_id: str) -> DataFrame:
        path = os.path.join(self.pairs_dir, f"epoch={epoch_id}")
        return self.spark.read.schema(self._pair_schema).parquet(path)

    def pair_log(self) -> DataFrame:
        """Every detection ever made (may include retired pairs)."""
        import glob

        dirs = sorted(glob.glob(os.path.join(self.pairs_dir, "epoch=*")))
        if not dirs:
            return self.spark.createDataFrame([], self._pair_schema)
        return self.spark.read.schema(self._pair_schema).parquet(*dirs)

    def maintain(self, max_deltas: int = 8, keep_versions: int = 4) -> dict:
        """Compact hot buckets + expire old snapshots on all three tables;
        never changes live_pairs() (asserted in tests)."""
        return _maintain_tables(
            [self.corpus, self.sigs, self.band_index], max_deltas, keep_versions
        )

    def reset(self) -> None:
        """Wipe every derived table and the pair log (used when the SOURCE
        table was truncated — its changelog cannot express the wipe as
        change rows). Destructive and idempotent."""
        import shutil

        for sub in ("corpus", "sigs", "bands", "pairs"):
            shutil.rmtree(os.path.join(self.root, sub), ignore_errors=True)
        self.__init__(self.spark, self.root, **self._ctor)

    def live_pairs(self) -> DataFrame:
        """Pairs whose BOTH sides still carry the content they were
        detected at — equals minhash_lsh_pairs(current corpus)."""
        cur = self.sigs.read().select("doc_id", "content_md5")
        log = self.pair_log()
        return (
            log.join(
                cur.select(
                    F.col("doc_id").alias("doc_a"), F.col("content_md5").alias("md5_a")
                ),
                ["doc_a", "md5_a"],
            )
            .join(
                cur.select(
                    F.col("doc_id").alias("doc_b"), F.col("content_md5").alias("md5_b")
                ),
                ["doc_b", "md5_b"],
            )
            .select("doc_a", "doc_b", "jaccard")
            .distinct()
        )


class DerivedIndexFeed:
    """Subscribe an IncrementalLSHDeduper to a source LakeTable: each sync
    reads the table's incremental changelog (LakeTable.read_changes — the
    Iceberg incremental-scan analog) from a PERSISTED version cursor and
    feeds it through process_epoch, committing the cursor only afterwards.

    Crash safety is free by construction: the epoch id is the version
    range, process_epoch is idempotent under redelivery (table merges are
    epoch-committed, the pair log overwrites its epoch dir and re-probing
    can only re-emit valid detections), so a crash between process_epoch
    and the cursor write simply replays the same range on restart. This is
    the same at-least-once-delivery + idempotent-apply contract the engine's
    primary sink uses (cdc/owner.go:706-800 analog).
    """

    def __init__(self, source, deduper, transform=None):
        """deduper: any derived index exposing process_epoch(df, epoch_id)
        and a root dir — IncrementalLSHDeduper, IncrementalIVF, or a custom
        one. transform: optional DataFrame->DataFrame applied to each
        changelog slice before process_epoch — e.g. deriving the dedup
        `text` from a token-array payload (concat_ws over tokens) when the
        source is a CDC tokens table, or renaming the key for the IVF.
        Must be deterministic and preserve (key, op, commit_ts, seq)."""
        self.source = source
        self.deduper = deduper
        self.transform = transform
        self._cursor_path = os.path.join(deduper.root, "_cursor")

    @property
    def cursor(self) -> int:
        try:
            with open(self._cursor_path) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def sync(self) -> dict:
        """Catch the derived index up to the source's current version.
        Returns {from_version, to_version, pairs} (pairs = detections this
        sync, possibly re-detections on replay)."""
        self.source.refresh()
        lo, hi = self.cursor, self.source.version
        if hi <= lo:
            return {"from_version": lo, "to_version": hi, "pairs": 0}
        # TRUNCATE cannot be expressed as change rows (read_changes rightly
        # skips rewrite commits), so detect the marker in the version range
        # and rebuild from scratch: wipe the derived state, then index the
        # post-truncate appends. Crash between reset and cursor write
        # replays the same range — reset is idempotent.
        trunc_v = None
        for v in range(lo + 1, hi + 1):
            mk = self.source._load_version_manifest(v).get("commit_kind")
            if mk == "truncate":
                trunc_v = v
        if trunc_v is not None:
            self.deduper.reset()
            lo = trunc_v
        ch = self.source.read_changes(lo, hi)
        if self.transform is not None:
            ch = self.transform(ch)
        out = self.deduper.process_epoch(ch, f"v{lo}-v{hi}")
        n = out.count() if isinstance(out, DataFrame) else 0
        tmp = self._cursor_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(hi))
        os.replace(tmp, self._cursor_path)
        return {"from_version": lo, "to_version": hi, "pairs": n}


class IncrementalIVF:
    """CDC-maintained IVF ANN index over an embedding change stream.

    Same derived-secondary-index pattern as the LSH band index, applied to
    vectors:

      cells  LakeTable(vec_id -> cell)             key-bucketed sidecar:
             the pre-image source (which cell does this vec live in NOW)
      vecs   LakeTable(vec_id -> cell, embedding)  BUCKETED BY cell
             (bucket_col): each coarse cell's vectors are co-located, so a
             query probe reads only the buckets its probe cells hash to

    A re-embedded vector can MOVE cells — the classic secondary-index move
    problem: its new row lands in a different bucket than its old one, so
    a probe of the old cell would keep seeing the stale row. Every update
    therefore writes TWO rows for the key: a tombstone carrying the OLD
    cell (placing it in the old bucket, killing the stale row there) and
    the insert carrying the new cell. merge_epoch is called with
    assume_deduped=True so the pair survives to the write (the class
    pre-collapses the batch itself); put beats tombstone at equal
    (commit_ts, seq) when the cell did not change.

    topk() equals similarity.ivf_topk over the current vector set — same
    deterministic cells, probes, scoring, and tie-break (tested, including
    cell moves, deletes, and epoch redelivery).
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        cell_bits: int = 4,
        dim: int = 64,
        n_buckets: int = 8,
        cell_buckets: int = 16,
        id_type: str = "bigint",
    ):
        self.spark = spark
        self.root = root
        self.cell_bits = cell_bits
        self.dim = dim
        self._id_type = id_type
        self.cells = self._open_or_create(
            os.path.join(root, "cells"),
            [
                {"id": 1, "name": "vec_id", "type": id_type, "nullable": False},
                {"id": 2, "name": "cell", "type": "bigint"},
            ],
            n_buckets=n_buckets,
            key_col="vec_id",
        )
        self.vecs = self._open_or_create(
            os.path.join(root, "vecs"),
            [
                {"id": 1, "name": "vec_id", "type": id_type, "nullable": False},
                {"id": 2, "name": "cell", "type": "bigint"},
                {"id": 3, "name": "embedding", "type": "array<float>"},
            ],
            n_buckets=cell_buckets,
            key_col="vec_id",
            bucket_col="cell",
        )

    _open_or_create = IncrementalLSHDeduper._open_or_create

    def process_epoch(self, changes: DataFrame, epoch_id: str) -> dict:
        """changes: (vec_id, op, commit_ts, seq, embedding). Idempotent by
        epoch id, like every lake merge."""
        from .similarity import cell_signature

        b = collapse_lww_batch(changes, "vec_id").localCheckpoint(eager=True)
        stamped = b.select("vec_id", "commit_ts", "seq")
        puts = b.filter(F.col("op") != OP_DELETE).withColumn(
            "cell", cell_signature("embedding", self.cell_bits, self.dim)
        )
        old = _rows_for_ids(self.cells, b.select("vec_id"), "vec_id")
        # tombstone in the OLD cell's bucket for every touched key that had
        # a row (update: kills the stale copy there; delete: the delete)
        vec_tombs = old.join(stamped, "vec_id").select(
            "vec_id",
            "cell",
            F.lit(None).cast("array<float>").alias("embedding"),
            F.lit(OP_DELETE).alias("op"),
            "commit_ts",
            "seq",
        )
        vec_puts = puts.select(
            "vec_id", "cell", "embedding", F.lit(OP_INSERT).alias("op"), "commit_ts", "seq"
        )
        self.vecs.merge_epoch(
            vec_tombs.unionByName(vec_puts), f"{epoch_id}-vecs", assume_deduped=True
        )
        cell_changes = puts.select(
            "vec_id", "cell", F.lit(OP_INSERT).alias("op"), "commit_ts", "seq"
        ).unionByName(
            b.filter(F.col("op") == OP_DELETE).select(
                "vec_id",
                F.lit(None).cast("bigint").alias("cell"),
                F.lit(OP_DELETE).alias("op"),
                "commit_ts",
                "seq",
            )
        )
        self.cells.merge_epoch(cell_changes, f"{epoch_id}-cells", assume_deduped=True)
        return {"epoch": epoch_id}

    def maintain(self, max_deltas: int = 8, keep_versions: int = 4) -> dict:
        """Compact hot buckets + expire old snapshots; never changes topk()."""
        return _maintain_tables([self.cells, self.vecs], max_deltas, keep_versions)

    def reset(self) -> None:
        """Wipe the index (source truncate support; see DerivedIndexFeed)."""
        import shutil

        for sub in ("cells", "vecs"):
            shutil.rmtree(os.path.join(self.root, sub), ignore_errors=True)
        self.__init__(
            self.spark, self.root, cell_bits=self.cell_bits, dim=self.dim,
            n_buckets=self.cells.n_buckets, cell_buckets=self.vecs.n_buckets,
            id_type=self._id_type,
        )

    def topk(
        self, queries: DataFrame, k: int = 5, n_probe_hamming: int = 1,
        id_col: str = "vec_id", vec_col: str = "embedding",
    ) -> DataFrame:
        """Probe the index: read ONLY the vec buckets the queries' probe
        cells hash to, exact-cosine re-rank inside. Same output contract as
        similarity.ivf_topk."""
        from pyspark.sql import Window

        from .similarity import cell_signature, cosine, probe_cells

        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.explode(
                probe_cells(
                    cell_signature(vec_col, self.cell_bits, self.dim),
                    self.cell_bits,
                    n_probe_hamming,
                )
            ).alias("cell"),
        )
        bks = sorted(
            int(r["b"])
            for r in q.select(self.vecs._bucket_expr("cell").alias("b")).distinct().collect()
        )
        if not bks:
            return self.spark.createDataFrame(
                [],
                f"query_id {self._id_type}, neighbor_id {self._id_type}, "
                "cos_sim double, rank int",
            )
        store = (
            self.vecs.read_raw(buckets=bks)
            .filter(~F.col(SYS_DELETED))
            .select(F.col("vec_id").alias("neighbor_id"), "cell", F.col("embedding").alias("cvec"))
        )
        cand = store.join(F.broadcast(q), "cell").filter(
            F.col("neighbor_id") != F.col("query_id")
        )
        scored = cand.select(
            "query_id", "neighbor_id", cosine(F.col("cvec"), F.col("qvec")).alias("cos_sim")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cos_sim", "rank")
        )


class IncrementalPQ:
    """CDC-maintained IVFADC index (pipeline/pq) over an embedding change
    stream — the compressed sibling of IncrementalIVF: the sidecar stores
    (vec_id, cell, codes array<int>), never the float vectors, so the
    live index stays ~32x smaller than the corpus at any scale.

    Codebooks are trained ONCE (from the first epoch's vectors unless
    passed in) and FROZEN — the standard PQ deployment shape: retraining
    would silently invalidate every stored code, so freshness comes from
    re-ENCODING changed vectors (map-only) against the fixed books, never
    from moving centroids. Books persist to <root>/books.json (atomic
    tmp+replace, same commit discipline as every metadata write) so a
    reopened index encodes identically.

    Same cell-move contract as IncrementalIVF: an update writes a
    tombstone into the OLD cell's bucket plus the insert in the new one;
    merge_epoch(assume_deduped=True) keeps the pair. topk() equals
    pq.ivfpq_topk(current corpus, books=frozen) — tested under inserts,
    negation cell-moves, deletes, and epoch redelivery.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        books: dict[int, list[tuple[int, list[float]]]] | None = None,
        cell_bits: int = 4,
        m: int = 16,
        k: int = 32,
        iters: int = 2,
        dim: int = 64,
        n_buckets: int = 8,
        cell_buckets: int = 16,
        id_type: str = "bigint",
    ):
        import json

        self.spark = spark
        self.root = root
        self.cell_bits = cell_bits
        self.m, self.k, self.iters, self.dim = m, k, iters, dim
        self._id_type = id_type
        self._books_path = os.path.join(root, "books.json")
        if books is None and os.path.exists(self._books_path):
            with open(self._books_path) as f:
                raw = json.load(f)
            books = {
                int(s): [(int(c), list(cent)) for c, cent in pairs]
                for s, pairs in raw.items()
            }
        self.books = books
        self.cells = self._open_or_create(
            os.path.join(root, "cells"),
            [
                {"id": 1, "name": "vec_id", "type": id_type, "nullable": False},
                {"id": 2, "name": "cell", "type": "bigint"},
            ],
            n_buckets=n_buckets,
            key_col="vec_id",
        )
        self.vecs = self._open_or_create(
            os.path.join(root, "vecs"),
            [
                {"id": 1, "name": "vec_id", "type": id_type, "nullable": False},
                {"id": 2, "name": "cell", "type": "bigint"},
                {"id": 3, "name": "codes", "type": "array<int>"},
            ],
            n_buckets=cell_buckets,
            key_col="vec_id",
            bucket_col="cell",
        )
        if self.books is not None and not os.path.exists(self._books_path):
            self._save_books()

    _open_or_create = IncrementalLSHDeduper._open_or_create

    def _save_books(self) -> None:
        import json

        os.makedirs(self.root, exist_ok=True)
        tmp = self._books_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {str(s): [[c, cent] for c, cent in pairs]
                 for s, pairs in self.books.items()},
                f,
            )
        os.replace(tmp, self._books_path)

    def process_epoch(self, changes: DataFrame, epoch_id: str) -> dict:
        """changes: (vec_id, op, commit_ts, seq, embedding). First epoch
        trains the books from its own vectors if none were given."""
        from .pq import pq_encode_staged, pq_train
        from .similarity import cell_signature

        b = collapse_lww_batch(changes, "vec_id").localCheckpoint(eager=True)
        if self.books is None:
            self.books = pq_train(
                b.filter(F.col("op") != OP_DELETE),
                m=self.m, k=self.k, iters=self.iters, dim=self.dim,
                id_col="vec_id", vec_col="embedding",
            )
            self._save_books()
        stamped = b.select("vec_id", "commit_ts", "seq")
        # Encode ONCE and pin: the m*k argmin plan is big (janino compiles
        # it in seconds) and feeds BOTH merges below — without the eager
        # checkpoint each merge action re-optimizes + recompiles it.
        # Change-bound materialization: only this epoch's rows, m ints each.
        puts = pq_encode_staged(
            b.filter(F.col("op") != OP_DELETE).select(
                "vec_id",
                "embedding",
                cell_signature("embedding", self.cell_bits, self.dim).alias(
                    "cell"
                ),
                "commit_ts",
                "seq",
            ),
            self.books,
            "embedding",
        ).drop("embedding").localCheckpoint(eager=True)
        old = _rows_for_ids(self.cells, b.select("vec_id"), "vec_id")
        vec_tombs = old.join(stamped, "vec_id").select(
            "vec_id",
            "cell",
            F.lit(None).cast("array<int>").alias("codes"),
            F.lit(OP_DELETE).alias("op"),
            "commit_ts",
            "seq",
        )
        vec_puts = puts.select(
            "vec_id", "cell", "codes",
            F.lit(OP_INSERT).alias("op"), "commit_ts", "seq",
        )
        self.vecs.merge_epoch(
            vec_tombs.unionByName(vec_puts), f"{epoch_id}-vecs",
            assume_deduped=True,
        )
        cell_changes = puts.select(
            "vec_id", "cell", F.lit(OP_INSERT).alias("op"), "commit_ts", "seq"
        ).unionByName(
            b.filter(F.col("op") == OP_DELETE).select(
                "vec_id",
                F.lit(None).cast("bigint").alias("cell"),
                F.lit(OP_DELETE).alias("op"),
                "commit_ts",
                "seq",
            )
        )
        self.cells.merge_epoch(
            cell_changes, f"{epoch_id}-cells", assume_deduped=True
        )
        return {"epoch": epoch_id}

    def maintain(self, max_deltas: int = 8, keep_versions: int = 4) -> dict:
        return _maintain_tables([self.cells, self.vecs], max_deltas, keep_versions)

    def reset(self) -> None:
        """Wipe the derived rows (source truncate via DerivedIndexFeed) but
        KEEP the frozen books: codes of the re-indexed rows stay comparable
        to anything encoded before; retraining is an explicit operator
        decision, never an implicit side effect of a truncate."""
        import shutil

        books = self.books
        for sub in ("cells", "vecs"):
            shutil.rmtree(os.path.join(self.root, sub), ignore_errors=True)
        self.__init__(
            self.spark, self.root, books=books, cell_bits=self.cell_bits,
            m=self.m, k=self.k, iters=self.iters, dim=self.dim,
            n_buckets=self.cells.n_buckets, cell_buckets=self.vecs.n_buckets,
            id_type=self._id_type,
        )

    def topk(
        self, queries: DataFrame, k_top: int = 5, n_probe_hamming: int = 1,
        id_col: str = "vec_id", vec_col: str = "embedding",
    ) -> DataFrame:
        """ADC probe: read ONLY the code buckets the probe cells hash to,
        rank by the broadcast distance tables. Output contract matches
        pq.ivfpq_topk."""
        from pyspark.sql import Window

        from .pq import _adc_expr, _query_tabs
        from .similarity import cell_signature, probe_cells

        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.explode(
                probe_cells(
                    cell_signature(vec_col, self.cell_bits, self.dim),
                    self.cell_bits,
                    n_probe_hamming,
                )
            ).alias("cell"),
        )
        bks = sorted(
            int(r["b"])
            for r in q.select(self.vecs._bucket_expr("cell").alias("b"))
            .distinct()
            .collect()
        )
        if not bks:
            return self.spark.createDataFrame(
                [],
                f"query_id {self._id_type}, neighbor_id {self._id_type}, "
                "adc_dist double, rank int",
            )
        tabs = _query_tabs(queries, self.books, self.dim, id_col, vec_col)
        store = (
            self.vecs.read_raw(buckets=bks)
            .filter(~F.col(SYS_DELETED))
            .select(F.col("vec_id").alias("neighbor_id"), "cell", "codes")
        )
        cand = (
            store.join(F.broadcast(q), "cell")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .join(tabs, "query_id")
        )
        scored = cand.select(
            "query_id", "neighbor_id", _adc_expr().alias("adc_dist")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("adc_dist").asc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k_top)
            .select("query_id", "neighbor_id", "adc_dist", "rank")
        )


class IncrementalDecontaminator:
    """CDC-maintained benchmark-contamination index.

    Batch decontamination (pipeline.decontam.decontaminate) re-shingles the
    WHOLE corpus per run; a doc's contamination is a pure function of its
    own text and the (static) eval set, so it is exactly as incremental as
    the LSH signatures: per epoch, only the changed docs are re-checked.

    State is one LakeTable `hits(doc_id -> n_hit_grams)` covering every
    live doc (0 = clean), maintained by the change stream like any CDC
    mirror; the eval set's n-gram inventory is frozen to parquet under the
    index root at creation so reopening the index (or replaying an epoch
    after a crash) checks against the identical gram set.

    Invariant (tested, incl. updates/deletes/out-of-order redelivery):

        report() == decontaminate(current corpus, eval_docs)

    Scale shape per epoch: O(batch grams) explode + a broadcast join
    against the eval grams (eval sets are 10^3-10^6 grams — tiny), one
    key-bucketed upsert. Nothing rescans the corpus. Fits DerivedIndexFeed
    (process_epoch/root/reset), so it can follow a live changefeed.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        eval_docs: DataFrame | None = None,
        n: int = 8,
        n_buckets: int = 8,
        id_type: str = "string",
    ):
        from ..functions.text import tokens_col, word_ngrams

        self.spark = spark
        self.root = root
        self.n = n
        self._id_type = id_type
        self._n_buckets = n_buckets
        self._grams_dir = os.path.join(root, "eval_grams")
        if not os.path.exists(self._grams_dir):
            if eval_docs is None:
                raise ValueError(
                    "first open of an IncrementalDecontaminator needs eval_docs"
                )
            (
                eval_docs.select(
                    F.explode(word_ngrams(tokens_col("text"), n)).alias("gram")
                )
                .distinct()
                .write.mode("overwrite")
                .parquet(self._grams_dir)
            )
        self.hits = self._open_or_create(
            os.path.join(root, "hits"),
            [
                {"id": 1, "name": "doc_id", "type": id_type, "nullable": False},
                {"id": 2, "name": "n_hit_grams", "type": "bigint"},
            ],
            n_buckets=n_buckets,
        )

    _open_or_create = IncrementalLSHDeduper._open_or_create

    def eval_grams(self) -> DataFrame:
        return self.spark.read.parquet(self._grams_dir)

    def process_epoch(self, changes: DataFrame, epoch_id: str) -> dict:
        """changes: (doc_id, op, commit_ts, seq, text). Idempotent by epoch
        id (lake merge contract)."""
        from ..functions.text import tokens_col, word_ngrams

        b = collapse_lww_batch(
            changes.select("doc_id", "op", "commit_ts", "seq", "text"), "doc_id"
        ).localCheckpoint(eager=True)  # grams + zero-join + tombstones reuse it
        puts = b.filter(F.col("op") != OP_DELETE)
        doc_hits = (
            puts.select(
                "doc_id",
                F.explode(word_ngrams(tokens_col("text"), self.n)).alias("gram"),
            )
            .distinct()
            .join(F.broadcast(self.eval_grams()), "gram")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_hit_grams"))
        )
        hit_rows = (
            puts.select("doc_id", "op", "commit_ts", "seq")
            .join(doc_hits, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_hit_grams", F.lit(0)).alias("n_hit_grams"),
                "op",
                "commit_ts",
                "seq",
            )
            .unionByName(
                b.filter(F.col("op") == OP_DELETE).select(
                    "doc_id",
                    F.lit(None).cast("bigint").alias("n_hit_grams"),
                    "op",
                    "commit_ts",
                    "seq",
                )
            )
        )
        self.hits.merge_epoch(hit_rows, f"{epoch_id}-hits", assume_deduped=True)
        return {"epoch": epoch_id}

    def report(self) -> DataFrame:
        """(doc_id, n_hit_grams, contaminated) for every live doc — the
        batch decontaminate() contract over the current corpus."""
        return self.hits.read().select(
            "doc_id",
            "n_hit_grams",
            (F.col("n_hit_grams") > 0).cast("int").alias("contaminated"),
        )

    def maintain(self, max_deltas: int = 8, keep_versions: int = 4) -> dict:
        return _maintain_tables([self.hits], max_deltas, keep_versions)

    def reset(self) -> None:
        """Wipe the index (source truncate support; see DerivedIndexFeed).
        The frozen eval grams are KEPT — they are configuration, not state."""
        import shutil

        shutil.rmtree(os.path.join(self.root, "hits"), ignore_errors=True)
        self.__init__(
            self.spark, self.root, n=self.n,
            n_buckets=self._n_buckets, id_type=self._id_type,
        )


def _maintain_tables(tables, max_deltas: int = 8, keep_versions: int = 4) -> dict:
    """Derived-index housekeeping: fold MOR deltas + purge tombstones when a
    table has accumulated more than max_deltas files in some bucket, then
    expire old snapshots. Same GC-safepoint discipline as the primary lake
    tables (compaction never changes visible state — asserted in tests)."""
    out = {}
    for t in tables:
        c = t.maybe_compact(max_deltas=max_deltas, purge_tombstones=True)
        e = t.expire_versions(keep_last=keep_versions)
        out[os.path.basename(t.root)] = {
            "compacted": bool(c),
            "expired": e.get("removed", e) if isinstance(e, dict) else e,
        }
    return out


def _rows_for_bucket_vals(table: LakeTable, vals: DataFrame, col: str) -> DataFrame:
    """Bucket-pruned read of `table` restricted to rows whose BUCKET column
    value appears in `vals` — the bucket_col sibling of _rows_for_ids (that
    one prunes+joins on key_col). Collects only the (<= n_buckets) bucket-id
    set, never the values."""
    vals = vals.select(F.col(col).alias(table.bucket_col)).distinct()
    bks = sorted(
        int(r["b"])
        for r in vals.select(table._bucket_expr(table.bucket_col).alias("b"))
        .distinct()
        .collect()
    )
    if not bks:
        return table.read().limit(0)
    live = (
        table.read_raw(buckets=bks)
        .filter(~F.col(SYS_DELETED))
        .select(*[f["name"] for f in table.current_fields])
    )
    return live.join(vals, table.bucket_col)


class IncrementalAsofView:
    """CDC-maintained point-in-time enrichment view.

    The batch form (operators/asof.asof_join) recomputes facts x dimension
    history every run. This maintains the enriched view as a derived table
    fed by TWO change streams — the fact stream (insert/update/delete) and
    the dimension VERSION stream (append-only history: each dimension
    change appends a version row at its commit time, which is exactly what
    a CDC changelog of the dimension table is) — touching only what an
    epoch invalidates:

      facts  LakeTable(fact_id -> k, ts, value)   BUCKETED BY k, so the
             dim-triggered recompute reads only affected keys' buckets
      fkeys  LakeTable(fact_id -> k)              key-bucketed sidecar: the
             stored pre-image k of every fact (the IncrementalIVF cells
             pattern — old-bucket tombstones on k moves)
      dims   LakeTable("k|ts" -> k, ts, pvalue)   version history, bucketed
             by k (probes read only affected keys' buckets)
      view   LakeTable(fact_id -> k, ts, value, asof_pvalue, asof_ts)

    Per epoch: (1) merge fact changes (old-bucket tombstones via fkeys);
    (2) append dim versions; (3) the invalidation set = batch's live facts
    UNION stored facts with key k and ts >= min(new version ts for k) —
    the ONLY facts whose as-of match can change (a version at v cannot
    match a fact before v; facts after v re-match against full history,
    which also makes LATE versions — older ts arriving in a later epoch —
    correct by construction); (4) re-enrich the invalidation set with
    asof_join against the affected keys' bucket-pruned dim history;
    (5) upsert into the view, stamped at the epoch's max commit_ts (epochs
    are resolved-ts ordered, so recomputes always beat stale rows).

    Invariant (tested, incl. updates/deletes/late versions/redelivery):

        view.read() == asof_join(current facts, current dim history)

    Scale shape per epoch: O(fact batch) merges; the recompute is
    O(invalidated facts x their dim history) through ONE union-window
    shuffle — proportional to change rate x version density, never to the
    fact table. Nothing rescans the store outside affected buckets.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_buckets: int = 8,
        k_buckets: int = 16,
        id_type: str = "bigint",
    ):
        self.spark = spark
        self.root = root
        self._id_type = id_type
        self._n_buckets = n_buckets
        self._k_buckets = k_buckets
        self.fkeys = self._open_or_create(
            os.path.join(root, "fkeys"),
            [
                {"id": 1, "name": "fact_id", "type": id_type, "nullable": False},
                {"id": 2, "name": "k", "type": "bigint"},
            ],
            n_buckets=n_buckets,
            key_col="fact_id",
        )
        self.facts = self._open_or_create(
            os.path.join(root, "facts"),
            [
                {"id": 1, "name": "fact_id", "type": id_type, "nullable": False},
                {"id": 2, "name": "k", "type": "bigint"},
                {"id": 3, "name": "ts", "type": "bigint"},
                {"id": 4, "name": "value", "type": "double"},
            ],
            n_buckets=k_buckets,
            key_col="fact_id",
            bucket_col="k",
        )
        self.dims = self._open_or_create(
            os.path.join(root, "dims"),
            [
                {"id": 1, "name": "vkey", "type": "string", "nullable": False},
                {"id": 2, "name": "k", "type": "bigint"},
                {"id": 3, "name": "ts", "type": "bigint"},
                {"id": 4, "name": "pvalue", "type": "double"},
            ],
            n_buckets=k_buckets,
            key_col="vkey",
            bucket_col="k",
        )
        self.view = self._open_or_create(
            os.path.join(root, "view"),
            [
                {"id": 1, "name": "fact_id", "type": id_type, "nullable": False},
                {"id": 2, "name": "k", "type": "bigint"},
                {"id": 3, "name": "ts", "type": "bigint"},
                {"id": 4, "name": "value", "type": "double"},
                {"id": 5, "name": "asof_pvalue", "type": "double"},
                {"id": 6, "name": "asof_ts", "type": "bigint"},
            ],
            n_buckets=n_buckets,
            key_col="fact_id",
        )

    _open_or_create = IncrementalLSHDeduper._open_or_create

    def process_epoch(
        self,
        fact_changes: DataFrame | None,
        dim_changes: DataFrame | None,
        epoch_id: str,
    ) -> dict:
        """fact_changes: (fact_id, op, commit_ts, seq, k, ts, value);
        dim_changes: (k, ts, pvalue, commit_ts, seq) — INSERTS only (a
        version history never retracts; updates to the dimension arrive as
        NEW versions). Either stream may be None/empty for the epoch.
        Idempotent by epoch id, like every lake merge."""
        fb = db = None
        stamp = []
        if fact_changes is not None:
            fb = collapse_lww_batch(
                fact_changes.select(
                    "fact_id", "op", "commit_ts", "seq", "k", "ts", "value"
                ),
                "fact_id",
            ).localCheckpoint(eager=True)
            stamp.append(fb.agg(F.max("commit_ts").alias("m")))
        if dim_changes is not None:
            db = (
                dim_changes.select(
                    F.concat_ws("|", F.col("k"), F.col("ts")).alias("vkey"),
                    "k",
                    "ts",
                    "pvalue",
                    "commit_ts",
                    "seq",
                )
                .groupBy("vkey")
                .agg(
                    F.max_by(
                        F.struct("k", "ts", "pvalue"), F.struct("commit_ts", "seq")
                    ).alias("_w"),
                    F.max("commit_ts").alias("commit_ts"),
                    F.max("seq").alias("seq"),
                )
                .select("vkey", "_w.k", "_w.ts", "_w.pvalue", "commit_ts", "seq")
                .withColumn("op", F.lit(OP_INSERT))
                .localCheckpoint(eager=True)
            )
            stamp.append(db.agg(F.max("commit_ts").alias("m")))
        if not stamp:
            return {"epoch": epoch_id, "invalidated": 0}
        stamps = [r["m"] for df in stamp for r in df.collect() if r["m"] is not None]
        if not stamps:
            return {"epoch": epoch_id, "invalidated": 0}
        stamp_ts = max(stamps)

        if fb is not None:
            stamped = fb.select("fact_id", "commit_ts", "seq")
            old = _rows_for_ids(self.fkeys, fb.select("fact_id"), "fact_id")
            # tombstone in the OLD k's bucket for every touched fact (the
            # secondary-index move problem; no-op when k is unchanged —
            # put-over-delete at equal (commit_ts, seq) keeps the new row)
            fact_tombs = old.join(stamped, "fact_id").select(
                "fact_id",
                "k",
                F.lit(None).cast("bigint").alias("ts"),
                F.lit(None).cast("double").alias("value"),
                F.lit(OP_DELETE).alias("op"),
                "commit_ts",
                "seq",
            )
            puts = fb.filter(F.col("op") != OP_DELETE)
            fact_puts = puts.select(
                "fact_id", "k", "ts", "value",
                F.lit(OP_INSERT).alias("op"), "commit_ts", "seq",
            )
            self.facts.merge_epoch(
                fact_tombs.unionByName(fact_puts),
                f"{epoch_id}-facts",
                assume_deduped=True,
            )
            self.fkeys.merge_epoch(
                puts.select("fact_id", "k", F.lit(OP_INSERT).alias("op"),
                            "commit_ts", "seq")
                .unionByName(
                    fb.filter(F.col("op") == OP_DELETE).select(
                        "fact_id", F.lit(None).cast("bigint").alias("k"),
                        F.lit(OP_DELETE).alias("op"), "commit_ts", "seq",
                    )
                ),
                f"{epoch_id}-fkeys",
                assume_deduped=True,
            )
        if db is not None:
            self.dims.merge_epoch(db, f"{epoch_id}-dims", assume_deduped=True)

        # invalidation set: the batch's live facts + stored facts a new
        # version can re-match (k affected and ts >= min new version ts)
        parts = []
        if fb is not None:
            parts.append(
                fb.filter(F.col("op") != OP_DELETE).select("fact_id", "k", "ts", "value")
            )
        if db is not None:
            kmin = db.groupBy("k").agg(F.min("ts").alias("_vmin"))
            hit = (
                _rows_for_bucket_vals(self.facts, kmin.select("k"), "k")
                .join(kmin, "k")
                .filter(F.col("ts") >= F.col("_vmin"))
                .select("fact_id", "k", "ts", "value")
            )
            parts.append(hit)
        affected = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1]).distinct()
        affected = affected.localCheckpoint(eager=True)
        n_affected = affected.count()

        view_changes = []
        if n_affected:
            from ..operators.asof import asof_join

            hist = _rows_for_bucket_vals(
                self.dims, affected.select("k"), "k"
            ).select("k", "ts", "pvalue")
            enriched = asof_join(
                affected, hist, key="k", payload=("pvalue",)
            ).select(
                "fact_id", "k", "ts", "value",
                F.col("asof_pvalue"),
                F.col("asof_ts").cast("bigint").alias("asof_ts"),
                F.lit(OP_INSERT).alias("op"),
                F.lit(stamp_ts).alias("commit_ts"),
                F.lit(0).cast("long").alias("seq"),
            )
            view_changes.append(enriched)
        if fb is not None:
            view_changes.append(
                fb.filter(F.col("op") == OP_DELETE).select(
                    "fact_id",
                    F.lit(None).cast("bigint").alias("k"),
                    F.lit(None).cast("bigint").alias("ts"),
                    F.lit(None).cast("double").alias("value"),
                    F.lit(None).cast("double").alias("asof_pvalue"),
                    F.lit(None).cast("bigint").alias("asof_ts"),
                    F.lit(OP_DELETE).alias("op"),
                    F.lit(stamp_ts).alias("commit_ts"),
                    F.lit(0).cast("long").alias("seq"),
                )
            )
        if view_changes:
            vc = view_changes[0]
            for extra in view_changes[1:]:
                vc = vc.unionByName(extra)
            self.view.merge_epoch(vc, f"{epoch_id}-view", assume_deduped=True)
        return {"epoch": epoch_id, "invalidated": int(n_affected)}

    def expected(self) -> DataFrame:
        """The batch recompute the view must equal (test/oracle surface)."""
        from ..operators.asof import asof_join

        return asof_join(
            self.facts.read().select("fact_id", "k", "ts", "value"),
            self.dims.read().select("k", "ts", "pvalue"),
            key="k",
            payload=("pvalue",),
        ).select(
            "fact_id", "k", "ts", "value", "asof_pvalue",
            F.col("asof_ts").cast("bigint").alias("asof_ts"),
        )

    def maintain(self, max_deltas: int = 8, keep_versions: int = 4) -> dict:
        return _maintain_tables(
            [self.fkeys, self.facts, self.dims, self.view], max_deltas, keep_versions
        )

    def reset(self) -> None:
        import shutil

        for sub in ("fkeys", "facts", "dims", "view"):
            shutil.rmtree(os.path.join(self.root, sub), ignore_errors=True)
        self.__init__(
            self.spark, self.root, n_buckets=self._n_buckets,
            k_buckets=self._k_buckets, id_type=self._id_type,
        )


class AsofViewFeed:
    """Keep an IncrementalAsofView in lockstep with TWO lake changelogs —
    a CDC-mirrored fact table and an append-only dimension-version table —
    via LakeTable.read_changes cursors (the dual-source DerivedIndexFeed).

    Both cursors live in ONE atomically-replaced file under the view root,
    so a crash can never split them: sync() either fully commits a
    (facts hi, dims hi) pair or replays the identical ranges — and the
    replayed epoch id is identical, so every lake merge no-ops
    (at-least-once delivery + idempotent apply = exactly-once view state,
    cdc/owner.go:706-800 analog).

    A TRUNCATE of the fact source resets the view and replays the dim
    history from version 0 (the dim source still holds it — version rows
    are never retracted). A truncate of the DIM source is a contract
    violation (append-only history) and raises.
    """

    def __init__(self, facts_source, dims_source, view, fact_transform=None,
                 dim_transform=None):
        """fact_transform: changelog slice -> (fact_id, op, commit_ts, seq,
        k, ts, value); dim_transform: slice -> (k, ts, pvalue, commit_ts,
        seq). Defaults pass columns through by those names. Must be
        deterministic and preserve (op, commit_ts, seq)."""
        self.facts_source = facts_source
        self.dims_source = dims_source
        self.view = view
        self.fact_transform = fact_transform
        self.dim_transform = dim_transform
        self._cursor_path = os.path.join(view.root, "_cursor2")

    @property
    def cursors(self) -> tuple[int, int]:
        try:
            with open(self._cursor_path) as f:
                a, b = f.read().split()
                return int(a), int(b)
        except FileNotFoundError:
            return 0, 0

    def _truncate_in(self, source, lo: int, hi: int) -> int | None:
        t = None
        for v in range(lo + 1, hi + 1):
            if source._load_version_manifest(v).get("commit_kind") == "truncate":
                t = v
        return t

    def sync(self) -> dict:
        self.facts_source.refresh()
        self.dims_source.refresh()
        flo, dlo = self.cursors
        fhi = self.facts_source.version
        dhi = self.dims_source.version
        if fhi <= flo and dhi <= dlo:
            return {"facts": (flo, fhi), "dims": (dlo, dhi), "invalidated": 0}
        if self._truncate_in(self.dims_source, dlo, dhi) is not None:
            raise ValueError(
                "dimension-version source was truncated — version history "
                "is append-only; rebuild the view from scratch explicitly"
            )
        ft = self._truncate_in(self.facts_source, flo, fhi)
        if ft is not None:
            self.view.reset()
            flo, dlo = ft, 0
        fc = dc = None
        if fhi > flo:
            fc = self.facts_source.read_changes(flo, fhi)
            if self.fact_transform is not None:
                fc = self.fact_transform(fc)
        if dhi > dlo:
            dc = self.dims_source.read_changes(dlo, dhi)
            if self.dim_transform is not None:
                dc = self.dim_transform(dc)
            if dc.filter(F.col("op") == OP_DELETE).limit(1).count():
                raise ValueError(
                    "dimension changelog carries a DELETE — version history "
                    "is append-only"
                )
            dc = dc.select("k", "ts", "pvalue", "commit_ts", "seq")
        out = self.view.process_epoch(fc, dc, f"f{flo}-{fhi}-d{dlo}-{dhi}")
        tmp = self._cursor_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{fhi} {dhi}")
        os.replace(tmp, self._cursor_path)
        return {"facts": (flo, fhi), "dims": (dlo, dhi),
                "invalidated": out["invalidated"]}
