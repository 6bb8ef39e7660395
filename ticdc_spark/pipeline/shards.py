"""CDC-maintained training-shard export — IncrementalShards.

The last mile of the CDC→training pipeline: the lake table of tokenized
sequences is consumed by trainers as a directory of shard files. A full
re-export after every epoch is O(corpus); this keeps the shard directory
current from the CHANGELOG, rewriting only the shards that contain changed
documents — the same epoch-derived-state pattern as IncrementalChecksum /
IncrementalNB / IncrementalPQ, applied to the exported files themselves.

Why hash shards, not rank shards: `pack.write_shards` slices the global
shuffle order into contiguous rank ranges — the best layout for a one-shot
export, but a single insert shifts every rank after it, so NO rank-sliced
shard is stable under change. Here shard membership is a pure function of
the key's lake bucket:

    shard s  =  lake buckets [s·k, (s+1)·k),   k = n_buckets / n_shards

so a changed doc dirties exactly one shard, and rewriting that shard is a
BUCKET-PRUNED read of k buckets (LakeTable.read_raw(buckets=…) — file
references, not a table scan). Within a shard, rows are ordered by
h60(seed ∥ doc_id): a deterministic pseudo-shuffle that is stable under
inserts/deletes elsewhere. Trainers that need global randomness shuffle the
shard list + read shards concurrently — the standard webdataset contract.

Refresh cost model (documented honestly, like IncrementalAsofView): one
refresh reads/writes O(affected_shards × shard_bytes). With c changed docs
uniformly hashed, affected shards ≈ n_shards·(1 − (1−1/n_shards)^c) — for
c ≪ n_shards that is ≈ c shards, i.e. read volume ∝ change volume; as c
approaches the corpus it degrades gracefully to the full export.

Crash/replay: the shard write uses Spark's dynamic partition overwrite
(only dirtied shard_id=… directories are replaced); the manifest
(_shards_manifest.json, atomic tmp+replace) advances synced_version only
after the write commits. A crash between the two leaves a manifest at v0 —
re-running the refresh rewrites the same shards deterministically (same
inputs → same bytes), so recovery is replay, not repair. Ranges containing
non-append commits (truncate / modify-column / compact) fall back to ONE
full re-export, exactly like the other changelog consumers
(lake/verify.range_is_append_only).

Reference analog: the cdclog/S3 sink keeps a downstream file archive
current from the change stream (cdc/sink/cdclog); this applies that
contract to the training-shard layout instead of the log layout.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import h60
from ..functions.partitioning import identity_repartition
from ..lake.verify import range_is_append_only
from ..model import SYS_DELETED

MANIFEST = "_shards_manifest.json"


class IncrementalShards:
    """Changelog-maintained shard directory over a LakeTable.

    Invariant (the check every test drives): after refresh(), the union of
    all shard files equals the table's live state at synced_version, and
    equals what export_full() would write from scratch — byte-identical
    assignment and order.
    """

    def __init__(self, table, out_dir: str, n_shards: int = 4, seed: int = 0):
        if table.n_buckets % n_shards != 0:
            raise ValueError(
                f"n_shards={n_shards} must divide the table's "
                f"n_buckets={table.n_buckets} (shard = contiguous bucket group)"
            )
        if table.bucket_col != table.key_col:
            # shard membership hashes the KEY; bucket pruning follows the
            # table's bucket function — on a non-key-bucketed table the two
            # diverge and a refresh would silently lose rows (same guard as
            # LakeTable.merge_epoch's prearranged path)
            raise ValueError(
                "IncrementalShards needs a key-bucketed table "
                f"(bucket_col={table.bucket_col!r} != key_col={table.key_col!r})"
            )
        self.table = table
        self.spark: SparkSession = table.spark
        self.out_dir = out_dir
        self.n_shards = n_shards
        self.seed = seed
        self.k = table.n_buckets // n_shards
        self._m = self._load()
        if self._m is not None:
            if self._m["n_shards"] != n_shards or self._m["seed"] != seed:
                raise ValueError(
                    "existing shard manifest disagrees on n_shards/seed — "
                    "reopen with the same parameters or export to a new dir"
                )

    # -- manifest ----------------------------------------------------------
    def _load(self) -> dict | None:
        p = os.path.join(self.out_dir, MANIFEST)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _save(self) -> None:
        p = os.path.join(self.out_dir, MANIFEST)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._m, f, indent=1, sort_keys=True)
        os.replace(tmp, p)

    @property
    def synced_version(self) -> int:
        return -1 if self._m is None else self._m["synced_version"]

    # -- shard math --------------------------------------------------------
    def _shard_expr(self):
        """shard id from the table's OWN bucket function — alignment is what
        makes the refresh read bucket-pruned."""
        t = self.table
        return (t._bucket_expr(t.key_col) / F.lit(self.k)).cast("int")

    def _order_key(self):
        return h60(
            F.concat_ws(
                "\x1f", F.lit(str(self.seed)), F.col(self.table.key_col).cast("string")
            )
        )

    # -- writes ------------------------------------------------------------
    def _write_shards(self, live: DataFrame, shard_ids: list[int] | None) -> dict:
        """One job: payload rows → shard_id dirs (dynamic overwrite touches
        only the shard directories present in `live`), one file per shard,
        rows ordered by the stable pseudo-shuffle key. Returns per-shard
        counts of what was written."""
        cols = [f["name"] for f in self.table.current_fields]
        out = live.select(*cols).withColumn("shard_id", self._shard_expr())
        if shard_ids is not None:
            out = out.filter(F.col("shard_id").isin([int(s) for s in shard_ids]))
        out = out.withColumn("_sk", self._order_key())
        writer = (
            identity_repartition(out, self.n_shards, "shard_id")
            .sortWithinPartitions("shard_id", "_sk", self.table.key_col)
            .drop("_sk")
            .write.mode("overwrite")
        )
        if shard_ids is not None:
            # incremental: pre-delete EVERY dirty shard dir, then let dynamic
            # overwrite write the survivors. Dynamic mode alone only replaces
            # partitions PRESENT in the new data — a dirty shard whose last
            # rows were deleted would keep its stale files. A crash in the
            # delete→write window is safe: the manifest hasn't advanced, so
            # recovery re-runs the same deterministic refresh.
            import shutil as _shutil

            for s in shard_ids:
                _shutil.rmtree(
                    os.path.join(self.out_dir, f"shard_id={int(s)}"),
                    ignore_errors=True,
                )
            writer = writer.option("partitionOverwriteMode", "dynamic")
        # full export: STATIC overwrite — shards absent from the new state
        # (e.g. after a truncate) must disappear, which dynamic mode would
        # leave behind
        writer.partitionBy("shard_id").parquet(self.out_dir)
        # count WHAT WAS WRITTEN (footer-metadata count over the new files),
        # not a recompute of `out` — the bucket read + LWW collapse runs once
        # per refresh, and the files are the ground truth anyway
        counted = self.read()
        if shard_ids is not None:
            counted = counted.filter(
                F.col("shard_id").isin([int(s) for s in shard_ids])
            )
        counts = {
            int(r["shard_id"]): int(r["n"])
            for r in counted.groupBy("shard_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        return counts

    def _schema_sig(self) -> list:
        """The exported schema, as written into shard files. Shard parquet is
        read back PLAIN (no field-id projection), so a metadata-only schema
        DDL (add/rename/widen column — append-only by manifest rules) would
        leave clean shards on the OLD schema while dirty shards rewrite with
        the new one — a mixed-schema directory. The manifest records the
        schema signature; refresh() full-exports on any change."""
        return [
            [f["id"], f["name"], f.get("type")]
            for f in self.table.current_fields
        ]

    def export_full(self) -> dict:
        """Initial (or fallback) export of every shard from the table's
        current live state."""
        v = self.table.version
        live = self.table.read_raw().filter(~F.col(SYS_DELETED))
        counts = self._write_shards(live, shard_ids=None)
        # empty shards still need a directory entry in the manifest (count 0)
        shards = {str(s): counts.get(s, 0) for s in range(self.n_shards)}
        self._m = {
            "n_shards": self.n_shards,
            "seed": self.seed,
            "k": self.k,
            "synced_version": v,
            "schema": self._schema_sig(),
            "shards": shards,
        }
        self._save()
        return {"full": True, "version": v, "shards_written": self.n_shards}

    def refresh(self) -> dict:
        """Advance the shard directory to the table's current version,
        rewriting only shards containing changed keys."""
        if self._m is None:
            return self.export_full()
        v0, v1 = self.synced_version, self.table.version
        if v1 == v0:
            return {"full": False, "version": v1, "shards_written": 0}
        if v1 < v0:
            raise ValueError(f"table at v{v1} is older than shard export v{v0}")
        if not range_is_append_only(self.table, v0, v1):
            return self.export_full()
        if self._m.get("schema") != self._schema_sig():
            # metadata-only schema DDL in the range (see _schema_sig)
            return self.export_full()
        ch = self.table.read_changes(v0, v1)
        dirty = sorted(
            int(r[0])
            for r in ch.select(self._shard_expr().alias("s")).distinct().collect()
        )
        if not dirty:  # metadata-only commits in the range
            self._m["synced_version"] = v1
            self._save()
            return {"full": False, "version": v1, "shards_written": 0}
        buckets = [b for s in dirty for b in range(s * self.k, (s + 1) * self.k)]
        live = self.table.read_raw(buckets=buckets).filter(~F.col(SYS_DELETED))
        counts = self._write_shards(live, shard_ids=dirty)
        for s in dirty:
            self._m["shards"][str(s)] = counts.get(s, 0)
        self._m["synced_version"] = v1
        self._save()
        return {"full": False, "version": v1, "shards_written": len(dirty)}

    # -- reads -------------------------------------------------------------
    def _read_schema(self):
        """Explicit read schema (payload + shard_id): schema inference over
        an EMPTY export (e.g. full export of a truncated table) would fail
        with 'unable to infer schema'; with the schema declared, zero files
        read back as an empty frame — which is exactly the certified state."""
        from pyspark.sql import types as T

        from ..lake.table import _fields_to_struct

        base = _fields_to_struct(self.table.current_fields)
        return T.StructType(
            list(base.fields) + [T.StructField("shard_id", T.IntegerType())]
        )

    def read(self) -> DataFrame:
        """All shards (shard_id recovered from the directory layout)."""
        return self.spark.read.schema(self._read_schema()).parquet(
            self.out_dir
        )

    def read_shard(self, shard_id: int) -> DataFrame:
        return self.spark.read.schema(self._read_schema()).parquet(
            os.path.join(self.out_dir, f"shard_id={int(shard_id)}")
        ).drop("shard_id")

    def manifest(self) -> dict:
        return dict(self._m) if self._m else {}

    def verify(self) -> bool:
        """Audit: shard contents ≡ the table's live state at the synced
        version (full recompute — the from-scratch check, like
        IncrementalChecksum.verify)."""
        if self._m is None:
            return False
        key = self.table.key_col
        cols = [f["name"] for f in self.table.current_fields]
        want = self.table.read_version(self.synced_version).select(*cols)
        got = self.read().select(*cols)
        n_want, n_got = want.count(), got.count()
        if n_want != n_got:
            return False
        return (
            want.exceptAll(got).count() == 0 and got.exceptAll(want).count() == 0
        )
