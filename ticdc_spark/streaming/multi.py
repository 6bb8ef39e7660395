"""Multi-table changefeed — one stream, many target tables.

Reference: a TiCDC changefeed replicates EVERY table matched by its filter;
the processor builds one pipeline per table (cdc/processor/processor.go:
86-151, table pipelines table.go:136-169) and tables are added/removed at a
boundary ts (handleTableOperation, processor.go:322-447): an added table
only receives events with commit-ts ABOVE its boundary, a removed table
stops at its stop-ts.

Ours: one Structured Streaming source; per micro-batch the global resolved
frontier is computed once (the owner's min-over-positions), then the
releasable prefix is routed per table (the table dispatcher, §2.10) and
LWW-merged into each table's lake independently, with per-table epoch ids —
a replayed batch re-skips exactly the tables that already committed.

The LWW/merge path is the same one the single-table ChangeFeed uses; this
class owns only the routing + per-table boundary bookkeeping.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lake.table import LakeTable
from ..model import BINLOG_SCHEMA
from ..operators.lww import lww_latest_semijoin


class MultiTableChangeFeed:
    def __init__(
        self,
        tables: dict[str, LakeTable],
        binlog_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = None,
        boundaries: dict[str, int] | None = None,  # table -> add-boundary ts
        stop_ts: dict[str, int] | None = None,  # table -> stop-at ts
    ):
        if not tables:
            raise ValueError("need at least one table")
        self.tables = dict(tables)
        self.spark = next(iter(tables.values())).spark
        self.binlog_dir = binlog_dir
        self.checkpoint_dir = checkpoint_dir
        self.pending_dir = os.path.join(checkpoint_dir, "pending")
        self.max_files_per_trigger = max_files_per_trigger
        self.boundaries = dict(boundaries or {})
        self.stop_ts = dict(stop_ts or {})
        self.batch_summaries: list[dict] = []
        # feed-scoped epoch ids — see ChangeFeed.feed_id for why
        import hashlib

        self.feed_id = hashlib.md5(
            os.path.abspath(checkpoint_dir).encode()
        ).hexdigest()[:8]

    # -- table operations between batches (handleTableOperation analog) --
    def add_table(self, name: str, table: LakeTable, boundary_ts: int) -> None:
        """Start replicating `name` from boundary_ts (exclusive): events at
        or below the boundary are the pre-existing snapshot's business."""
        self.tables[name] = table
        self.boundaries[name] = boundary_ts

    def remove_table(self, name: str, stop_at_ts: int) -> None:
        """Stop `name` at stop_at_ts (inclusive); later events are dropped
        (pipeline/sink.go:199-207 stop-at-target-ts)."""
        self.stop_ts[name] = stop_at_ts

    # ---------------- micro-batch ----------------
    def _read_pending(self) -> DataFrame | None:
        if not os.path.isdir(self.pending_dir):
            return None
        dirs = [
            os.path.join(self.pending_dir, d)
            for d in sorted(os.listdir(self.pending_dir))
            if d.startswith("batch-")
        ]
        dirs = [d for d in dirs if any(f.endswith(".parquet") for f in os.listdir(d))]
        if not dirs:
            return None
        return self.spark.read.schema(BINLOG_SCHEMA).parquet(*dirs)

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        pending = self._read_pending()
        events = batch_df.unionByName(pending) if pending is not None else batch_df

        part_stats = (
            events.groupBy("part")
            .agg(F.max("commit_ts").alias("max_ts"), F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        stored: dict[int, int] = {}
        for t in self.tables.values():
            for k, v in t.part_watermarks.items():
                stored[int(k)] = max(stored.get(int(k), -1), int(v))
        for r in part_stats:
            stored[int(r["part"])] = max(stored.get(int(r["part"]), -1), int(r["max_ts"]))
        resolved = min(stored.values()) if stored else -1
        watermarks = {str(k): v for k, v in stored.items()}

        ready = events.filter(F.col("commit_ts") <= F.lit(resolved))
        tail = events.filter(F.col("commit_ts") > F.lit(resolved))

        per_table = {}
        for name, table in self.tables.items():
            sl = ready.filter(F.col("table") == F.lit(name))
            if name in self.boundaries:
                sl = sl.filter(F.col("commit_ts") > F.lit(self.boundaries[name]))
            if name in self.stop_ts:
                sl = sl.filter(F.col("commit_ts") <= F.lit(self.stop_ts[name]))
            key = table.key_col
            payload = [f["name"] for f in table.current_fields if f["name"] != key]
            winners = lww_latest_semijoin(
                sl.select(key, "op", "commit_ts", "seq", *payload), [key]
            )
            st = table.merge_epoch(
                winners,
                f"cfm-{self.feed_id}-{batch_id:010d}-{name}",
                watermarks=watermarks,
                assume_deduped=True,
            )
            per_table[name] = st.get("committed", False)

        had_tail = any(int(r["max_ts"]) > resolved for r in part_stats)
        out = os.path.join(self.pending_dir, f"batch-{batch_id:010d}")
        if had_tail:
            tail.repartition(4).write.mode("overwrite").parquet(out)
        for d in (
            os.listdir(self.pending_dir) if os.path.isdir(self.pending_dir) else []
        ):
            if d.startswith("batch-") and d != f"batch-{batch_id:010d}":
                shutil.rmtree(os.path.join(self.pending_dir, d), ignore_errors=True)

        self.batch_summaries.append(
            {
                "batch_id": batch_id,
                "resolved_ts": resolved,
                "tables": per_table,
                "events": sum(int(r["cnt"]) for r in part_stats),
            }
        )

    # ---------------- run ----------------
    def _stream(self) -> DataFrame:
        r = self.spark.readStream.schema(BINLOG_SCHEMA)
        if self.max_files_per_trigger:
            r = r.option("maxFilesPerTrigger", str(self.max_files_per_trigger))
        return r.parquet(self.binlog_dir)

    def run_available(self) -> list[dict]:
        q = (
            self._stream()
            .writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return self.batch_summaries
