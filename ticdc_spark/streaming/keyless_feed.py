"""KeylessFeed — Structured Streaming changefeed into a force-replicate
multiset table.

The keyed ChangeFeed needs resolved-ts gating, DDL barriers, and LWW
collapse; a keyless table's state is an ADDITIVE monoid (lake/keyless.py),
which buys a radically simpler streaming contract:

  * commutative + associative — ANY partition of the event stream into
    micro-batches, applied in any order, converges to the same multiset,
    so there is no watermark machinery and no carry-over tail;
  * exactly-once — foreachBatch's batchId is stable across checkpoint
    replays, and KeylessTable.apply_epoch is idempotent by epoch id, so a
    crashed batch re-applies as a no-op;
  * prefix validity — the binlog's arrival chunks are commit-ordered, so
    every batch boundary is a consistent history prefix (retractions only
    chase live rows) and the collapse's negative-total guard never fires
    on valid input.

Reference framing: this is the force-replicate changefeed
(config force-replicate=true routed via operators.handle.replication_mode)
— the path TiCDC serves with per-row `LIMIT 1` SQL, re-expressed as one
delta aggregation per micro-batch.
"""

from __future__ import annotations

from ..lake.keyless import KeylessTable
from ..model import KEYLESS_BINLOG_SCHEMA, KEYLESS_OLD_COLS


class KeylessFeed:
    """Single- or multi-table: pass `table` for one target, or `tables`
    (a name -> KeylessTable map) to route events by the binlog's `table`
    column — each target folds its own filtered slice under its own epoch
    id, so per-table exactly-once holds independently (a crash between two
    tables' commits replays the batch; the committed one no-ops)."""

    def __init__(
        self,
        table: KeylessTable | None = None,
        binlog_dir: str = "",
        checkpoint_dir: str = "",
        tables: dict[str, KeylessTable] | None = None,
        old_cols: dict[str, str] | None = None,
        max_files_per_trigger: int | None = None,
        strategy: str = "agg",
        feed_name: str = "keyless",
        compact_max_deltas: int = 64,
        expire_keep_last: int | None = None,
        mq_dir: str | None = None,
        mq_partitions: int = 16,
    ):
        if (table is None) == (tables is None):
            raise ValueError("pass exactly one of table / tables")
        self.table = table
        self.tables = tables
        any_t = table if table is not None else next(iter(tables.values()))
        self.spark = any_t.spark
        self.binlog_dir = binlog_dir
        self.checkpoint_dir = checkpoint_dir
        self.old_cols = KEYLESS_OLD_COLS if old_cols is None else old_cols
        self.max_files_per_trigger = max_files_per_trigger
        self.strategy = strategy
        self.feed_name = feed_name
        self.compact_max_deltas = compact_max_deltas
        self.expire_keep_last = expire_keep_last
        # MQ sink (keyless open protocol, streaming/keyless_mq.py): whole
        # batch emitted per trigger — no released-prefix gating because the
        # additive state needs no frontier; table-dispatcher partitioning
        self.mq_dir = mq_dir
        self.mq_partitions = mq_partitions
        self.batch_summaries: list[dict] = []

    def _process_batch(self, batch_df, batch_id: int) -> None:
        from pyspark.sql import functions as F

        # control events are a KEYED-feed concept (the additive keyless
        # state needs no frontier, and has no span universe to split) —
        # drop resolved heartbeats AND span-topology rows defensively so a
        # shared binlog dir never turns a control row into a phantom bag row
        from ..model import TOPOLOGY_OPS

        batch_df = batch_df.filter(~F.col("op").isin(["R", *TOPOLOGY_OPS]))
        targets = self.tables if self.tables is not None else {"": self.table}
        summary: dict = {"batch_id": batch_id}
        if self.mq_dir is not None:
            from .keyless_mq import emit_keyless_mq

            any_t = next(iter(targets.values()))
            cols = {tuple(kt.value_cols) for kt in targets.values()}
            if len(cols) != 1:
                # one physical stream schema = one message value shape; a
                # heterogeneous fleet would silently mis-encode the others
                raise ValueError(
                    f"keyless MQ emission needs homogeneous value columns "
                    f"across tables, got {sorted(cols)}"
                )
            emit_keyless_mq(
                batch_df,
                self.mq_dir,
                batch_id,
                any_t.value_cols,
                self.old_cols,
                n_partitions=self.mq_partitions,
            )
            summary["mq"] = True
        for name, kt in targets.items():
            sl = (
                batch_df.filter(F.col("table") == F.lit(name))
                if self.tables is not None
                else batch_df
            )
            suffix = f"-{name}" if name else ""
            st = kt.apply_epoch(
                sl,
                f"kl-{self.feed_name}-{batch_id}{suffix}",
                old_cols=self.old_cols,
                strategy=self.strategy,
            )
            # MOR hygiene: fold delta files when a bucket accumulates too
            # many (the additive collapse makes compaction a pure sum —
            # also purging zero-total tuples). Same cadence as ChangeFeed.
            kt.t.maybe_compact(self.compact_max_deltas)
            if self.expire_keep_last is not None:
                kt.t.expire_versions(keep_last=self.expire_keep_last)
            if self.tables is not None:
                summary.setdefault("tables", {})[name] = st
            else:
                summary.update(st)
        self.batch_summaries.append(summary)

    def _stream(self):
        r = self.spark.readStream.schema(KEYLESS_BINLOG_SCHEMA)
        if self.max_files_per_trigger:
            r = r.option("maxFilesPerTrigger", str(self.max_files_per_trigger))
        return r.parquet(self.binlog_dir)

    def run_available(self) -> list[dict]:
        """Process everything currently in the binlog dir (availableNow),
        then stop. Resumable: streaming checkpoint + idempotent epochs."""
        q = (
            self._stream()
            .writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return self.batch_summaries

    def start(self, processing_time: str = "5 seconds"):
        """Continuous micro-batching (production mode)."""
        return (
            self._stream()
            .writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime=processing_time)
            .start()
        )
