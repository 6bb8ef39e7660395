"""Batch replay — the minimum end-to-end slice (SURVEY.md §7 step 1).

One epoch of the hot path (SURVEY.md §3.2 Spark mapping):

    events  = read(binlog)                         # scan
    resolved = min over parts of max(commit_ts)     # frontier
    batch   = events where commit_ts <= resolved    # sorter release rule
    winners = LWW collapse per doc_id               # sort+dedup
    MERGE into lake table, epoch_id = f(resolved)   # apply, exactly-once

Multi-epoch replay slices the commit_ts range so resume/idempotence tests can
kill and re-run mid-stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake.table import LakeTable
from ..operators.epochs import epoch_slice, frontier_and_bounds, resolved_frontier
from ..operators.lww import lww_latest_agg, lww_latest_semijoin


def replay_epoch(table: LakeTable, events: DataFrame, epoch_id: str) -> dict:
    """Dedup one epoch's events and merge. events: binlog-schema rows.

    Winners are persisted across merge_epoch's two actions (touched-bucket
    discovery + the write) so the LWW shuffle runs once, not twice.
    """
    key = table.key_col
    payload = [f["name"] for f in table.current_fields if f["name"] != key]
    cols = [key, "op", "commit_ts", "seq", *payload]
    winners = lww_latest_semijoin(events.select(*cols), [key]).persist()
    try:
        return table.merge_epoch(winners, epoch_id, assume_deduped=True)
    finally:
        winners.unpersist()


def replay_binlog(
    table: LakeTable,
    events: DataFrame,
    n_epochs: int = 1,
    epoch_prefix: str = "replay",
    stop_after_epoch: int | None = None,
) -> list[dict]:
    """Replay a full binlog in `n_epochs` commit-ts slices.

    Epoch boundaries are deterministic functions of the resolved frontier so
    a restarted replay re-derives identical epochs → idempotent re-commits.
    stop_after_epoch simulates a crash for resume tests.
    """
    # cache the binlog across the epoch loop: each epoch filters a commit_ts
    # range of the same data, and the parquet scan (token arrays) dominates
    events = events.persist()
    lo, resolved = frontier_and_bounds(events)
    if resolved < 0:
        events.unpersist()
        return []
    stats = []
    width = max(1, (resolved - lo + 1 + n_epochs - 1) // n_epochs)
    prev_hi = lo - 1
    try:
        for e in range(n_epochs):
            hi = min(resolved, lo + (e + 1) * width - 1)
            sl = events.filter(
                (F.col("commit_ts") > prev_hi) & (F.col("commit_ts") <= hi)
            )
            epoch_id = f"{epoch_prefix}-{e:05d}-{hi}"
            stats.append(replay_epoch(table, sl, epoch_id))
            prev_hi = hi
            if stop_after_epoch is not None and e >= stop_after_epoch:
                break
            if hi >= resolved:
                break
    finally:
        events.unpersist()
    return stats


def open_binlog(spark: SparkSession, path: str) -> DataFrame:
    from ..model import BINLOG_SCHEMA

    return spark.read.schema(BINLOG_SCHEMA).parquet(path)
