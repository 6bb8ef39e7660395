"""Resolved-ts frontier, epoch slicing, txn grouping, late-event contract.

The reference's consistency machinery is a family of min/max folds
(SURVEY.md §2.5): per-span resolved-ts frontier = min over span watermarks
(cdc/puller/frontier/frontier.go:65-119), owner checkpoint = min over task
positions (cdc/changefeed.go:795-954), MQ checkpoint = min over per-partition
flushed ts (cdc/sink/mq.go:187-226, kafka_consumer/main.go:531-544). In Spark
each is ONE aggregation — the skiplist/heap machinery existed only because
TiKV regions split and merge; Spark partitions don't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolved_frontier(df: DataFrame, part_col: str = "part", ts_col: str = "commit_ts") -> int:
    """Global resolved-ts = min over partitions of (max commit_ts seen).

    Mirror of kafka_consumer/main.go:531-544 (per-partition resolvedTs, global
    = min) and frontier.Frontier() (puller/frontier/frontier.go:65-73).
    Returns -1 for an empty stream.
    """
    row = (
        df.groupBy(part_col)
        .agg(F.max(ts_col).alias("part_resolved"))
        .agg(F.min("part_resolved").alias("resolved"))
        .collect()[0]
    )
    return row["resolved"] if row["resolved"] is not None else -1


def frontier_and_bounds(
    df: DataFrame, part_col: str = "part", ts_col: str = "commit_ts"
) -> tuple[int, int]:
    """(min commit_ts, resolved frontier) in ONE aggregation pass — the
    replay loop needs both and the binlog scan is the dominant cost."""
    rows = (
        df.groupBy(part_col)
        .agg(F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi"))
        .collect()
    )
    if not rows:
        return -1, -1
    return min(r["lo"] for r in rows), min(r["hi"] for r in rows)


def epoch_slice(df: DataFrame, resolved_ts: int, ts_col: str = "commit_ts") -> DataFrame:
    """Events safe to apply: commit_ts <= resolved_ts.

    The EntrySorter release rule (cdc/puller/entry_sorter.go:119-155): on each
    resolved event, emit everything ordered with commit_ts <= maxResolvedTs;
    rows above the watermark are the carry-over tail for the next epoch.
    """
    return df.filter(F.col(ts_col) <= F.lit(resolved_ts))


def epoch_tail(df: DataFrame, resolved_ts: int, ts_col: str = "commit_ts") -> DataFrame:
    """The retained carry-over: events beyond the watermark."""
    return df.filter(F.col(ts_col) > F.lit(resolved_ts))


def assert_no_late_events(df: DataFrame, resolved_ts: int, ts_col: str = "commit_ts") -> None:
    """Hard late-data contract: an event below the already-resolved watermark
    is a bug, not data to drop — the reference panics
    (cdc/puller/puller.go:163-168). Raises on violation."""
    n = df.filter(F.col(ts_col) <= F.lit(resolved_ts)).limit(1).count()
    if n:
        raise AssertionError(
            f"late event at or below resolved_ts={resolved_ts} — watermark contract violated"
        )


def txn_group(df: DataFrame) -> DataFrame:
    """Group rows into transactions by (table, commit_ts) — SingleTableTxn
    assembly (cdc/sink/common/common.go:74-102; txn identity is start-ts,
    ours is the (table, commit_ts) pair since the synthetic log has no
    two-phase ts). Returns per-txn row counts and seq span."""
    return df.groupBy("table", "commit_ts").agg(
        F.count(F.lit(1)).alias("txn_rows"),
        F.min("seq").alias("first_seq"),
        F.max("seq").alias("last_seq"),
    )


def lineage_stats(df: DataFrame, part_col: str = "part", ts_col: str = "commit_ts") -> DataFrame:
    """Per-partition progress record (TaskPosition analog,
    cdc/model/owner.go:77-86): event count, max commit ts, delete count."""
    return df.groupBy(part_col).agg(
        F.count(F.lit(1)).alias("event_count"),
        F.max(ts_col).alias("max_commit_ts"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("delete_count"),
    )


def span_frontier(
    reports: DataFrame,
    lo_col: str = "span_lo",
    hi_col: str = "span_hi",
    ts_col: str = "ts",
) -> DataFrame:
    """TRUE span frontier over OVERLAPPING key-range reports
    (cdc/puller/frontier/frontier.go:65-119): Forward(span, ts) raises the
    resolved ts over [lo, hi); the frontier value at a key point is the MAX
    ts among reports covering it (monotone — ts never regresses), and the
    global frontier is the MIN over the covered keyspace.

    The reference maintains this with a skiplist because spans arrive one
    at a time (region splits/merges). Set-oriented version: decompose the
    keyspace into elementary fragments at the distinct span boundaries,
    cover-join fragments to reports, max per fragment, min over fragments.
    Returns per-fragment rows (f_lo, f_hi, resolved); fold with
    min(resolved) for the scalar frontier.

    Scale shape: #reports = #regions (metadata, ~10^5-10^6 at 100 TB, NOT
    row count). The boundary sort is one window over that metadata set and
    the cover join is bounded by fragments × avg-overlap; for larger span
    universes, bucket fragments by range before the join.
    """
    from pyspark.sql import Window

    bounds = (
        reports.select(F.col(lo_col).alias("b"))
        .unionByName(reports.select(F.col(hi_col).alias("b")))
        .distinct()
    )
    w = Window.orderBy("b")
    frags = (
        bounds.select(F.col("b").alias("f_lo"), F.lead("b").over(w).alias("f_hi"))
        .filter(F.col("f_hi").isNotNull())
    )
    cov = frags.join(
        reports,
        (F.col(lo_col) <= F.col("f_lo")) & (F.col(hi_col) >= F.col("f_hi")),
    )
    return cov.groupBy("f_lo", "f_hi").agg(F.max(F.col(ts_col)).alias("resolved"))


def span_frontier_value(reports: DataFrame, **kw):
    """Scalar frontier = min over covered fragments."""
    return (
        span_frontier(reports, **kw)
        .agg(F.min("resolved").alias("frontier"))
        .collect()[0]["frontier"]
    )
