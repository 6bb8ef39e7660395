"""Cyclic (bidirectional) replication — mark emission + echo filtering.

Reference: pkg/cyclic/mark/mark.go (the sink writes a `repl_mark` row per
applied txn carrying the txn's origin replica_id, in the same transaction)
and pkg/cyclic/filter.go:44-130 (the outgoing feed joins its binlog txns to
the mark table by ts: a txn with a mark row is stamped with the mark's
replica id, unmarked txns get the local replica id; txns whose origin is in
filter_replica_ids are dropped — that's the echo a peer already owns; a
mark claiming the LOCAL replica id is a loopback and panics).

Spark-first: marks are a parquet table (commit_ts, replica_id) written
batch-adjacent by the applying feed (idempotent per-batch file, the
same-transaction guarantee our epoch commit already gives); stamping and
filtering is one left join on commit_ts + a filter — no Python in the path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MARKS_SCHEMA = "commit_ts long, replica_id long"


def stamp_origin(
    events: DataFrame, marks: DataFrame, local_replica_id: int
) -> DataFrame:
    """events + `origin_replica` column: the mark's replica id when the
    txn's commit_ts is marked, else the local replica id
    (filter.go:103-113 txn.ReplicaID assignment)."""
    m = marks.select(
        F.col("commit_ts").alias("_m_ts"), F.col("replica_id").alias("_m_rid")
    ).dropDuplicates(["_m_ts"])
    out = events.join(m, events["commit_ts"] == m["_m_ts"], "left")
    return out.withColumn(
        "origin_replica", F.coalesce(F.col("_m_rid"), F.lit(local_replica_id))
    ).drop("_m_ts", "_m_rid")


def filter_echoes(
    events: DataFrame,
    marks: DataFrame,
    local_replica_id: int,
    filter_replica_ids: list[int],
) -> DataFrame:
    """Drop txns whose origin replica is in filter_replica_ids (they were
    replicated INTO this cluster and must not bounce back). Keeps the
    `origin_replica` stamp on survivors."""
    stamped = stamp_origin(events, marks, local_replica_id)
    if not filter_replica_ids:
        return stamped
    return stamped.filter(~F.col("origin_replica").isin(list(filter_replica_ids)))


def loopback_check(
    events: DataFrame, marks: DataFrame, local_replica_id: int
) -> int:
    """filter.go:49-53: a mark row claiming the LOCAL replica id means the
    cluster is consuming its own emission — a wiring bug. Returns the count
    (caller raises); one aggregate job."""
    m = marks.select("commit_ts", "replica_id").dropDuplicates(["commit_ts"])
    return (
        events.join(m, "commit_ts")
        .filter(F.col("replica_id") == F.lit(local_replica_id))
        .count()
    )


def mark_rows(applied: DataFrame, origin_replica_col_or_id) -> DataFrame:
    """One mark row per applied txn (commit_ts): the write side of
    mark.go. origin: either a literal replica id (single-origin feed) or a
    column name carrying per-row origin (multi-hop)."""
    origin = (
        F.col(origin_replica_col_or_id)
        if isinstance(origin_replica_col_or_id, str)
        else F.lit(int(origin_replica_col_or_id))
    )
    return (
        applied.select(F.col("commit_ts"), origin.cast("long").alias("replica_id"))
        .dropDuplicates(["commit_ts"])
    )


def write_marks(marks: DataFrame, marks_dir: str, batch_id: int) -> None:
    """Append this batch's marks idempotently: one overwritten directory per
    batch id — a replayed batch rewrites the same marks (same content), so
    exactly-once holds without coordination."""
    out = os.path.join(marks_dir, f"batch-{batch_id:010d}")
    marks.coalesce(1).write.mode("overwrite").parquet(out)


def read_marks(spark, marks_dir: str) -> DataFrame:
    if not os.path.isdir(marks_dir):
        return spark.createDataFrame([], MARKS_SCHEMA)
    dirs = [
        os.path.join(marks_dir, d)
        for d in sorted(os.listdir(marks_dir))
        if d.startswith("batch-")
    ]
    if not dirs:
        return spark.createDataFrame([], MARKS_SCHEMA)
    return spark.read.schema(MARKS_SCHEMA).parquet(*dirs)
