"""Causality conflict detection (SURVEY.md §2.10).

Reference: cdc/sink/causality.go:29-142 — the MySQL sink routes each txn to
one of 16 workers by the hash of its unique-key values (`genTxnKeys`); two
txns whose key sets hash to different workers but intersect force a
flush-all barrier + reset, because applying them concurrently could violate
per-key ordering.

Our engine's set-oriented epoch MERGE makes the barrier unnecessary at apply
time (the whole deduped epoch commits atomically — README "Scale design"),
but the *detector* is still useful as an admission diagnostic: it reports,
per txn, how many workers its keys span under a given worker count, which is
exactly the reference's conflict predicate. Pure DataFrame aggregation; the
hash is the cross-engine h60 so the DuckDB oracle reproduces it bit-exact.

A txn here is the set of rows sharing one commit_ts (SingleTableTxn analog,
cdc/model/sink.go:415-427 — identity by ts; our feed carries no start_ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ticdc_spark.functions.hashing import bucket

N_WORKERS = 16


def txn_conflicts(feed: DataFrame, n_workers: int = N_WORKERS) -> DataFrame:
    """Per-txn worker fan-out: worker = h60(doc_id) % n_workers per row
    (causality.go:33-41 add), txn conflict ⟺ its keys span >1 worker
    (causality.go:43-71 detectConflict ⇒ flush barrier)."""
    rows = feed.select(
        "commit_ts",
        "doc_id",
        bucket("doc_id", n_workers).alias("worker"),
    )
    return (
        rows.groupBy("commit_ts")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("doc_id").alias("n_keys"),
            F.countDistinct("worker").alias("n_workers"),
            F.min("worker").alias("first_worker"),
        )
        .withColumn("conflict", F.col("n_workers") > F.lit(1))
    )


def conflict_barriers(feed: DataFrame, n_workers: int = N_WORKERS) -> DataFrame:
    """Summary the reference would act on: how many txns flush straight to a
    single worker vs force the flush-all barrier (mysql.go:707-737)."""
    t = txn_conflicts(feed, n_workers)
    return t.agg(
        F.count("*").alias("n_txns"),
        F.sum(F.col("conflict").cast("long")).alias("n_conflicts"),
        F.sum("n_rows").alias("n_rows"),
        F.max("n_workers").alias("max_fanout"),
    )
