"""Prewrite ⋈ commit matcher — the two-phase-commit assembly join.

Reference: cdc/kv/matcher.go:43-99 — TiKV emits PREWRITE (carrying the row
value) and COMMIT (carrying the commit-ts) as separate stream entries; the
matcher caches prewrites by (start_ts, key), attaches the value when the
matching commit arrives, and drops the pair on ROLLBACK. Unmatched commits
arriving before their prewrite are cached too (matcher.go:74-85).

Spark-first formulation per micro-batch: an equi-join on (start_ts, key)
between the batch's prewrites (∪ carried-over unmatched prewrites) and its
commits, minus rollbacks — plus the two carry-over sets for the next batch.
The join shuffles on the composite key; rollback removal is a broadcast
left-anti join (rollback sets are small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def match_prewrite_commit(
    prewrites: DataFrame,
    commits: DataFrame,
    rollbacks: DataFrame | None = None,
    join_cols: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Returns {"matched", "pending_prewrites", "pending_commits"}.

    prewrites: (join_cols..., value cols...); commits: (join_cols...,
    commit_ts...); rollbacks: (join_cols...) — a rolled-back txn's prewrite
    is discarded (matcher.go:93-99).
    """
    join_cols = join_cols or ["start_ts", "key"]
    if rollbacks is not None:
        prewrites = prewrites.join(F.broadcast(rollbacks.select(*join_cols).distinct()), join_cols, "left_anti")
    matched = commits.join(prewrites, join_cols, "inner")
    pending_pre = prewrites.join(commits.select(*join_cols).distinct(), join_cols, "left_anti")
    pending_com = commits.join(prewrites.select(*join_cols).distinct(), join_cols, "left_anti")
    return {
        "matched": matched,
        "pending_prewrites": pending_pre,
        "pending_commits": pending_com,
    }
