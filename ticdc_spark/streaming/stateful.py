"""Custom stateful streaming operator — applyInPandasWithState.

The engine's core path needs no custom state (the LWW collapse + conditional
merge is stateless per epoch; the carry-over tail is the only state and it
lives in files). This module demonstrates the escape hatch the reference's
per-table in-memory caches would map to when semantics genuinely need
cross-batch keyed state: Spark's state store keyed by the handle key, Arrow
batches in and out, state schema explicit, checkpoint-recovered.

`running_key_stats` mirrors the sink's per-key bookkeeping
(UnresolvedTxnCache row counts, cdc/sink/common/common.go:74-102 +
statistics counters): a per-doc_id running (event count, delete count, last
commit-ts) that survives across micro-batches via the state store.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "doc_id string, n_events long, n_deletes long, last_commit_ts long"
)
STATE_SCHEMA = "n long, d long, last long"


def _track(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    n, d, last = state.get if state.exists else (0, 0, -1)
    for pdf in pdfs:
        n += len(pdf)
        d += int((pdf["op"] == "D").sum())
        last = max(last, int(pdf["commit_ts"].max()))
    state.update((n, d, last))
    yield pd.DataFrame(
        {
            "doc_id": [key[0]],
            "n_events": [n],
            "n_deletes": [d],
            "last_commit_ts": [last],
        }
    )


def running_key_stats(events: DataFrame) -> DataFrame:
    """events: streaming DF with (doc_id, op, commit_ts, ...). Returns the
    per-key running stats stream (update mode), state kept by Spark's state
    store and restored from the checkpoint on restart."""
    return events.groupBy("doc_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
