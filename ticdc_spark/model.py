"""Event model — the Spark analog of the reference's change-record structs.

Reference mapping (see SURVEY.md §1):
  - RawKVEntry / RowChangedEvent  (cdc/model/kv.go:71-84, cdc/model/sink.go:218-235)
      → one flat binlog row: (table, doc_id, op, tokens, n_tok, source,
        commit_ts, seq, part, schema_version)
  - delete ⟺ empty after-image    (cdc/model/sink.go:238-240)
      → op = 'D', payload columns NULL
  - DDLEvent                      (cdc/model/sink.go:364-371)
      → (commit_ts, ddl_type, table, spec-json)
  - sort order: commit_ts asc, ties Delete(0) before Put(1)
                                  (cdc/puller/entry_sorter.go:62-72)
      → OP_RANK column; last-write-wins rank key is (commit_ts, seq, op_rank)
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- ops ------------------------------------------------------------------
OP_INSERT = "I"
OP_UPDATE = "U"
OP_DELETE = "D"
# resolved-ts CONTROL event (cdc/model/mounter.go polymorphic resolved
# events; kv/client.go forwards per-region resolved ts to the puller): a
# row with op='R' carries NO data — it promises that its (table, part)
# span will deliver no further data at or below commit_ts, advancing the
# span's frontier exactly like a data event's max would. This is what
# keeps an IDLE span live: a part (or a whole table in a multi feed) with
# no traffic still advances resolved, so downstream barriers (DDL,
# target_ts, syncpoints) are reachable without data. Stale heartbeats
# (at or below the frontier) are ignored — the frontier fold is monotone.
OP_RESOLVED = "R"

# span-topology CONTROL events (kv/client.go region-change handling: on a
# TiKV region split/merge the CDC client ends the old region's stream and
# RESUBSCRIBES the new regions at the old span's checkpoint — cdc/kv/
# client.go singleRegionInfo resolvedTs seeding; the frontier absorbs the
# new spans, cdc/puller/frontier). Our span universe is the binlog's `part`
# ids, so topology changes are explicit control rows:
#
#   op='S' (split): part = the RETIRING parent span; doc_id = "c1,c2,..."
#     the child span ids. Children are seeded at the parent's current
#     position (resubscribe-at-checkpoint); the parent leaves the universe.
#   op='M' (merge): part = the surviving/new span; doc_id = "p1,p2,..."
#     the RETIRING parents. The child seeds at min(parent positions) — the
#     merged region resubscribes at the frontier of its union span.
#
# commit_ts/seq order topology events against EACH OTHER only; positions
# never derive from the event's ts. A topology row carries no data, never
# counts as an event, and takes effect at the end of its micro-batch: data
# for a retired span in any LATER batch is a fatal contract violation
# (the old region's stream has ended), while a stale heartbeat on a
# retired span is dropped (an in-flight resolved event racing the split).
OP_SPLIT = "S"
OP_MERGE = "M"
TOPOLOGY_OPS = (OP_SPLIT, OP_MERGE)

# entry_sorter.go:62-72 — at equal commit-ts a delete sorts/applies BEFORE a
# put, so when both land at the same (commit_ts, seq) the put is the later
# write and wins; a bare delete wins as a delete.
OP_RANK = {OP_DELETE: 0, OP_INSERT: 1, OP_UPDATE: 1}

# --- target table (input_hint shape, exact) ---------------------------------
TARGET_FIELDS = [
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
    T.StructField("n_tok", T.IntegerType(), True),
    T.StructField("source", T.StringType(), True),
]
TARGET_SCHEMA = T.StructType(TARGET_FIELDS)

# payload columns carried by the binlog after-image (subset of target)
PAYLOAD_COLS = ["tokens", "n_tok", "source"]
KEY_COL = "doc_id"  # the HandleKey (cdc/model/sink.go:49 HandleKeyFlag analog)

# --- binlog change stream ---------------------------------------------------
BINLOG_SCHEMA = T.StructType(
    [
        T.StructField("commit_ts", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("part", T.IntegerType(), False),
        T.StructField("schema_version", T.IntegerType(), False),
    ]
)

# --- DDL stream --------------------------------------------------------------
DDL_SCHEMA = T.StructType(
    [
        T.StructField("commit_ts", T.LongType(), False),
        T.StructField("ddl_type", T.StringType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("spec", T.StringType(), False),
    ]
)

# system columns the lake table stores alongside the payload so that MERGE is
# conditional on recency (order-tolerant + idempotent; see lake/table.py)
SYS_COMMIT_TS = "_commit_ts"
SYS_SEQ = "_seq"
SYS_DELETED = "_deleted"
SYS_COLS = [SYS_COMMIT_TS, SYS_SEQ, SYS_DELETED]

# --- keyless (force-replicate) binlog ----------------------------------------
# A keyless table's events carry the FULL row image for deletes (all columns
# form the WHERE key, cdc/sink/mysql.go:1178-1201) and the pre-image in old_*
# columns for updates (whereSlice's PreColumns, mysql.go:1133-1158): without
# old values a keyless update is inapplicable.
KEYLESS_BINLOG_SCHEMA = T.StructType(
    [
        T.StructField("commit_ts", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("old_doc_id", T.StringType(), True),
        T.StructField("old_tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("old_n_tok", T.IntegerType(), True),
        T.StructField("old_source", T.StringType(), True),
        T.StructField("part", T.IntegerType(), False),
    ]
)

# value col -> pre-image col for the keyless apply path
KEYLESS_OLD_COLS = {
    "doc_id": "old_doc_id",
    "tokens": "old_tokens",
    "n_tok": "old_n_tok",
    "source": "old_source",
}
