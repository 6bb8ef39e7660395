"""Keyless (force-replicate) MQ leg: open-protocol-style messages for
tables whose row identity is the FULL column tuple.

Differences from the keyed open protocol (functions/codec.py), all forced
by whereSlice's all-columns semantics (cdc/sink/mysql.go:1133-1221):

  * DELETE messages carry the full row image in the value — the key alone
    cannot identify the row (there is no handle key);
  * UPDATE messages carry the pre-image under "old" — mandatory, not an
    enable-old-value option;
  * dispatch is the TABLE dispatcher (hash(table) % N): the index-value
    dispatcher needs a handle key, which keyless tables lack, so per-table
    total order is the strongest deliverable ordering (matching the
    reference's dispatcher fallback for such tables).

The consumer side replays batches into a downstream KeylessTable with
(feed, batch, table)-scoped epoch ids: exactly-once under redelivery, and
— because the state is an additive monoid — no resolved-ts frontier or
watermark machinery at all.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import h60
from ..lake.keyless import KeylessTable

KEY_FIELDS = ["commit_ts", "seq", "table", "op"]


def encode_keyless_open(
    df: DataFrame,
    value_cols: list[str],
    old_cols: dict[str, str],
    n_partitions: int,
) -> DataFrame:
    """Keyless events → (partition, key_json, value_json). value = {"row":
    after-or-deleted image, "old": pre-image | null}."""
    row = F.struct(*[F.col(c) for c in value_cols])
    old = F.when(
        F.col("op") == "U",
        F.struct(*[F.col(old_cols[c]).alias(c) for c in value_cols]),
    )
    return df.select(
        (h60(F.col("table")) % F.lit(n_partitions)).cast("int").alias("partition"),
        F.to_json(F.struct(*[F.col(c) for c in KEY_FIELDS])).alias("key_json"),
        F.to_json(F.struct(row.alias("row"), old.alias("old"))).alias("value_json"),
        F.col("commit_ts"),
        F.col("seq"),
    )


def decode_keyless_open(df: DataFrame, value_fields: T.StructType) -> DataFrame:
    """(key_json, value_json) → keyless event rows (op/commit_ts/seq/table +
    value cols + old_* pre-image cols)."""
    key_schema = T.StructType(
        [
            T.StructField("commit_ts", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("table", T.StringType()),
            T.StructField("op", T.StringType()),
        ]
    )
    val_schema = T.StructType(
        [
            T.StructField("row", value_fields),
            T.StructField("old", value_fields),
        ]
    )
    out = df.select(
        F.from_json("key_json", key_schema).alias("_k"),
        F.from_json("value_json", val_schema).alias("_v"),
    )
    return out.select(
        "_k.*",
        *[F.col(f"_v.row.{f.name}").alias(f.name) for f in value_fields.fields],
        *[F.col(f"_v.old.{f.name}").alias(f"old_{f.name}") for f in value_fields.fields],
    )


def emit_keyless_mq(
    events: DataFrame,
    mq_dir: str,
    batch_id: int,
    value_cols: list[str],
    old_cols: dict[str, str],
    n_partitions: int = 16,
) -> str:
    """Write one batch's messages under mq_dir/batch-N/partition=P, sorted
    by (commit_ts, seq) within each partition (per-partition delivery
    order). Overwrite-idempotent: a replayed batch rewrites byte-identical
    content."""
    out_dir = os.path.join(mq_dir, f"batch-{batch_id:06d}")
    from .dispatch import identity_repartition

    msgs = encode_keyless_open(events, value_cols, old_cols, n_partitions)
    (
        identity_repartition(msgs, n_partitions)
        .sortWithinPartitions("partition", "commit_ts", "seq")
        .select("partition", "key_json", "value_json")
        .write.mode("overwrite")
        .partitionBy("partition")
        .json(out_dir)
    )
    return out_dir


class KeylessMQConsumer:
    """Replay MQ batches into downstream KeylessTables. tables: name ->
    KeylessTable (messages routed by the key's `table` field)."""

    def __init__(
        self,
        spark,
        mq_dir: str,
        tables: dict[str, KeylessTable],
        value_fields: T.StructType,
        name: str = "klmq",
    ):
        self.spark = spark
        self.mq_dir = mq_dir
        self.tables = tables
        self.value_fields = value_fields
        self.name = name

    def _old_cols(self) -> dict[str, str]:
        return {f.name: f"old_{f.name}" for f in self.value_fields.fields}

    def run(self) -> list[dict]:
        out = []
        batches = sorted(
            d for d in os.listdir(self.mq_dir) if d.startswith("batch-")
        )
        for b in batches:
            raw = self.spark.read.json(
                os.path.join(self.mq_dir, b),
                schema="key_json string, value_json string",
            )
            events = decode_keyless_open(raw, self.value_fields)
            for name, kt in self.tables.items():
                sl = events.filter(F.col("table") == F.lit(name))
                st = kt.apply_epoch(
                    sl, f"mq-{self.name}-{b}-{name}", old_cols=self._old_cols()
                )
                out.append({"batch": b, "table": name, **st})
        return out
