"""Open-Protocol-style JSON codec (SURVEY.md §2.9).

Reference: cdc/sink/codec/json.go:127-234 — each change event serializes to
a key JSON {ts, schema, table, type} and a value JSON of column maps; the
decoder reverses it. Our engine's internal format is columnar parquet, but
the MQ-sink surface still needs a row codec; here it's one `to_json` /
`from_json` pair — JVM-side, codegen'd, no Python.

encode → (key_json string, value_json string); decode(schema) reverses.
Deletes carry a null value payload (json.go delete case; delete ⟺ empty
after-image, cdc/model/sink.go:238-240).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KEY_FIELDS = ["commit_ts", "seq", "table", "op", "doc_id"]


def encode_open_protocol(df: DataFrame, payload_cols: list[str]) -> DataFrame:
    """Rows → (key_json, value_json). Key carries identity+ordering; value
    carries the after-image (null for deletes)."""
    key = F.to_json(F.struct(*[F.col(c) for c in KEY_FIELDS]))
    val = F.when(
        F.col("op") != "D", F.to_json(F.struct(*[F.col(c) for c in payload_cols]))
    )
    return df.select(key.alias("key_json"), val.alias("value_json"))


def decode_open_protocol(df: DataFrame, payload_schema: T.StructType) -> DataFrame:
    """(key_json, value_json) → typed change rows."""
    key_schema = T.StructType(
        [
            T.StructField("commit_ts", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("table", T.StringType()),
            T.StructField("op", T.StringType()),
            T.StructField("doc_id", T.StringType()),
        ]
    )
    out = df.select(
        F.from_json("key_json", key_schema).alias("_k"),
        F.from_json("value_json", payload_schema).alias("_v"),
    )
    return out.select("_k.*", "_v.*")
