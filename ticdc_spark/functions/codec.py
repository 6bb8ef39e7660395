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


def encode_open_protocol_resolved(df: DataFrame) -> DataFrame:
    """Resolved-ts watermark messages (cdc/sink/codec/json.go:332-369): the
    MQ sink broadcasts `{ts, type:resolved}` keys with an EMPTY value to
    every partition so consumers can advance their frontier. Input: rows
    with a `resolved_ts` column (one per partition broadcast target)."""
    key = F.to_json(
        F.struct(
            F.col("resolved_ts").alias("ts"), F.lit("resolved").alias("type")
        )
    )
    return df.select(key.alias("key_json"), F.lit(None).cast("string").alias("value_json"))


def encode_open_protocol_ddl(df: DataFrame) -> DataFrame:
    """DDL messages (cdc/sink/codec/json.go:425-446): key carries ts+type,
    value carries the DDL query/spec. Input: DDL_SCHEMA rows
    (commit_ts, ddl_type, table, spec)."""
    key = F.to_json(
        F.struct(F.col("commit_ts").alias("ts"), F.lit("ddl").alias("type"), F.col("table"))
    )
    val = F.to_json(F.struct(F.col("ddl_type"), F.col("spec")))
    return df.select(key.alias("key_json"), val.alias("value_json"))


def decode_open_protocol_ddl(df: DataFrame) -> DataFrame:
    key_schema = T.StructType(
        [
            T.StructField("ts", T.LongType()),
            T.StructField("type", T.StringType()),
            T.StructField("table", T.StringType()),
        ]
    )
    val_schema = T.StructType(
        [T.StructField("ddl_type", T.StringType()), T.StructField("spec", T.StringType())]
    )
    out = df.select(
        F.from_json("key_json", key_schema).alias("_k"),
        F.from_json("value_json", val_schema).alias("_v"),
    )
    return out.select(
        F.col("_k.ts").alias("commit_ts"),
        F.col("_v.ddl_type").alias("ddl_type"),
        F.col("_k.table").alias("table"),
        F.col("_v.spec").alias("spec"),
    )


# ---------------------------------------------------------------------------
# Canal-flat codec (cdc/sink/codec/canal_flat.go:1-249): one JSON message per
# row change — {database, table, pkNames, isDdl, type INSERT/UPDATE/DELETE,
# es (commit-ts ms), ts, data:[{col:stringval}], old:null}. Canal stringifies
# every value (java type mapping, codec/canal.go java.go:1-152); deletes carry
# only the handle key in `data` (mysql whereSlice semantics).
# ---------------------------------------------------------------------------

def _canal_type():
    # built lazily: Column construction needs an active SparkContext, and
    # this module must stay importable before the session exists
    return (
        F.when(F.col("op") == "I", F.lit("INSERT"))
        .when(F.col("op") == "U", F.lit("UPDATE"))
        .otherwise(F.lit("DELETE"))
    )


def encode_canal_flat(
    df: DataFrame, payload_cols: list[str], database: str = "cdc"
) -> DataFrame:
    """Rows → one canal-flat JSON string per change event."""
    data_map = F.create_map(
        F.lit("doc_id"),
        F.col("doc_id"),
        *[x for c in payload_cols for x in (F.lit(c), F.col(c).cast("string"))],
    )
    # delete events carry the handle key only (canal_flat.go delete case)
    data = F.when(
        F.col("op") == "D", F.create_map(F.lit("doc_id"), F.col("doc_id"))
    ).otherwise(data_map)
    msg = F.struct(
        F.lit(database).alias("database"),
        F.col("table"),
        F.array(F.lit("doc_id")).alias("pkNames"),
        F.lit(False).alias("isDdl"),
        _canal_type().alias("type"),
        (F.col("commit_ts") / 1000).cast("long").alias("es"),
        F.col("commit_ts").alias("ts"),
        F.col("seq").alias("seq"),
        F.array(data).alias("data"),
    )
    return df.select(F.to_json(msg).alias("canal_json"))


def decode_canal_flat(df: DataFrame, payload_types: dict[str, str]) -> DataFrame:
    """canal_json → typed change rows (values un-stringified by cast)."""
    schema = T.StructType(
        [
            T.StructField("database", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("pkNames", T.ArrayType(T.StringType())),
            T.StructField("isDdl", T.BooleanType()),
            T.StructField("type", T.StringType()),
            T.StructField("es", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("data", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
        ]
    )
    m = df.select(F.from_json("canal_json", schema).alias("_m")).select("_m.*")
    op = (
        F.when(F.col("type") == "INSERT", F.lit("I"))
        .when(F.col("type") == "UPDATE", F.lit("U"))
        .otherwise(F.lit("D"))
    )
    row = F.col("data")[0]
    return m.select(
        F.col("ts").alias("commit_ts"),
        F.col("seq"),
        F.col("table"),
        op.alias("op"),
        row["doc_id"].alias("doc_id"),
        *[row[c].cast(t).alias(c) for c, t in payload_types.items()],
    )


# ---------------------------------------------------------------------------
# Maxwell codec (cdc/sink/codec/maxwell.go:1-370): {database, table, type
# insert/update/delete, ts (seconds), xid, data:{col:val}} — values keep
# native JSON types (unlike canal's all-strings).
# ---------------------------------------------------------------------------

def _maxwell_type():
    # lazy for the same importability reason as _canal_type
    return (
        F.when(F.col("op") == "I", F.lit("insert"))
        .when(F.col("op") == "U", F.lit("update"))
        .otherwise(F.lit("delete"))
    )


def encode_maxwell(
    df: DataFrame, payload_cols: list[str], database: str = "cdc"
) -> DataFrame:
    """Rows → one maxwell JSON string per change event."""
    data = F.struct(
        F.col("doc_id"), *[F.col(c) for c in payload_cols]
    )
    msg = F.struct(
        F.lit(database).alias("database"),
        F.col("table"),
        _maxwell_type().alias("type"),
        (F.col("commit_ts") / 1_000_000).cast("long").alias("ts"),
        F.col("commit_ts").alias("commit_ts"),
        F.col("seq").alias("xid"),
        data.alias("data"),
    )
    return df.select(F.to_json(msg).alias("maxwell_json"))


def decode_maxwell(df: DataFrame, payload_schema: T.StructType) -> DataFrame:
    """maxwell_json → typed change rows."""
    data_fields = [T.StructField("doc_id", T.StringType())] + list(payload_schema)
    schema = T.StructType(
        [
            T.StructField("database", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("ts", T.LongType()),
            T.StructField("commit_ts", T.LongType()),
            T.StructField("xid", T.LongType()),
            T.StructField("data", T.StructType(data_fields)),
        ]
    )
    m = df.select(F.from_json("maxwell_json", schema).alias("_m")).select("_m.*")
    op = (
        F.when(F.col("type") == "insert", F.lit("I"))
        .when(F.col("type") == "update", F.lit("U"))
        .otherwise(F.lit("D"))
    )
    return m.select(
        F.col("commit_ts"),
        F.col("xid").alias("seq"),
        F.col("table"),
        op.alias("op"),
        F.col("data.doc_id").alias("doc_id"),
        *[F.col(f"data.{f.name}").alias(f.name) for f in payload_schema],
    )
