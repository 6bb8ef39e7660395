"""Avro BINARY wire codec (SURVEY.md §2.9 — the round-1 gap).

Reference: cdc/sink/codec/avro.go:88-127 (key = handle columns, value = full
row, value nil for deletes), 179-208 (encode via registered schema),
509-520 (Confluent envelope: magic 0x00 + big-endian int32 registry id +
Avro binary body). Schema JSON comes from functions.avro_schema (nullable
["null", T] unions with null default except the handle key).

Spark-first shape: the per-value binary packing is inherently scalar work
(varint zigzag framing), so it runs inside Arrow-batched pandas UDFs — one
Python invocation per ~10k-row batch, never per-row Python in the plan. The
schema is parsed once per executor (closure capture), not per row.

Binary format implemented (Avro 1.11 spec, "binary encoding"):
  long/int  zigzag varint          null      zero bytes
  string    varint len + utf8      boolean   1 byte
  bytes     varint len + raw       double    8-byte little-endian IEEE754
  float     4-byte LE              array     count-prefixed blocks, 0 end
  union     branch-index varint + branch     record   fields in order
"""

from __future__ import annotations

import json
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC_BYTE = 0  # schema_registry envelope, avro.go:509

# ---------------------------------------------------------------------------
# primitive binary encoding
# ---------------------------------------------------------------------------


def _write_long(buf: bytearray, n: int) -> None:
    """zigzag varint (Avro spec: long/int share the encoding)."""
    z = (n << 1) ^ (n >> 63)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    z = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


# ---------------------------------------------------------------------------
# schema-driven value codec
# ---------------------------------------------------------------------------


def _normalize(schema):
    """{"type": "array", ...} and {"type": "long", "logicalType": ...} keep
    their dict form; plain {"type": "string"} collapses to "string"."""
    if isinstance(schema, dict) and set(schema) <= {"type"}:
        return schema["type"]
    return schema


class AvroBinaryCodec:
    """Encode/decode Python values against one Avro record schema JSON
    (the exact string the registry stores)."""

    def __init__(self, schema_json: str):
        self.schema = json.loads(schema_json)
        if self.schema.get("type") != "record":
            raise ValueError("top-level schema must be a record")
        self.fields = self.schema["fields"]

    # -- encode --
    def encode(self, record: dict) -> bytes:
        buf = bytearray()
        for f in self.fields:
            self._enc(buf, _normalize(f["type"]), record.get(f["name"]))
        return bytes(buf)

    def _enc(self, buf: bytearray, schema, val) -> None:
        if isinstance(schema, list):  # union — ours are ["null", T]
            if val is None:
                _write_long(buf, schema.index("null"))
                return
            branch = next(i for i, s in enumerate(schema) if s != "null")
            _write_long(buf, branch)
            self._enc(buf, _normalize(schema[branch]), val)
            return
        if isinstance(schema, dict):
            t = schema["type"]
            if t == "array":
                if val:
                    _write_long(buf, len(val))
                    for item in val:
                        self._enc(buf, _normalize(schema["items"]), item)
                _write_long(buf, 0)
                return
            # logical types ride on their base primitive
            schema = t
        if schema == "null":
            return
        if val is None:
            raise ValueError("null value for non-null schema")
        if schema in ("long", "int"):
            _write_long(buf, int(val))
        elif schema == "string":
            b = val.encode("utf-8")
            _write_long(buf, len(b))
            buf.extend(b)
        elif schema == "bytes":
            _write_long(buf, len(val))
            buf.extend(val)
        elif schema == "double":
            buf.extend(struct.pack("<d", float(val)))
        elif schema == "float":
            buf.extend(struct.pack("<f", float(val)))
        elif schema == "boolean":
            buf.append(1 if val else 0)
        else:
            raise ValueError(f"unsupported avro type {schema!r}")

    # -- decode --
    def decode(self, data: bytes) -> dict:
        out = {}
        pos = 0
        for f in self.fields:
            out[f["name"]], pos = self._dec(data, pos, _normalize(f["type"]))
        if pos != len(data):
            raise ValueError(f"trailing bytes: {len(data) - pos}")
        return out

    def _dec(self, data: bytes, pos: int, schema):
        if isinstance(schema, list):
            branch, pos = _read_long(data, pos)
            s = _normalize(schema[branch])
            if s == "null":
                return None, pos
            return self._dec(data, pos, s)
        if isinstance(schema, dict):
            t = schema["type"]
            if t == "array":
                items = []
                while True:
                    n, pos = _read_long(data, pos)
                    if n == 0:
                        break
                    if n < 0:  # block with byte-size prefix (spec)
                        n = -n
                        _, pos = _read_long(data, pos)
                    for _ in range(n):
                        v, pos = self._dec(data, pos, _normalize(schema["items"]))
                        items.append(v)
                return items, pos
            schema = t
        if schema == "null":
            return None, pos
        if schema in ("long", "int"):
            return _read_long(data, pos)
        if schema == "string":
            n, pos = _read_long(data, pos)
            return data[pos : pos + n].decode("utf-8"), pos + n
        if schema == "bytes":
            n, pos = _read_long(data, pos)
            return bytes(data[pos : pos + n]), pos + n
        if schema == "double":
            return struct.unpack("<d", data[pos : pos + 8])[0], pos + 8
        if schema == "float":
            return struct.unpack("<f", data[pos : pos + 4])[0], pos + 4
        if schema == "boolean":
            return data[pos] == 1, pos + 1
        raise ValueError(f"unsupported avro type {schema!r}")


# ---------------------------------------------------------------------------
# Confluent envelope (avro.go:509-520)
# ---------------------------------------------------------------------------


def to_envelope(payload: bytes, registry_id: int) -> bytes:
    return bytes([MAGIC_BYTE]) + struct.pack(">i", registry_id) + payload


def from_envelope(data: bytes) -> tuple[int, bytes]:
    if data[0] != MAGIC_BYTE:
        raise ValueError(f"bad magic byte {data[0]}")
    return struct.unpack(">i", data[1:5])[0], bytes(data[5:])


# ---------------------------------------------------------------------------
# Spark surface — Arrow-batched pandas UDFs
# ---------------------------------------------------------------------------


def _sql_to_spark(t: str) -> T.DataType:
    return T._parse_datatype_string(t)


def encode_avro(
    df: DataFrame,
    fields: list[dict],
    table: str = "events",
    registry=None,
    handle_key: str = "doc_id",
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Rows → (avro_key binary, avro_value binary) + meta passthrough,
    mirroring AppendRowChangedEvent (avro.go:88-127): key = envelope of the
    handle columns under the key subject, value = envelope of the full row
    under the value subject, value NULL for deletes.

    fields: registry-style [{id, name, type}] including the handle key.
    registry: AvroSchemaRegistry (created if None).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from .avro_schema import AvroSchemaRegistry, avro_schema

    if registry is None:
        registry = AvroSchemaRegistry()
    key_fields = [f for f in fields if f["name"] == handle_key]
    value_schema = avro_schema(table, fields, handle_key=handle_key)
    key_schema = avro_schema(f"{table}_key", key_fields, handle_key=handle_key)
    value_id = registry.register(table, value_schema)
    key_id = registry.register(f"{table}_key", key_schema)
    names = [f["name"] for f in sorted(fields, key=lambda f: f["id"])]

    def _enc_value(op, cols):  # op: pd.Series, cols: pd.DataFrame (struct)
        codec = AvroBinaryCodec(value_schema)
        out = []
        for o, row in zip(op, cols.itertuples(index=False)):
            if o == "D":  # delete → nil value (avro.go:105-107)
                out.append(None)
            else:
                rec = {n: _py(v) for n, v in zip(cols.columns, row)}
                out.append(to_envelope(codec.encode(rec), value_id))
        return pd.Series(out)

    # registered without type hints: the (Series, DataFrame) -> Series
    # signature for struct inputs isn't expressible as a checked hint
    enc_value = pandas_udf(_enc_value, T.BinaryType())

    def _enc_key(key):
        codec = AvroBinaryCodec(key_schema)
        return key.map(
            lambda k: to_envelope(codec.encode({handle_key: k}), key_id)
        )

    enc_key = pandas_udf(_enc_key, T.BinaryType())

    meta = [c for c in ("commit_ts", "seq", "table", "op") if c in df.columns]
    meta += [c for c in (passthrough or []) if c not in meta]
    return df.select(
        *meta,
        enc_key(F.col(handle_key)).alias("avro_key"),
        enc_value(F.col("op"), F.struct(*[F.col(n) for n in names])).alias(
            "avro_value"
        ),
    )


def _py(v):
    """numpy / pandas scalar → plain Python for the binary packer."""
    import numpy as np

    if v is None or (isinstance(v, float) and v != v):
        return None
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, np.ndarray):
        return [_py(x) for x in v.tolist()]
    if isinstance(v, list):
        return [_py(x) for x in v]
    return v


def decode_avro(
    df: DataFrame,
    fields: list[dict],
    table: str = "events",
    handle_key: str = "doc_id",
    expect_value_id: int | None = None,
) -> DataFrame:
    """(avro_key, avro_value) → typed columns. Deletes (NULL value) yield
    NULL payload columns; the handle key always decodes from the key
    envelope. Envelope magic is verified; registry id optionally pinned."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from .avro_schema import avro_schema

    value_schema = avro_schema(table, fields, handle_key=handle_key)
    key_schema = avro_schema(
        f"{table}_key", [f for f in fields if f["name"] == handle_key], handle_key=handle_key
    )
    ordered = sorted(fields, key=lambda f: f["id"])
    out_struct = T.StructType(
        [T.StructField(f["name"], _sql_to_spark(f["type"])) for f in ordered]
    )

    def _dec_value(key, value):
        vcodec = AvroBinaryCodec(value_schema)
        kcodec = AvroBinaryCodec(key_schema)
        rows = []
        for k, v in zip(key, value):
            kid, kbody = from_envelope(k)
            krec = kcodec.decode(kbody)
            if v is None:
                rec = {f["name"]: None for f in ordered}
                rec[handle_key] = krec[handle_key]
            else:
                vid, vbody = from_envelope(v)
                if expect_value_id is not None and vid != expect_value_id:
                    raise ValueError(f"unexpected schema id {vid}")
                rec = vcodec.decode(vbody)
            rows.append(rec)
        return pd.DataFrame(rows, columns=[f["name"] for f in ordered])

    dec_value = pandas_udf(_dec_value, out_struct)
    meta = [c for c in ("commit_ts", "seq", "table", "op") if c in df.columns]
    dec = df.select(
        *meta, dec_value(F.col("avro_key"), F.col("avro_value")).alias("_r")
    )
    return dec.select(*meta, "_r.*")
