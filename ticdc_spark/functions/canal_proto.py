"""Canal PROTOBUF codec — the non-flat wire form canal-ecosystem consumers
speak (SURVEY.md §2.9, the last codec row).

Reference: cdc/sink/codec/canal.go:113-276 (entry builder: Header with
version/serverenCode/executeTime=commit_ts>>18/sourceType=MYSQL/eventType,
RowChange with rowDatas, Entry{header, ROWDATA, storeValue}); java type
mapping cdc/sink/codec/java.go (VARCHAR=12, BIGINT=-5, INTEGER=4, DOUBLE=8,
DECIMAL=3); proto schema proto/EntryProtocol.proto (field numbers + enums:
EntryType.ROWDATA=2, EventType INSERT=1/UPDATE=2/DELETE=3, Type.MYSQL=2).

The container has no protobuf library, so the proto3 WIRE FORMAT is
implemented directly (it is small: base-128 varints + tag = field<<3|wire,
wire 0 = varint, wire 2 = length-delimited — every field this schema uses).
Proto3 rules honored: zero-valued plain scalars are elided; oneof-wrapped
fields (version/sourceType/eventType/isDdl/isNull) are always written.
Per-value packing is scalar work → Arrow-batched pandas UDFs, exactly like
functions.avro_codec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# EntryProtocol.proto enums
ENTRYTYPE_ROWDATA = 2
EVENT_INSERT, EVENT_UPDATE, EVENT_DELETE = 1, 2, 3
TYPE_MYSQL = 2
CANAL_PROTOCOL_VERSION = 1  # canal.go:39
CANAL_SERVER_ENCODE = "UTF-8"  # canal.go:40

JAVA_SQL_TYPE = {  # java.go + canal.go:148-158 promotions
    "string": 12,  # VARCHAR
    "bigint": -5,  # BIGINT (promoted from TypeLong)
    "long": -5,
    "int": 4,  # INTEGER
    "integer": 4,
    "double": 8,
    "float": 7,
    "boolean": -6,  # TINYINT
}


# ---------------------------------------------------------------------------
# proto3 wire primitives
# ---------------------------------------------------------------------------


def _uvarint(n: int) -> bytes:
    if n < 0:  # negative int32/int64 → 10-byte two's-complement varint
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = z = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return z, pos


def _svalue(n: int) -> int:
    """Interpret a 64-bit varint as signed (for int32/int64 fields)."""
    return n - (1 << 64) if n >= (1 << 63) else n


def _field_varint(field: int, value: int, always: bool = False) -> bytes:
    if value == 0 and not always:
        return b""  # proto3 elides zero-valued plain scalars
    return _uvarint(field << 3) + _uvarint(value)


def _field_bytes(field: int, value: bytes, always: bool = False) -> bytes:
    if not value and not always:
        return b""
    return _uvarint((field << 3) | 2) + _uvarint(len(value)) + value


def _field_str(field: int, value: str) -> bytes:
    return _field_bytes(field, value.encode("utf-8"))


def parse_message(buf: bytes) -> dict[int, list]:
    """Generic TLV parse: field number → list of raw values (int for wire 0,
    bytes for wire 2)."""
    out: dict[int, list] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _read_uvarint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = _read_uvarint(buf, pos)
        elif wire == 2:
            n, pos = _read_uvarint(buf, pos)
            v = bytes(buf[pos : pos + n])
            pos += n
        else:
            raise ValueError(f"unsupported wire type {wire}")
        out.setdefault(field, []).append(v)
    return out


# ---------------------------------------------------------------------------
# canal message build / parse
# ---------------------------------------------------------------------------


def _pair(key: str, value: str) -> bytes:
    return _field_str(1, key) + _field_str(2, value)


def build_column(
    name: str, value, sql_type: str, is_key: bool, updated: bool
) -> bytes:
    """canal.Column (canal.go:134-218): every value stringified, isNull via
    the oneof (always written)."""
    is_null = value is None
    if is_null:
        sval = ""
    elif isinstance(value, bool):
        sval = "1" if value else "0"
    elif isinstance(value, float):
        sval = repr(value)  # shortest round-trip decimal
    else:
        sval = str(value)
    jt = JAVA_SQL_TYPE.get(sql_type.lower(), 12)
    return (
        _field_varint(2, jt)  # negative (BIGINT=-5) → 10-byte varint
        + _field_str(3, name)
        + _field_varint(4, 1 if is_key else 0)
        + _field_varint(5, 1 if updated else 0)
        + _field_varint(6, 1 if is_null else 0, always=True)  # oneof
        + _field_str(8, sval)
        + _field_str(10, sql_type.lower())
    )


def build_header(
    commit_ts: int, schema: str, table: str, event_type: int, row_count: int
) -> bytes:
    h = (
        _field_varint(1, CANAL_PROTOCOL_VERSION, always=True)  # oneof
        + _field_str(5, CANAL_SERVER_ENCODE)
        + _field_varint(6, commit_ts >> 18)  # convertToCanalTs, canal.go:43-45
        + _field_varint(7, TYPE_MYSQL, always=True)  # oneof
        + _field_str(8, schema)
        + _field_str(9, table)
        + _field_varint(11, event_type, always=True)  # oneof
    )
    if row_count > 0:
        h += _field_bytes(12, _pair("rowsCount", str(row_count)))
    return h


def build_entry(
    commit_ts: int,
    schema: str,
    table: str,
    op: str,
    key_col: tuple[str, object],
    payload: list[tuple[str, object, str]],
) -> bytes:
    """One canal Entry for one row change (canal.go:249-276).
    key_col: (name, value); payload: [(name, value, sql_type)]. Deletes
    carry the handle key in beforeColumns (mysql whereSlice semantics);
    inserts/updates carry the full after image."""
    ev = {"I": EVENT_INSERT, "U": EVENT_UPDATE, "D": EVENT_DELETE}[op]
    updated = op != "D"
    cols = [build_column(key_col[0], key_col[1], "string", True, updated)]
    if op != "D":
        cols += [build_column(n, v, t, False, updated) for n, v, t in payload]
    row_data = b"".join(
        _field_bytes(1 if op == "D" else 2, c, always=True) for c in cols
    )
    row_change = (
        _field_varint(2, ev, always=True)  # oneof
        + _field_varint(10, 0, always=True)  # oneof isDdl=false
        + _field_bytes(12, row_data, always=True)
    )
    header = build_header(commit_ts, "cdc", table, ev, 1)
    return (
        _field_bytes(1, header, always=True)
        + _field_varint(2, ENTRYTYPE_ROWDATA, always=True)  # oneof
        + _field_bytes(3, row_change, always=True)
    )


def parse_entry(buf: bytes) -> dict:
    """Entry bytes → {commit_ts(ms-shifted back is lossy — exposes es),
    table, op, columns{name: (value|None)}, is_key set}."""
    entry = parse_message(buf)
    header = parse_message(entry[1][0])
    assert entry[2][0] == ENTRYTYPE_ROWDATA
    rc = parse_message(entry[3][0])
    ev = rc[2][0]
    op = {EVENT_INSERT: "I", EVENT_UPDATE: "U", EVENT_DELETE: "D"}[ev]
    # proto3 elides zero-valued plain scalars — default absent fields
    row_data = parse_message(rc.get(12, [b""])[0])
    cols = {}
    key_names = set()
    for raw in row_data.get(1, []) + row_data.get(2, []):
        c = parse_message(raw)
        name = c[3][0].decode("utf-8")
        is_null = bool(c.get(6, [0])[0])
        val = None if is_null else c.get(8, [b""])[0].decode("utf-8")
        cols[name] = val
        if c.get(4, [0])[0]:
            key_names.add(name)
    return {
        "es_ms": _svalue(header.get(6, [0])[0]),
        "table": header.get(9, [b""])[0].decode("utf-8"),
        "op": op,
        "columns": cols,
        "key_names": key_names,
    }


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def encode_canal_entries(
    df: DataFrame,
    payload: list[tuple[str, str]],
    key_col: str = "doc_id",
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Rows → canal Entry bytes (one Entry per change event) + meta
    passthrough. payload: [(col_name, sql_type)]."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    names = [n for n, _ in payload]
    types = {n: t for n, t in payload}

    def _enc(cols):
        import json as _json

        import numpy as _np

        def _scalarize(v, t):
            # canal columns are strings; array/list payloads (e.g. the
            # tokens column — MySQL-born canal has no array type) travel
            # as JSON text, parsed back by decode's from_json
            if v is None:
                return None
            if isinstance(v, _np.ndarray):
                return _json.dumps(v.tolist())
            if isinstance(v, (list, tuple)):
                return _json.dumps(list(v))
            if isinstance(v, float) and v != v:
                return None
            if pd.isna(v):
                return None
            # pandas upcasts nullable int columns to float — restore the
            # declared integer type so '57.0' never reaches an int cast
            if isinstance(v, (float, _np.floating)) and t.strip().lower() in (
                "tinyint", "smallint", "int", "integer", "bigint", "long", "short", "byte"
            ):
                return int(v)
            return v

        out = []
        for row in cols.itertuples(index=False):
            d = dict(zip(cols.columns, row))
            pl = [(n, _scalarize(d[n], types[n]), types[n]) for n in names]
            out.append(
                build_entry(
                    int(d["commit_ts"]), "cdc", str(d["table"]), d["op"],
                    (key_col, d[key_col]), pl,
                )
            )
        return pd.Series(out)

    enc = pandas_udf(_enc, T.BinaryType())
    meta = [c for c in ("commit_ts", "seq", "table", "op") if c in df.columns]
    meta += [c for c in (passthrough or []) if c not in meta]
    struct_cols = ["commit_ts", "table", "op", key_col, *names]
    return df.select(
        *meta, enc(F.struct(*[F.col(c) for c in struct_cols])).alias("entry_bytes")
    )


def decode_canal_entries(
    df: DataFrame, payload: list[tuple[str, str]], key_col: str = "doc_id"
) -> DataFrame:
    """entry_bytes → typed columns (values un-stringified by cast). Deletes
    carry only the key, payload decodes to NULL."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    names = [n for n, _ in payload]
    out_struct = T.StructType(
        [
            T.StructField("op2", T.StringType()),
            T.StructField("es_ms", T.LongType()),
            T.StructField(key_col, T.StringType()),
        ]
        + [T.StructField(n, T.StringType()) for n in names]
    )

    def _dec(b):
        rows = []
        for buf in b:
            e = parse_entry(buf)
            r = {"op2": e["op"], "es_ms": e["es_ms"], key_col: e["columns"].get(key_col)}
            for n in names:
                r[n] = e["columns"].get(n)
            rows.append(r)
        return pd.DataFrame(rows, columns=["op2", "es_ms", key_col] + names)

    dec = pandas_udf(_dec, out_struct)
    meta = [c for c in ("commit_ts", "seq", "table", "op") if c in df.columns]
    out = df.select(*meta, dec(F.col("entry_bytes")).alias("_r"))
    cols = [*meta, "_r.op2", "_r.es_ms", f"_r.{key_col}"]
    low = lambda t: t.strip().lower()  # noqa: E731
    typed = [
        (
            F.from_json(F.col(f"_r.{n}"), t)
            if low(t).startswith(("array", "struct", "map"))
            else F.col(f"_r.{n}").cast(t)
        ).alias(n)
        for n, t in payload
    ]
    return out.select(*cols, *typed)
