"""Canal protobuf codec (cdc/sink/codec/canal.go + proto/EntryProtocol.proto):
hand-computed proto3 wire bytes pin the format; Spark round trip covers the
UDF surface including deletes (key-only beforeColumns)."""

from ticdc_spark.functions.canal_proto import (
    EVENT_DELETE,
    EVENT_INSERT,
    _pair,
    build_column,
    build_entry,
    parse_entry,
    parse_message,
)


def test_pair_golden_bytes():
    # field1 "a": tag 0x0A len 1; field2 "b": tag 0x12 len 1
    assert _pair("a", "b") == b"\x0a\x01a\x12\x01b"


def test_column_golden_bytes():
    got = build_column("k", "v", "string", True, True)
    assert got == (
        b"\x10\x0c"          # sqlType=12 VARCHAR
        b"\x1a\x01k"         # name
        b"\x20\x01"          # isKey
        b"\x28\x01"          # updated
        b"\x30\x00"          # oneof isNull=false (always written)
        b"\x42\x01v"         # value
        b"\x52\x06string"    # mysqlType
    )


def test_negative_sqltype_varint():
    # BIGINT = -5 → two's-complement 10-byte varint
    c = build_column("n", 7, "bigint", False, True)
    p = parse_message(c)
    assert p[2][0] - (1 << 64) == -5
    assert p[8][0] == b"7" and p[10][0] == b"bigint"


def test_entry_roundtrip_insert_and_delete():
    e = build_entry(
        1000 << 18, "cdc", "events", "I", ("doc_id", "d1"),
        [("event_type", "view", "string"), ("value", 0.5, "double")],
    )
    out = parse_entry(e)
    assert out["op"] == "I" and out["table"] == "events"
    assert out["es_ms"] == 1000  # convertToCanalTs: ts >> 18
    assert out["columns"] == {"doc_id": "d1", "event_type": "view", "value": "0.5"}
    assert out["key_names"] == {"doc_id"}

    d = build_entry(2000 << 18, "cdc", "events", "D", ("doc_id", "d2"), [])
    out = parse_entry(d)
    assert out["op"] == "D"
    assert out["columns"] == {"doc_id": "d2"}  # delete carries only the key


def test_null_value_roundtrip():
    e = build_entry(
        1 << 18, "cdc", "t", "U", ("doc_id", "x"),
        [("s", None, "string")],
    )
    assert parse_entry(e)["columns"]["s"] is None


def test_spark_roundtrip(spark):
    from pyspark.sql import functions as F

    from ticdc_spark.functions.canal_proto import (
        decode_canal_entries,
        encode_canal_entries,
    )

    rows = [
        (100 << 18, 1, "t", "I", "d1", "view", 0.5),
        (101 << 18, 2, "t", "U", "d2", "buy", 1.25),
        (102 << 18, 3, "t", "D", "d3", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "commit_ts long, seq long, table string, op string, doc_id string, "
        "event_type string, value double",
    )
    payload = [("event_type", "string"), ("value", "double")]
    enc = encode_canal_entries(df, payload)
    dec = decode_canal_entries(enc, payload)
    out = {r["doc_id"]: r for r in dec.collect()}
    assert out["d1"]["op2"] == "I" and out["d1"]["value"] == 0.5
    assert out["d1"]["es_ms"] == 100
    assert out["d2"]["event_type"] == "buy" and out["d2"]["value"] == 1.25
    assert out["d3"]["op2"] == "D" and out["d3"]["event_type"] is None


def test_property_entry_roundtrip_random():
    """Hypothesis: arbitrary stringifiable payloads survive the proto3
    entry round trip; ops map correctly; deletes always key-only."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        ts=st.integers(min_value=0, max_value=2**62),
        op=st.sampled_from(["I", "U", "D"]),
        key=st.text(min_size=1, max_size=30),
        sval=st.one_of(st.none(), st.text(max_size=50)),
        nval=st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62)),
    )
    def check(ts, op, key, sval, nval):
        e = build_entry(
            ts, "cdc", "t", op, ("doc_id", key),
            [("s", sval, "string"), ("n", nval, "bigint")],
        )
        out = parse_entry(e)
        assert out["op"] == op and out["es_ms"] == ts >> 18
        assert out["columns"]["doc_id"] == key
        if op == "D":
            assert set(out["columns"]) == {"doc_id"}
        else:
            assert out["columns"]["s"] == sval
            assert out["columns"]["n"] == (None if nval is None else str(nval))

    check()


def test_open_protocol_batch_framing_golden():
    """json.go:336-368 wire layout: key = [8B BE version=1][8B BE len][key],
    value = [8B BE len][value]; delete frames a zero-length value."""
    from ticdc_spark.functions.codec import (
        pack_open_protocol_batch,
        unpack_open_protocol_batch,
    )

    kb, vb = pack_open_protocol_batch(["k1", "kk2"], ["v1", None])
    assert kb == (
        b"\x00\x00\x00\x00\x00\x00\x00\x01"      # BatchVersion1
        b"\x00\x00\x00\x00\x00\x00\x00\x02k1"
        b"\x00\x00\x00\x00\x00\x00\x00\x03kk2"
    )
    assert vb == (
        b"\x00\x00\x00\x00\x00\x00\x00\x02v1"
        b"\x00\x00\x00\x00\x00\x00\x00\x00"      # delete → zero-length value
    )
    assert unpack_open_protocol_batch(kb, vb) == [("k1", "v1"), ("kk2", None)]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="version"):
        unpack_open_protocol_batch(b"\x00\x00\x00\x00\x00\x00\x00\x09", b"")


def test_cdclog_sink_layout_and_roundtrip(spark, tmp_path):
    """cdclog file sink (cdc/sink/cdclog): reference layout — log.meta,
    t_<id>/cdclog.<maxTs> mixed-build frames, ddls/ddl.<~ts> reverse-ts
    names — and a full read-back to typed rows."""
    import json
    import os

    from pyspark.sql import types as T

    from ticdc_spark.streaming.cdclog import CdclogSink, read_cdclog

    rows = [
        (100, 1, "ta", "I", "a1", [1, 2], 2, "web"),
        (105, 2, "ta", "D", "a2", None, None, None),
        (103, 3, "tb", "U", "b1", [9], 1, "api"),
    ]
    df = spark.createDataFrame(
        rows,
        "commit_ts long, seq long, table string, op string, doc_id string, "
        "tokens array<int>, n_tok int, source string",
    )
    root = str(tmp_path / "cdclog")
    sink = CdclogSink(spark, root, {"ta": 11, "tb": 22})
    paths = sink.emit(df, {"ta": ["tokens", "n_tok", "source"],
                           "tb": ["tokens", "n_tok", "source"]})
    # layout: file name carries the table MAX commit ts; small batch = one
    # file per table (rotation kicks in past rotate_bytes)
    assert [p for p in paths["ta"]] and paths["ta"][0].endswith("t_11/cdclog.105")
    assert len(paths["ta"]) == 1 and len(paths["tb"]) == 1
    assert paths["tb"][0].endswith("t_22/cdclog.103")
    meta = json.load(open(os.path.join(root, "log.meta")))
    assert meta["names"] == {"11": "`cdc`.`ta`", "22": "`cdc`.`tb`"}

    sink.emit_ddl(104, "add_column", "ta", {"name": "lang", "type": "string"})
    sink.emit_ddl(200, "drop_column", "tb", {"name": "source"})
    ddls = sorted(os.listdir(os.path.join(root, "ddls")))
    # reverse-ts names: the NEWEST ddl (ts=200) sorts first
    assert ddls[0].endswith(str((1 << 64) - 1 - 200))

    schema = T.StructType([
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ])
    back = {r["doc_id"]: r for r in read_cdclog(spark, root, schema).collect()}
    assert len(back) == 3
    assert list(back["a1"]["tokens"]) == [1, 2] and back["a1"]["source"] == "web"
    assert back["a2"]["op"] == "D" and back["a2"]["tokens"] is None
    assert back["b1"]["n_tok"] == 1


def test_mixed_framing_golden():
    from ticdc_spark.functions.codec import (
        pack_open_protocol_mixed,
        unpack_open_protocol_mixed,
    )

    data = pack_open_protocol_mixed(["k", "kk"], [None, "v"])
    assert data == (
        b"\x00\x00\x00\x00\x00\x00\x00\x01"
        b"\x00\x00\x00\x00\x00\x00\x00\x01k"
        b"\x00\x00\x00\x00\x00\x00\x00\x00"
        b"\x00\x00\x00\x00\x00\x00\x00\x02kk"
        b"\x00\x00\x00\x00\x00\x00\x00\x01v"
    )
    assert unpack_open_protocol_mixed(data) == [("k", None), ("kk", "v")]
