"""Avro binary wire codec (cdc/sink/codec/avro.go:88-127, 179-208, 509-520).

Golden-byte tests pin the actual wire format (zigzag varints, Confluent
envelope) so encode/decode can't drift together; Spark tests drive the
Arrow-batched UDF surface end-to-end including deletes."""

import json
import struct

import pytest

from ticdc_spark.functions.avro_codec import (
    AvroBinaryCodec,
    from_envelope,
    to_envelope,
)
from ticdc_spark.functions.avro_schema import AvroSchemaRegistry, avro_schema

FIELDS = [
    {"id": 1, "name": "doc_id", "type": "string"},
    {"id": 2, "name": "n", "type": "bigint"},
]


def test_golden_bytes():
    """Hand-computed Avro binary for {doc_id:"ab", n:3} against the schema
    {doc_id: string (handle, non-null), n: ["null","long"]}:
    string len 2 → zigzag 4; union branch 1 → zigzag 2; long 3 → zigzag 6."""
    codec = AvroBinaryCodec(avro_schema("t", FIELDS))
    assert codec.encode({"doc_id": "ab", "n": 3}) == b"\x04ab\x02\x06"
    assert codec.decode(b"\x04ab\x02\x06") == {"doc_id": "ab", "n": 3}
    # null union branch 0 → zigzag 0 → single 0x00 byte, no payload
    assert codec.encode({"doc_id": "ab", "n": None}) == b"\x04ab\x00"
    # negative long: -2 → zigzag 3
    assert codec.encode({"doc_id": "", "n": -2}) == b"\x00\x02\x03"


def test_zigzag_varint_multi_byte():
    codec = AvroBinaryCodec(avro_schema("t", FIELDS))
    # 300 → zigzag 600 = 0b1001011000 → varint LE7: 0xD8 0x04
    assert codec.encode({"doc_id": "", "n": 300}) == b"\x00\x02\xd8\x04"
    assert codec.decode(b"\x00\x02\xd8\x04")["n"] == 300


def test_double_and_array_roundtrip():
    fields = [
        {"id": 1, "name": "doc_id", "type": "string"},
        {"id": 2, "name": "tokens", "type": "array<int>"},
        {"id": 3, "name": "score", "type": "double"},
        {"id": 4, "name": "ok", "type": "boolean"},
    ]
    codec = AvroBinaryCodec(avro_schema("t", fields))
    rec = {"doc_id": "x", "tokens": [1, -5, 1000], "score": 3.25, "ok": True}
    assert codec.decode(codec.encode(rec)) == rec
    # empty array encodes as the bare end-of-blocks marker
    rec2 = {"doc_id": "x", "tokens": [], "score": None, "ok": False}
    assert codec.decode(codec.encode(rec2)) == rec2
    # double is little-endian IEEE754 after the union branch
    buf = codec.encode({"doc_id": "", "tokens": None, "score": 1.5, "ok": None})
    assert struct.pack("<d", 1.5) in buf


def test_envelope():
    assert to_envelope(b"xyz", 7) == b"\x00\x00\x00\x00\x07xyz"
    assert from_envelope(b"\x00\x00\x00\x00\x07xyz") == (7, b"xyz")
    with pytest.raises(ValueError, match="magic"):
        from_envelope(b"\x01\x00\x00\x00\x07xyz")


def test_handle_key_not_nullable_in_schema():
    s = json.loads(avro_schema("t", FIELDS))
    by_name = {f["name"]: f for f in s["fields"]}
    assert by_name["doc_id"]["type"] == "string"  # no union
    assert by_name["n"]["type"] == ["null", "long"]


def test_spark_roundtrip_with_deletes(spark):
    from ticdc_spark.functions.avro_codec import decode_avro, encode_avro

    fields = [
        {"id": 1, "name": "doc_id", "type": "string"},
        {"id": 2, "name": "tokens", "type": "array<int>"},
        {"id": 3, "name": "n_tok", "type": "int"},
        {"id": 4, "name": "source", "type": "string"},
    ]
    rows = [
        (100, 1, "t", "I", "d1", [1, 2, 3], 3, "web"),
        (101, 2, "t", "U", "d2", [], 0, None),
        (102, 3, "t", "D", "d3", None, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "commit_ts long, seq long, table string, op string, doc_id string, "
        "tokens array<int>, n_tok int, source string",
    )
    reg = AvroSchemaRegistry()
    enc = encode_avro(df, fields, table="docs", registry=reg)
    assert reg.n_versions("docs") == 1 and reg.n_versions("docs_key") == 1
    # delete → NULL value, key still present (avro.go:105-118)
    got = {r["op"]: r for r in enc.collect()}
    assert got["D"]["avro_value"] is None and got["D"]["avro_key"] is not None
    assert got["I"]["avro_value"][0] == 0  # magic byte

    dec = decode_avro(enc, fields, table="docs")
    out = {r["doc_id"]: r for r in dec.collect()}
    assert list(out["d1"]["tokens"]) == [1, 2, 3] and out["d1"]["source"] == "web"
    assert list(out["d2"]["tokens"]) == [] and out["d2"]["source"] is None
    assert out["d3"]["tokens"] is None and out["d3"]["op"] == "D"
    assert {r["op"] for r in dec.collect()} == {"I", "U", "D"}


def test_registry_evolution_new_id_per_schema(spark):
    """A DDL-evolved field list registers a NEW schema id under the same
    subject (schema_registry.go GetCachedOrRegister semantics)."""
    reg = AvroSchemaRegistry()
    v0 = avro_schema("docs", FIELDS)
    v1 = avro_schema(
        "docs", FIELDS + [{"id": 3, "name": "lang", "type": "string"}]
    )
    id0 = reg.register("docs", v0)
    id1 = reg.register("docs", v1)
    assert id0 != id1
    assert reg.lookup("docs") == (id1, v1)
    assert reg.register("docs", v1) == id1  # idempotent re-post


def test_property_roundtrip_random_records():
    """Hypothesis: any record of nullable string/long/double/int-array/bool
    fields survives encode→decode bit-exactly (doubles are IEEE754 pass-
    through, longs full 64-bit range)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    fields = [
        {"id": 1, "name": "doc_id", "type": "string"},
        {"id": 2, "name": "s", "type": "string"},
        {"id": 3, "name": "n", "type": "bigint"},
        {"id": 4, "name": "d", "type": "double"},
        {"id": 5, "name": "arr", "type": "array<int>"},
        {"id": 6, "name": "b", "type": "boolean"},
    ]
    codec = AvroBinaryCodec(avro_schema("t", fields))
    rec_st = st.fixed_dictionaries(
        {
            "doc_id": st.text(max_size=40),
            "s": st.one_of(st.none(), st.text(max_size=60)),
            "n": st.one_of(
                st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1)
            ),
            "d": st.one_of(
                st.none(),
                st.floats(allow_nan=False, allow_infinity=True, width=64),
            ),
            "arr": st.one_of(
                st.none(),
                st.lists(
                    st.integers(min_value=-(2**31), max_value=2**31 - 1),
                    max_size=12,
                ),
            ),
            "b": st.one_of(st.none(), st.booleans()),
        }
    )

    @settings(max_examples=300, deadline=None)
    @given(rec_st)
    def check(rec):
        assert codec.decode(codec.encode(rec)) == rec

    check()


def test_backward_compat_ddl_evolutions_pass():
    """The engine's DDL set (add nullable column, widen int->long, rename)
    produces BACKWARD-compatible schemas — the default Confluent subject
    rule the reference's registry posts run under."""
    from ticdc_spark.functions.avro_schema import AvroSchemaRegistry

    reg = AvroSchemaRegistry()  # BACKWARD by default
    base = [
        {"id": 1, "name": "doc_id", "type": "string"},
        {"id": 2, "name": "n_tok", "type": "int"},
        {"id": 3, "name": "source", "type": "string"},
    ]
    reg.register("docs", avro_schema("docs", base))
    added = base + [{"id": 4, "name": "lang", "type": "string"}]
    reg.register("docs", avro_schema("docs", added))  # nullable + default
    widened = [dict(f, type="bigint") if f["name"] == "n_tok" else f for f in added]
    reg.register("docs", avro_schema("docs", widened))  # int -> long
    renamed = [
        dict(f, name="origin") if f["name"] == "source" else f for f in widened
    ]
    reg.register("docs", avro_schema("docs", renamed))  # drop+add-with-default
    assert reg.n_versions("docs") == 4


def test_backward_compat_violations_refused():
    """Adding a field with no default / narrowing a type is refused with
    SchemaCompatibilityError (the Confluent server's 409), like the sink
    error that halts the reference feed."""
    import json

    import pytest

    from ticdc_spark.functions.avro_schema import (
        AvroSchemaRegistry,
        SchemaCompatibilityError,
        check_backward_compatible,
    )

    base = [
        {"id": 1, "name": "doc_id", "type": "string"},
        {"id": 2, "name": "n_tok", "type": "bigint"},
    ]
    reg = AvroSchemaRegistry()
    v0 = avro_schema("t", base)
    reg.register("t", v0)

    # required (non-null, no-default) new field: old data unreadable
    v_bad = json.loads(v0)
    v_bad["fields"].append({"name": "must", "field-id": 9, "type": "string"})
    v_bad = json.dumps(v_bad, sort_keys=True, separators=(",", ":"))
    assert check_backward_compatible(v0, v_bad)
    with pytest.raises(SchemaCompatibilityError):
        reg.register("t", v_bad)

    # narrowing long -> int is not an Avro promotion
    narrowed = [dict(f, type="int") if f["name"] == "n_tok" else f for f in base]
    with pytest.raises(SchemaCompatibilityError):
        reg.register("t", avro_schema("t", narrowed))

    # losing the null branch of a nullable field is refused too
    v_nonnull = json.loads(v0)
    for f in v_nonnull["fields"]:
        if f["name"] == "n_tok":
            f["type"] = "long"
            f.pop("default", None)
    v_nonnull = json.dumps(v_nonnull, sort_keys=True, separators=(",", ":"))
    with pytest.raises(SchemaCompatibilityError):
        reg.register("t", v_nonnull)

    # NONE mode admits everything (per-subject override)
    lax = AvroSchemaRegistry(compatibility="NONE")
    lax.register("t", v0)
    lax.register("t", v_bad)
    assert lax.n_versions("t") == 2
