"""Matcher join, open-protocol codec, drop-column / truncate DDL."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_matcher_attach_pending_rollback(spark):
    """cdc/kv/matcher.go semantics: commit attaches the cached prewrite's
    value; early commits / unmatched prewrites become carry-over; rollback
    discards the prewrite."""
    from ticdc_spark.operators.matcher import match_prewrite_commit

    pre = spark.createDataFrame(
        [(1, "a", "v1"), (2, "b", "v2"), (3, "c", "v3")],
        "start_ts long, key string, value string",
    )
    com = spark.createDataFrame(
        [(1, "a", 10), (3, "c", 30), (4, "d", 40)],
        "start_ts long, key string, commit_ts long",
    )
    rb = spark.createDataFrame([(3, "c")], "start_ts long, key string")
    m = match_prewrite_commit(pre, com, rollbacks=rb)
    matched = {(r["key"], r["value"], r["commit_ts"]) for r in m["matched"].collect()}
    assert matched == {("a", "v1", 10)}  # c rolled back, d has no prewrite
    assert {r["key"] for r in m["pending_prewrites"].collect()} == {"b"}
    assert {r["key"] for r in m["pending_commits"].collect()} == {"c", "d"}


def test_codec_roundtrip_with_tokens(spark):
    from ticdc_spark.functions.codec import decode_open_protocol, encode_open_protocol

    rows = [
        (100, 1, "t", "I", "k1", [1, 2, 3], 3),
        (101, 2, "t", "D", "k1", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "commit_ts long, seq long, table string, op string, doc_id string, "
        "tokens array<int>, n_tok int",
    )
    enc = encode_open_protocol(df, ["tokens", "n_tok"])
    assert enc.columns == ["key_json", "value_json"]
    assert enc.filter(F.col("value_json").isNull()).count() == 1  # delete
    dec = decode_open_protocol(
        enc,
        T.StructType(
            [
                T.StructField("tokens", T.ArrayType(T.IntegerType())),
                T.StructField("n_tok", T.IntegerType()),
            ]
        ),
    )
    got = {r["doc_id"] + r["op"]: r for r in dec.collect()}
    assert got["k1I"]["tokens"] == [1, 2, 3] and got["k1I"]["n_tok"] == 3
    assert got["k1D"]["tokens"] is None


def test_lake_drop_column_and_truncate(spark, tmp_path):
    from ticdc_spark.lake.table import LakeTable

    root = str(tmp_path / "tbl")
    t = LakeTable.create(spark, root, n_buckets=4)
    ch = spark.createDataFrame(
        [("d1", "U", 1, 1, [1], 1, "web"), ("d2", "U", 2, 2, [2, 3], 2, "book")],
        "doc_id string, op string, commit_ts long, seq long, "
        "tokens array<int>, n_tok int, source string",
    )
    t.merge_epoch(ch, "e0")
    assert t.read().count() == 2

    # drop a payload column: metadata-only; old files keep bytes, readers skip
    assert t.update_schema("drop_column", {"name": "source"}, "ddl-drop")
    assert "source" not in t.read().columns
    assert t.read().count() == 2
    # dropping the key is refused
    import pytest

    with pytest.raises(ValueError):
        t.update_schema("drop_column", {"name": "doc_id"})
    # re-adding a same-named column gets a FRESH field id -> old values do
    # NOT resurrect (Iceberg rule)
    t.update_schema("add_column", {"name": "source", "type": "string"}, "ddl-readd")
    vals = {r["doc_id"]: r["source"] for r in t.read().collect()}
    assert vals == {"d1": None, "d2": None}

    # truncate: metadata-only, idempotent by epoch id
    assert t.truncate("ddl-trunc")
    assert t.read().count() == 0
    assert not t.truncate("ddl-trunc")  # replay is a no-op
    # table still writable after truncate
    ch2 = spark.createDataFrame(
        [("d9", "U", 9, 9, [9], 1, "x")],
        "doc_id string, op string, commit_ts long, seq long, "
        "tokens array<int>, n_tok int, source string",
    )
    t.merge_epoch(ch2.drop("source").withColumn("source", F.lit("x")), "e1")
    assert t.read().count() == 1


def test_registry_drop_column(spark):
    from ticdc_spark.streaming.registry import SchemaRegistry

    base = [
        {"id": 1, "name": "doc_id", "type": "string"},
        {"id": 2, "name": "tokens", "type": "array<int>"},
        {"id": 3, "name": "n_tok", "type": "int"},
    ]
    reg = SchemaRegistry(base, [(100, "drop_column", {"name": "n_tok"})])
    assert [f["name"] for f in reg.fields(1)] == ["doc_id", "tokens"]
    assert reg.version_at(100) == 0  # equals-ts uses pre-DDL schema
    assert reg.version_at(101) == 1


def test_mor_maybe_compact_bounds_delta_files(spark, tmp_path):
    from ticdc_spark.lake.table import LakeTable

    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    for e in range(6):
        ch = spark.createDataFrame(
            [(f"d{i}", "U", e * 10 + i, e * 10 + i, [e], 1, "s") for i in range(4)],
            "doc_id string, op string, commit_ts long, seq long, "
            "tokens array<int>, n_tok int, source string",
        )
        t.merge_epoch(ch, f"e{e}")
    assert t.max_files_per_bucket() >= 6  # one delta per epoch
    before = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    assert t.maybe_compact(max_deltas=3) is not None
    assert t.max_files_per_bucket() <= 3
    after = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    assert before == after and before["d0"] == [5]  # last epoch won
    assert t.maybe_compact(max_deltas=3) is None  # already bounded
