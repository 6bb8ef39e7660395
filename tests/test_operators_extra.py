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


def test_canal_flat_roundtrip(spark):
    """canal_flat.go semantics: all-string values, delete carries only the
    handle key, type INSERT/UPDATE/DELETE maps back to I/U/D."""
    from ticdc_spark.functions.codec import decode_canal_flat, encode_canal_flat

    df = spark.createDataFrame(
        [
            (100, 1, "t", "I", "k1", "click", 1.5),
            (101, 2, "t", "U", "k1", "view", 2.25),
            (102, 3, "t", "D", "k1", "error", 9.0),
        ],
        "commit_ts long, seq long, table string, op string, doc_id string, "
        "event_type string, value double",
    )
    enc = encode_canal_flat(df, ["event_type", "value"])
    raw = enc.collect()[0]["canal_json"]
    assert '"type":"INSERT"' in raw and '"pkNames":["doc_id"]' in raw
    dec = decode_canal_flat(enc, {"event_type": "string", "value": "double"})
    got = {r["op"]: r for r in dec.collect()}
    assert got["I"]["value"] == 1.5 and got["U"]["event_type"] == "view"
    # delete keeps identity, sheds payload
    assert got["D"]["doc_id"] == "k1" and got["D"]["value"] is None
    assert got["U"]["commit_ts"] == 101 and got["U"]["seq"] == 2


def test_maxwell_roundtrip(spark):
    """maxwell.go semantics: native JSON types, delete carries full image."""
    from pyspark.sql import types as T

    from ticdc_spark.functions.codec import decode_maxwell, encode_maxwell

    df = spark.createDataFrame(
        [
            (1_000_000, 1, "t", "I", "k1", "click", 1.5),
            (2_000_000, 2, "t", "D", "k2", "error", 3.0),
        ],
        "commit_ts long, seq long, table string, op string, doc_id string, "
        "event_type string, value double",
    )
    enc = encode_maxwell(df, ["event_type", "value"])
    raw = enc.collect()[0]["maxwell_json"]
    assert '"type":"insert"' in raw and '"ts":1' in raw  # seconds
    dec = decode_maxwell(
        enc,
        T.StructType(
            [
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
            ]
        ),
    )
    got = {r["op"]: r for r in dec.collect()}
    assert got["D"]["value"] == 3.0  # full delete image survives
    assert got["I"]["commit_ts"] == 1_000_000 and got["I"]["seq"] == 1


def test_causality_conflicts(spark):
    """causality.go:43-71: a txn whose keys span >1 worker conflicts; a
    single-key txn never does; worker routing is the stable h60 bucket."""
    from ticdc_spark.functions.hashing import bucket
    from ticdc_spark.operators.causality import conflict_barriers, txn_conflicts

    feed = spark.createDataFrame(
        [
            (100, 1, "a"), (100, 2, "a"),            # same-key txn: no conflict
            (200, 3, "a"), (200, 4, "b"), (200, 5, "c"),  # multi-key txn
            (300, 6, "z"),
        ],
        "commit_ts long, seq long, doc_id string",
    )
    t = {r["commit_ts"]: r for r in txn_conflicts(feed, n_workers=16).collect()}
    assert not t[100]["conflict"] and t[100]["n_rows"] == 2
    # multi-key conflicts unless all keys hash to one worker — check actual
    buckets = {
        r["doc_id"]: r["b"]
        for r in feed.select("doc_id", bucket("doc_id", 16).alias("b")).collect()
    }
    expect = len({buckets[k] for k in ("a", "b", "c")}) > 1
    assert t[200]["conflict"] == expect and t[200]["n_keys"] == 3
    assert not t[300]["conflict"]
    s = conflict_barriers(feed, n_workers=16).collect()[0]
    assert s["n_txns"] == 3 and s["n_rows"] == 6
    assert s["n_conflicts"] == (1 if expect else 0)


def test_avro_schema_registry():
    """avro.go:233-264 + schema_registry.go:117-278: nullable-union columns
    (handle key not-null), deterministic JSON, idempotent register, versioned
    subject lookup across a DDL."""
    import json

    from ticdc_spark.functions.avro_schema import AvroSchemaRegistry, avro_schema
    from ticdc_spark.streaming.registry import SchemaRegistry

    base = [
        {"id": 1, "name": "doc_id", "type": "string"},
        {"id": 2, "name": "tokens", "type": "array<int>"},
        {"id": 3, "name": "n_tok", "type": "int"},
    ]
    sreg = SchemaRegistry(base, [(100, "widen_column", {"name": "n_tok", "to": "long"})])
    s0 = avro_schema("seqs", sreg.fields(0))
    s1 = avro_schema("seqs", sreg.fields(1))
    rec = json.loads(s0)
    by_name = {f["name"]: f for f in rec["fields"]}
    assert by_name["doc_id"]["type"] == "string"          # handle key not-null
    assert by_name["tokens"]["type"] == ["null", {"items": "int", "type": "array"}]
    assert by_name["n_tok"]["default"] is None
    assert json.loads(s1)["fields"][2]["type"] == ["null", "long"]  # widened
    assert avro_schema("seqs", sreg.fields(0)) == s0       # deterministic

    reg = AvroSchemaRegistry()
    id0 = reg.register("seqs", s0)
    assert reg.register("seqs", s0) == id0                 # idempotent re-post
    id1 = reg.register("seqs", s1)
    assert id1 != id0 and reg.n_versions("seqs") == 2
    assert reg.lookup("seqs") == (id1, s1)                 # latest wins
    reg.clear_subject("seqs")
    import pytest

    with pytest.raises(KeyError):
        reg.lookup("seqs")


def test_open_protocol_ddl_and_resolved_messages(spark):
    """json.go:332-369 (resolved) + 425-446 (DDL): watermark keys carry an
    empty value; DDL messages round-trip the full spec."""
    from ticdc_spark.functions.codec import (
        decode_open_protocol_ddl,
        encode_open_protocol_ddl,
        encode_open_protocol_resolved,
    )

    res = spark.createDataFrame([(500,), (600,)], "resolved_ts long")
    enc_r = encode_open_protocol_resolved(res)
    rows = enc_r.collect()
    assert all(r["value_json"] is None for r in rows)  # empty value
    assert '"type":"resolved"' in rows[0]["key_json"] and '"ts":500' in rows[0]["key_json"]

    ddl = spark.createDataFrame(
        [(100, "add_column", "t", '{"name":"lang","type":"string"}')],
        "commit_ts long, ddl_type string, table string, spec string",
    )
    got = decode_open_protocol_ddl(encode_open_protocol_ddl(ddl)).collect()[0]
    assert (got["commit_ts"], got["ddl_type"], got["table"]) == (100, "add_column", "t")
    assert '"name":"lang"' in got["spec"]


def test_span_frontier_overlapping_reports(spark):
    """frontier.go semantics over overlaps: point value = max covering ts
    (monotone Forward), frontier = min over the covered keyspace. A later
    report over a sub-range (region split child) raises only its fragment."""
    from pyspark.sql import functions as F

    from ticdc_spark.operators.epochs import span_frontier, span_frontier_value

    reports = spark.createDataFrame(
        [(0, 10, 5), (0, 5, 9), (5, 10, 3)],
        "span_lo long, span_hi long, ts long",
    )
    frags = {(r["f_lo"], r["f_hi"]): r["resolved"] for r in span_frontier(reports).collect()}
    assert frags == {(0, 5): 9, (5, 10): 5}
    assert span_frontier_value(reports) == 5

    # a gap in coverage: the frontier is over COVERED fragments only
    gappy = spark.createDataFrame(
        [(0, 5, 7), (6, 10, 9)], "span_lo long, span_hi long, ts long"
    )
    frags = {(r["f_lo"], r["f_hi"]): r["resolved"] for r in span_frontier(gappy).collect()}
    assert frags == {(0, 5): 7, (6, 10): 9}
    assert span_frontier_value(gappy) == 7


def test_asof_join_picks_latest_at_or_before(spark):
    from ticdc_spark.operators.asof import asof_join

    facts = spark.createDataFrame(
        [(1, 100, 5), (1, 200, 6), (2, 50, 7), (3, 10, 8)],
        "k long, ts long, fv long",
    )
    dims = spark.createDataFrame(
        [(1, 90, "a"), (1, 150, "b"), (1, 200, "c"), (2, 60, "d")],
        "k long, ts long, dv string",
    )
    out = {
        r.fv: (r.asof_dv, r.asof_ts)
        for r in asof_join(facts, dims, key="k", payload=("dv",)).collect()
    }
    assert out[5] == ("a", 90)  # 90 <= 100 < 150
    assert out[6] == ("c", 200)  # allow_exact: equal ts matches
    assert out[7] == (None, None)  # dim at 60 > fact at 50
    assert out[8] == (None, None)  # key with no dims at all


def test_asof_join_strict_excludes_equal_ts(spark):
    from ticdc_spark.operators.asof import asof_join

    facts = spark.createDataFrame([(1, 200, 6)], "k long, ts long, fv long")
    dims = spark.createDataFrame(
        [(1, 150, "b"), (1, 200, "c")], "k long, ts long, dv string"
    )
    r = asof_join(facts, dims, key="k", payload=("dv",), allow_exact=False).collect()[0]
    assert (r.asof_dv, r.asof_ts) == ("b", 150)


def test_asof_join_matches_python_reference_hypothesis(spark):
    """Fuzz the as-of semantics (both tie rules) against a brute-force
    python reference over arbitrary fact/dim interleavings, including
    duplicate fact timestamps and keys with no dims."""
    from hypothesis import given, settings, strategies as st

    from ticdc_spark.operators.asof import asof_join

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(st.tuples(st.integers(0, 2), st.integers(0, 9)),
                 min_size=1, max_size=12),          # facts: (key, ts)
        st.lists(st.tuples(st.integers(0, 2), st.integers(0, 9)),
                 min_size=0, max_size=10),          # dims: (key, ts)
        st.booleans(),                              # allow_exact
    )
    def run(fact_rows, dim_rows, allow_exact):
        dim_rows = sorted({(k, t) for k, t in dim_rows})  # unique (k, ts)
        facts = spark.createDataFrame(
            [(i, k, t) for i, (k, t) in enumerate(fact_rows)],
            "fid long, k long, ts long",
        )
        dims = spark.createDataFrame(
            [(k, t, float(k * 100 + t)) for k, t in dim_rows],
            "k long, ts long, pv double",
        ) if dim_rows else spark.createDataFrame([], "k long, ts long, pv double")
        got = {
            r.fid: (r.asof_pv, r.asof_ts)
            for r in asof_join(
                facts, dims, key="k", payload=("pv",), allow_exact=allow_exact
            ).collect()
        }
        for i, (k, t) in enumerate(fact_rows):
            cand = [
                (dt, float(dk * 100 + dt))
                for dk, dt in dim_rows
                if dk == k and (dt <= t if allow_exact else dt < t)
            ]
            want = (None, None) if not cand else (max(cand)[1], max(cand)[0])
            assert got[i] == want, (i, k, t, allow_exact, got[i], want)

    run()


def test_asof_join_salted_equals_plain(spark):
    """The skew-split form must be OUTPUT-IDENTICAL to the plain form —
    hot key (90% of facts on one key), carry-in across empty ranges,
    both tie rules, several range widths."""
    from ticdc_spark.operators.asof import asof_join, asof_join_salted

    facts = spark.createDataFrame(
        [(i, 7 if i % 10 else 3, (i * 37) % 1000, float(i)) for i in range(300)],
        "fid long, k long, ts long, fv double",
    )
    dims = spark.createDataFrame(
        [(7, t, float(t)) for t in range(0, 1000, 211)]
        + [(3, 500, 99.0), (5, 1, 1.0)],
        "k long, ts long, pv double",
    )
    for allow_exact in (True, False):
        for n_ranges in (1, 4, 16):
            plain = asof_join(
                facts, dims, key="k", payload=("pv",), allow_exact=allow_exact
            )
            salted = asof_join_salted(
                facts, dims, key="k", payload=("pv",),
                allow_exact=allow_exact, n_ranges=n_ranges,
            )
            a = sorted(map(tuple, plain.collect()))
            b = sorted(map(tuple, salted.collect()))
            assert a == b, (allow_exact, n_ranges)


def test_asof_join_salted_hypothesis(spark):
    from hypothesis import given, settings, strategies as st

    from ticdc_spark.operators.asof import asof_join, asof_join_salted

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)),
                 min_size=1, max_size=14),
        st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)),
                 min_size=1, max_size=10),
        st.integers(2, 5),
    )
    def run(fact_rows, dim_rows, n_ranges):
        dim_rows = sorted({(k, t) for k, t in dim_rows})
        facts = spark.createDataFrame(
            [(i, k, t) for i, (k, t) in enumerate(fact_rows)],
            "fid long, k long, ts long",
        )
        dims = spark.createDataFrame(
            [(k, t, float(k * 100 + t)) for k, t in dim_rows],
            "k long, ts long, pv double",
        )
        a = sorted(map(tuple, asof_join(facts, dims, key="k", payload=("pv",)).collect()))
        b = sorted(map(tuple, asof_join_salted(
            facts, dims, key="k", payload=("pv",), n_ranges=n_ranges).collect()))
        assert a == b

    run()
