"""DDL×DML mid-stream schema evolution (tests/multi_source/main.go:74-131
analog): add / widen / rename DDLs interleaved with DML, applied at
resolved-ts barriers; final schema AND data must match the raw-mode oracle.

Also pins the equals-uses-pre-DDL-schema rule (cdc/entry/mounter.go:242-247)
and the registry's version_at arithmetic.
"""

import pyarrow as pa
import pytest

from ticdc_spark.lake.table import LakeTable
from ticdc_spark.oracle import apply_binlog_raw, diff_tables
from ticdc_spark.streaming.changefeed import ChangeFeed
from ticdc_spark.streaming.registry import SchemaRegistry
from ticdc_spark.testgen import BinlogSpec, binlog_to_raw, generate_binlog, write_raw_binlog

BASE = [
    {"id": 1, "name": "doc_id", "type": "string"},
    {"id": 2, "name": "tokens", "type": "array<int>"},
    {"id": 3, "name": "n_tok", "type": "int"},
    {"id": 4, "name": "source", "type": "string"},
]


def test_registry_version_at():
    reg = SchemaRegistry(BASE, [(100, "add_column", {"name": "lang", "type": "string"})])
    # DML at commit_ts == DDL finished_ts uses the PRE-ddl schema
    assert reg.version_at(99) == 0
    assert reg.version_at(100) == 0
    assert reg.version_at(101) == 1
    assert [f["name"] for f in reg.fields(1)] == ["doc_id", "tokens", "n_tok", "source", "lang"]


def test_registry_widen_rename():
    reg = SchemaRegistry(
        BASE,
        [
            (10, "widen_column", {"name": "n_tok", "to": "bigint"}),
            (20, "rename_column", {"from": "source", "to": "origin"}),
        ],
    )
    assert dict((f["name"], f["type"]) for f in reg.fields(2))["n_tok"] == "bigint"
    assert [f["name"] for f in reg.fields(2)] == ["doc_id", "tokens", "n_tok", "origin"]
    with pytest.raises(ValueError):
        reg.add_ddl(15, "add_column", {"name": "x", "type": "int"})  # non-monotone ts


def _mk_ddls(typed: pa.Table):
    """Barriers at 1/4, 1/2, 3/4 through the ACTUAL commit-ts range."""
    import pyarrow.compute as pc

    lo = pc.min(typed.column("commit_ts")).as_py()
    hi = pc.max(typed.column("commit_ts")).as_py()
    q = (hi - lo) // 4
    return [
        (lo + q, "add_column", {"name": "lang", "type": "string"}),
        (lo + 2 * q, "widen_column", {"name": "n_tok", "to": "bigint"}),
        (lo + 3 * q, "rename_column", {"from": "source", "to": "origin"}),
    ]


def _lake_arrow(table):
    pdf = table.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(pdf["doc_id"], pa.string()),
            "tokens": pa.array([None if t is None else list(t) for t in pdf["tokens"]], pa.list_(pa.int32())),
            "n_tok": pa.array(pdf["n_tok"], pa.int64()),
            "origin": pa.array(pdf["origin"], pa.string()),
            "lang": pa.array(pdf["lang"], pa.string()),
        }
    )


def test_ddl_mid_stream_matches_oracle(spark, tmp_path):
    spec = BinlogSpec(n_events=12_000, n_keys=1_200, seed=41, p_delete=0.15, p_insert=0.55, tie_frac=0.3)
    typed = generate_binlog(spec)
    ddls = _mk_ddls(typed)
    raw = binlog_to_raw(typed, ddls)
    write_raw_binlog(raw, str(tmp_path / "binlog"), n_files=5)

    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=8)
    ddl_rows = [
        {"commit_ts": ts, "ddl_type": typ, "spec": s} for ts, typ, s in ddls
    ]
    cf = ChangeFeed(
        t,
        str(tmp_path / "binlog"),
        str(tmp_path / "ckpt"),
        mode="raw",
        ddl_rows=ddl_rows,
        max_files_per_trigger=2,
    )
    summaries = cf.run_available()
    resolved = summaries[-1]["resolved_ts"]
    # all three DDLs must have executed (barriers below final resolved)
    assert t.schema_version == 3
    assert [f["name"] for f in t.current_fields] == ["doc_id", "tokens", "n_tok", "origin", "lang"]
    assert dict((f["name"], f["type"]) for f in t.current_fields)["n_tok"] == "bigint"

    expected = apply_binlog_raw(raw, BASE, ddls, upto_ts=resolved)
    problems = diff_tables(expected, _lake_arrow(t))
    assert not problems, problems[:3]


def test_ddl_barrier_not_applied_before_frontier(spark, tmp_path):
    """A DDL whose finished-ts is beyond the resolved frontier must NOT
    execute (checkpoint capped at FinishedTS-1, changefeed.go:899-910)."""
    import os

    from ticdc_spark.streaming.changefeed import RAW_BINLOG_SCHEMA

    rows = [
        (100, 1, "t", "I", "a", '{"tokens":[1],"n_tok":1,"source":"web"}', 0, 0),
        (100, 2, "t", "I", "b", '{"tokens":[2],"n_tok":1,"source":"web"}', 1, 0),
    ]
    os.makedirs(str(tmp_path / "binlog"))
    spark.createDataFrame(rows, schema=RAW_BINLOG_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "stage"))
    import glob, shutil

    for f in glob.glob(str(tmp_path / "stage/*.parquet")):
        shutil.copy(f, str(tmp_path / "binlog"))
    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    cf = ChangeFeed(
        t,
        str(tmp_path / "binlog"),
        str(tmp_path / "ckpt"),
        mode="raw",
        ddl_rows=[{"commit_ts": 500, "ddl_type": "add_column", "spec": '{"name":"lang","type":"string"}'}],
    )
    cf.run_available()
    assert t.schema_version == 0  # barrier at 500 > frontier 100 → deferred
    assert {r["doc_id"] for r in t.read().collect()} == {"a", "b"}


def test_truncate_table_ddl_mid_stream(spark, tmp_path):
    """TRUNCATE TABLE flows through the DDL stream as a barrier-ordered DATA
    operation (ActionTruncateTable is on the reference's built-in allowlist,
    pkg/filter/filter.go:149; schema_storage.go:539-624 truncate case):
    events at commit_ts <= truncate_ts apply and are then wiped atomically;
    later events rebuild the table. Final state must equal the LWW fold of
    ONLY the post-truncate events."""
    import glob
    import os

    import pyarrow.parquet as pq

    from ticdc_spark.oracle import apply_binlog
    from ticdc_spark.streaming.consumer import MQConsumer
    from ticdc_spark.testgen import write_binlog

    # ordered arrival (out_of_order=False): barrier-ordered DATA operations
    # require the puller's no-late-events contract (puller.go:163-168) —
    # the feed now REFUSES late events when such DDLs are configured, so
    # the harness must deliver files as commit-ts ranges
    spec = BinlogSpec(n_events=8_000, n_keys=500, seed=83, p_delete=0.15,
                      p_insert=0.55, out_of_order=False)
    binlog_dir = str(tmp_path / "binlog")
    write_binlog(spec, binlog_dir, files_per_part=4)
    binlog = pq.read_table(binlog_dir)
    import pyarrow.compute as pc

    lo = pc.min(binlog.column("commit_ts")).as_py()
    hi = pc.max(binlog.column("commit_ts")).as_py()
    trunc_ts = (lo + hi) // 2
    ddl_rows = [{"commit_ts": trunc_ts, "ddl_type": "truncate_table", "spec": "{}"}]

    t1 = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    mq = str(tmp_path / "mq")
    cf = ChangeFeed(
        t1, binlog_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2,
        ddl_rows=ddl_rows, mq_dir=mq, mq_partitions=4,
    )
    summaries = cf.run_available()
    resolved = summaries[-1]["resolved_ts"]
    # schema unchanged, but the registry/lake version advanced through the
    # truncate barrier in lockstep
    assert t1.schema_version == 1
    assert [f["name"] for f in t1.current_fields] == [
        "doc_id", "tokens", "n_tok", "source"]

    # oracle: LWW fold of ONLY post-truncate events (events at == trunc_ts
    # use the pre-DDL schema, apply, then vanish in the wipe)
    post = binlog.filter(pc.greater(binlog.column("commit_ts"), trunc_ts))
    expected = apply_binlog(post, upto_ts=resolved)
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tok"]) for r in t1.read().collect()}
    want = {
        d.as_py(): (t.as_py(), n.as_py())
        for d, t, n in zip(expected.column("doc_id"), expected.column("tokens"),
                           expected.column("n_tok"))
    }
    assert got == want and len(got) > 50

    # downstream consumer replays the truncate between the DML slices
    t2 = LakeTable.create(spark, str(tmp_path / "down"), n_buckets=4)
    consumer = MQConsumer(spark, mq, t2)
    stats = consumer.run_once()
    assert stats and all(s["committed"] for s in stats)
    down = {r["doc_id"]: (list(r["tokens"]), r["n_tok"]) for r in t2.read().collect()}
    assert down == got
    assert consumer.run_once() == []  # idempotent re-consume

    # history shows the atomic wipe: some version is EMPTY (the truncate
    # commit) while versions before and after it carry rows
    versions = sorted(
        int(os.path.basename(f)[1:-5])
        for f in glob.glob(str(tmp_path / "tbl" / "_manifests" / "v*.json"))
    )
    counts = [t1.read_version(v).count() for v in versions]
    wipe = counts.index(0, 1)
    assert counts[wipe - 1] > 0 and counts[-1] > 0


def test_modify_column_lake_rewrite(spark, tmp_path):
    """Non-widening type change (ActionModifyColumn parity,
    schema_storage.go:539-624): physically rewrites the data in ONE atomic
    manifest commit; tombstones survive so a replayed old event still loses
    the conditional merge; idempotent by epoch id."""
    from pyspark.sql import functions as F

    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    ch = spark.createDataFrame(
        [("a", [1], 7, "web", "I", 10, 1),
         ("b", [2], 9, "api", "I", 11, 2),
         ("b", None, None, None, "D", 12, 3)],
        "doc_id string, tokens array<int>, n_tok int, source string, "
        "op string, commit_ts long, seq long",
    )
    t.merge_epoch(ch, "e1")
    v_before = t.version
    assert t.modify_column({"name": "n_tok", "to": "string"}, "ddl-mod-1")
    assert t.schema_version == 1 and t.version == v_before + 1
    assert dict((f["name"], f["type"]) for f in t.current_fields)["n_tok"] == "string"
    live = {r["doc_id"]: r["n_tok"] for r in t.read().collect()}
    assert live == {"a": "7"}  # cast applied; b's tombstone still hides it
    # replay of an OLD pre-modify event must lose to the retained tombstone
    old = spark.createDataFrame(
        [("b", [3], "5", "web", "I", 11, 1)],
        "doc_id string, tokens array<int>, n_tok string, source string, "
        "op string, commit_ts long, seq long",
    )
    t.merge_epoch(old, "e-replay")
    assert "b" not in {r["doc_id"] for r in t.read().collect()}
    # idempotence: re-applying the same DDL epoch no-ops
    assert not t.modify_column({"name": "n_tok", "to": "string"}, "ddl-mod-1")
    # handle key type is protected
    with pytest.raises(ValueError, match="handle key"):
        t.modify_column({"name": "doc_id", "to": "bigint"}, "ddl-mod-2")


def test_modify_column_ddl_mid_stream(spark, tmp_path):
    """modify column through the DDL stream: widen (metadata) then a
    NARROWING modify (rewrite), interleaved with DML; final state matches
    the raw-mode oracle and the same-ts pre-DDL rule holds (a DML whose
    commit-ts equals the modify's finished-ts decodes at the pre-modify
    type)."""
    spec = BinlogSpec(
        n_events=8_000, n_keys=800, seed=57, p_delete=0.15, p_insert=0.55,
        tie_frac=0.3,
    )
    typed = generate_binlog(spec)
    import pyarrow.compute as pc

    lo = pc.min(typed.column("commit_ts")).as_py()
    hi = pc.max(typed.column("commit_ts")).as_py()
    q = (hi - lo) // 4
    ddls = [
        (lo + q, "widen_column", {"name": "n_tok", "to": "bigint"}),
        (lo + 3 * q, "modify_column", {"name": "n_tok", "to": "int"}),
    ]
    raw = binlog_to_raw(typed, ddls)
    write_raw_binlog(raw, str(tmp_path / "binlog"), n_files=5)

    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=8)
    ddl_rows = [
        {"commit_ts": ts, "ddl_type": typ, "spec": s} for ts, typ, s in ddls
    ]
    cf = ChangeFeed(
        t, str(tmp_path / "binlog"), str(tmp_path / "ckpt"),
        mode="raw", ddl_rows=ddl_rows, max_files_per_trigger=2,
    )
    summaries = cf.run_available()
    resolved = summaries[-1]["resolved_ts"]
    assert t.schema_version == 2
    assert dict((f["name"], f["type"]) for f in t.current_fields)["n_tok"] == "int"

    expected = apply_binlog_raw(raw, BASE, ddls, upto_ts=resolved)
    pdf = t.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    got = pa.table({
        "doc_id": pa.array(pdf["doc_id"], pa.string()),
        "tokens": pa.array(
            [None if x is None else list(x) for x in pdf["tokens"]],
            pa.list_(pa.int32()),
        ),
        "n_tok": pa.array(pdf["n_tok"], pa.int32()),
        "source": pa.array(pdf["source"], pa.string()),
    })
    problems = diff_tables(expected, got)
    assert not problems, problems[:3]


def test_drop_partition_ddl_mid_stream(spark, tmp_path):
    """Partition-table ops (schema_storage.go:586-624 ActionDrop/Truncate
    TablePartition): drop_partition is a barrier-ordered DATA operation —
    rows matching the partition predicate are tombstoned as of the barrier
    ts (same-ts DML applies first, pre-DDL-schema rule), later events
    rebuild freely. Checked against an independent fold, and replayed
    downstream through the MQ consumer."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ticdc_spark.oracle import apply_binlog
    from ticdc_spark.streaming.consumer import MQConsumer
    from ticdc_spark.testgen import write_binlog

    # many keys / few events-per-key: a good share of keys see their LAST
    # event before the barrier, so the partition drop has lasting victims
    spec = BinlogSpec(n_events=8_000, n_keys=4_000, seed=29, p_delete=0.1,
                      p_insert=0.6, out_of_order=False)
    binlog_dir = str(tmp_path / "binlog")
    write_binlog(spec, binlog_dir, files_per_part=4)
    binlog = pq.read_table(binlog_dir)
    lo = pc.min(binlog.column("commit_ts")).as_py()
    hi = pc.max(binlog.column("commit_ts")).as_py()
    part_ts = (lo + hi) // 2
    ddl_rows = [{
        "commit_ts": part_ts, "ddl_type": "drop_partition",
        "spec": '{"where": "source = \'web\'"}',
    }]
    t1 = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    mq = str(tmp_path / "mq")
    cf = ChangeFeed(
        t1, binlog_dir, str(tmp_path / "ckpt"), max_files_per_trigger=2,
        ddl_rows=ddl_rows, mq_dir=mq, mq_partitions=4, n_parts=8,
    )
    summaries = cf.run_available()
    resolved = summaries[-1]["resolved_ts"]
    assert resolved > part_ts
    assert t1.schema_version == 1  # version bumped, fields unchanged
    assert [f["name"] for f in t1.current_fields] == [
        "doc_id", "tokens", "n_tok", "source"]

    # expected: LWW fold of everything, minus keys whose LAST event is at
    # or below the barrier and whose winning row sits in the dropped
    # partition (no later event re-added them)
    full = apply_binlog(binlog, upto_ts=resolved)
    import collections

    last_ts = collections.defaultdict(int)
    for ts, k in zip(
        binlog.column("commit_ts").to_pylist(), binlog.column("doc_id").to_pylist()
    ):
        if ts <= resolved:
            last_ts[k] = max(last_ts[k], ts)
    want = {}
    for d, tok, n, src in zip(
        full.column("doc_id").to_pylist(), full.column("tokens").to_pylist(),
        full.column("n_tok").to_pylist(), full.column("source").to_pylist(),
    ):
        if src == "web" and last_ts[d] <= part_ts:
            continue  # dropped with the partition, never rebuilt
        want[d] = (tok, n, src)
    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
        for r in t1.read().collect()
    }
    assert got == want and len(want) > 50
    # the partition actually had victims
    assert len(want) < len(full)

    # downstream consumer replays the partition drop between DML slices
    t2 = LakeTable.create(spark, str(tmp_path / "down"), n_buckets=4)
    stats = MQConsumer(spark, mq, t2).run_once()
    assert stats and all(s["committed"] for s in stats)
    down = {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
        for r in t2.read().collect()
    }
    assert down == got


# ---------------- ADD COLUMN ... DEFAULT (initial-default rule) ----------------
# TiDB fills existing rows instantly on ADD COLUMN DEFAULT x (no rewrite) and
# TiCDC's downstream DDL carries the default, so pre-DDL rows read x
# downstream. Lake analog: Iceberg initial-default — projected at read for
# files written before the column existed; post-DDL events carry the column.


def test_add_column_default_lake(spark, tmp_path):
    from ticdc_spark.engine.replay import replay_epoch
    from ticdc_spark.model import BINLOG_SCHEMA

    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    ev = spark.createDataFrame(
        [
            (10, 1, "t", "I", "a", [1, 2], 2, "web", 0, 0),
            (11, 2, "t", "I", "b", [3], 1, "book", 0, 0),
        ],
        schema=BINLOG_SCHEMA,
    )
    replay_epoch(t, ev, "e1")
    v_pre = t.version
    t.update_schema(
        "add_column", {"name": "lang", "type": "string", "default": "und"}, "ddl1"
    )
    rows = {r["doc_id"]: r for r in t.read().collect()}
    # pre-DDL rows read the default, not NULL
    assert rows["a"]["lang"] == "und" and rows["b"]["lang"] == "und"
    # time travel before the DDL has no such column
    assert "lang" not in t.read_version(v_pre).columns
    # post-DDL write carries its own value and wins over the default
    ev2 = spark.createDataFrame(
        [(20, 3, "t", "U", "a", [9], 1, "web", "en", 0, 0)],
        schema="commit_ts long, seq long, table string, op string, doc_id string, "
        "tokens array<int>, n_tok int, source string, lang string, part int, "
        "schema_version int",
    )
    replay_epoch(t, ev2, "e2")
    rows = {r["doc_id"]: r for r in t.read().collect()}
    assert rows["a"]["lang"] == "en" and rows["b"]["lang"] == "und"
    # a column added WITHOUT a default still projects NULL
    t.update_schema("add_column", {"name": "note", "type": "string"}, "ddl2")
    rows = {r["doc_id"]: r for r in t.read().collect()}
    assert rows["a"]["note"] is None and rows["b"]["note"] is None
    # lookup path projects the default too (bucket-pruned read)
    lk = {r["doc_id"]: r for r in t.lookup(["b"]).collect()}
    assert lk["b"]["lang"] == "und"


def test_add_column_default_mounter_projection(spark):
    from ticdc_spark.operators.mounter import project_fields

    from_fields = [{"id": 2, "name": "x", "type": "int"}]
    to_fields = [
        {"id": 2, "name": "x", "type": "int"},
        {"id": 3, "name": "lang", "type": "string", "initial_default": "und"},
        {"id": 4, "name": "note", "type": "string"},
    ]
    df = spark.createDataFrame([(7,)], "x int")
    row = project_fields(df, from_fields, to_fields, keep=[]).collect()[0]
    assert row["lang"] == "und" and row["note"] is None and row["x"] == 7


def test_add_column_default_mid_stream_matches_oracle(spark, tmp_path):
    """Feed end-to-end: a default-bearing ADD COLUMN mid-stream; final state
    must match the sequential raw oracle, and rows whose LWW winner predates
    the DDL must read the default (proving the scenario exercises it)."""
    spec = BinlogSpec(
        n_events=6_000, n_keys=800, seed=43, p_delete=0.1, p_insert=0.6
    )
    typed = generate_binlog(spec)
    import pyarrow.compute as pc

    lo = pc.min(typed.column("commit_ts")).as_py()
    hi = pc.max(typed.column("commit_ts")).as_py()
    ddls = [
        (
            (lo + hi) // 2,
            "add_column",
            {"name": "lang", "type": "string", "default": "und"},
        )
    ]
    raw = binlog_to_raw(typed, ddls)
    write_raw_binlog(raw, str(tmp_path / "binlog"), n_files=4)

    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=8)
    cf = ChangeFeed(
        t,
        str(tmp_path / "binlog"),
        str(tmp_path / "ckpt"),
        mode="raw",
        ddl_rows=[
            {"commit_ts": ts, "ddl_type": typ, "spec": __import__("json").dumps(s)}
            for ts, typ, s in ddls
        ],
        max_files_per_trigger=2,
    )
    summaries = cf.run_available()
    resolved = summaries[-1]["resolved_ts"]
    assert t.schema_version == 1

    expected = apply_binlog_raw(raw, BASE, ddls, upto_ts=resolved)
    got = t.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    got_pa = pa.table(
        {
            "doc_id": pa.array(got["doc_id"], pa.string()),
            "tokens": pa.array(
                [None if v is None else list(v) for v in got["tokens"]],
                pa.list_(pa.int32()),
            ),
            "n_tok": pa.array(got["n_tok"], pa.int32()),
            "source": pa.array(got["source"], pa.string()),
            "lang": pa.array(got["lang"], pa.string()),
        }
    )
    problems = diff_tables(expected, got_pa)
    assert not problems, problems[:3]
    # at least one surviving key's winner predates the DDL -> default visible
    langs = set(got["lang"])
    assert "und" in langs and len(langs) > 1


def test_add_column_default_keyless(spark, tmp_path):
    from ticdc_spark.lake.keyless import KeylessTable

    kt = KeylessTable.create(
        spark,
        str(tmp_path / "kt"),
        value_fields=[
            {"id": 1, "name": "a", "type": "int"},
            {"id": 2, "name": "b", "type": "string"},
        ],
        n_buckets=4,
    )
    ch = spark.createDataFrame(
        [("I", 1, 1, 5, "x"), ("I", 1, 2, 5, "x"), ("I", 1, 3, 6, "y")],
        "op string, commit_ts long, seq long, a int, b string",
    )
    kt.apply_epoch(ch, "e1")
    kt.evolve(
        "add_column", {"name": "c", "type": "string", "default": "dflt"}, "ddl1"
    )
    rows = {(r["a"], r["b"], r["c"]): r["mult"] for r in kt.read().collect()}
    # the default is PART of the rewritten tuple identity
    assert rows == {(5, "x", "dflt"): 2, (6, "y", "dflt"): 1}
