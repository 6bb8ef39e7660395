"""cdclog restore — rebuilding a lake table FROM the archived log, the
reference sink's whole purpose (BR consumes cdclog for point-in-time
recovery; layout cdc/sink/cdclog/utils.go:220-251)."""

import pytest
from pyspark.sql import functions as F

from ticdc_spark.engine.replay import open_binlog, replay_binlog
from ticdc_spark.lake.table import LakeTable
from ticdc_spark.streaming.cdclog import (
    CdclogSink,
    read_cdclog_ddls,
    read_cdclog_meta,
    restore_cdclog,
)
from ticdc_spark.testgen import BinlogSpec, write_binlog

BASE_FIELDS = [
    {"id": 1, "name": "doc_id", "type": "string"},
    {"id": 2, "name": "tokens", "type": "array<int>"},
    {"id": 3, "name": "n_tok", "type": "int"},
    {"id": 4, "name": "source", "type": "string"},
]
PAYLOAD = ["tokens", "n_tok", "source"]


def _rows(df, cols=("doc_id", "tokens", "n_tok", "source")):
    return sorted(
        (tuple(r[c] for c in cols) for r in df.collect()),
        key=lambda t: t[0],
    )


def test_restore_matches_direct_replay(spark, tmp_path):
    """cdclog archive → restore ≡ replicating the same binlog directly."""
    from ticdc_spark.operators.epochs import resolved_frontier

    path = write_binlog(
        BinlogSpec(n_events=12_000, n_keys=900, seed=31), str(tmp_path / "binlog")
    )
    events = open_binlog(spark, path)
    direct = LakeTable.create(spark, str(tmp_path / "direct"), n_buckets=4)
    replay_binlog(direct, events, n_epochs=2)

    root = str(tmp_path / "cdclog")
    sink = CdclogSink(spark, root, {"seq": 3})
    # production archives only RELEASED prefixes (the changefeed emits at or
    # below the resolved frontier) — mirror that here so direct ≡ restore
    released = events.filter(F.col("commit_ts") <= resolved_frontier(events))
    sink.emit(
        released.withColumn("table", F.lit("seq")),
        {"seq": PAYLOAD},
        rotate_bytes=256 * 1024,  # force several files
    )
    assert read_cdclog_meta(root) == {"seq": 3}

    restored = restore_cdclog(
        spark, root, str(tmp_path / "restored"), "seq", BASE_FIELDS, n_buckets=4
    )
    assert _rows(restored.read()) == _rows(direct.read())


def test_restore_replays_schema_evolution(spark, tmp_path):
    """Events archived under DIFFERENT schema versions decode at the
    version current at their CRTs-1 and project to the final schema by
    stable field id — add_column then rename_column across two batches."""
    b1 = spark.range(300).select(
        (1000 + F.col("id")).alias("commit_ts"),
        F.col("id").alias("seq"),
        F.lit("ta").alias("table"),
        F.lit("I").alias("op"),
        F.concat(F.lit("d"), F.col("id") % 120).alias("doc_id"),
        F.sequence(F.lit(0), (F.col("id") % 5).cast("int")).cast("array<int>").alias("tokens"),
        ((F.col("id") % 5) + 1).cast("int").alias("n_tok"),
        F.lit("web").alias("source"),
    )
    # DDLs land between the batches: add lang at 2000, rename source→src at 2001
    b2 = spark.range(300).select(
        (2100 + F.col("id")).alias("commit_ts"),
        (1000 + F.col("id")).alias("seq"),
        F.lit("ta").alias("table"),
        F.lit("U").alias("op"),
        F.concat(F.lit("d"), F.col("id") % 120 + 60).alias("doc_id"),
        F.sequence(F.lit(0), F.lit(2)).cast("array<int>").alias("tokens"),
        F.lit(3).cast("int").alias("n_tok"),
        F.lit("book").alias("src"),
        F.lit("en").alias("lang"),
    )
    root = str(tmp_path / "cdclog")
    sink = CdclogSink(spark, root, {"ta": 9})
    sink.emit(b1, {"ta": ["tokens", "n_tok", "source"]})
    sink.emit_ddl(2000, "add_column", "ta", {"name": "lang", "type": "string"})
    sink.emit_ddl(2001, "rename_column", "ta", {"from": "source", "to": "src"})
    sink.emit(b2, {"ta": ["tokens", "n_tok", "src", "lang"]})

    got = read_cdclog_ddls(root, table="ta")
    assert [(ts, typ) for ts, _t, typ, _s in got] == [
        (2000, "add_column"), (2001, "rename_column"),
    ]

    restored = restore_cdclog(
        spark, root, str(tmp_path / "restored"), "ta", BASE_FIELDS, n_buckets=4
    )
    out = restored.read()
    assert set(out.columns) == {"doc_id", "tokens", "n_tok", "src", "lang"}
    rows = {r["doc_id"]: r for r in out.collect()}
    # a key only touched pre-DDL: source projected into src, lang NULL
    pre_only = rows["d0"]
    assert pre_only["src"] == "web" and pre_only["lang"] is None
    # a key updated post-DDL wins with the new columns
    post = rows["d119"]
    assert post["src"] == "book" and post["lang"] == "en"


def test_restore_truncate_barrier_and_upto_ts(spark, tmp_path):
    """A truncate_table archived mid-log wipes everything at or below its
    barrier on restore; point-in-time restore at upto_ts stops early."""
    ev = spark.range(400).select(
        (1000 + F.col("id")).alias("commit_ts"),
        F.col("id").alias("seq"),
        F.lit("ta").alias("table"),
        F.lit("I").alias("op"),
        F.concat(F.lit("d"), F.col("id") % 150).alias("doc_id"),
        F.sequence(F.lit(0), F.lit(3)).cast("array<int>").alias("tokens"),
        F.lit(4).cast("int").alias("n_tok"),
        F.lit("web").alias("source"),
    )
    root = str(tmp_path / "cdclog")
    sink = CdclogSink(spark, root, {"ta": 5})
    sink.emit(ev, {"ta": PAYLOAD})
    sink.emit_ddl(1349, "truncate_table", "ta", {})

    restored = restore_cdclog(
        spark, root, str(tmp_path / "restored"), "ta", BASE_FIELDS, n_buckets=4
    )
    # expected: only keys whose LAST event is after the barrier survive
    survivors = {
        r["doc_id"]
        for r in ev.filter(F.col("commit_ts") > 1349)
        .select("doc_id").distinct().collect()
    }
    got = {r["doc_id"] for r in restored.read().select("doc_id").collect()}
    assert got == survivors and len(got) < 150

    # point-in-time BEFORE the truncate: full prefix state, no wipe
    pit = restore_cdclog(
        spark, root, str(tmp_path / "pit"), "ta", BASE_FIELDS,
        n_buckets=4, upto_ts=1150,
    )
    expect = {
        r["doc_id"]
        for r in ev.filter(F.col("commit_ts") <= 1150)
        .select("doc_id").distinct().collect()
    }
    assert {r["doc_id"] for r in pit.read().collect()} == expect

    # point-in-time AT the truncate barrier: restored state is empty
    # (same-ts DML applies first, then the wipe — nothing after)
    empty = restore_cdclog(
        spark, root, str(tmp_path / "empty"), "ta", BASE_FIELDS,
        n_buckets=4, upto_ts=1349,
    )
    assert empty.read().count() == 0


def test_restore_unknown_table_raises(spark, tmp_path):
    root = str(tmp_path / "cdclog")
    CdclogSink(spark, root, {"ta": 1})
    with pytest.raises(KeyError):
        restore_cdclog(spark, root, str(tmp_path / "x"), "nope", BASE_FIELDS)
