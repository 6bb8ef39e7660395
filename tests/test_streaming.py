"""Structured Streaming changefeed: micro-batches, watermark gating,
carry-over tail, checkpoint resume, lineage.

Mirrors: kafka_consumer/main.go:531-586 (partition resolved-ts → min),
cdc/puller/entry_sorter.go release rule, tests/availability (resume)."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from ticdc_spark.lake.table import LakeTable
from ticdc_spark.oracle import apply_binlog, diff_tables
from ticdc_spark.streaming.changefeed import ChangeFeed
from ticdc_spark.testgen import BinlogSpec, write_binlog


def _lake_arrow(table):
    import pyarrow as pa

    pdf = table.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(pdf["doc_id"], pa.string()),
            "tokens": pa.array([list(t) for t in pdf["tokens"]], pa.list_(pa.int32())),
            "n_tok": pa.array(pdf["n_tok"], pa.int32()),
            "source": pa.array(pdf["source"], pa.string()),
        }
    )


@pytest.fixture()
def workspace(tmp_path):
    return {
        "binlog": str(tmp_path / "binlog"),
        "tbl": str(tmp_path / "tbl"),
        "ckpt": str(tmp_path / "ckpt"),
        "lineage": str(tmp_path / "lineage"),
    }


def test_streaming_replay_matches_oracle(spark, workspace):
    spec = BinlogSpec(n_events=30_000, n_keys=3_000, seed=31, p_delete=0.15, p_insert=0.55)
    write_binlog(spec, workspace["binlog"], files_per_part=6)
    t = LakeTable.create(spark, workspace["tbl"], n_buckets=8)
    cf = ChangeFeed(
        t,
        workspace["binlog"],
        workspace["ckpt"],
        lineage_dir=workspace["lineage"],
        max_files_per_trigger=2,
    )
    summaries = cf.run_available()
    assert len(summaries) == 3  # 6 files / 2 per trigger
    # final resolved = global max ts since every partition completed
    binlog = pq.read_table(workspace["binlog"])
    resolved = summaries[-1]["resolved_ts"]
    expected = apply_binlog(binlog, upto_ts=resolved)
    problems = diff_tables(expected, _lake_arrow(t))
    assert not problems, problems[:3]
    # lineage recorded every batch
    lin = cf.read_lineage()
    assert lin.select("batch_id").distinct().count() == 3
    assert lin.filter("committed").count() > 0


def test_streaming_resume_from_checkpoint(spark, workspace):
    """Process half the files, 'crash', create a NEW ChangeFeed over the same
    checkpoint, finish. Final state must equal a clean full run's oracle."""
    spec = BinlogSpec(n_events=20_000, n_keys=2_000, seed=32, p_delete=0.2, p_insert=0.5)
    write_binlog(spec, workspace["binlog"] + "-full", files_per_part=4)
    files = sorted(glob.glob(workspace["binlog"] + "-full/*.parquet"))
    os.makedirs(workspace["binlog"])
    # stage only the first 2 files
    for f in files[:2]:
        os.link(f, os.path.join(workspace["binlog"], os.path.basename(f)))
    t = LakeTable.create(spark, workspace["tbl"], n_buckets=8)
    cf1 = ChangeFeed(t, workspace["binlog"], workspace["ckpt"], max_files_per_trigger=1)
    cf1.run_available()
    v_mid = t._manifest["version"]
    assert v_mid > 0
    # "restart": stage the rest, new ChangeFeed instance, same checkpoint
    for f in files[2:]:
        os.link(f, os.path.join(workspace["binlog"], os.path.basename(f)))
    t2 = LakeTable(spark, workspace["tbl"])
    cf2 = ChangeFeed(t2, workspace["binlog"], workspace["ckpt"], max_files_per_trigger=1)
    summaries = cf2.run_available()
    binlog = pq.read_table(workspace["binlog"] + "-full")
    expected = apply_binlog(binlog, upto_ts=summaries[-1]["resolved_ts"])
    problems = diff_tables(expected, _lake_arrow(t2))
    assert not problems, problems[:3]


def test_watermark_gating_holds_unresolved_tail(spark, workspace):
    """Events above the min-over-partitions frontier are NOT applied in the
    batch that sees them (prefix-consistency), but survive in the pending
    tail and apply once the frontier passes them."""
    import pyarrow as pa

    # partition 0 advances to ts 200, partition 1 only to ts 100 in file 1;
    # file 2 brings partition 1 forward to 300.
    rows_f1 = [
        (100, 1, "t", "I", "a", [1], 1, "web", 0, 0),
        (200, 2, "t", "I", "b", [2], 1, "web", 0, 0),  # part 0, beyond frontier
        (100, 3, "t", "I", "c", [3], 1, "web", 1, 0),
    ]
    rows_f2 = [(300, 4, "t", "I", "d", [4], 1, "web", 1, 0)]
    os.makedirs(workspace["binlog"])
    from ticdc_spark.model import BINLOG_SCHEMA

    for i, rows in enumerate([rows_f1, rows_f2]):
        spark.createDataFrame(rows, schema=BINLOG_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(workspace["binlog"] + f"-stage{i}")
        for f in glob.glob(workspace["binlog"] + f"-stage{i}/*.parquet"):
            os.link(f, os.path.join(workspace["binlog"], f"f{i}-{os.path.basename(f)}"))
    t = LakeTable.create(spark, workspace["tbl"], n_buckets=4)
    cf = ChangeFeed(t, workspace["binlog"], workspace["ckpt"], max_files_per_trigger=1)
    summaries = cf.run_available()
    # batch 1 frontier = min(200, 100) = 100 → only a, c applied
    assert summaries[0]["resolved_ts"] == 100
    # batch 2 frontier = min(200, 300) = 200 → b applied, d still pending
    assert summaries[1]["resolved_ts"] == 200
    keys = {r["doc_id"] for r in t.read().collect()}
    assert keys == {"a", "b", "c"}
    # d arrives once partition 0 advances past 300
    rows_f3 = [(301, 5, "t", "I", "e", [5], 1, "web", 0, 0)]
    spark.createDataFrame(rows_f3, schema=BINLOG_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(workspace["binlog"] + "-stage3")
    for f in glob.glob(workspace["binlog"] + "-stage3/*.parquet"):
        os.link(f, os.path.join(workspace["binlog"], f"f3-{os.path.basename(f)}"))
    cf2 = ChangeFeed(t, workspace["binlog"], workspace["ckpt"], max_files_per_trigger=1)
    cf2.run_available()
    keys = {r["doc_id"] for r in t.read().collect()}
    # frontier now min(301, 300) = 300: d applies; e (ts 301) stays pending —
    # the applied state is always a commit-ts prefix
    assert keys == {"a", "b", "c", "d"}


def test_continuous_tailing_files_arrive_mid_stream(spark, workspace):
    """Production mode: ChangeFeed.start() with a processing-time trigger,
    new binlog files LANDING WHILE THE QUERY RUNS (the actual 'tail the
    change log' flow, cdc/kv/client.go realtime push analog). The applied
    state must converge to the oracle at the final resolved frontier."""
    import time

    spec = BinlogSpec(n_events=8_000, n_keys=800, seed=77, p_delete=0.15, p_insert=0.55)
    staging = workspace["binlog"] + "-stage"
    write_binlog(spec, staging, files_per_part=6)
    files = sorted(glob.glob(staging + "/*.parquet"))
    os.makedirs(workspace["binlog"])
    for f in files[:2]:
        os.link(f, os.path.join(workspace["binlog"], os.path.basename(f)))

    t = LakeTable.create(spark, workspace["tbl"], n_buckets=4)
    cf = ChangeFeed(
        t,
        workspace["binlog"],
        workspace["ckpt"],
        lineage_dir=workspace["lineage"],
        max_files_per_trigger=2,
    )
    q = cf.start(processing_time="1 second")
    try:
        deadline = time.time() + 60
        # drip the remaining files in while the query is live
        for f in files[2:]:
            os.link(f, os.path.join(workspace["binlog"], os.path.basename(f)))
            time.sleep(0.5)
        # wait until every file is consumed and the feed goes idle
        while time.time() < deadline:
            n_batches = len(cf.batch_summaries)
            total_seen = sum(s["events"] for s in cf.batch_summaries)
            if cf.batch_summaries and total_seen >= spec.n_events and not q.status["isDataAvailable"]:
                break
            time.sleep(0.5)
        assert cf.batch_summaries, "no batches processed before deadline"
    finally:
        q.stop()
    resolved = max(s["resolved_ts"] for s in cf.batch_summaries)
    binlog = pq.read_table(staging)
    expected = apply_binlog(binlog, upto_ts=resolved)
    problems = diff_tables(expected, _lake_arrow(t))
    assert not problems, problems[:3]
    assert len(cf.batch_summaries) >= 2  # genuinely incremental


def test_strict_watermarks_late_event_raises(spark, workspace):
    """Puller contract (cdc/puller/puller.go:163-168): in strict mode an
    event arriving at or below the already-resolved frontier is an ERROR;
    in default (tolerant) mode it is applied conditionally and loses."""
    from ticdc_spark.model import BINLOG_SCHEMA

    os.makedirs(workspace["binlog"])

    def stage(rows, name):
        spark.createDataFrame(rows, schema=BINLOG_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(workspace["binlog"] + "-" + name)
        for f in glob.glob(workspace["binlog"] + "-" + name + "/*.parquet"):
            os.link(f, os.path.join(workspace["binlog"], f"{name}-{os.path.basename(f)}"))

    # batch 1: both partitions advance to 200 → resolved 200
    stage(
        [
            (100, 1, "t", "I", "a", [1], 1, "web", 0, 0),
            (200, 2, "t", "I", "b", [2], 1, "web", 0, 0),
            (200, 3, "t", "I", "c", [3], 1, "web", 1, 0),
        ],
        "f1",
    )
    t = LakeTable.create(spark, workspace["tbl"], n_buckets=4)
    cf = ChangeFeed(
        t, workspace["binlog"], workspace["ckpt"], max_files_per_trigger=1,
        strict_watermarks=True,
    )
    cf.run_available()
    assert cf.batch_summaries[-1]["resolved_ts"] == 200

    # batch 2: a LATE event (ts 150 <= resolved 200) → strict mode raises
    stage([(150, 4, "t", "U", "a", [9], 1, "web", 0, 0)], "f2")
    cf_strict = ChangeFeed(
        t, workspace["binlog"], workspace["ckpt"], max_files_per_trigger=1,
        strict_watermarks=True,
    )
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises((RuntimeError, StreamingQueryException), match="late-event"):
        cf_strict.run_available()

    # tolerant mode: same late file applies conditionally — 'a' keeps its
    # NEWER value (the ts-100 insert was superseded? no: 150 > 100, late
    # event wins over older state but the strict check is about the
    # CONTRACT, not corruption)
    t2 = LakeTable(spark, workspace["tbl"])
    cf_tol = ChangeFeed(
        t2, workspace["binlog"], workspace["ckpt"] + "2", max_files_per_trigger=4,
    )
    cf_tol.run_available()
    got = {r["doc_id"]: list(r["tokens"]) for r in t2.read().collect()}
    assert got == {"a": [9], "b": [2], "c": [3]}  # 150 > 100 → late U wins


def test_changefeed_stats(spark, workspace):
    spec = BinlogSpec(n_events=5_000, n_keys=500, seed=88)
    write_binlog(spec, workspace["binlog"], files_per_part=2)
    t = LakeTable.create(spark, workspace["tbl"], n_buckets=4)
    cf = ChangeFeed(t, workspace["binlog"], workspace["ckpt"], max_files_per_trigger=1)
    cf.run_available()
    s = cf.stats()
    assert s["batches"] == 2 and s["total_rows"] >= spec.n_events
    assert s["rows_per_sec"] and s["rows_per_sec"] > 0
    assert s["last_resolved_ts"] == cf.batch_summaries[-1]["resolved_ts"]


def test_sql_view_and_lag_report(spark, workspace):
    spec = BinlogSpec(n_events=6_000, n_keys=600, seed=44)
    write_binlog(spec, workspace["binlog"], files_per_part=2)
    t = LakeTable.create(spark, workspace["tbl"], n_buckets=4)
    cf = ChangeFeed(
        t, workspace["binlog"], workspace["ckpt"],
        lineage_dir=workspace["lineage"], max_files_per_trigger=1,
    )
    cf.run_available()
    t.create_view("target_tokens_v")
    row = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT source) AS s FROM target_tokens_v"
    ).collect()[0]
    assert row["n"] == t.read().count() and row["s"] >= 1
    rep = {r["part"]: r for r in cf.lag_report().collect()}
    assert len(rep) == spec.n_parts
    assert all(r["lag_us"] >= 0 for r in rep.values())
    assert min(r["lag_us"] for r in rep.values()) == 0  # some part is current


def test_watermarked_window_agg_drops_too_late_rows(spark, tmp_path):
    """Structured Streaming native path: readStream → withWatermark →
    tumbling window → append sink. A row later than watermark+window is
    dropped by the engine (late-data semantics §2.11); on-time rows and
    tolerably-late rows aggregate normally."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)
    schema = "ts timestamp, k string, v long"

    def put(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / ("stage-" + name))
        )
        for f in glob.glob(str(tmp_path / ("stage-" + name)) + "/*.parquet"):
            os.link(f, os.path.join(src, name + "-" + os.path.basename(f)))

    import datetime as dt

    T0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    m = lambda mins: T0 + dt.timedelta(minutes=mins)  # noqa: E731
    put("f1", [(m(5), "a", 1), (m(15), "a", 2), (m(65), "a", 4)])  # wm -> 55m

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "k")
        .agg(F.sum("v").alias("total"))
        .select(F.col("window.start").alias("ws"), "k", "total")
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # push the watermark first (separate availableNow round — one batch per
    # round, so the wm from f2 is in force before f3 arrives)
    put("f2", [(m(135), "a", 8)])  # wm -> 125m: closes windows 1 and 2
    for name_rows in (None, ("f3", [(m(7), "a", 100)])):  # f3: 7m << wm -> dropped
        if name_rows is not None:
            put(*name_rows)
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = {
        (r["ws"].minute + r["ws"].hour * 60, r["k"]): r["total"]
        for r in spark.read.parquet(out).collect()
    }
    # hour-1 window total = 1+2 (the ts-7m late row NOT included)
    assert got[(600, "a")] == 3, got
    # hour-2 window appeared once closed
    assert got[(660, "a")] == 4, got


def test_stateful_running_key_stats_survives_batches_and_restart(spark, tmp_path):
    """applyInPandasWithState: per-key running stats accumulate ACROSS
    micro-batches via the state store and recover from the checkpoint."""
    from ticdc_spark.model import BINLOG_SCHEMA
    from ticdc_spark.streaming.stateful import running_key_stats

    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    def put(name, rows):
        spark.createDataFrame(rows, schema=BINLOG_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / ("st-" + name)))
        for f in glob.glob(str(tmp_path / ("st-" + name)) + "/*.parquet"):
            os.link(f, os.path.join(src, name + "-" + os.path.basename(f)))

    def run(sink_name):
        stream = spark.readStream.schema(BINLOG_SCHEMA).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        emissions = []

        def sink(df, _bid):
            emissions.extend(df.collect())

        q = (
            running_key_stats(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = {}
        for r in emissions:  # update mode: keep the LAST emission per key
            out[r["doc_id"]] = (r["n_events"], r["n_deletes"], r["last_commit_ts"])
        return out

    put("b1", [(100, 1, "t", "I", "a", [1], 1, "w", 0, 0),
               (101, 2, "t", "D", "a", None, None, None, 0, 0),
               (102, 3, "t", "I", "b", [2], 1, "w", 1, 0)])
    got = run("s1")
    assert got["a"] == (2, 1, 101) and got["b"] == (1, 0, 102)

    # new data + NEW query over the same checkpoint: state recovered
    put("b2", [(200, 4, "t", "U", "a", [9], 1, "w", 0, 0)])
    got = run("s2")
    assert got["a"] == (3, 1, 200)  # accumulated across restart


def test_mq_sink_emission(spark, workspace, tmp_path):
    """MQ sink analog: released events emitted as open-protocol messages
    partitioned by the dispatch hash, resolved-ts broadcast per partition;
    a consumer decoding the messages sees exactly the released prefix."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ticdc_spark.functions.codec import decode_open_protocol

    spec = BinlogSpec(n_events=5_000, n_keys=500, seed=55)
    write_binlog(spec, workspace["binlog"], files_per_part=2)
    mq = str(tmp_path / "mq")
    t = LakeTable.create(spark, workspace["tbl"], n_buckets=4)
    cf = ChangeFeed(
        t, workspace["binlog"], workspace["ckpt"], max_files_per_trigger=2,
        mq_dir=mq, mq_partitions=8,
    )
    summaries = cf.run_available()
    resolved = summaries[-1]["resolved_ts"]

    msgs = spark.read.option("basePath", mq).parquet(mq + "/batch-*")
    data = msgs.filter(F.col("value_json").isNotNull() | F.col("key_json").contains('"op"'))
    dec = decode_open_protocol(
        data.select("key_json", "value_json"),
        T.StructType([
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
        ]),
    )
    n_released = dec.count()
    import pyarrow.parquet as pq_

    binlog = pq_.read_table(workspace["binlog"])
    import pyarrow.compute as pc

    expect = len(binlog.filter(pc.less_equal(binlog.column("commit_ts"), resolved)))
    assert n_released == expect  # exactly the released prefix, nothing else
    # per-key ordering: all messages of one key share a partition
    per_key = (
        data.select(
            F.get_json_object("key_json", "$.doc_id").alias("k"), "partition"
        )
        .groupBy("k")
        .agg(F.countDistinct("partition").alias("np"))
    )
    assert per_key.filter(F.col("np") > 1).count() == 0
    # resolved broadcast covers every partition with the batch frontier
    res = spark.read.parquet(mq + "/batch-*/resolved.parquet")
    last = res.select(F.get_json_object("key_json", "$.ts").cast("long").alias("ts"))
    assert last.agg(F.max("ts")).collect()[0][0] == resolved
    assert res.select("partition").distinct().count() == 8


def test_mq_consumer_replicates_downstream(spark, workspace, tmp_path):
    """Full MQ pipeline: changefeed → open-protocol messages → consumer →
    downstream table. Downstream final state must equal the primary sink's
    state (the TiCDC MQ-pipeline consistency contract), and re-consuming is
    a no-op."""
    from ticdc_spark.streaming.consumer import MQConsumer

    spec = BinlogSpec(n_events=8_000, n_keys=800, seed=66, p_delete=0.15, p_insert=0.55)
    write_binlog(spec, workspace["binlog"], files_per_part=3)
    mq = str(tmp_path / "mq")
    t1 = LakeTable.create(spark, workspace["tbl"], n_buckets=4)
    cf = ChangeFeed(
        t1, workspace["binlog"], workspace["ckpt"], max_files_per_trigger=2,
        mq_dir=mq, mq_partitions=8,
    )
    cf.run_available()

    t2 = LakeTable.create(spark, str(tmp_path / "downstream"), n_buckets=4)
    consumer = MQConsumer(spark, mq, t2)
    stats = consumer.run_once()
    assert stats and all(s["committed"] for s in stats)

    a = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"]) for r in t1.read().collect()}
    b = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"]) for r in t2.read().collect()}
    assert a == b and len(a) > 0

    # re-consume: every batch already applied
    assert consumer.run_once() == []


def test_mq_pipeline_with_ddl_schema_evolution(spark, workspace, tmp_path):
    """Schema evolution flows END-TO-END through the MQ path: the changefeed
    emits DDL messages at barriers; the consumer evolves its table and the
    downstream state + schema match the primary sink."""
    import pyarrow.parquet as pq_

    from ticdc_spark.streaming.consumer import MQConsumer

    spec = BinlogSpec(n_events=6_000, n_keys=600, seed=67, p_delete=0.1, p_insert=0.6)
    write_binlog(spec, workspace["binlog"], files_per_part=3)
    binlog = pq_.read_table(workspace["binlog"])
    import pyarrow.compute as pc

    lo = pc.min(binlog.column("commit_ts")).as_py()
    hi = pc.max(binlog.column("commit_ts")).as_py()
    ddl_rows = [
        {"commit_ts": (lo + hi) // 2, "ddl_type": "add_column",
         "spec": '{"name":"lang","type":"string"}'},
    ]
    mq = str(tmp_path / "mq")
    t1 = LakeTable.create(spark, workspace["tbl"], n_buckets=4)
    cf = ChangeFeed(
        t1, workspace["binlog"], workspace["ckpt"], max_files_per_trigger=2,
        ddl_rows=ddl_rows, mq_dir=mq, mq_partitions=4,
    )
    cf.run_available()
    assert t1.schema_version == 1

    t2 = LakeTable.create(spark, str(tmp_path / "down"), n_buckets=4)
    stats = MQConsumer(spark, mq, t2).run_once()
    assert stats and all(s["committed"] for s in stats)
    assert [f["name"] for f in t2.current_fields] == [f["name"] for f in t1.current_fields]
    a = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"], r["lang"])
         for r in t1.read().collect()}
    b = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"], r["lang"])
         for r in t2.read().collect()}
    assert a == b and len(a) > 0


def test_changefeed_gc_bounds_snapshots(spark, workspace):
    """expire_keep_last wires snapshot GC into the feed loop: old manifests
    and unreferenced data files are pruned as the feed advances, while the
    live state stays correct."""
    import pyarrow.parquet as pq_

    from ticdc_spark.oracle import apply_binlog, diff_tables

    spec = BinlogSpec(n_events=8_000, n_keys=800, seed=58, p_delete=0.15, p_insert=0.55)
    write_binlog(spec, workspace["binlog"], files_per_part=6)
    t = LakeTable.create(spark, workspace["tbl"], n_buckets=4)
    cf = ChangeFeed(
        t, workspace["binlog"], workspace["ckpt"], max_files_per_trigger=1,
        expire_keep_last=2,
    )
    summaries = cf.run_available()
    assert len(summaries) == 6
    mdir = os.path.join(workspace["tbl"], "_manifests")
    kept = [f for f in os.listdir(mdir) if f.startswith("v")]
    assert len(kept) <= 3  # 2 kept + the fresh post-GC commit of the last batch
    expected = apply_binlog(pq_.read_table(workspace["binlog"]),
                            upto_ts=summaries[-1]["resolved_ts"])
    assert not diff_tables(expected, _lake_arrow(t))


@pytest.mark.parametrize("protocol", ["canal-json", "maxwell", "avro", "canal-pb"])
def test_mq_protocol_switch_replicates_downstream(spark, workspace, tmp_path, protocol):
    """The MQ sink's protocol= option (mq.go:356-378 codec dispatch): the
    same pipeline consistency contract must hold for every wire codec —
    canal-flat JSON, maxwell JSON, binary Avro envelopes, canal protobuf
    Entries — including a mid-stream DDL flowing through the meta channel."""
    import pyarrow.compute as pc

    from ticdc_spark.streaming.consumer import MQConsumer

    spec = BinlogSpec(n_events=4_000, n_keys=400, seed=68, p_delete=0.15, p_insert=0.55)
    write_binlog(spec, workspace["binlog"], files_per_part=2)
    binlog = pq.read_table(workspace["binlog"])
    lo = pc.min(binlog.column("commit_ts")).as_py()
    hi = pc.max(binlog.column("commit_ts")).as_py()
    ddl_rows = [
        {"commit_ts": (lo + hi) // 2, "ddl_type": "add_column",
         "spec": '{"name":"lang","type":"string"}'},
    ]
    mq = str(tmp_path / "mq")
    t1 = LakeTable.create(spark, workspace["tbl"], n_buckets=4)
    cf = ChangeFeed(
        t1, workspace["binlog"], workspace["ckpt"], max_files_per_trigger=2,
        ddl_rows=ddl_rows, mq_dir=mq, mq_partitions=4, mq_protocol=protocol,
    )
    cf.run_available()
    assert t1.schema_version == 1

    t2 = LakeTable.create(spark, str(tmp_path / "down"), n_buckets=4)
    consumer = MQConsumer(spark, mq, t2, protocol=protocol)
    stats = consumer.run_once()
    assert stats and all(s["committed"] for s in stats)
    assert [f["name"] for f in t2.current_fields] == [f["name"] for f in t1.current_fields]
    a = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"], r["lang"])
         for r in t1.read().collect()}
    b = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"], r["lang"])
         for r in t2.read().collect()}
    assert a == b and len(a) > 0
    assert consumer.run_once() == []  # idempotent re-consume


def test_mq_old_value_cross_batch(spark, workspace, tmp_path):
    """enable-old-value: every emitted event carries its pre-change image,
    INCLUDING each batch's first event per key, whose image predates the
    batch (read bucket-pruned from the pre-batch snapshot). Verified
    against a pure-python fold of the whole binlog in apply order.

    Arrival respects the resolved-ts contract (files are commit-ts ranges,
    out_of_order=False): pre-image reconstruction is sequence-sensitive, so
    — exactly like the reference, where TiKV only hands TiCDC old values
    for deliveries that honor resolved-ts — it is only defined for streams
    without late events. Late-event replay (order-insensitive LWW state) is
    covered by the other streaming tests."""
    import json as j

    spec = BinlogSpec(
        n_events=6_000, n_keys=300, seed=69, p_delete=0.2, p_insert=0.5,
        out_of_order=False,
    )
    write_binlog(spec, workspace["binlog"], files_per_part=4)
    mq = str(tmp_path / "mq")
    t1 = LakeTable.create(spark, workspace["tbl"], n_buckets=4)
    cf = ChangeFeed(
        t1, workspace["binlog"], workspace["ckpt"], max_files_per_trigger=2,
        mq_dir=mq, mq_partitions=4, mq_protocol="open", mq_old_value=True,
    )
    cf.run_available()

    # python oracle: fold events in apply order, tracking each key's state
    ev = pq.read_table(workspace["binlog"]).to_pylist()
    op_rank = {"D": 0, "I": 1, "U": 1}
    ev.sort(key=lambda r: (r["commit_ts"], r["seq"], op_rank[r["op"]]))
    state, want = {}, {}
    for r in ev:
        k = r["doc_id"]
        # key includes op: the generator's delete+put tie pairs share
        # (commit_ts, seq) and only op_rank distinguishes them
        want[(r["commit_ts"], r["seq"], r["op"])] = state.get(k)
        state[k] = None if r["op"] == "D" else {
            "tokens": list(r["tokens"]), "n_tok": r["n_tok"], "source": r["source"]}

    msgs = spark.read.parquet(mq + "/batch-*/partition=*").collect()
    n_checked = n_with_old = 0
    for m in msgs:
        key = j.loads(m["key_json"])
        pre = want.get((key["commit_ts"], key["seq"], key["op"]))
        if pre is None:
            assert m["old_json"] is None, key
        else:
            got = j.loads(m["old_json"])
            assert got["tokens"] == pre["tokens"] and got["n_tok"] == pre["n_tok"], key
            n_with_old += 1
        n_checked += 1
    assert n_checked > 4000 and n_with_old > 1000  # both cases well-covered


def test_mq_old_value_canal_json(spark, workspace, tmp_path):
    """canal-json under enable-old-value (canal_flat.go:93-147): UPDATE and
    DELETE messages carry the one-element before image in `old`; a DELETE's
    `data` IS the before image (Alibaba-adapter/Flink contract); INSERT's
    old is [null]. The downstream consumer still converges to the upstream
    table through the same messages."""
    import json as j

    from ticdc_spark.streaming.consumer import MQConsumer

    spec = BinlogSpec(
        n_events=5_000, n_keys=250, seed=71, p_delete=0.2, p_insert=0.5,
        out_of_order=False,
    )
    write_binlog(spec, workspace["binlog"], files_per_part=4)
    mq = str(tmp_path / "mq")
    t1 = LakeTable.create(spark, workspace["tbl"], n_buckets=4)
    cf = ChangeFeed(
        t1, workspace["binlog"], workspace["ckpt"], max_files_per_trigger=2,
        mq_dir=mq, mq_partitions=4, mq_protocol="canal-json", mq_old_value=True,
    )
    cf.run_available()

    # python oracle of pre-images, keyed by (commit_ts, seq, op)
    ev = pq.read_table(workspace["binlog"]).to_pylist()
    op_rank = {"D": 0, "I": 1, "U": 1}
    ev.sort(key=lambda r: (r["commit_ts"], r["seq"], op_rank[r["op"]]))
    state, want = {}, {}
    for r in ev:
        k = r["doc_id"]
        want[(r["commit_ts"], r["seq"], r["op"])] = state.get(k)
        state[k] = None if r["op"] == "D" else {
            "tokens": list(r["tokens"]), "n_tok": r["n_tok"]}

    n_old = n_del_img = 0
    for m in spark.read.parquet(mq + "/batch-*/partition=*").collect():
        v = j.loads(m["value_json"])
        if v.get("isDdl"):
            continue
        pre = want[(v["ts"], v["seq"], v["type"][0].replace("N", "I"))]
        assert len(v["old"]) == 1 and len(v["data"]) == 1
        old = v["old"][0]
        if v["type"] == "INSERT" or pre is None:
            assert old is None, v
        else:
            assert j.loads(old["tokens"]) == pre["tokens"]
            assert int(old["n_tok"]) == pre["n_tok"]
            n_old += 1
            if v["type"] == "DELETE":
                # data carries the before image, not the bare key
                assert v["data"][0] == old
                n_del_img += 1
    assert n_old > 500 and n_del_img > 100

    # same messages still replicate state downstream
    t2 = LakeTable.create(spark, str(tmp_path / "down"), n_buckets=4)
    consumer = MQConsumer(spark, mq, t2, protocol="canal-json")
    stats = consumer.run_once()
    assert stats and all(s["committed"] for s in stats)
    a = {r["doc_id"]: (list(r["tokens"]), r["n_tok"]) for r in t1.read().collect()}
    b = {r["doc_id"]: (list(r["tokens"]), r["n_tok"]) for r in t2.read().collect()}
    assert a == b and len(a) > 0


def test_mq_old_value_crash_replay(spark, workspace, tmp_path):
    """Crash between a batch's merges and its streaming-checkpoint commit:
    the replayed batch must emit IDENTICAL old values. Without the per-batch
    (prev_resolved, pre_version) record the replay would (a) false-panic
    the late check (the table's watermarks already cover the batch) and
    (b) read pre-images from the POST-batch snapshot. Crash is simulated by
    re-delivering the last micro-batch's files to a fresh ChangeFeed over
    the same checkpoint via _process_batch — exactly what foreachBatch does
    when the streaming commit for that batch was lost."""
    import json as j

    spec = BinlogSpec(
        n_events=6_000, n_keys=300, seed=73, p_delete=0.2, p_insert=0.5,
        out_of_order=False,
    )
    write_binlog(spec, workspace["binlog"], files_per_part=4)
    mq = str(tmp_path / "mq")
    t1 = LakeTable.create(spark, workspace["tbl"], n_buckets=4)
    cf = ChangeFeed(
        t1, workspace["binlog"], workspace["ckpt"], max_files_per_trigger=2,
        mq_dir=mq, mq_partitions=4, mq_protocol="open", mq_old_value=True,
    )
    cf.run_available()
    before = {
        j.loads(m["key_json"])["seq"]: m["old_json"]
        for m in spark.read.parquet(mq + "/batch-*/partition=*").collect()
        if "seq" in j.loads(m["key_json"])
    }
    state_before = {r["doc_id"]: list(r["tokens"]) for r in t1.read().collect()}

    # crash: last batch merged + emitted, but its streaming commit is lost —
    # on restart foreachBatch re-delivers the same files with the same id
    files = sorted(glob.glob(os.path.join(workspace["binlog"], "*.parquet")))
    last_batch = spark.read.parquet(*files[2:])  # trigger 2 files/batch
    t1b = LakeTable(spark, workspace["tbl"])
    cf2 = ChangeFeed(
        t1b, workspace["binlog"], workspace["ckpt"], max_files_per_trigger=2,
        mq_dir=mq, mq_partitions=4, mq_protocol="open", mq_old_value=True,
    )
    cf2._process_batch(last_batch, 1)  # replay — must not raise 'late'

    after = {
        j.loads(m["key_json"])["seq"]: m["old_json"]
        for m in spark.read.parquet(mq + "/batch-*/partition=*").collect()
        if "seq" in j.loads(m["key_json"])
    }
    assert after == before and len(after) > 4000
    state_after = {r["doc_id"]: list(r["tokens"]) for r in t1b.read().collect()}
    assert state_after == state_before


def test_mq_partition_delivery_order(spark, workspace, tmp_path):
    """Per-partition delivery order: within every MQ partition of every
    batch, messages appear in (commit_ts, seq) order — the reference's
    Kafka contract (sink send order = commit order per partition), so a
    sequential consumer needs no sort. Each partition dir is exactly one
    parquet file (hash(partition) routes a value to one task), and parquet
    preserves row order."""
    import json as j

    spec = BinlogSpec(n_events=5_000, n_keys=400, seed=75, p_delete=0.15, p_insert=0.55)
    write_binlog(spec, workspace["binlog"], files_per_part=2)
    mq = str(tmp_path / "mq")
    t1 = LakeTable.create(spark, workspace["tbl"], n_buckets=4)
    cf = ChangeFeed(
        t1, workspace["binlog"], workspace["ckpt"], max_files_per_trigger=1,
        mq_dir=mq, mq_partitions=4,
    )
    cf.run_available()

    n_parts = n_msgs = 0
    for bdir in sorted(glob.glob(mq + "/batch-*")):
        for pdir in sorted(glob.glob(bdir + "/partition=*")):
            files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
            assert len(files) == 1, pdir
            rows = pq.read_table(os.path.join(pdir, files[0])).to_pylist()
            keys = [j.loads(r["key_json"]) for r in rows]
            order = [(k["commit_ts"], k["seq"]) for k in keys if "seq" in k]
            assert order == sorted(order), pdir
            n_parts += 1
            n_msgs += len(order)
    assert n_parts >= 8 and n_msgs >= 5000  # base events + tie-pair clones


def test_mq_sized_framing_pipeline(spark, workspace, tmp_path):
    """mq_framing='sized': the batch-framed kafka wire form flows END-TO-END
    — every emitted MQ message holds ≤ max-batch-size events and ≤
    max-message-bytes bytes (json.go:38-41, 394-418), msg_idx preserves the
    per-partition send order, and the consumer's downstream state equals
    the primary sink's."""
    from pyspark.sql import functions as F

    from ticdc_spark.streaming.consumer import MQConsumer

    spec = BinlogSpec(n_events=8_000, n_keys=800, seed=68, p_delete=0.15, p_insert=0.55)
    write_binlog(spec, workspace["binlog"], files_per_part=3)
    mq = str(tmp_path / "mq")
    t1 = LakeTable.create(spark, workspace["tbl"], n_buckets=4)
    cf = ChangeFeed(
        t1, workspace["binlog"], workspace["ckpt"], max_files_per_trigger=2,
        mq_dir=mq, mq_partitions=8, mq_framing="sized",
        mq_max_batch_size=16, mq_max_message_bytes=16 * 1024,
    )
    cf.run_available()

    # wire-form invariants on the raw message files
    msgs = spark.read.option("basePath", os.path.join(mq, sorted(os.listdir(mq))[0])).parquet(
        os.path.join(mq, sorted(os.listdir(mq))[0], "partition=*")
    )
    agg = msgs.agg(
        F.max("n_events"), F.max(F.length("key_bytes") + F.length("value_bytes")),
        F.count("*"), F.sum("n_events"),
    ).collect()[0]
    assert agg[0] <= 16 and agg[1] <= 16 * 1024
    assert agg[2] < agg[3]  # genuinely batched: fewer messages than events
    # msg_idx dense from 0 per partition
    per = msgs.groupBy("partition").agg(
        F.min("msg_idx"), F.max("msg_idx"), F.count("*")
    ).collect()
    assert all(r[1] == 0 and r[2] == r[3] - 1 for r in per)

    t2 = LakeTable.create(spark, str(tmp_path / "downstream"), n_buckets=4)
    consumer = MQConsumer(spark, mq, t2, framing="sized")
    stats = consumer.run_once()
    assert stats and all(s["committed"] for s in stats)
    a = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"]) for r in t1.read().collect()}
    b = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"]) for r in t2.read().collect()}
    assert a == b and len(a) > 0
    assert consumer.run_once() == []  # idempotent re-consume


def test_mq_sized_framing_rejects_incompatible_options(spark, workspace):
    from ticdc_spark.streaming.consumer import MQConsumer

    t = LakeTable.create(spark, workspace["tbl"], n_buckets=4)
    with pytest.raises(ValueError, match="sized"):
        ChangeFeed(
            t, workspace["binlog"], workspace["ckpt"],
            mq_dir="/tmp/x", mq_framing="sized", mq_protocol="maxwell",
        )
    with pytest.raises(ValueError, match="sized"):
        ChangeFeed(
            t, workspace["binlog"], workspace["ckpt"],
            mq_dir="/tmp/x", mq_framing="sized", mq_old_value=True,
        )
    with pytest.raises(ValueError, match="framing"):
        MQConsumer(t.spark, "/tmp/x", t, framing="nope")
    with pytest.raises(ValueError, match="open-protocol"):
        MQConsumer(t.spark, "/tmp/x", t, protocol="maxwell", framing="sized")
