"""§2.10 dispatchers: ts / table / index-value / rule switcher, plus the
DDL allowlist skip semantics (pkg/filter/filter.go:115-171)."""

import json

import pyarrow.compute as pc
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


def test_registry_skips_unsupported_ddl_with_warning():
    with pytest.warns(UserWarning, match="create_index"):
        reg = SchemaRegistry(
            BASE,
            [
                (10, "add_column", {"name": "lang", "type": "string"}),
                (20, "create_index", {"name": "idx_lang"}),
                (30, "rename_column", {"from": "source", "to": "origin"}),
            ],
        )
    # the skipped DDL creates no version and no barrier
    assert len(reg.versions) == 3 and reg.ddl_ts == [10, 30]
    with pytest.raises(ValueError, match="unsupported"):
        reg.add_ddl(40, "create_index", {}, on_unsupported="raise")


def test_feed_with_unsupported_ddl_converges(spark, tmp_path):
    """One exotic DDL in the stream must not halt replication — the feed
    warns, skips it, and still matches the oracle."""
    spec = BinlogSpec(n_events=4_000, n_keys=400, seed=94, p_delete=0.1, p_insert=0.6)
    typed = generate_binlog(spec)
    lo = pc.min(typed.column("commit_ts")).as_py()
    hi = pc.max(typed.column("commit_ts")).as_py()
    good = [(lo + (hi - lo) // 2, "add_column", {"name": "lang", "type": "string"})]
    raw = binlog_to_raw(typed, good)
    write_raw_binlog(raw, str(tmp_path / "binlog"), n_files=2)
    ddl_rows = [
        {"commit_ts": lo + (hi - lo) // 4, "ddl_type": "create_index",
         "spec": json.dumps({"name": "idx"})},
        {"commit_ts": good[0][0], "ddl_type": "add_column", "spec": good[0][2]},
    ]
    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    with pytest.warns(UserWarning, match="create_index"):
        cf = ChangeFeed(
            t, str(tmp_path / "binlog"), str(tmp_path / "ckpt"),
            mode="raw", ddl_rows=ddl_rows,
        )
    summaries = cf.run_available()
    assert t.schema_version == 1  # only the supported DDL executed
    expected = apply_binlog_raw(raw, BASE, good, upto_ts=summaries[-1]["resolved_ts"])
    import pyarrow as pa

    pdf = t.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    actual = pa.table({
        "doc_id": pa.array(pdf["doc_id"], pa.string()),
        "tokens": pa.array(
            [None if x is None else list(x) for x in pdf["tokens"]], pa.list_(pa.int32())
        ),
        "n_tok": pa.array(pdf["n_tok"], pa.int64()),
        "source": pa.array(pdf["source"], pa.string()),
        "lang": pa.array(pdf["lang"], pa.string()),
    })
    assert not diff_tables(expected, actual)


def test_rule_switcher_first_match_wins_and_anchored(spark):
    from pyspark.sql import functions as F

    from ticdc_spark.streaming.dispatch import compile_dispatch_rules

    df = spark.createDataFrame(
        [("orders", "k1", 101), ("orders_v2", "k1", 102), ("xorders", "k2", 103),
         ("users", "k3", 104)],
        "table string, doc_id string, commit_ts long",
    )
    part = compile_dispatch_rules(
        [("orders", "ts"), ("orders*", "table")], 4, key_col="doc_id"
    )
    rows = {r["table"]: r["p"] for r in df.select("table", part.alias("p")).collect()}
    # exact 'orders' hits the FIRST rule (ts), not the broader glob
    assert rows["orders"] == 101 % 4
    # 'orders_v2' falls through to the second rule (table hash)
    from ticdc_spark.functions.hashing import h60

    th = df.filter(F.col("table") == "orders_v2").select(
        (h60(F.col("table")) % 4).alias("h")
    ).collect()[0]["h"]
    assert rows["orders_v2"] == th
    # 'xorders' must NOT match 'orders*' (anchored), so default → index-value
    from ticdc_spark.functions.hashing import bucket

    kb = df.filter(F.col("table") == "xorders").select(
        bucket("doc_id", 4).alias("b")
    ).collect()[0]["b"]
    assert rows["xorders"] == kb
    ub = df.filter(F.col("table") == "users").select(
        bucket("doc_id", 4).alias("b")
    ).collect()[0]["b"]
    assert rows["users"] == ub


def test_unknown_rule_name_warns_and_uses_default():
    from ticdc_spark.streaming.dispatch import dispatcher_for

    with pytest.warns(UserWarning, match="unsupported dispatch rule"):
        dispatcher_for("bogus", 4)


def test_mq_ts_dispatch_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from ticdc_spark.testgen import write_binlog

    spec = BinlogSpec(n_events=3_000, n_keys=300, seed=95)
    write_binlog(spec, str(tmp_path / "binlog"), files_per_part=1)
    mq = str(tmp_path / "mq")
    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    cf = ChangeFeed(
        t, str(tmp_path / "binlog"), str(tmp_path / "ckpt"),
        mq_dir=mq, mq_partitions=8, mq_dispatch_rule="ts",
    )
    cf.run_available()
    msgs = spark.read.option("basePath", mq).parquet(mq + "/batch-*/partition=*")
    bad = msgs.select(
        F.get_json_object("key_json", "$.commit_ts").cast("long").alias("ts"),
        "partition",
    ).filter(F.col("ts") % 8 != F.col("partition"))
    assert bad.count() == 0


def test_slot_representatives_cover_all_slots(spark):
    from pyspark.sql import functions as F

    from ticdc_spark.streaming.dispatch import slot_representatives

    for n in (8, 32):
        reps = slot_representatives(spark, n)
        assert len(reps) == n
        # each representative must hash into its own slot under Spark's
        # exact partitioning function (pmod(murmur3, n))
        df = spark.createDataFrame([(p, v) for p, v in enumerate(reps)], "p int, v int")
        bad = df.filter(F.pmod(F.hash("v"), F.lit(n)) != F.col("p"))
        assert bad.count() == 0


def test_identity_repartition_one_dir_per_task(spark):
    from pyspark.sql import functions as F

    from ticdc_spark.streaming.dispatch import identity_repartition

    n = 16
    df = spark.range(0, 4_000).select(
        (F.col("id") % n).cast("int").alias("partition"), F.col("id")
    )
    out = identity_repartition(df, n)
    # rows preserved, schema unchanged
    assert out.columns == ["partition", "id"]
    assert out.count() == 4_000
    # every task owns exactly one partition-dir value (the property the
    # plain hash repartition lacks: murmur3 over 0..n-1 collides)
    per_task = (
        out.withColumn("task", F.spark_partition_id())
        .groupBy("task")
        .agg(F.countDistinct("partition").alias("dirs"))
        .collect()
    )
    assert len(per_task) == n
    assert all(r["dirs"] == 1 for r in per_task)
