"""Consistency verification (lake.verify): bucketed state checksums —
sync-diff-inspector analog (the reference's integration tests gate on its
checksum diff, tests/simple/run.sh)."""

from pyspark.sql import functions as F

from ticdc_spark.engine.replay import replay_epoch
from ticdc_spark.lake.table import LakeTable
from ticdc_spark.lake.verify import (
    checksum_diff,
    lake_tables_consistent,
    state_checksum,
)
from ticdc_spark.model import BINLOG_SCHEMA
from ticdc_spark.testgen import BinlogSpec, generate_binlog


def _replicated_pair(spark, tmp_path, seed=77):
    import pyarrow.parquet as pq

    spec = BinlogSpec(n_events=3_000, n_keys=300, seed=seed)
    tbl = generate_binlog(spec)
    pq.write_table(tbl, str(tmp_path / "binlog.parquet"))
    ev = spark.read.parquet(str(tmp_path / "binlog.parquet"))
    up = LakeTable.create(spark, str(tmp_path / "up"), n_buckets=4)
    down = LakeTable.create(spark, str(tmp_path / "down"), n_buckets=8)
    replay_epoch(up, ev, "e1")
    replay_epoch(down, ev, "e1")
    return up, down


def test_consistent_pair_has_empty_diff(spark, tmp_path):
    up, down = _replicated_pair(spark, tmp_path)
    # n_buckets of the CHECKSUM is independent of either table's physical
    # bucketing (4 vs 8 above) — the signature is over logical state
    assert lake_tables_consistent(up, down, n_buckets=16) == []


def test_divergence_localizes_to_its_bucket(spark, tmp_path):
    up, down = _replicated_pair(spark, tmp_path)
    # corrupt the downstream: drop one live row via an extra tombstone
    victim = down.read().select("doc_id").orderBy("doc_id").first()["doc_id"]
    ev = spark.createDataFrame(
        [(1 << 60, 1, "t", "D", victim, None, None, None, 0, 0)],
        schema=BINLOG_SCHEMA,
    )
    replay_epoch(down, ev, "corrupt")
    bad = lake_tables_consistent(up, down, n_buckets=16)
    assert len(bad) == 1
    row = bad[0]
    # exactly the victim's bucket, count off by one on the right side
    from ticdc_spark.functions.hashing import h60

    want_bucket = (
        spark.range(1)
        .select((h60(F.lit(victim)) % F.lit(16)).alias("b"))
        .first()["b"]
    )
    assert row["bucket"] == want_bucket
    assert row["l_cnt"] == row["r_cnt"] + 1


def test_checksum_insensitive_to_row_order_and_sensitive_to_values(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "k string, v int"
    )
    cols = [F.col("k"), F.col("v").cast("string")]
    a = {
        r["bucket"]: (r["cnt"], r["xor_sig"], r["sum_sig"])
        for r in state_checksum(df, "k", cols, 4).collect()
    }
    b = {
        r["bucket"]: (r["cnt"], r["xor_sig"], r["sum_sig"])
        for r in state_checksum(
            df.orderBy(F.col("v").desc()).repartition(7), "k", cols, 4
        ).collect()
    }
    assert a == b
    mutated = df.withColumn(
        "v", F.when(F.col("k") == "b", 99).otherwise(F.col("v"))
    )
    assert (
        checksum_diff(df, mutated, "k", cols, 4).count() == 1
    )  # b's bucket only


def test_incremental_checksum_tracks_epochs(spark, tmp_path):
    """Maintained signature == full recompute after every epoch (the xor
    algebra: old image out, new image in; intermediate versions cancel)."""
    import pyarrow.parquet as pq

    from ticdc_spark.lake.verify import IncrementalChecksum

    spec = BinlogSpec(n_events=4_000, n_keys=300, seed=91)
    tbl = generate_binlog(spec)
    n = len(tbl)
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    cs = IncrementalChecksum(t, n_buckets=16)
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        sl = tbl.slice(cuts[i], cuts[i + 1] - cuts[i])
        pq.write_table(sl, str(tmp_path / f"e{i}.parquet"))
        ev = spark.read.parquet(str(tmp_path / f"e{i}.parquet"))
        replay_epoch(t, ev, f"e{i}")
        r = cs.sync()
        assert r["synced"] and r["mode"] in ("incremental", "empty")
        assert cs.verify() == [], f"epoch {i}"
    # re-sync of a covered range is a no-op (crash-replay safety)
    assert cs.sync() == {"synced": False, "version": cs.state["version"]}
    # a fresh object over the persisted state agrees
    cs2 = IncrementalChecksum(t, n_buckets=16)
    assert cs2.snapshot() == cs.snapshot()


def test_incremental_checksum_full_fallback_on_rewrite(spark, tmp_path):
    """A truncate (rewrite commit, invisible to the changelog) forces one
    full recompute; incremental maintenance resumes after."""
    import pyarrow.parquet as pq

    from ticdc_spark.lake.verify import IncrementalChecksum

    spec = BinlogSpec(n_events=2_000, n_keys=200, seed=92)
    tbl = generate_binlog(spec)
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    pq.write_table(tbl, str(tmp_path / "e.parquet"))
    replay_epoch(t, spark.read.parquet(str(tmp_path / "e.parquet")), "e0")
    cs = IncrementalChecksum(t, n_buckets=16)
    assert cs.sync()["synced"]
    assert cs.verify() == []
    t.truncate(epoch_id="wipe")
    r = cs.sync()
    assert r["mode"] == "full"
    assert cs.snapshot() == {}  # empty table → empty signature
    assert cs.verify() == []
    # post-wipe epochs go back to incremental
    pq.write_table(tbl.slice(0, 500), str(tmp_path / "e2.parquet"))
    replay_epoch(t, spark.read.parquet(str(tmp_path / "e2.parquet")), "e2")
    r = cs.sync()
    assert r["mode"] == "incremental"
    assert cs.verify() == []


def test_duplicate_pair_caught_by_count_not_xor(spark):
    """XOR alone is blind to a doubled row pair; cnt/sum are the guards."""
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    doubled = df.union(
        spark.createDataFrame([("a", 1), ("a", 1)], "k string, v int")
    )
    cols = [F.col("k"), F.col("v").cast("string")]
    bad = checksum_diff(df, doubled, "k", cols, 4).collect()
    assert len(bad) == 1
    r = bad[0]
    assert r["l_xor_sig"] == r["r_xor_sig"]  # the blind spot, by design
    assert r["l_cnt"] != r["r_cnt"]
