"""Cyclic (bidirectional) replication round trip (pkg/cyclic):

A→B applies A's binlog into B and writes B-side marks; the applied rows
echo into B's binlog; B→A must replicate only B-origin rows (echo of A
filtered by B's marks); the B rows applied into A echo into A's binlog and
are filtered by the next A→B run. Both clusters converge to the union with
zero ping-pong."""

import os

import pytest
from pyspark.sql import functions as F

from ticdc_spark.lake.table import LakeTable
from ticdc_spark.streaming.changefeed import ChangeFeed

ROWS_SCHEMA = (
    "commit_ts long, seq long, table string, op string, doc_id string, "
    "tokens array<int>, n_tok int, source string, part int, schema_version int"
)


def _rows(prefix, ts0, n, src):
    # single stream partition: the watermark releases the whole set (a
    # multi-part stream would gate each part's tail above min(max_ts))
    return [
        (ts0 + i, i, "t", "I", f"{prefix}{i:03d}", [i, i + 1], 2, src, 0, 0)
        for i in range(n)
    ]


def _write(spark, rows, out_dir, name):
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    tbl = pa.table(
        {
            "commit_ts": pa.array([r[0] for r in rows], pa.int64()),
            "seq": pa.array([r[1] for r in rows], pa.int64()),
            "table": pa.array([r[2] for r in rows]),
            "op": pa.array([r[3] for r in rows]),
            "doc_id": pa.array([r[4] for r in rows]),
            "tokens": pa.array([r[5] for r in rows], pa.list_(pa.int32())),
            "n_tok": pa.array([r[6] for r in rows], pa.int32()),
            "source": pa.array([r[7] for r in rows]),
            "part": pa.array([r[8] for r in rows], pa.int32()),
            "schema_version": pa.array([r[9] for r in rows], pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, name))


def _feed(table, binlog, ckpt, replica_id, peer_id, src_marks, own_marks):
    return ChangeFeed(
        table,
        binlog,
        ckpt,
        cyclic={
            "replica_id": replica_id,
            "filter_replica_ids": [peer_id],
            "source_marks_dir": src_marks,
            "marks_dir": own_marks,
        },
    )


def test_bidirectional_round_trip_converges(spark, tmp_path):
    a_binlog = str(tmp_path / "a_binlog")
    b_binlog = str(tmp_path / "b_binlog")
    a_marks = str(tmp_path / "a_marks")
    b_marks = str(tmp_path / "b_marks")
    a_rows = _rows("a", 1000, 40, "clusterA")
    b_rows = _rows("b", 2000, 40, "clusterB")
    _write(spark, a_rows, a_binlog, "origin-a.parquet")
    _write(spark, b_rows, b_binlog, "origin-b.parquet")

    ta = LakeTable.create(spark, str(tmp_path / "lakeA"), n_buckets=4)
    tb = LakeTable.create(spark, str(tmp_path / "lakeB"), n_buckets=4)
    # bootstrap each lake with its own local writes (the local workload)
    import pyarrow as pa

    for t, rows in ((ta, a_rows), (tb, b_rows)):
        df = spark.createDataFrame(rows, ROWS_SCHEMA).select(
            "doc_id", "op", "commit_ts", "seq", "tokens", "n_tok", "source"
        )
        t.merge_epoch(df, "local-writes")

    # A→B round 1: applies A's rows into B, writes B marks (origin=1)
    fab = _feed(tb, a_binlog, str(tmp_path / "ckAB"), 1, 2, a_marks, b_marks)
    s1 = fab.run_available()
    assert sum(s["events"] for s in s1) == 40
    assert tb.read().count() == 80
    marks_b = spark.read.parquet(os.path.join(b_marks, "batch-*"))
    assert marks_b.count() == 40
    assert marks_b.select("replica_id").distinct().collect()[0][0] == 1

    # the applied rows echo into B's binlog
    _write(spark, a_rows, b_binlog, "echo-a.parquet")

    # B→A: must apply ONLY b-origin rows; the a-echo is filtered by B marks
    fba = _feed(ta, b_binlog, str(tmp_path / "ckBA"), 2, 1, b_marks, a_marks)
    fba.run_available()
    assert ta.read().count() == 80
    assert ta.read().filter(F.col("doc_id").startswith("a")).count() == 40
    marks_a = spark.read.parquet(os.path.join(a_marks, "batch-*"))
    # A's marks carry only the b-origin txns (origin 2), not the echo
    assert marks_a.count() == 40
    assert marks_a.select("replica_id").distinct().collect()[0][0] == 2

    # B's rows applied into A echo into A's binlog; A→B round 2 must be a no-op
    n_batches_r1 = len(s1)  # run_available returns the live summaries list
    _write(spark, b_rows, a_binlog, "echo-b.parquet")
    s2 = fab.run_available()
    new_rows = sum(s["events"] for s in s2[n_batches_r1:])
    assert new_rows == 40  # seen in the stream…
    assert tb.read().count() == 80  # …but zero re-applied (echo filtered)

    # convergence: both lakes hold the identical union
    a = {r["doc_id"]: (list(r["tokens"]), r["source"]) for r in ta.read().collect()}
    b = {r["doc_id"]: (list(r["tokens"]), r["source"]) for r in tb.read().collect()}
    assert a == b and len(a) == 80


def test_loopback_mark_raises(spark, tmp_path):
    binlog = str(tmp_path / "binlog")
    marks = str(tmp_path / "marks")
    rows = _rows("x", 100, 10, "s")
    _write(spark, rows, binlog, "data.parquet")
    # marks claiming the feed's OWN replica id → wiring bug, must refuse
    os.makedirs(os.path.join(marks, "batch-0000000000"), exist_ok=True)
    spark.createDataFrame(
        [(100 + i, 1) for i in range(10)], "commit_ts long, replica_id long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(marks, "batch-0000000000")
    )
    t = LakeTable.create(spark, str(tmp_path / "lake"), n_buckets=2)
    feed = _feed(t, binlog, str(tmp_path / "ck"), 1, 2, marks, str(tmp_path / "om"))
    with pytest.raises(Exception, match="loopback"):
        feed.run_available()
