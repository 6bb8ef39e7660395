"""Resolved-ts CONTROL events (op='R'): the kv-client→puller resolved-ts
event analog (kv/client.go forwards per-region resolved ts; the puller's
frontier folds them exactly like data maxima). A heartbeat advances its
(table, part) span's frontier with NO rows — what keeps an idle span live:
an undeclared-traffic part or a whole idle table still reaches DDL
barriers, target_ts, and syncpoints."""

import glob
import os

import pyarrow.compute as pc
import pyarrow.parquet as pq

from ticdc_spark.lake.table import LakeTable
from ticdc_spark.oracle import apply_binlog, diff_tables
from ticdc_spark.streaming.changefeed import ChangeFeed
from ticdc_spark.streaming.multi import MultiTableChangeFeed
from ticdc_spark.testgen import BinlogSpec, write_binlog, write_resolved_events


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


def test_heartbeat_releases_idle_parts(spark, tmp_path):
    """A feed declaring a span universe larger than the traffic's part set
    stays pinned at -1 (frontier-initialized-with-all-spans) — until the
    idle parts heartbeat, after which the full prefix releases."""
    spec = BinlogSpec(n_events=4_000, n_keys=300, seed=11, n_parts=4)
    binlog_dir = str(tmp_path / "binlog")
    write_binlog(spec, binlog_dir, files_per_part=2)
    ev = pq.read_table(glob.glob(binlog_dir + "/*.parquet")[0])  # any file

    # universe = 8 parts, traffic only on 0..3: pinned, nothing applies
    t1 = LakeTable.create(spark, str(tmp_path / "t1"), n_buckets=4)
    cf = ChangeFeed(t1, binlog_dir, str(tmp_path / "ck1"), n_parts=8)
    s1 = cf.run_available()
    assert s1[-1]["resolved_ts"] == -1
    assert t1.read().count() == 0

    # same binlog + heartbeats for parts 4..7 at hi: releases everything
    full = pq.read_table(binlog_dir)
    hi = pc.max(full.column("commit_ts")).as_py()
    write_resolved_events(binlog_dir, {p: hi for p in range(4, 8)})
    t2 = LakeTable.create(spark, str(tmp_path / "t2"), n_buckets=4)
    cf2 = ChangeFeed(t2, binlog_dir, str(tmp_path / "ck2"), n_parts=8)
    s2 = cf2.run_available()
    resolved = s2[-1]["resolved_ts"]
    assert resolved > 0
    expected = apply_binlog(full, upto_ts=resolved)
    assert not diff_tables(expected, _lake_arrow(t2))
    # heartbeats are control flow, not rows: event counts equal the DATA
    # row count exactly (`full` was read before the heartbeat file landed)
    assert sum(s["events"] for s in s2) == full.num_rows


def test_heartbeat_unblocks_idle_table_data_ddl(spark, tmp_path):
    """Multi-table feed: tb has ZERO data — only heartbeats — and a
    truncate barrier. The data DDL waits for tb's OWN span frontier
    (per-table gating); the heartbeats advance it with no rows, the wipe
    applies, and ta replicates untouched."""
    stage_a = str(tmp_path / "sa")
    write_binlog(
        BinlogSpec(n_events=4_000, n_keys=300, seed=21, table="ta",
                   out_of_order=False, n_parts=4),
        stage_a, files_per_part=2, align_ts=True,
    )
    binlog = str(tmp_path / "binlog")
    os.makedirs(binlog)
    for f in glob.glob(stage_a + "/*.parquet"):
        os.link(f, os.path.join(binlog, "a-" + os.path.basename(f)))
    ev_a = pq.read_table(stage_a)
    hi = pc.max(ev_a.column("commit_ts")).as_py()
    trunc_ts = hi // 2
    write_resolved_events(
        binlog, {p: hi for p in range(4)}, table="tb", fname="b-resolved.parquet"
    )

    ddl_rows = [{"commit_ts": trunc_ts, "ddl_type": "truncate_table",
                 "table": "tb", "spec": "{}"}]
    ta = LakeTable.create(spark, str(tmp_path / "ta"), n_buckets=4)
    tb = LakeTable.create(spark, str(tmp_path / "tb"), n_buckets=4)
    cf = MultiTableChangeFeed(
        {"ta": ta, "tb": tb}, binlog, str(tmp_path / "ckpt"),
        max_files_per_trigger=3, ddl_rows=ddl_rows,
    )
    summaries = cf.run_available()
    resolved = summaries[-1]["resolved_ts"]
    assert resolved > trunc_ts
    # tb's wipe applied purely off heartbeats (no data ever)
    assert tb.schema_version == 1
    assert tb.read().count() == 0
    expected = apply_binlog(ev_a, upto_ts=resolved)
    assert not diff_tables(expected, _lake_arrow(ta))


def test_stale_heartbeat_is_ignored(spark, tmp_path):
    """A heartbeat at or below the released frontier is a no-op (monotone
    fold), never a late-event violation — even in strict mode."""
    spec = BinlogSpec(n_events=2_000, n_keys=200, seed=31, n_parts=4,
                      out_of_order=False)
    binlog_dir = str(tmp_path / "binlog")
    write_binlog(spec, binlog_dir, files_per_part=1, align_ts=True)
    full = pq.read_table(binlog_dir)
    lo = pc.min(full.column("commit_ts")).as_py()
    t1 = LakeTable.create(spark, str(tmp_path / "t1"), n_buckets=4)
    cf = ChangeFeed(
        t1, binlog_dir, str(tmp_path / "ck"), strict_watermarks=True
    )
    s1 = cf.run_available()
    resolved = s1[-1]["resolved_ts"]
    # stale heartbeats arrive AFTER the frontier passed them
    write_resolved_events(binlog_dir, {p: lo for p in range(4)},
                          fname="resolved-stale.parquet")
    s2 = cf.run_available()  # strict mode: data this late would panic
    assert s2 == [] or s2[-1]["resolved_ts"] == resolved
    expected = apply_binlog(full, upto_ts=resolved)
    assert not diff_tables(expected, _lake_arrow(t1))


def test_heartbeat_raw_mode(spark, tmp_path):
    """Heartbeats also flow through a RAW-mode feed (payload-json wire
    form): same release semantics, no decode of the NULL payload."""
    from ticdc_spark.testgen import binlog_to_raw, generate_binlog, write_raw_binlog

    spec = BinlogSpec(n_events=2_000, n_keys=200, seed=43, n_parts=4)
    typed = generate_binlog(spec)
    raw = binlog_to_raw(typed)
    binlog_dir = str(tmp_path / "binlog")
    write_raw_binlog(raw, binlog_dir, n_files=2)
    hi = pc.max(typed.column("commit_ts")).as_py()

    t1 = LakeTable.create(spark, str(tmp_path / "t1"), n_buckets=4)
    cf = ChangeFeed(t1, binlog_dir, str(tmp_path / "ck"), mode="raw", n_parts=8)
    s1 = cf.run_available()
    assert s1[-1]["resolved_ts"] == -1 and t1.read().count() == 0

    write_resolved_events(binlog_dir, {p: hi for p in range(4, 8)}, raw=True)
    s2 = cf.run_available()
    resolved = s2[-1]["resolved_ts"]
    assert resolved > 0
    expected = apply_binlog(typed, upto_ts=resolved)
    assert not diff_tables(expected, _lake_arrow(t1))


def test_heartbeat_only_batch_persists_frontier_across_restart(spark, tmp_path):
    """A heartbeat that advances a span in a batch with NO releasable data
    (everything else pending/idle) must survive a restart: the control file
    is consumed by the source and never re-read, so the advance has to ride
    a metadata-only commit — an in-memory-only fold would roll the frontier
    back and lose the delivered heartbeat forever (the reference checkpoints
    forwarded resolved-ts: processor position, cdc/processor/processor.go).
    """
    from tests.test_split_merge import _write_data_rows

    binlog = str(tmp_path / "binlog")
    rows = [(100, i, "I", f"d{i}", [i], p) for i, p in enumerate((0, 1, 2))]
    sa = _write_data_rows(binlog, rows, "a-00000.parquet")
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    ck = str(tmp_path / "ck")
    s1 = ChangeFeed(t, binlog, ck, n_parts=3).run_available()
    assert s1[-1]["resolved_ts"] == 100

    # heartbeat-only batch: part 0 → 900 (parts 1,2 still at 100, so the
    # frontier stays 100 and the batch is provably empty of releasable data)
    write_resolved_events(binlog, {0: 900}, fname="b-hb.parquet")
    t = LakeTable(spark, str(tmp_path / "t"))
    s2 = ChangeFeed(t, binlog, ck, n_parts=3).run_available()
    assert s2[-1]["resolved_ts"] == 100
    assert int(t.part_watermarks["0"]) == 900  # persisted, not in-memory

    # restart: the remaining heartbeats close the frontier — reaches 900
    # only if part 0's earlier advance survived the restart
    write_resolved_events(binlog, {1: 900, 2: 900}, fname="c-hb.parquet")
    t = LakeTable(spark, str(tmp_path / "t"))
    s3 = ChangeFeed(t, binlog, ck, n_parts=3).run_available()
    assert s3[-1]["resolved_ts"] == 900
    expected = apply_binlog(sa, upto_ts=900)
    assert not diff_tables(expected, _lake_arrow(t))
