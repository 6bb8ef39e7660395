"""Span-topology CONTROL events (op='S' split / op='M' merge,
model.TOPOLOGY_OPS): the kv-client region-change analog (cdc/kv/client.go —
on a TiKV region split/merge the old region's stream ENDS and the new
regions resubscribe at the old span's checkpoint; the puller frontier
absorbs the new spans, cdc/puller/frontier). Here the span universe is the
binlog's `part` ids: a split retires the parent and seeds its children at
the parent's position; a merge retires the parents and seeds the child at
min(parent positions). Data on a retired span in a LATER batch is fatal;
a stale heartbeat racing a committed retirement is dropped."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from ticdc_spark.lake.table import LakeTable
from ticdc_spark.oracle import apply_binlog, diff_tables
from ticdc_spark.streaming.changefeed import ChangeFeed
from ticdc_spark.testgen import (
    BinlogSpec,
    write_binlog,
    write_resolved_events,
    write_topology_events,
)


def _lake_arrow(table):
    pdf = table.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(pdf["doc_id"], pa.string()),
            "tokens": pa.array(
                [list(t) for t in pdf["tokens"]], pa.list_(pa.int32())
            ),
            "n_tok": pa.array(pdf["n_tok"], pa.int32()),
            "source": pa.array(pdf["source"], pa.string()),
        }
    )


def _write_data_rows(out_dir, rows, fname, table="target_tokens"):
    """rows: list of (commit_ts, seq, op, doc_id, tokens, part)."""
    cols = {
        "commit_ts": pa.array([r[0] for r in rows], pa.int64()),
        "seq": pa.array([r[1] for r in rows], pa.int64()),
        "table": pa.array([table] * len(rows), pa.string()),
        "op": pa.array([r[2] for r in rows], pa.string()),
        "doc_id": pa.array([r[3] for r in rows], pa.string()),
        "tokens": pa.array(
            [r[4] if r[2] != "D" else None for r in rows], pa.list_(pa.int32())
        ),
        "n_tok": pa.array(
            [len(r[4]) if r[2] != "D" else None for r in rows], pa.int32()
        ),
        "source": pa.array(
            ["web" if r[2] != "D" else None for r in rows], pa.string()
        ),
        "part": pa.array([r[5] for r in rows], pa.int32()),
        "schema_version": pa.array([0] * len(rows), pa.int32()),
    }
    tbl = pa.table(cols)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, fname)
    pq.write_table(tbl, path)
    return tbl


def _data_only(tbl):
    return tbl.filter(pc.is_in(tbl.column("op"), pa.array(["I", "U", "D"])))


def test_split_retires_parent_and_seeds_children(spark, tmp_path):
    """Split mid-stream: parent leaves the universe, children inherit its
    checkpoint, later traffic on the children keeps converging to the
    sequential oracle, and the persisted watermark map shows the new
    universe."""
    spec = BinlogSpec(n_events=3_000, n_keys=250, seed=5, n_parts=2,
                      out_of_order=False)
    binlog = str(tmp_path / "binlog")
    write_binlog(spec, binlog, files_per_part=1, align_ts=True)
    stage1 = pq.read_table(binlog)
    hi = pc.max(stage1.column("commit_ts")).as_py()
    # split part 1 -> children 2,3 (topology ts orders it; positions derive
    # from the parent's checkpoint, never from this ts)
    write_topology_events(binlog, [("S", 1, [2, 3], hi + 1)])

    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    cf = ChangeFeed(t, binlog, str(tmp_path / "ck"), n_parts=2,
                    dynamic_spans=True)
    s1 = cf.run_available()
    assert s1[-1]["span_changes"] == 1
    assert s1[-1]["spans_retired"] == [1]
    assert t.retired_parts == {"1"}
    wm = {int(k) for k in t.part_watermarks}
    assert wm == {0, 2, 3}
    # children seeded at the parent's position: the frontier did not regress
    res1 = s1[-1]["resolved_ts"]
    assert res1 > 0

    # stage 2: traffic arrives on the NEW spans (and the surviving part 0)
    rows = [
        (hi + 10, 10_000, "I", "doc_s2_a", [1, 2, 3], 2),
        (hi + 11, 10_001, "U", "doc_0", [9, 9], 3),
        (hi + 12, 10_002, "I", "doc_s2_b", [7], 0),
        (hi + 13, 10_003, "D", "doc_1", None, 2),
    ]
    stage2 = _write_data_rows(binlog, rows, "stage2-00000.parquet")
    s2 = cf.run_available()
    res2 = s2[-1]["resolved_ts"]
    assert res2 >= hi + 10
    full = pa.concat_tables([_data_only(stage1), stage2])
    expected = apply_binlog(full, upto_ts=res2)
    assert not diff_tables(expected, _lake_arrow(t))


def test_data_on_retired_span_is_fatal(spark, tmp_path):
    """The old region's stream ended at the split: data for the parent in a
    LATER batch violates the contract and must fail loudly."""
    spec = BinlogSpec(n_events=1_000, n_keys=100, seed=6, n_parts=2,
                      out_of_order=False)
    binlog = str(tmp_path / "binlog")
    write_binlog(spec, binlog, files_per_part=1, align_ts=True)
    hi = pc.max(pq.read_table(binlog).column("commit_ts")).as_py()
    write_topology_events(binlog, [("S", 1, [2, 3], hi + 1)])
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    cf = ChangeFeed(t, binlog, str(tmp_path / "ck"), n_parts=2,
                    dynamic_spans=True)
    cf.run_available()
    _write_data_rows(
        binlog, [(hi + 20, 20_000, "I", "late_doc", [1], 1)],
        "stage2-00000.parquet",
    )
    with pytest.raises(Exception, match="retired span"):
        cf.run_available()


def test_stale_heartbeat_on_retired_span_is_dropped(spark, tmp_path):
    """A resolved-ts heartbeat racing a committed retirement (in flight when
    the region went away) is silently ignored — it neither resurrects the
    span nor moves the frontier."""
    spec = BinlogSpec(n_events=1_000, n_keys=100, seed=7, n_parts=2,
                      out_of_order=False)
    binlog = str(tmp_path / "binlog")
    write_binlog(spec, binlog, files_per_part=1, align_ts=True)
    hi = pc.max(pq.read_table(binlog).column("commit_ts")).as_py()
    write_topology_events(binlog, [("S", 1, [2, 3], hi + 1)])
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    cf = ChangeFeed(t, binlog, str(tmp_path / "ck"), n_parts=2,
                    dynamic_spans=True)
    s1 = cf.run_available()
    res1 = s1[-1]["resolved_ts"]
    write_resolved_events(binlog, {1: hi + 500}, fname="stale-hb.parquet")
    s2 = cf.run_available()
    assert s2 == [] or s2[-1]["resolved_ts"] == res1
    assert t.retired_parts == {"1"}
    assert {int(k) for k in t.part_watermarks} == {0, 2, 3}


def test_merge_seeds_child_at_min_parent_position(spark, tmp_path):
    """Merge: the union span resubscribes at the FRONTIER of its
    constituents — min over parent checkpoints — so no undelivered parent
    data can land below the merged span's seed."""
    binlog = str(tmp_path / "binlog")
    # hand-built: part 0 ahead (ts 100..200), part 1 behind (ts 100..150)
    rows = [(100 + i, i, "I", f"a{i}", [i], 0) for i in range(0, 101, 10)]
    rows += [(100 + i, 1000 + i, "I", f"b{i}", [i], 1) for i in range(0, 51, 10)]
    stage1 = _write_data_rows(binlog, rows, "stage1-00000.parquet")
    write_topology_events(binlog, [("M", 5, [0, 1], 900)])
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    cf = ChangeFeed(t, binlog, str(tmp_path / "ck"), dynamic_spans=True)
    s1 = cf.run_available()
    assert t.retired_parts == {"0", "1"}
    wm = t.part_watermarks
    assert set(wm) == {"5"}
    # seeded at min(200, 150) = 150 — the lagging parent's checkpoint
    assert int(wm["5"]) == 150
    assert s1[-1]["resolved_ts"] == 150

    # post-merge traffic on the union span releases the rest
    rows2 = [(210, 5_000, "I", "c1", [1, 2], 5)]
    stage2 = _write_data_rows(binlog, rows2, "stage2-00000.parquet")
    s2 = cf.run_available()
    assert s2[-1]["resolved_ts"] == 210
    full = pa.concat_tables([stage1, stage2])
    expected = apply_binlog(full, upto_ts=210)
    assert not diff_tables(expected, _lake_arrow(t))


def test_static_feed_rejects_topology_events(spark, tmp_path):
    """A feed without dynamic_spans=True treats topology events as a fatal
    contract violation (never silently misfolds them as data)."""
    spec = BinlogSpec(n_events=500, n_keys=50, seed=8, n_parts=2,
                      out_of_order=False)
    binlog = str(tmp_path / "binlog")
    write_binlog(spec, binlog, files_per_part=1, align_ts=True)
    hi = pc.max(pq.read_table(binlog).column("commit_ts")).as_py()
    write_topology_events(binlog, [("S", 1, [2, 3], hi + 1)])
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    cf = ChangeFeed(t, binlog, str(tmp_path / "ck"), n_parts=2)
    with pytest.raises(Exception, match="dynamic_spans"):
        cf.run_available()


def test_chained_split_in_one_batch(spark, tmp_path):
    """Two topology events in ONE batch apply in (commit_ts, seq) order:
    parent -> (2,3), then 3 -> (4,5). Final universe {0,2,4,5}; every
    child chain inherits the original parent's checkpoint."""
    spec = BinlogSpec(n_events=1_000, n_keys=100, seed=9, n_parts=2,
                      out_of_order=False)
    binlog = str(tmp_path / "binlog")
    write_binlog(spec, binlog, files_per_part=1, align_ts=True)
    hi = pc.max(pq.read_table(binlog).column("commit_ts")).as_py()
    write_topology_events(
        binlog, [("S", 1, [2, 3], hi + 1), ("S", 3, [4, 5], hi + 2)]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    cf = ChangeFeed(t, binlog, str(tmp_path / "ck"), n_parts=2,
                    dynamic_spans=True)
    s1 = cf.run_available()
    assert s1[-1]["span_changes"] == 2
    assert t.retired_parts == {"1", "3"}
    assert {int(k) for k in t.part_watermarks} == {0, 2, 4, 5}


def test_topology_only_batch_persists_retirement(spark, tmp_path):
    """A batch holding ONLY the topology event (no data at all) still
    persists the universe change — the source never re-reads the file, so
    losing it would pin the frontier on the parent forever."""
    spec = BinlogSpec(n_events=1_000, n_keys=100, seed=10, n_parts=2,
                      out_of_order=False)
    binlog = str(tmp_path / "binlog")
    write_binlog(spec, binlog, files_per_part=1, align_ts=True)
    hi = pc.max(pq.read_table(binlog).column("commit_ts")).as_py()
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    cf = ChangeFeed(t, binlog, str(tmp_path / "ck"), n_parts=2,
                    dynamic_spans=True)
    cf.run_available()
    # second run: one file, one topology row, zero data
    write_topology_events(binlog, [("S", 1, [2, 3], hi + 1)])
    s2 = cf.run_available()
    assert s2[-1]["span_changes"] == 1
    assert t.retired_parts == {"1"}
    assert {int(k) for k in t.part_watermarks} == {0, 2, 3}
    # and a third, heartbeat-driven advance over the new spans still works
    write_resolved_events(binlog, {2: hi + 50, 3: hi + 60},
                          fname="hb-children.parquet")
    s3 = cf.run_available()
    assert s3[-1]["resolved_ts"] >= min(
        int(t.part_watermarks[k]) for k in t.part_watermarks
    )


def test_split_truncate_restart_composition(spark, tmp_path):
    """Composition soak: a split, a barrier-ordered data-wiping DDL
    (truncate — makes late events FATAL), a feed restart over the same
    checkpoint, and heartbeats releasing the post-split universe. The
    truncate defers until the CHILDREN's spans clear its barrier, the
    restarted feed inherits the retired universe, and the final state
    matches the post-truncate oracle."""
    binlog = str(tmp_path / "binlog")
    ddl_rows = [{"commit_ts": 300, "ddl_type": "truncate_table",
                 "table": "target_tokens", "spec": "{}"}]

    # run 1: part 0 ahead (ts..190), part 1 behind (ts..150); split 1->(2,3)
    rows1 = [(100 + 10 * i, i, "I", f"a{i}", [i], 0) for i in range(10)]
    rows1 += [(100 + 10 * i, 100 + i, "I", f"b{i}", [i], 1) for i in range(6)]
    _write_data_rows(binlog, rows1, "stage1-00000.parquet")
    write_topology_events(binlog, [("S", 1, [2, 3], 900)])
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    cf = ChangeFeed(t, binlog, str(tmp_path / "ck"), n_parts=2,
                    dynamic_spans=True, ddl_rows=ddl_rows)
    s1 = cf.run_available()
    assert s1[-1]["resolved_ts"] == 150  # children pinned at parent's pos
    assert t.schema_version == 0  # truncate barrier (300) still deferred

    # restart: a fresh feed over the same checkpoint inherits the retired
    # universe {1} and the children's positions
    rows2 = [(200 + 10 * i, 200 + i, "I", f"c{i}", [7, i], 0) for i in range(7)]
    rows2 += [(210, 300, "I", "d0", [1], 2), (310, 301, "I", "d1", [2], 2)]
    rows2 += [(205, 302, "I", "e0", [3], 3), (320, 303, "U", "a1", [9, 9], 3)]
    stage2 = _write_data_rows(binlog, rows2, "stage2-00000.parquet")
    write_resolved_events(binlog, {0: 400, 2: 400, 3: 400},
                          fname="hb-final.parquet")
    t2 = LakeTable(spark, str(tmp_path / "t"))
    cf2 = ChangeFeed(t2, binlog, str(tmp_path / "ck"), n_parts=2,
                     dynamic_spans=True, ddl_rows=ddl_rows)
    s2 = cf2.run_available()
    assert s2[-1]["resolved_ts"] == 400
    assert t2.schema_version == 1  # truncate executed past its barrier
    assert t2.retired_parts == {"1"}
    # final state = post-truncate events only (ts > 300), LWW-folded
    post = stage2.filter(pc.greater(stage2.column("commit_ts"), 300))
    expected = apply_binlog(post, upto_ts=400)
    assert not diff_tables(expected, _lake_arrow(t2))


def test_multi_feed_split_is_per_table(spark, tmp_path):
    """Multi-table feed: regions are per-table key ranges, so a split on
    (ta, part 1) rewrites ONLY ta's universe — tb keeps replicating its own
    part 1 untouched; both converge to their oracles."""
    from ticdc_spark.streaming.multi import MultiTableChangeFeed

    binlog = str(tmp_path / "binlog")
    rows_a = [(100 + 10 * i, i, "I", f"a{i}", [i], 0) for i in range(10)]
    rows_a += [(100 + 10 * i, 100 + i, "I", f"b{i}", [i], 1) for i in range(6)]
    sa1 = _write_data_rows(binlog, rows_a, "a1-00000.parquet", table="ta")
    rows_b = [(100 + 10 * i, 200 + i, "I", f"x{i}", [i, i], p)
              for i in range(9) for p in (0, 1)]
    sb1 = _write_data_rows(binlog, rows_b, "b1-00000.parquet", table="tb")
    write_topology_events(binlog, [("S", 1, [2, 3], 900)], table="ta")

    ta = LakeTable.create(spark, str(tmp_path / "ta"), n_buckets=4)
    tb = LakeTable.create(spark, str(tmp_path / "tb"), n_buckets=4)
    cf = MultiTableChangeFeed(
        {"ta": ta, "tb": tb}, binlog, str(tmp_path / "ck"),
        n_parts=2, dynamic_spans=True,
    )
    s1 = cf.run_available()
    assert s1[-1]["span_changes"] == 1
    assert s1[-1]["spans_retired"] == {"ta": [1]}
    assert ta.retired_parts == {"1"}
    assert tb.retired_parts == set()
    assert {int(k) for k in ta.part_watermarks} == {0, 2, 3}
    assert {int(k) for k in tb.part_watermarks} == {0, 1}

    # post-split traffic: ta on its children, tb STILL on part 1
    rows_a2 = [(300, 500, "I", "c0", [5], 2), (310, 501, "U", "a1", [9], 3)]
    sa2 = _write_data_rows(binlog, rows_a2, "a2-00000.parquet", table="ta")
    rows_b2 = [(305, 600, "I", "y0", [6, 6], 1)]
    sb2 = _write_data_rows(binlog, rows_b2, "b2-00000.parquet", table="tb")
    write_resolved_events(binlog, {0: 400, 2: 400, 3: 400}, table="ta",
                          fname="hb-a.parquet")
    write_resolved_events(binlog, {0: 400, 1: 400}, table="tb",
                          fname="hb-b.parquet")
    s2 = cf.run_available()
    assert s2[-1]["resolved_ts"] == 400
    exp_a = apply_binlog(pa.concat_tables([sa1, sa2]), upto_ts=400)
    exp_b = apply_binlog(pa.concat_tables([sb1, sb2]), upto_ts=400)
    assert not diff_tables(exp_a, _lake_arrow(ta))
    assert not diff_tables(exp_b, _lake_arrow(tb))


def test_multi_feed_static_rejects_topology(spark, tmp_path):
    """A multi feed without dynamic_spans=True treats topology events as a
    fatal contract violation."""
    from ticdc_spark.streaming.multi import MultiTableChangeFeed

    binlog = str(tmp_path / "binlog")
    _write_data_rows(
        binlog, [(100, 1, "I", "a", [1], 0)], "a-00000.parquet", table="ta"
    )
    write_topology_events(binlog, [("S", 0, [1, 2], 900)], table="ta")
    ta = LakeTable.create(spark, str(tmp_path / "ta"), n_buckets=4)
    cf = MultiTableChangeFeed({"ta": ta}, binlog, str(tmp_path / "ck"))
    with pytest.raises(Exception, match="dynamic_spans"):
        cf.run_available()


@pytest.mark.parametrize("seed", [3, 17, 99])
def test_randomized_topology_matches_simulator(spark, tmp_path, seed):
    """Randomized interleavings of data / heartbeats / splits / merges /
    stale-retired heartbeats, driven batch-by-batch through
    ChangeFeed._process_batch, against a pure-python span-map simulator:
    after every batch the persisted watermark map, retired checkpoints and
    resolved frontier must equal the simulator's, and the final table
    state must equal the LWW fold of the released data prefix."""
    import random

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    rng = random.Random(seed)
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    cf = ChangeFeed(t, str(tmp_path / "nolog"), str(tmp_path / "ck"),
                    n_parts=3, dynamic_spans=True)

    live = {0: -1, 1: -1, 2: -1}   # span -> position (simulator)
    retired: dict[int, int] = {}   # span -> retirement checkpoint
    next_child = 10
    ts = 100
    seq = 0
    all_data: list[tuple] = []     # (commit_ts, seq, op, doc_id, tokens)

    for batch_id in range(5):
        rows = []
        # data on live spans (per-span increasing ts)
        for p in list(live):
            for _ in range(rng.randrange(0, 4)):
                ts += rng.randrange(1, 5)
                seq += 1
                op = rng.choice(["I", "I", "U", "D"])
                doc = f"d{rng.randrange(0, 30)}"
                toks = None if op == "D" else [rng.randrange(0, 99)]
                rows.append(Row(
                    commit_ts=ts, seq=seq, table="target_tokens", op=op,
                    doc_id=doc, tokens=toks,
                    n_tok=None if toks is None else len(toks),
                    source=None if toks is None else "web",
                    part=p, schema_version=0,
                ))
                all_data.append((ts, seq, op, doc, toks))
                live[p] = max(live[p], ts)
        # heartbeats (sometimes stale) on live spans
        for p in list(live):
            if rng.random() < 0.5:
                hb = ts + rng.randrange(-10, 10)
                rows.append(Row(
                    commit_ts=hb, seq=0, table="target_tokens", op="R",
                    doc_id="", tokens=None, n_tok=None, source=None,
                    part=p, schema_version=0,
                ))
                live[p] = max(live[p], hb)
        # stale heartbeat on an already-retired span: must be dropped
        if retired and rng.random() < 0.5:
            p = rng.choice(list(retired))
            rows.append(Row(
                commit_ts=ts + 50, seq=0, table="target_tokens", op="R",
                doc_id="", tokens=None, n_tok=None, source=None,
                part=p, schema_version=0,
            ))
        # topology: one split or merge per batch (sometimes none)
        roll = rng.random()
        if roll < 0.45 and live:
            p = rng.choice(list(live))
            c1, c2 = next_child, next_child + 1
            next_child += 2
            rows.append(Row(
                commit_ts=ts + 1, seq=seq + 1, table="target_tokens",
                op="S", doc_id=f"{c1},{c2}", tokens=None, n_tok=None,
                source=None, part=p, schema_version=0,
            ))
            pos = live.pop(p)
            retired[p] = pos
            live[c1] = pos
            live[c2] = pos
        elif roll < 0.7 and len(live) >= 2:
            pa_, pb = rng.sample(list(live), 2)
            c = next_child
            next_child += 1
            rows.append(Row(
                commit_ts=ts + 1, seq=seq + 1, table="target_tokens",
                op="M", doc_id=f"{pa_},{pb}", tokens=None, n_tok=None,
                source=None, part=c, schema_version=0,
            ))
            a, b = live.pop(pa_), live.pop(pb)
            retired[pa_] = a
            retired[pb] = b
            live[c] = min(a, b)
        if not rows:
            continue
        batch = spark.createDataFrame(rows)
        cf._process_batch(batch.select(
            "commit_ts", "seq", "table", "op", "doc_id",
            F.col("tokens").cast("array<int>").alias("tokens"),
            F.col("n_tok").cast("int").alias("n_tok"),
            "source",
            F.col("part").cast("int").alias("part"),
            F.col("schema_version").cast("int").alias("schema_version"),
        ), batch_id)
        # simulator vs persisted state after every batch
        assert {int(k): v for k, v in t.part_watermarks.items()} == live, (
            batch_id, live)
        assert {int(k): v for k, v in t.retired_positions.items()} == retired
        resolved = min(live.values()) if live else -1
        assert cf.batch_summaries[-1]["resolved_ts"] == resolved

    # final state = LWW winners of the released data prefix, minus deletes
    resolved = min(live.values()) if live else -1
    winners: dict[str, tuple] = {}
    for cts, sq, op, doc, toks in all_data:
        if cts > resolved:
            continue
        rank = (cts, sq, 0 if op == "D" else 1)
        if doc not in winners or rank > winners[doc][0]:
            winners[doc] = (rank, op, toks)
    expect = {
        d: tuple(tk) for d, (r, o, tk) in winners.items() if o != "D"
    }
    got = {r["doc_id"]: tuple(r["tokens"]) for r in t.read().collect()}
    assert got == expect


def test_split_batch_crash_replay_is_idempotent(spark, tmp_path):
    """Crash between the topology batch's commits and its streaming
    checkpoint: foreachBatch re-delivers the same files with the same id.
    The replayed batch re-offers the parent's data AND the split — both
    must no-op (retire-again is absorbed, child seeds are monotone max,
    epoch ids dedupe the merges)."""
    spec = BinlogSpec(n_events=2_000, n_keys=150, seed=12, n_parts=2,
                      out_of_order=False)
    binlog = str(tmp_path / "binlog")
    write_binlog(spec, binlog, files_per_part=1, align_ts=True)
    hi = pc.max(pq.read_table(binlog).column("commit_ts")).as_py()
    write_topology_events(binlog, [("S", 1, [2, 3], hi + 1)])
    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    cf = ChangeFeed(t, binlog, str(tmp_path / "ck"), n_parts=2,
                    dynamic_spans=True)
    s1 = cf.run_available()
    state = {r["doc_id"]: list(r["tokens"]) for r in t.read().collect()}
    wm1, retired1 = dict(t.part_watermarks), set(t.retired_parts)

    files = sorted(glob.glob(os.path.join(binlog, "*.parquet")))
    batch = spark.read.parquet(*files)
    t2 = LakeTable(spark, str(tmp_path / "t"))
    cf2 = ChangeFeed(t2, binlog, str(tmp_path / "ck"), n_parts=2,
                     dynamic_spans=True)
    cf2._process_batch(batch, 0)  # replay of batch 0 — must not raise
    assert dict(t2.part_watermarks) == wm1
    assert set(t2.retired_parts) == retired1
    state2 = {r["doc_id"]: list(r["tokens"]) for r in t2.read().collect()}
    assert state2 == state
    assert s1[-1]["spans_retired"] == [1]


def test_lifecycle_created_table_split_drop_restart(spark, tmp_path):
    """Lifecycle × topology interplay: a table CREATED by an in-stream DDL
    acquires its own dynamic span universe — a later split retires its
    parent span (retirement persisted across a restart), post-split data
    lands on the children, and the drop_table window freezes its state; the
    statically-configured sibling's universe is untouched throughout.
    Reference analog: schema_storage create/drop (cdc/entry/schema_storage
    .go:539-624) composed with kv-client region splits (cdc/kv/client.go)."""
    from ticdc_spark.streaming.multi import MultiTableChangeFeed

    binlog = str(tmp_path / "binlog")
    rows_a = [(100 + 10 * i, i, "I", f"a{i}", [i], i % 2) for i in range(12)]
    sa = _write_data_rows(binlog, rows_a, "a1-00000.parquet", table="ta")
    fields = [
        {"id": 1, "name": "doc_id", "type": "string"},
        {"id": 2, "name": "tokens", "type": "array<int>"},
        {"id": 3, "name": "n_tok", "type": "int"},
        {"id": 4, "name": "source", "type": "string"},
    ]
    ddl_rows = [
        {"commit_ts": 150, "ddl_type": "create_table", "table": "tc",
         "spec": {"fields": fields, "key": "doc_id", "n_buckets": 4}},
        {"commit_ts": 800, "ddl_type": "drop_table", "table": "tc",
         "spec": {}},
    ]
    rows_c1 = [(200 + 10 * i, 50 + i, "I", f"c{i}", [i, i], i % 2)
               for i in range(10)]
    sc1 = _write_data_rows(binlog, rows_c1, "c1-00000.parquet", table="tc")
    # split the CREATED table's part 1 into {2, 3}
    write_topology_events(binlog, [("S", 1, [2, 3], 500)], table="tc",
                          fname="d1-topo.parquet")

    LakeTable.create(spark, str(tmp_path / "ta"), n_buckets=4)
    ck = str(tmp_path / "ck")

    def mk_feed():
        return MultiTableChangeFeed(
            {"ta": LakeTable(spark, str(tmp_path / "ta"))}, binlog, ck,
            n_parts=2, dynamic_spans=True, ddl_rows=ddl_rows,
            table_root=str(tmp_path / "created"), max_files_per_trigger=1,
        )

    mk_feed().run_available()
    tc = LakeTable(spark, str(tmp_path / "created" / "tc"))
    assert tc.retired_parts == {"1"}
    assert {int(k) for k in tc.part_watermarks} == {0, 2, 3}
    assert LakeTable(spark, str(tmp_path / "ta")).retired_parts == set()

    # ---- restart: children data, then heartbeats carry past the drop ----
    rows_c2 = [(600, 90, "I", "cx", [7], 2), (610, 91, "U", "c1", [8, 8], 3),
               (620, 92, "D", "c2", [0], 0)]
    sc2 = _write_data_rows(binlog, rows_c2, "e1-00000.parquet", table="tc")
    write_resolved_events(binlog, {0: 900, 2: 900, 3: 900}, table="tc",
                          fname="f1-hb.parquet")
    write_resolved_events(binlog, {0: 900, 1: 900}, table="ta",
                          fname="g1-hb.parquet")
    s2 = mk_feed().run_available()
    assert s2[-1]["resolved_ts"] == 900  # past the drop: tc frozen at 800

    exp_a = apply_binlog(sa, upto_ts=900)
    assert not diff_tables(
        exp_a, _lake_arrow(LakeTable(spark, str(tmp_path / "ta")))
    )
    ev_c = pa.concat_tables([sc1, sc2])
    win = ev_c.filter(
        pc.and_(pc.greater(ev_c.column("commit_ts"), 150),
                pc.less_equal(ev_c.column("commit_ts"), 800))
    )
    exp_c = apply_binlog(win, upto_ts=900)
    tc = LakeTable(spark, str(tmp_path / "created" / "tc"))
    assert not diff_tables(exp_c, _lake_arrow(tc))
