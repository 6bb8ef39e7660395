"""Chaos compositions: table scheduling × span topology × crash replay.

The reference's chaos suites (tests/availability/, tests/changefeed_
reconstruct/) exercise exactly these overlaps — an owner move racing region
splits, a capture dying around a topology change, job resume after an owner
restart. Each case's invariant is the hard one: final lake state ≡ the
sequential oracle (oracle.apply_binlog) at the converged frontier.

Round-4 engine change under test: move_table across DYNAMIC-span captures
is now supported — the source skips a stopped table's post-stop topology
(multi.py topo filter), so it never commits to a manifest the target owns;
mixed span modes stay rejected, and adoption refuses a split/merge inside
the catch-up range (unrecoverable by a flat scan).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ticdc_spark.lake.table import LakeTable
from ticdc_spark.oracle import apply_binlog, diff_tables
from ticdc_spark.streaming.multi import MultiTableChangeFeed
from ticdc_spark.streaming.scheduler import TableScheduler
from ticdc_spark.testgen import write_resolved_events, write_topology_events


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


def _write_data_rows(out_dir, rows, fname, table):
    """rows: list of (commit_ts, seq, op, doc_id, tokens, part)."""
    cols = {
        "commit_ts": pa.array([r[0] for r in rows], pa.int64()),
        "seq": pa.array([r[1] for r in rows], pa.int64()),
        "table": pa.array([table] * len(rows), pa.string()),
        "op": pa.array([r[2] for r in rows], pa.string()),
        "doc_id": pa.array(
            [r[3] for r in rows], pa.string()
        ),
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
    pq.write_table(tbl, os.path.join(out_dir, fname))
    return tbl


def _mk_tables(spark, tmp_path, names=("ta", "tb", "tc")):
    return {
        t: LakeTable.create(spark, str(tmp_path / t), n_buckets=4)
        for t in names
    }


def _feed(spark, tmp_path, tables, ck, **kw):
    return MultiTableChangeFeed(
        {n: LakeTable(spark, str(tmp_path / n)) for n in tables},
        str(tmp_path / "binlog"), str(tmp_path / ck),
        n_parts=2, dynamic_spans=True, max_files_per_trigger=10,
        spark=spark, **kw,
    )


def _wave1(binlog):
    """Three tables, parts {0,1}, heartbeats pinning resolved to 400."""
    out = {}
    for t, base_seq in (("ta", 0), ("tb", 1000), ("tc", 2000)):
        rows = [
            (100 + 10 * i, base_seq + i, "I", f"{t}_d{i}", [i, i], i % 2)
            for i in range(12)
        ]
        out[t] = _write_data_rows(binlog, rows, f"{t}-w1.parquet", t)
        write_resolved_events(
            binlog, {0: 400, 1: 400}, table=t, fname=f"{t}-hb1.parquet"
        )
    return out


def test_move_then_split_on_target(spark, tmp_path):
    """Move tb c1→c2 (dynamic-span captures), THEN tb's part 1 splits into
    {2,3} with post-split data — the topology lands on the TARGET. Every
    table converges to its oracle; the retirement and new universe are on
    tb's manifest; the source never touched it post-move."""
    binlog = str(tmp_path / "binlog")
    _mk_tables(spark, tmp_path)
    w1 = _wave1(binlog)
    c1 = _feed(spark, tmp_path, ("ta", "tb"), "ck1")
    c2 = _feed(spark, tmp_path, ("tc",), "ck2")
    sched = TableScheduler({"c1": c1, "c2": c2}, str(tmp_path / "sched.json"))
    sched.tick()
    job = sched.move_table("tb", "c1", "c2")
    sched.tick()
    assert job["status"] == "finished"
    boundary = job["boundary"]
    assert boundary == 400

    # the split arrives AFTER the move, above the boundary — target's world
    write_topology_events(binlog, [("S", 1, [2, 3], 500)], table="tb",
                          fname="tb-topo.parquet")
    w2 = {}
    w2["tb"] = _write_data_rows(
        binlog,
        [(600, 5000, "I", "tb_post_a", [9], 2),
         (610, 5001, "U", "tb_d1", [7, 7, 7], 3),
         (620, 5002, "D", "tb_d3", None, 2)],
        "tb-w2.parquet", "tb",
    )
    w2["ta"] = _write_data_rows(
        binlog, [(605, 5100, "I", "ta_post", [4], 0)], "ta-w2.parquet", "ta"
    )
    w2["tc"] = _write_data_rows(
        binlog, [(606, 5200, "U", "tc_d0", [8], 1)], "tc-w2.parquet", "tc"
    )
    for t in ("ta", "tb", "tc"):
        parts = {0, 1} if t != "tb" else {0, 2, 3}
        write_resolved_events(binlog, {p: 900 for p in parts}, table=t,
                              fname=f"{t}-hb2.parquet")
    s = sched.tick()
    assert s["c2"][-1]["resolved_ts"] == 900

    tb = LakeTable(spark, str(tmp_path / "tb"))
    assert tb.retired_parts == {"1"}
    assert {int(k) for k in tb.part_watermarks} == {0, 2, 3}
    for t in ("ta", "tb", "tc"):
        full = pa.concat_tables([w1[t], w2[t]])
        exp = apply_binlog(full, upto_ts=900)
        got = _lake_arrow(LakeTable(spark, str(tmp_path / t)))
        assert not diff_tables(exp, got), t


def test_split_then_move_preserves_universe(spark, tmp_path):
    """tb splits on the SOURCE (retirement committed), then moves: the
    handoff clamp preserves retirement checkpoints, the target continues
    on the children, and post-move traffic converges."""
    binlog = str(tmp_path / "binlog")
    _mk_tables(spark, tmp_path)
    w1 = _wave1(binlog)
    write_topology_events(binlog, [("S", 1, [2, 3], 300)], table="tb",
                          fname="tb-topo.parquet")
    c1 = _feed(spark, tmp_path, ("ta", "tb"), "ck1")
    c2 = _feed(spark, tmp_path, ("tc",), "ck2")
    sched = TableScheduler({"c1": c1, "c2": c2}, str(tmp_path / "sched.json"))
    sched.tick()
    tb = LakeTable(spark, str(tmp_path / "tb"))
    assert tb.retired_parts == {"1"}

    job = sched.move_table("tb", "c1", "c2")
    sched.tick()
    assert job["status"] == "finished"
    tb = LakeTable(spark, str(tmp_path / "tb"))
    assert tb.retired_parts == {"1"}, "retirement lost at the handoff clamp"
    assert {int(k) for k in tb.part_watermarks} == {0, 2, 3}

    w2 = _write_data_rows(
        binlog,
        [(600, 6000, "I", "tb_child", [1], 3),
         (610, 6001, "U", "tb_d0", [2, 2], 2)],
        "tb-w2.parquet", "tb",
    )
    write_resolved_events(binlog, {0: 900, 2: 900, 3: 900}, table="tb",
                          fname="tb-hb2.parquet")
    for t in ("ta", "tc"):
        write_resolved_events(binlog, {0: 900, 1: 900}, table=t,
                              fname=f"{t}-hb2.parquet")
    s = sched.tick()
    assert s["c2"][-1]["resolved_ts"] == 900
    exp = apply_binlog(pa.concat_tables([w1["tb"], w2]), upto_ts=900)
    assert not diff_tables(exp, _lake_arrow(LakeTable(spark, str(tmp_path / "tb"))))


def test_scheduler_crash_between_phases_then_split(spark, tmp_path):
    """Owner crash BETWEEN move phases (remove persisted as status=deleted,
    add never dispatched), composed with a split arriving during the
    outage: the restarted scheduler finishes the add from the state file,
    the target then applies the split, and tb converges to its oracle."""
    binlog = str(tmp_path / "binlog")
    _mk_tables(spark, tmp_path)
    w1 = _wave1(binlog)
    c1 = _feed(spark, tmp_path, ("ta", "tb"), "ck1")
    c2 = _feed(spark, tmp_path, ("tc",), "ck2")
    state = str(tmp_path / "sched.json")
    sched = TableScheduler({"c1": c1, "c2": c2}, state)
    sched.tick()
    sched.move_table("tb", "c1", "c2")

    # crash injection: phase 2's add_table dies after phase 1 persisted
    orig_add = c2.add_table

    def boom(*a, **k):
        raise RuntimeError("capture lost between move phases")

    c2.add_table = boom
    with pytest.raises(RuntimeError, match="between move phases"):
        sched.tick()
    c2.add_table = orig_add
    import json as j

    persisted = j.load(open(state))["jobs"]
    assert persisted[0]["status"] == "deleted"  # phase 1 durable

    # the outage: a split + data arrive while no owner is running
    write_topology_events(binlog, [("S", 1, [2, 3], 500)], table="tb",
                          fname="tb-topo.parquet")
    w2 = _write_data_rows(
        binlog, [(600, 7000, "I", "tb_new", [5], 2)], "tb-w2.parquet", "tb"
    )
    write_resolved_events(binlog, {0: 900, 2: 900, 3: 900}, table="tb",
                          fname="tb-hb2.parquet")
    for t in ("ta", "tc"):
        write_resolved_events(binlog, {0: 900, 1: 900}, table=t,
                              fname=f"{t}-hb2.parquet")

    # restart: fresh captures over the same checkpoints + the state file
    c1b = _feed(spark, tmp_path, ("ta", "tb"), "ck1")
    c2b = _feed(spark, tmp_path, ("tc",), "ck2")
    sched2 = TableScheduler({"c1": c1b, "c2": c2b}, state)
    assert "tb" in c1b.stop_ts  # remove re-applied from the job log
    s = sched2.tick()
    assert sched2.jobs[0]["status"] == "finished"
    assert "tb" in c2b.tables
    assert s["c2"][-1]["resolved_ts"] == 900
    tb = LakeTable(spark, str(tmp_path / "tb"))
    assert tb.retired_parts == {"1"}
    exp = apply_binlog(pa.concat_tables([w1["tb"], w2]), upto_ts=900)
    assert not diff_tables(exp, _lake_arrow(tb))


def test_adopt_after_split_commit(spark, tmp_path):
    """Capture c1 dies AFTER committing tb's split (retirement durable in
    the manifest, the crash window right after the topology batch's lake
    commit): adoption into a dynamic-span survivor preserves the span
    universe and post-split traffic converges on the adopter."""
    binlog = str(tmp_path / "binlog")
    _mk_tables(spark, tmp_path)
    w1 = _wave1(binlog)
    write_topology_events(binlog, [("S", 1, [2, 3], 300)], table="tb",
                          fname="tb-topo.parquet")
    c1 = _feed(spark, tmp_path, ("ta", "tb"), "ck1")
    c2 = _feed(spark, tmp_path, ("tc",), "ck2")
    state = str(tmp_path / "sched.json")
    sched = TableScheduler({"c1": c1, "c2": c2}, state)
    sched.tick()
    assert LakeTable(spark, str(tmp_path / "tb")).retired_parts == {"1"}

    # c1 dies; survivors adopt (fresh scheduler, dead capture cold)
    c1_cold = _feed(spark, tmp_path, ("ta", "tb"), "ck1")
    c2b = _feed(spark, tmp_path, ("tc",), "ck2")
    sched2 = TableScheduler({"c1": c1_cold, "c2": c2b}, state)
    jobs = sched2.adopt_orphans("c1")
    assert sorted(j["table"] for j in jobs) == ["ta", "tb"]
    assert all(j["status"] == "finished" for j in jobs)
    tb = LakeTable(spark, str(tmp_path / "tb"))
    assert tb.retired_parts == {"1"}, "span universe lost in adoption"

    w2 = _write_data_rows(
        binlog,
        [(600, 8000, "I", "tb_c2", [3, 3], 3),
         (610, 8001, "D", "tb_d0", None, 2)],
        "tb-w2.parquet", "tb",
    )
    write_resolved_events(binlog, {0: 900, 2: 900, 3: 900}, table="tb",
                          fname="tb-hb2.parquet")
    for t in ("ta", "tc"):
        write_resolved_events(binlog, {0: 900, 1: 900}, table=t,
                              fname=f"{t}-hb2.parquet")
    s = sched2.tick()
    assert s["c2"][-1]["resolved_ts"] == 900
    exp = apply_binlog(pa.concat_tables([w1["tb"], w2]), upto_ts=900)
    assert not diff_tables(exp, _lake_arrow(LakeTable(spark, str(tmp_path / "tb"))))


def test_adopt_refuses_topology_in_catchup_range(spark, tmp_path):
    """A split the dead capture never processed but the survivor already
    released past is unrecoverable by the flat catch-up scan — adoption
    must refuse it deterministically (same contract as the DDL-barrier
    refusal), not silently drop the topology."""
    binlog = str(tmp_path / "binlog")
    _mk_tables(spark, tmp_path, names=("tb", "tc"))
    w1 = _wave1(binlog)  # writes ta too; harmless extra files
    c1 = _feed(spark, tmp_path, ("tb",), "ck1")
    c2 = _feed(spark, tmp_path, ("tc",), "ck2")
    c1.run_available()  # c1 sees wave 1 only, then "dies"
    # the split + a heartbeat land; ONLY the survivor drains them
    write_topology_events(binlog, [("S", 1, [2, 3], 500)], table="tb",
                          fname="tb-topo.parquet")
    write_resolved_events(binlog, {0: 600, 1: 600}, table="tc",
                          fname="tc-hb2.parquet")
    c2.run_available()
    assert c2.batch_summaries[-1]["resolved_ts"] == 600
    sched = TableScheduler({"c1": c1, "c2": c2}, str(tmp_path / "sched.json"))
    with pytest.raises(ValueError, match="split/merge inside the catch-up"):
        sched.adopt_orphans("c1")
    # refusal must leave the capture set intact (no half-committed state)
    assert "c1" in sched.captures


def test_mixed_span_mode_move_rejected(spark, tmp_path):
    binlog = str(tmp_path / "binlog")
    _mk_tables(spark, tmp_path)
    _wave1(binlog)
    c1 = _feed(spark, tmp_path, ("ta", "tb"), "ck1")  # dynamic
    c2 = MultiTableChangeFeed(
        {"tc": LakeTable(spark, str(tmp_path / "tc"))},
        binlog, str(tmp_path / "ck2"), n_parts=2, dynamic_spans=False,
    )
    sched = TableScheduler({"c1": c1, "c2": c2}, str(tmp_path / "sched.json"))
    sched.tick()
    with pytest.raises(ValueError, match="matching span modes"):
        sched.move_table("tb", "c1", "c2")


@pytest.mark.parametrize("seed", [4, 5, 7, 23])
def test_randomized_scheduler_topology_soak(spark, tmp_path, seed):
    """Randomized soak over the full composition surface: waves of data +
    heartbeats interleaved with random splits, random table moves between
    two dynamic-span captures, and random owner crash-rebuilds (fresh
    capture objects over the same checkpoints + scheduler state). Invariant
    after the final wave: every table's lake state equals the sequential
    LWW oracle of everything released — regardless of which capture applied
    which slice or when the owner restarted."""
    import random

    rng = random.Random(seed)
    binlog = str(tmp_path / "binlog")
    os.makedirs(binlog)
    names = ("ta", "tb", "tc")
    _mk_tables(spark, tmp_path, names=names)

    # per-table mirror of the span universe; data rows accumulated per table
    live = {t: {0: True, 1: True} for t in names}
    next_child = {t: 10 for t in names}
    all_rows: dict[str, list] = {t: [] for t in names}
    seq = 0
    assign = {"ta": "c1", "tb": "c1", "tc": "c2"}

    def mk_captures():
        c1 = _feed(spark, tmp_path, [t for t, c in assign.items() if c == "c1"], "ck1")
        c2 = _feed(spark, tmp_path, [t for t, c in assign.items() if c == "c2"], "ck2")
        return {"c1": c1, "c2": c2}

    sched = TableScheduler(mk_captures(), str(tmp_path / "sched.json"))
    hb = 0
    for wave in range(6):
        base = 1000 * (wave + 1)
        # maybe split one live span of one table (ts before this wave's data)
        if rng.random() < 0.5:
            t = rng.choice(names)
            parent = rng.choice([p for p, ok in live[t].items() if ok])
            c1_, c2_ = next_child[t], next_child[t] + 1
            next_child[t] += 2
            write_topology_events(
                binlog, [("S", parent, [c1_, c2_], base + 5)], table=t,
                fname=f"topo-{t}-{wave}.parquet",
            )
            live[t][parent] = False
            live[t][c1_] = live[t][c2_] = True
        # data on live spans
        for t in names:
            rows = []
            for _ in range(rng.randrange(3, 9)):
                seq += 1
                op = rng.choice(["I", "I", "U", "D"])
                doc = f"{t}_d{rng.randrange(0, 25)}"
                toks = [rng.randrange(0, 9)] if op != "D" else None
                p = rng.choice([p for p, ok in live[t].items() if ok])
                rows.append(
                    (base + 10 + rng.randrange(0, 200), seq, op, doc, toks, p)
                )
            if rows:
                tbl = _write_data_rows_soak(binlog, rows, f"{t}-w{wave}.parquet", t)
                all_rows[t].append(tbl)
        # heartbeats pin this wave's frontier for every live span
        hb = base + 400
        for t in names:
            write_resolved_events(
                binlog,
                {p: hb for p, ok in live[t].items() if ok},
                table=t, fname=f"hb-{t}-{wave}.parquet",
            )
        s = sched.tick()
        vals = [summ[-1]["resolved_ts"] for summ in s.values() if summ]
        if vals:
            last_res = max(vals)
        # random move of a live table between captures. A move right
        # after a crash-rebuild legitimately DEFERS (fresh captures have
        # no resolved frontier yet) — the job stays queued and a later
        # tick executes it, so the assignment mirror is derived from the
        # scheduler's own job log, never assumed.
        pending = {
            j["table"] for j in sched.jobs if j["status"] != "finished"
        }
        if rng.random() < 0.5:
            t = rng.choice([n for n in names if n not in pending] or names)
            if t not in pending:
                src = assign[t]
                dst = "c2" if src == "c1" else "c1"
                try:
                    sched.move_table(t, src, dst)
                except ValueError:
                    pass  # stopped on src from a prior move this run
                else:
                    sched.tick()

        def sync_assign():
            for j in sched.jobs:
                if j.get("kind") != "adopt" and j["status"] == "finished"                         and "note" not in j:
                    assign[j["table"]] = j["to"]

        sync_assign()
        # random owner crash: rebuild captures + scheduler from disk
        if rng.random() < 0.4:
            sched = TableScheduler(mk_captures(), str(tmp_path / "sched.json"))
            sync_assign()

    s = sched.tick()
    vals = [summ[-1]["resolved_ts"] for summ in s.values() if summ]
    final = max(vals) if vals else last_res
    assert final == hb
    for t in names:
        exp = apply_binlog(pa.concat_tables(all_rows[t]), upto_ts=final)
        got = _lake_arrow(LakeTable(spark, str(tmp_path / t)))
        assert not diff_tables(exp, got), (t, seed)


def _write_data_rows_soak(out_dir, rows, fname, table):
    # deletes carry no payload (D rows: tokens None)
    cols = {
        "commit_ts": pa.array([r[0] for r in rows], pa.int64()),
        "seq": pa.array([r[1] for r in rows], pa.int64()),
        "table": pa.array([table] * len(rows), pa.string()),
        "op": pa.array([r[2] for r in rows], pa.string()),
        "doc_id": pa.array([r[3] for r in rows], pa.string()),
        "tokens": pa.array(
            [r[4] for r in rows], pa.list_(pa.int32())
        ),
        "n_tok": pa.array(
            [None if r[4] is None else len(r[4]) for r in rows], pa.int32()
        ),
        "source": pa.array(
            [None if r[4] is None else "web" for r in rows], pa.string()
        ),
        "part": pa.array([r[5] for r in rows], pa.int32()),
        "schema_version": pa.array([0] * len(rows), pa.int32()),
    }
    tbl = pa.table(cols)
    pq.write_table(tbl, os.path.join(out_dir, fname))
    return tbl
