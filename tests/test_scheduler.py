"""Owner-side table scheduling: two-phase move-table between captures,
rebalance planning, skewness — cdc/changefeed.go:505-590 handleMoveTableJobs
and pkg/scheduler/{table_number,workload}.go analogs."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from ticdc_spark.lake.table import LakeTable
from ticdc_spark.oracle import apply_binlog, diff_tables
from ticdc_spark.streaming.multi import MultiTableChangeFeed
from ticdc_spark.streaming.scheduler import (
    TableScheduler,
    distribute_tables,
    rebalance_plan,
    skewness,
)
from ticdc_spark.testgen import BinlogSpec, write_binlog


# ---------------------------------------------------------------------------
# pure planning logic (no Spark)


def test_skewness_matches_reference_formula():
    # workload.go:70-93: std/mean over per-capture workload sums
    assert skewness({}) == 0.0
    assert skewness({"c1": {"t1": 1.0}, "c2": {"t2": 1.0}}) == 0.0
    # c1=3, c2=1: mean 2, std 1 → 0.5
    w = {"c1": {"a": 1.0, "b": 1.0, "c": 1.0}, "c2": {"d": 1.0}}
    assert abs(skewness(w) - 0.5) < 1e-12


def test_distribute_tables_fills_idle_captures_first():
    w = {"c1": {"a": 1.0, "b": 1.0}, "c2": {}, "c3": {"c": 1.0}}
    got = distribute_tables(w, ["t1", "t2", "t3", "t4"])
    # c2 (load 0) gets the first, then c3 (1), then c2/c3 round out; c1
    # (load 2) only after others reach it — deterministic tie-break by id
    counts = {cid: len(ts) for cid, ts in got.items()}
    assert sum(counts.values()) == 4
    assert counts.get("c2", 0) >= counts.get("c1", 0)
    # every orphan placed exactly once
    placed = [t for ts in got.values() for t in ts]
    assert sorted(placed) == ["t1", "t2", "t3", "t4"]


def test_rebalance_plan_caps_over_limit_captures():
    # table_number.go:46-84: limit = total/num + 1 = 6/3+1 = 3 → c1 (4
    # tables) sheds exactly 1, landing on an idle capture
    w = {
        "c1": {t: 1.0 for t in ("a", "b", "c", "d")},
        "c2": {"e": 1.0, "f": 1.0},
        "c3": {},
    }
    moves = rebalance_plan(w)
    assert len(moves) == 2  # c1 sheds down to <3: 4→2 ... see below
    after = {cid: dict(ts) for cid, ts in w.items()}
    for t, s, d in moves:
        assert after[s].pop(t) == 1.0
        after[d][t] = 1.0
    assert skewness(after) <= skewness(w)
    # no self-moves
    assert all(s != d for _, s, d in moves)


def test_rebalance_plan_noop_when_even():
    w = {"c1": {"a": 1.0}, "c2": {"b": 1.0}}
    assert rebalance_plan(w) == []


# ---------------------------------------------------------------------------
# end-to-end move between live captures


def _mk_binlogs(tmp_path, n=4_000):
    """Three homogeneous token tables' events staged per table; the binlog
    dir receives files in WAVES (first half, then the rest) so moves happen
    with data still arriving."""
    stages, events = {}, {}
    for i, t in enumerate(("ta", "tb", "tc")):
        stage = str(tmp_path / f"stage_{t}")
        # ts-aligned file ranges: a later wave never delivers an event below
        # an earlier wave's released frontier (the puller's per-span no-late
        # contract — real TiKV never emits below its resolved-ts)
        write_binlog(
            BinlogSpec(
                n_events=n, n_keys=n // 10, seed=61 + i, table=t,
                p_delete=0.12, p_insert=0.58, out_of_order=False,
            ),
            stage,
            files_per_part=4,
            align_ts=True,
        )
        stages[t] = sorted(glob.glob(stage + "/*.parquet"))
        events[t] = pq.read_table(stage)
    binlog = str(tmp_path / "binlog")
    os.makedirs(binlog)
    waves = []
    for half in (0, 1):
        wave = []
        for t, files in stages.items():
            cut = len(files) // 2
            wave += [(t, f) for f in (files[:cut] if half == 0 else files[cut:])]
        waves.append(wave)
    return binlog, waves, events


def _link_wave(binlog, wave):
    for t, f in wave:
        os.link(f, os.path.join(binlog, f"{t}-{os.path.basename(f)}"))


def test_move_table_two_phase_exactly_once(spark, tmp_path):
    """ta,tb on capture c1; tc on c2. After wave 1, tb moves c1→c2 at the
    resolved boundary; wave 2 lands post-move. Every table's final lake
    state matches the sequential oracle — no lost events at the handoff
    (the target's own pending tail covers above-boundary events from
    already-consumed files) and no double-apply (the add-boundary filter)."""
    binlog, waves, ev = _mk_binlogs(tmp_path)
    tables = {
        t: LakeTable.create(spark, str(tmp_path / t), n_buckets=4)
        for t in ("ta", "tb", "tc")
    }
    c1 = MultiTableChangeFeed(
        {"ta": tables["ta"], "tb": tables["tb"]},
        binlog, str(tmp_path / "ck1"), max_files_per_trigger=5,
    )
    c2 = MultiTableChangeFeed(
        {"tc": tables["tc"]},
        binlog, str(tmp_path / "ck2"), max_files_per_trigger=5,
    )
    sched = TableScheduler(
        {"c1": c1, "c2": c2}, str(tmp_path / "sched.json")
    )
    _link_wave(binlog, waves[0])
    sched.tick()
    job = sched.move_table("tb", "c1", "c2")
    assert job["status"] == "none"
    sched.tick()  # drains nothing new; executes both phases at the frontier
    assert job["status"] == "finished"
    boundary = job["boundary"]
    assert boundary is not None and boundary > 0
    assert "tb" in c2.tables and c1.stop_ts.get("tb") == boundary
    # load accounting follows the move
    assert sched.workloads() == {"c1": {"ta": 1.0}, "c2": {"tc": 1.0, "tb": 1.0}}

    _link_wave(binlog, waves[1])
    s = sched.tick()
    owner = {"ta": "c1", "tb": "c2", "tc": "c2"}
    for t in ("ta", "tb", "tc"):
        expected = apply_binlog(
            ev[t], upto_ts=s[owner[t]][-1]["resolved_ts"]
        )
        got = _lake_arrow(LakeTable(spark, str(tmp_path / t)))
        assert not diff_tables(expected, got), t
    # the boundary actually bit: tb had post-boundary events
    assert pc.max(ev["tb"].column("commit_ts")).as_py() > boundary


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


def test_move_table_resume_from_state_file(spark, tmp_path):
    """A scheduler restarted over fresh captures re-applies persisted jobs:
    a finished move survives (stop on source, table live on target), like
    the owner re-deriving task statuses from etcd."""
    binlog, waves, ev = _mk_binlogs(tmp_path, n=2_000)
    for t in ("ta", "tb", "tc"):
        LakeTable.create(spark, str(tmp_path / t), n_buckets=4)
    mk = lambda: (  # noqa: E731 — fresh feed objects, same checkpoints
        MultiTableChangeFeed(
            {"ta": LakeTable(spark, str(tmp_path / "ta")),
             "tb": LakeTable(spark, str(tmp_path / "tb"))},
            binlog, str(tmp_path / "ck1"), max_files_per_trigger=5,
        ),
        MultiTableChangeFeed(
            {"tc": LakeTable(spark, str(tmp_path / "tc"))},
            binlog, str(tmp_path / "ck2"), max_files_per_trigger=5,
        ),
    )
    c1, c2 = mk()
    state = str(tmp_path / "sched.json")
    sched = TableScheduler({"c1": c1, "c2": c2}, state)
    _link_wave(binlog, waves[0])
    sched.tick()
    sched.move_table("tb", "c1", "c2")
    sched.tick()

    # "crash": rebuild everything from disk
    c1b, c2b = mk()
    sched2 = TableScheduler({"c1": c1b, "c2": c2b}, state)
    assert "tb" in c2b.tables
    assert "tb" in c1b.stop_ts
    assert c2b.boundaries["tb"] == sched2.jobs[0]["boundary"]

    _link_wave(binlog, waves[1])
    s = sched2.tick()
    expected = apply_binlog(ev["tb"], upto_ts=s["c2"][-1]["resolved_ts"])
    got = _lake_arrow(LakeTable(spark, str(tmp_path / "tb")))
    assert not diff_tables(expected, got)


def test_adopt_orphans_after_capture_failure(spark, tmp_path):
    """c1 dies after wave 1; its tables re-enter on c2 at their durable lake
    frontiers, the gap up to c2's stream position served by the catch-up
    scan (balanceOrphanTables, changefeed.go:306-400). Wave 2 then streams
    normally and every table converges to the sequential oracle."""
    binlog, waves, ev = _mk_binlogs(tmp_path)
    tables = {
        t: LakeTable.create(spark, str(tmp_path / t), n_buckets=4)
        for t in ("ta", "tb", "tc")
    }
    c1 = MultiTableChangeFeed(
        {"ta": tables["ta"], "tb": tables["tb"]},
        binlog, str(tmp_path / "ck1"), max_files_per_trigger=5,
    )
    c2 = MultiTableChangeFeed(
        {"tc": tables["tc"]},
        binlog, str(tmp_path / "ck2"), max_files_per_trigger=5,
    )
    state = str(tmp_path / "sched.json")
    sched = TableScheduler({"c1": c1, "c2": c2}, state)
    _link_wave(binlog, waves[0])
    sched.tick()

    # "crash" of c1: a fresh scheduler is built over survivors + a cold
    # (never-run) handle on the dead capture's config, then adopts
    c1_cold = MultiTableChangeFeed(
        {"ta": LakeTable(spark, str(tmp_path / "ta")),
         "tb": LakeTable(spark, str(tmp_path / "tb"))},
        binlog, str(tmp_path / "ck1"), max_files_per_trigger=5,
    )
    c2b = MultiTableChangeFeed(
        {"tc": LakeTable(spark, str(tmp_path / "tc"))},
        binlog, str(tmp_path / "ck2"), max_files_per_trigger=5,
    )
    sched2 = TableScheduler({"c1": c1_cold, "c2": c2b}, state)
    jobs = sched2.adopt_orphans("c1")
    assert sorted(j["table"] for j in jobs) == ["ta", "tb"]
    assert all(j["status"] == "finished" for j in jobs)
    assert "ta" in c2b.tables and "tb" in c2b.tables
    assert "c1" not in sched2.captures
    # the catch-up brought each orphan to full coverage of what has ARRIVED
    # (wave-1 files) up to its catchup_to — events above it still upstream
    import pyarrow as pa

    for j in jobs:
        arrived = pa.concat_tables(
            [pq.read_table(f) for t_, f in waves[0] if t_ == j["table"]]
        )
        exp = apply_binlog(arrived, upto_ts=j["catchup_to"])
        got = _lake_arrow(LakeTable(spark, str(tmp_path / j["table"])))
        assert not diff_tables(exp, got), (j["table"], "post-catch-up")
    # the machinery was exercised: at least one orphan lagged the frontier
    assert any(j["catchup_to"] > j["boundary"] for j in jobs)

    _link_wave(binlog, waves[1])
    s = sched2.tick()
    res = s["c2"][-1]["resolved_ts"]
    for t in ("ta", "tb", "tc"):
        exp = apply_binlog(ev[t], upto_ts=res)
        got = _lake_arrow(LakeTable(spark, str(tmp_path / t)))
        assert not diff_tables(exp, got), t


def test_adopt_orphans_resume_mid_crash(spark, tmp_path):
    """A crash between the adopt job's persistence and its completion
    resumes idempotently: the catch-up epoch / clamp / add re-apply to the
    same state on scheduler restart."""
    binlog, waves, ev = _mk_binlogs(tmp_path, n=2_000)
    for t in ("ta", "tb", "tc"):
        LakeTable.create(spark, str(tmp_path / t), n_buckets=4)
    mk2 = lambda: MultiTableChangeFeed(  # noqa: E731
        {"tc": LakeTable(spark, str(tmp_path / "tc"))},
        binlog, str(tmp_path / "ck2"), max_files_per_trigger=5,
    )
    c1 = MultiTableChangeFeed(
        {"ta": LakeTable(spark, str(tmp_path / "ta")),
         "tb": LakeTable(spark, str(tmp_path / "tb"))},
        binlog, str(tmp_path / "ck1"), max_files_per_trigger=5,
    )
    state = str(tmp_path / "sched.json")
    sched = TableScheduler({"c1": c1, "c2": mk2()}, state)
    _link_wave(binlog, waves[0])
    sched.tick()
    sched2 = TableScheduler({"c1": c1, "c2": mk2()}, state)
    sched2.adopt_orphans("c1")

    # restart AGAIN over the finished jobs: fresh captures re-attach
    c2c = mk2()
    sched3 = TableScheduler({"c2": c2c}, state)
    assert "ta" in c2c.tables and "tb" in c2c.tables
    _link_wave(binlog, waves[1])
    s = sched3.tick()
    res = s["c2"][-1]["resolved_ts"]
    for t in ("ta", "tb", "tc"):
        exp = apply_binlog(ev[t], upto_ts=res)
        got = _lake_arrow(LakeTable(spark, str(tmp_path / t)))
        assert not diff_tables(exp, got), t


def test_move_table_rejects_bad_source_and_double_assignment(spark, tmp_path):
    binlog, waves, _ = _mk_binlogs(tmp_path, n=1_000)
    c1 = MultiTableChangeFeed(
        {"ta": LakeTable.create(spark, str(tmp_path / "ta"), n_buckets=4)},
        binlog, str(tmp_path / "ck1"),
    )
    c2 = MultiTableChangeFeed(
        {"tc": LakeTable.create(spark, str(tmp_path / "tc"), n_buckets=4)},
        binlog, str(tmp_path / "ck2"),
    )
    sched = TableScheduler({"c1": c1, "c2": c2}, str(tmp_path / "s.json"))
    with pytest.raises(ValueError, match="not live"):
        sched.move_table("tb", "c1", "c2")
    with pytest.raises(ValueError, match="already on"):
        c2.add_table("ta", LakeTable(spark, str(tmp_path / "ta")), 0)
        sched.move_table("ta", "c1", "c2")


def test_pending_move_job_dropped_when_capture_dies(spark, tmp_path):
    """A persisted ST_NONE move whose source capture is removed by
    adopt_orphans must be DROPPED (reference: handleMoveTableJobs skips
    jobs with missing captures), not wedge every future tick on KeyError."""
    binlog, waves, ev = _mk_binlogs(tmp_path, n=2_000)
    tables = {
        t: LakeTable.create(spark, str(tmp_path / t), n_buckets=4)
        for t in ("ta", "tb", "tc")
    }
    c1 = MultiTableChangeFeed(
        {"ta": tables["ta"], "tb": tables["tb"]},
        binlog, str(tmp_path / "ck1"), max_files_per_trigger=8,
    )
    c2 = MultiTableChangeFeed(
        {"tc": tables["tc"]},
        binlog, str(tmp_path / "ck2"), max_files_per_trigger=8,
    )
    sched = TableScheduler({"c1": c1, "c2": c2}, str(tmp_path / "s.json"))
    _link_wave(binlog, waves[0])
    sched.tick()
    job = sched.move_table("tb", "c1", "c2")
    # c1 dies before the job runs; its tables (incl. tb) are adopted
    sched.adopt_orphans("c1")
    assert "tb" in c2.tables
    s = sched.tick()  # must not raise; the stale job is dropped
    assert job["status"] == "finished" and job.get("note")
    assert set(s) == {"c2"}


def test_tick_resumes_crashed_adopt_with_catchup(spark, tmp_path):
    """An adopt job left ST_DELETED (crash between job persist and
    _finish_adopt) must be resumed by tick() through the SAME catch-up path
    — driving it as a plain add would silently skip the
    (boundary, catchup_to] replay (regression)."""
    binlog, waves, ev = _mk_binlogs(tmp_path, n=2_000)
    tables = {
        t: LakeTable.create(spark, str(tmp_path / t), n_buckets=4)
        for t in ("ta", "tb", "tc")
    }
    c1 = MultiTableChangeFeed(
        {"ta": tables["ta"], "tb": tables["tb"]},
        binlog, str(tmp_path / "ck1"), max_files_per_trigger=8,
    )
    c2 = MultiTableChangeFeed(
        {"tc": tables["tc"]},
        binlog, str(tmp_path / "ck2"), max_files_per_trigger=8,
    )
    sched = TableScheduler({"c1": c1, "c2": c2}, str(tmp_path / "s.json"))
    _link_wave(binlog, waves[0])
    sched.tick()
    # plan the adoption (to get honest boundary/catchup numbers), then undo
    # its effects to simulate the crash-before-_finish_adopt state
    sched2 = TableScheduler(
        {"c1": MultiTableChangeFeed(
            {"ta": LakeTable(spark, str(tmp_path / "ta")),
             "tb": LakeTable(spark, str(tmp_path / "tb"))},
            binlog, str(tmp_path / "ck1"), max_files_per_trigger=8),
         "c2": c2},
        str(tmp_path / "s.json"),
    )
    jobs = sched2.adopt_orphans("c1")
    lagged = [j for j in jobs if j["catchup_to"] > j["boundary"]]
    assert lagged, "setup: need an orphan with a real catch-up range"
    j = lagged[0]
    # simulate the crash: wipe the catch-up's effect (fresh table from the
    # pre-adopt state is impossible here, so instead re-mark the job
    # ST_DELETED and verify tick() re-runs _finish_adopt idempotently —
    # the epoch id is a pure function of (table, range))
    j["status"] = "deleted"
    sched2._save()
    s = sched2.tick()  # must route through _finish_adopt, not a plain add
    assert j["status"] == "finished"
    arrived = pa.concat_tables(
        [pq.read_table(f) for t_, f in waves[0] if t_ == j["table"]]
    )
    exp = apply_binlog(arrived, upto_ts=max(
        j["catchup_to"], s["c2"][-1]["resolved_ts"] if s["c2"] else -1
    ))
    got = _lake_arrow(LakeTable(spark, str(tmp_path / j["table"])))
    assert not diff_tables(exp, got), "resumed adopt diverged"


# ---------------------------------------------------------------------------
# capture / processor CLI keyspace reads (cmd/client_capture.go:34-57,
# cmd/client_processor.go:21-99 analogs) — Spark-free state-file reads


def test_capture_processor_cli_reads(spark, tmp_path):
    """capture_list / processor_list / processor_query read the persisted
    assignment snapshot + table manifests without a Spark session, and
    track a move: after tb moves c1→c2, the listing shows it stopped on c1
    and live on c2, with its checkpoint at the post-move frontier."""
    from ticdc_spark.streaming.scheduler import (
        capture_list,
        processor_list,
        processor_query,
    )

    binlog, waves, ev = _mk_binlogs(tmp_path, n=1_000)
    tables = {
        t: LakeTable.create(spark, str(tmp_path / t), n_buckets=4)
        for t in ("ta", "tb", "tc")
    }
    c1 = MultiTableChangeFeed(
        {"ta": tables["ta"], "tb": tables["tb"]},
        binlog, str(tmp_path / "ck1"), max_files_per_trigger=5,
    )
    c2 = MultiTableChangeFeed(
        {"tc": tables["tc"]},
        binlog, str(tmp_path / "ck2"), max_files_per_trigger=5,
    )
    state = str(tmp_path / "sched.json")
    sched = TableScheduler({"c1": c1, "c2": c2}, state)

    # registered at construction, before any tick (capture.go Register)
    rows = capture_list(state)
    assert rows == [
        {"id": "c1", "n_tables": 2, "n_stopped": 0},
        {"id": "c2", "n_tables": 1, "n_stopped": 0},
    ]

    _link_wave(binlog, waves[0])
    sched.tick()
    sched.move_table("tb", "c1", "c2")
    sched.tick()
    _link_wave(binlog, waves[1])
    s = sched.tick()

    rows = {r["id"]: r for r in capture_list(state)}
    assert rows["c1"]["n_tables"] == 1 and rows["c1"]["n_stopped"] == 1
    assert rows["c2"]["n_tables"] == 2

    pl = processor_list(state)
    assert {"capture": "c2", "table": "tb", "stopped": False} in pl
    assert {"capture": "c1", "table": "tb", "stopped": True} in pl

    q = processor_query(state, "c2", table="tb")
    pos = q["tables"]["tb"]
    assert pos["reachable"] and pos["stopped"] is False
    assert pos["checkpoint_ts"] == s["c2"][-1]["resolved_ts"]
    assert pos["n_spans"] >= 1 and pos["epochs_committed"] >= 1

    # the stopped copy on c1 carries its stop boundary
    q1 = processor_query(state, "c1", table="tb")
    assert q1["tables"]["tb"]["stopped"] is True
    assert q1["tables"]["tb"]["stop_ts"] is not None

    with pytest.raises(KeyError):
        processor_query(state, "nope")
    with pytest.raises(KeyError):
        processor_query(state, "c1", table="zzz")


def test_owner_lock_serializes_admin_mutations(tmp_path):
    """The embedded HTTP admin thread mutates the scheduler concurrently
    with the driver's tick() loop — owner mutations serialize on
    scheduler.lock (cdc/http_handler.go s.ownerLock analog): a move_table
    issued while the lock is held (as tick holds it) blocks until release."""
    import threading
    import time as _t

    from ticdc_spark.streaming.scheduler import TableScheduler

    class _Tbl:
        root = str(tmp_path / "r")

    class _Cap:
        binlog_dir = str(tmp_path)
        mode = "raw"
        dynamic_spans = False

        def __init__(self, tables):
            self.tables = dict(tables)
            self.stop_ts = {}

    sched = TableScheduler(
        {"c1": _Cap({"t": _Tbl()}), "c2": _Cap({})},
        str(tmp_path / "state.json"),
    )
    done = threading.Event()

    def mover():
        sched.move_table("t", "c1", "c2")
        done.set()

    with sched.lock:  # what tick() holds for its whole round
        th = threading.Thread(target=mover, daemon=True)
        th.start()
        _t.sleep(0.3)
        assert not done.is_set(), "move_table ran inside the owner's round"
    th.join(timeout=5)
    assert done.is_set() and sched.jobs[-1]["table"] == "t"
