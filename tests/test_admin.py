"""Changefeed admin lifecycle: pause/resume/remove/finish state machine and
its gating of a running feed.

Mirrors: cdc/owner.go:966-1128 (handleAdminJob), model/changefeed.go:46-52
(feed states), model/owner.go:43-48 (admin job types), owner.go:938-946
(AdminFinish at target_ts)."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from ticdc_spark.lake.table import LakeTable
from ticdc_spark.oracle import apply_binlog, diff_tables
from ticdc_spark.streaming.admin import (
    STATE_FAILED,
    STATE_FINISHED,
    STATE_NORMAL,
    STATE_REMOVED,
    STATE_STOPPED,
    FeedLifecycleError,
    FeedRegistry,
)
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


# ---------------------------------------------------------------- registry


def test_registry_state_machine(tmp_path):
    reg = FeedRegistry(str(tmp_path / "admin"))
    info = reg.create("f1", binlog="/b", table="/t")
    assert info["state"] == STATE_NORMAL and info["error"] is None

    # duplicate create of a live feed is refused (etcd info key exists)
    with pytest.raises(FeedLifecycleError, match="already exists"):
        reg.create("f1")

    # pause records state + optional error history (owner.go:1012-1016)
    info = reg.pause("f1", error="operator stop")
    assert info["state"] == STATE_STOPPED
    assert info["error"] == "operator stop" and len(info["error_his"]) == 1
    # pause of a stopped feed is a no-op (owner.go:996-1005)
    again = reg.pause("f1")
    assert again["state"] == STATE_STOPPED and len(again["error_his"]) == 1

    # resume clears the error (owner.go:1100-1104)
    info = reg.resume("f1")
    assert info["state"] == STATE_NORMAL and info["error"] is None

    # failed → resume works (retry path)
    reg.set_failed("f1", "boom")
    assert reg.state("f1") == STATE_FAILED
    assert reg.query("f1")["error"] == "boom"
    reg.resume("f1")
    assert reg.state("f1") == STATE_NORMAL

    # remove keeps a TTL'd status marker; force drops the file entirely
    info = reg.remove("f1")
    assert info["state"] == STATE_REMOVED and info["status_ttl_s"] == 24 * 3600
    with pytest.raises(FeedLifecycleError, match="cannot be resumed"):
        reg.resume("f1")
    # the id becomes free again (reference deletes the info key)
    reg.create("f1")
    reg.remove("f1", force=True)
    assert reg.query("f1") is None

    # unmanaged feed defaults to normal (admin gating is opt-in)
    assert reg.state("ghost") == STATE_NORMAL
    assert reg.list() == []


def test_registry_finish_is_terminal(tmp_path):
    reg = FeedRegistry(str(tmp_path / "admin"))
    reg.create("f2")
    reg.finish("f2")
    assert reg.state("f2") == STATE_FINISHED
    with pytest.raises(FeedLifecycleError, match="cannot be resumed"):
        reg.resume("f2")
    # pause of a finished feed is a no-op, not an error
    assert reg.pause("f2")["state"] == STATE_FINISHED


def test_registry_checkpoint_monotone(tmp_path):
    reg = FeedRegistry(str(tmp_path / "admin"))
    reg.create("f3")
    reg.update_checkpoint("f3", 100)
    reg.update_checkpoint("f3", 50)  # stale write ignored
    assert reg.query("f3")["checkpoint_ts"] == 100


# ------------------------------------------------------- feed integration


@pytest.fixture()
def ws(tmp_path):
    return {
        "binlog": str(tmp_path / "binlog"),
        "tbl": str(tmp_path / "tbl"),
        "ckpt": str(tmp_path / "ckpt"),
        "admin": str(tmp_path / "admin"),
    }


def test_paused_feed_processes_nothing_then_resumes(spark, ws):
    """Pause → run is a no-op with the checkpoint PRESERVED; resume
    continues from it (new files included) and converges to the full
    oracle."""
    spec = BinlogSpec(n_events=8_000, n_keys=800, seed=71, n_parts=4)
    write_binlog(spec, ws["binlog"], files_per_part=2)
    reg = FeedRegistry(ws["admin"])
    reg.create("feed1")
    t = LakeTable.create(spark, ws["tbl"], n_buckets=4)

    cf = ChangeFeed(
        t, ws["binlog"], ws["ckpt"], max_files_per_trigger=4,
        admin=reg, feed_name="feed1",
    )
    n_first = len(cf.run_available())
    assert n_first >= 1

    # more files land while the feed is paused — they must NOT be consumed
    spec2 = BinlogSpec(n_events=4_000, n_keys=800, seed=97, n_parts=4)
    extra = ws["binlog"] + "-extra"
    write_binlog(spec2, extra, files_per_part=1)
    for f in glob.glob(os.path.join(extra, "*.parquet")):
        os.link(f, os.path.join(ws["binlog"], "x-" + os.path.basename(f)))

    reg.pause("feed1", error="maintenance window")
    assert cf.run_available() is cf.batch_summaries
    assert len(cf.batch_summaries) == n_first  # nothing new processed
    assert reg.state("feed1") == STATE_STOPPED  # run did not clobber state

    reg.resume("feed1")
    cf2 = ChangeFeed(
        t, ws["binlog"], ws["ckpt"], max_files_per_trigger=4,
        admin=reg, feed_name="feed1",
    )
    assert len(cf2.run_available()) >= 1  # the paused-era files now apply

    binlog = pq.read_table(ws["binlog"])
    resolved = reg.query("feed1")["checkpoint_ts"]
    expected = apply_binlog(binlog, upto_ts=resolved)
    assert not diff_tables(expected, _lake_arrow(t))


def test_in_batch_gate_raises_without_marking_failed(spark, ws):
    """A pause landing while the stream is up stops it at the next batch
    boundary via a raise BEFORE any offsets commit — and the lifecycle stop
    must not be recorded as a feed failure."""
    spec = BinlogSpec(n_events=1_000, n_keys=100, seed=72, n_parts=2)
    write_binlog(spec, ws["binlog"], files_per_part=1)
    reg = FeedRegistry(ws["admin"])
    reg.create("feed1")
    t = LakeTable.create(spark, ws["tbl"], n_buckets=4)
    cf = ChangeFeed(t, ws["binlog"], ws["ckpt"], admin=reg, feed_name="feed1")
    reg.pause("feed1")
    df = spark.read.parquet(ws["binlog"])
    with pytest.raises(RuntimeError, match="is stopped"):
        cf._process_batch(df, 0)
    assert cf._stop_reason == STATE_STOPPED
    assert reg.state("feed1") == STATE_STOPPED  # not failed


def test_processing_error_marks_feed_failed(spark, ws):
    """A real error (late-event contract violation in strict mode) lands the
    feed in `failed` with the error recorded; resume clears it."""
    from ticdc_spark.model import BINLOG_SCHEMA

    os.makedirs(ws["binlog"])

    def stage(rows, name):
        spark.createDataFrame(rows, schema=BINLOG_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(ws["binlog"] + "-" + name)
        for f in glob.glob(ws["binlog"] + "-" + name + "/*.parquet"):
            os.link(f, os.path.join(ws["binlog"], f"{name}-{os.path.basename(f)}"))

    stage(
        [
            (100, 1, "t", "I", "a", [1], 1, "web", 0, 0),
            (200, 2, "t", "I", "b", [2], 1, "web", 0, 0),
            (200, 3, "t", "I", "c", [3], 1, "web", 1, 0),
        ],
        "f1",
    )
    reg = FeedRegistry(ws["admin"])
    reg.create("feed1")
    t = LakeTable.create(spark, ws["tbl"], n_buckets=4)
    cf = ChangeFeed(
        t, ws["binlog"], ws["ckpt"], max_files_per_trigger=1,
        strict_watermarks=True, admin=reg, feed_name="feed1",
    )
    cf.run_available()

    stage([(150, 4, "t", "U", "a", [9], 1, "web", 0, 0)], "f2")  # late
    cf2 = ChangeFeed(
        t, ws["binlog"], ws["ckpt"], max_files_per_trigger=1,
        strict_watermarks=True, admin=reg, feed_name="feed1",
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises((RuntimeError, StreamingQueryException), match="late-event"):
        cf2.run_available()
    info = reg.query("feed1")
    assert info["state"] == STATE_FAILED
    assert "late-event" in info["error"] and len(info["error_his"]) == 1

    reg.resume("feed1")
    info = reg.query("feed1")
    assert info["state"] == STATE_NORMAL and info["error"] is None


def test_multi_table_feed_respects_admin_gate(spark, ws, tmp_path):
    """The same registry gates a multi-table feed (one feed id covers all
    its tables, like one changefeed replicating many tables upstream)."""
    from ticdc_spark.streaming.multi import MultiTableChangeFeed

    stage_a = str(tmp_path / "stage_a")
    stage_b = str(tmp_path / "stage_b")
    write_binlog(BinlogSpec(n_events=2_000, n_keys=200, seed=81, table="ta"), stage_a)
    write_binlog(BinlogSpec(n_events=2_000, n_keys=200, seed=82, table="tb"), stage_b)
    os.makedirs(ws["binlog"])
    for tag, stage in (("a", stage_a), ("b", stage_b)):
        for f in glob.glob(stage + "/*.parquet"):
            os.link(f, os.path.join(ws["binlog"], f"{tag}-{os.path.basename(f)}"))

    reg = FeedRegistry(ws["admin"])
    reg.create("mfeed")
    ta = LakeTable.create(spark, str(tmp_path / "ta"), n_buckets=4)
    tb = LakeTable.create(spark, str(tmp_path / "tb"), n_buckets=4)
    cf = MultiTableChangeFeed(
        {"ta": ta, "tb": tb}, ws["binlog"], ws["ckpt"],
        admin=reg, feed_name="mfeed",
    )
    reg.pause("mfeed")
    assert cf.run_available() == []  # paused: nothing processed
    assert ta.read().count() == 0

    reg.resume("mfeed")
    summaries = cf.run_available()
    assert summaries and all(all(s["tables"].values()) for s in summaries)
    assert reg.query("mfeed")["checkpoint_ts"] == summaries[-1]["resolved_ts"]
    ev_a = pq.read_table(stage_a)
    expected = apply_binlog(ev_a, upto_ts=summaries[-1]["resolved_ts"])
    assert not diff_tables(expected, _lake_arrow(ta))


def test_target_ts_finishes_feed(spark, ws):
    """--target-ts contract (model/changefeed.go:74-75, owner.go:938-946):
    state equals the oracle applied up to target_ts exactly, the checkpoint
    stops AT target_ts, the feed finishes, and a finished feed can be
    neither run nor resumed."""
    spec = BinlogSpec(n_events=10_000, n_keys=1_000, seed=73, n_parts=4)
    write_binlog(spec, ws["binlog"], files_per_part=2)
    binlog = pq.read_table(ws["binlog"])
    ts_sorted = sorted(binlog.column("commit_ts").to_pylist())
    target = ts_sorted[len(ts_sorted) // 2]  # mid-stream target

    reg = FeedRegistry(ws["admin"])
    reg.create("feed1", target_ts=target)
    t = LakeTable.create(spark, ws["tbl"], n_buckets=4)
    cf = ChangeFeed(
        t, ws["binlog"], ws["ckpt"],
        target_ts=target, admin=reg, feed_name="feed1",
    )
    summaries = cf.run_available()
    assert summaries, "feed processed nothing"

    # final state == oracle at exactly target_ts (not a single event beyond)
    expected = apply_binlog(binlog, upto_ts=target)
    assert not diff_tables(expected, _lake_arrow(t))

    info = reg.query("feed1")
    assert info["state"] == STATE_FINISHED
    assert info["checkpoint_ts"] == target  # clamped, never beyond

    # finished ⇒ inert + unresumable
    assert cf.run_available() is cf.batch_summaries
    with pytest.raises(FeedLifecycleError, match="cannot be resumed"):
        reg.resume("feed1")

    # a NEW process over the same checkpoint also stays inert (registry
    # gate, not the in-memory flag)
    cf_new = ChangeFeed(
        t, ws["binlog"], ws["ckpt"],
        target_ts=target, admin=reg, feed_name="feed1",
    )
    assert cf_new.run_available() == []  # registry gate: nothing processed


def test_create_validates_start_ts_against_gc_safepoint(spark, tmp_path):
    """Feed creation below the GC safepoint must fail fast (pkg/util/
    gc_service.go:31-43 CheckSafetyOfStartTs → ErrStartTsBeforeGC, surfaced
    by `cdc cli changefeed create`). The lake analog of the safepoint is
    the oldest syncpoint that survived expire_versions."""
    from ticdc_spark.streaming.admin import table_gc_safepoint

    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    # four epochs, each recording a syncpoint (watermarks given) — the
    # shape ChangeFeed commits produce
    for e in range(4):
        ch = spark.createDataFrame(
            [(f"d{e}", [e], 1, "web", "I", 100 + e * 10, e)],
            "doc_id string, tokens array<int>, n_tok int, source string, "
            "op string, commit_ts long, seq long",
        )
        t.merge_epoch(ch, f"e{e}", watermarks={"0": 100 + e * 10})
    sps = [sp["primary_ts"] for sp in t.syncpoints]
    assert len(sps) >= 4
    # before expiry every syncpoint is resumable
    assert table_gc_safepoint(t) == min(sps)
    t.expire_versions(keep_last=2)
    floor = table_gc_safepoint(t)
    assert floor is not None and floor > min(sps)

    reg = FeedRegistry(str(tmp_path / "feeds"))
    with pytest.raises(FeedLifecycleError, match="GC safepoint"):
        reg.create("too-old", start_ts=floor - 1, gc_tables=[t])
    # at/above the floor the create succeeds and records start_ts
    info = reg.create("ok", start_ts=floor, gc_tables=[t])
    assert info["config"]["start_ts"] == floor
    # the reference's --disable-gc-check escape hatch
    info2 = reg.create(
        "forced", start_ts=floor - 1, gc_tables=[t], check_gc_safe_point=False
    )
    assert info2["state"] == "normal"
    # explicit safepoint (no tables handy) works the same way
    with pytest.raises(FeedLifecycleError, match="GC safepoint"):
        reg.create("too-old-2", start_ts=99, gc_safepoint_ts=100)


def test_registry_update_stopped_only(tmp_path):
    """`changefeed update` (cmd/client_changefeed.go:497-580): config
    mutation is allowed only on a STOPPED feed, records a changelog diff,
    and refuses immutable fields."""
    reg = FeedRegistry(str(tmp_path / "admin"))
    reg.create("f1", binlog="/b", table="/t", target_ts=100)

    # running feed: refused ("can only update ... when it is stopped")
    with pytest.raises(FeedLifecycleError, match="stopped"):
        reg.update("f1", target_ts=200)

    reg.pause("f1")
    info = reg.update("f1", target_ts=200, sink_uri="mq:/out")
    assert info["config"]["target_ts"] == 200
    assert info["config"]["sink_uri"] == "mq:/out"
    # changelog mirrors the reference's old-vs-new diff print
    fields = {c["field"]: c for c in info["changelog"]}
    assert fields["target_ts"]["old"] == 100
    assert fields["target_ts"]["new"] == 200
    assert fields["sink_uri"]["old"] is None

    # unchanged values produce no changelog entries
    n = len(info["changelog"])
    info = reg.update("f1", target_ts=200)
    assert len(info["changelog"]) == n

    # immutable fields raise instead of silently applying
    with pytest.raises(FeedLifecycleError, match="start_ts"):
        reg.update("f1", start_ts=5)

    # update survives the pause/resume round trip and a reload from disk
    reg.resume("f1")
    assert reg.query("f1")["config"]["target_ts"] == 200

    # removed/finished feeds cannot be updated
    reg.pause("f1")
    reg.remove("f1")
    with pytest.raises(FeedLifecycleError):
        reg.update("f1", target_ts=300)


def test_cli_stats_snapshot(spark, ws):
    """`changefeed statistics` analog (cmd/client_changefeed.go:628-680):
    one profileStatus snapshot — Count from the lineage TaskPosition rows,
    SinkGap = resolved - checkpoint, OPS over the lineage window."""
    import json as j
    import json
    import subprocess
    import sys as _sys

    spec = BinlogSpec(n_events=6_000, n_keys=600, seed=77, n_parts=4)
    write_binlog(spec, ws["binlog"], files_per_part=2)
    reg = FeedRegistry(ws["admin"])
    reg.create("feed1")
    t = LakeTable.create(spark, ws["tbl"], n_buckets=4)
    lineage = os.path.join(ws["ckpt"], "lineage")
    cf = ChangeFeed(
        t, ws["binlog"], ws["ckpt"], max_files_per_trigger=1,
        admin=reg, feed_name="feed1", lineage_dir=lineage,
    )
    cf.run_available()

    r = subprocess.run(
        [_sys.executable, "jobs/changefeed_ctl.py", "--admin-dir", ws["admin"],
         "stats", "feed1", "--lineage-dir", lineage],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    out = j.loads(r.stdout)
    binlog = pq.read_table(ws["binlog"])
    assert out["state"] == STATE_NORMAL
    # TaskPosition Count is PROCESSED events (the reference's semantics):
    # carried-tail rows re-enter the next batch's fold, so >= unique rows
    assert out["count"] >= binlog.num_rows
    assert out["resolved_ts"] == out["checkpoint_ts"]  # checkpoint kept up
    assert out["sink_gap"] == 0
    assert out["batches"] >= 2


def test_unsafe_reset_and_show_metadata(tmp_path):
    """cmd/client_unsafe.go analogs: show-metadata dumps every stored
    entry; reset deletes ALL feed metadata regardless of state."""
    from ticdc_spark.streaming.admin import FeedRegistry

    reg = FeedRegistry(str(tmp_path / "admin"))
    reg.create("f1")
    reg.create("f2")
    reg.pause("f2")
    dump = reg.dump_metadata()
    assert [v["feed"] for _, v in dump] == ["f1", "f2"]
    assert all(k.endswith(".json") for k, _ in dump)
    out = reg.reset()
    assert out == {"deleted": ["f1", "f2"]}
    assert reg.list() == [] and reg.dump_metadata() == []
    # ids are free again after a reset
    reg.create("f1")
    assert reg.query("f1")["state"] == "normal"


def test_unsafe_cli_roundtrip(tmp_path):
    import json as _json
    import json
    import subprocess
    import sys as _sys

    admin = str(tmp_path / "admin")
    from ticdc_spark.streaming.admin import FeedRegistry

    FeedRegistry(admin).create("feed1")
    ctl = os.path.join(os.path.dirname(os.path.dirname(__file__)), "jobs", "changefeed_ctl.py")
    show = subprocess.run(
        [_sys.executable, ctl, "--admin-dir", admin, "unsafe-show-metadata"],
        capture_output=True, text=True,
    )
    assert show.returncode == 0
    assert _json.loads(show.stdout)[0]["value"]["feed"] == "feed1"
    # without --no-confirm, a non-Y answer aborts
    ab = subprocess.run(
        [_sys.executable, ctl, "--admin-dir", admin, "unsafe-reset"],
        capture_output=True, text=True, input="n\n",
    )
    assert ab.returncode == 1 and "abort" in ab.stderr
    rs = subprocess.run(
        [_sys.executable, ctl, "--admin-dir", admin, "unsafe-reset", "--no-confirm"],
        capture_output=True, text=True,
    )
    assert rs.returncode == 0
    assert _json.loads(rs.stdout) == {"deleted": ["feed1"]}


# ---------------------------------------------------------------------------
# Error history + owner retry loop (model/changefeed.go:211-234
# CheckErrorHistory, owner.go:527-660 loadChangeFeeds failure branches,
# model/changefeed_test.go TestCheckErrorHistory)
# ---------------------------------------------------------------------------


def test_check_error_history_gc_and_threshold(tmp_path):
    """Transcription of model/changefeed_test.go TestCheckErrorHistory:
    records older than the GC interval are pruned (need_save), and
    can_init flips false only when the trailing 2-minute window holds
    >= threshold errors."""
    from ticdc_spark.streaming.admin import (
        ERROR_HISTORY_CHECK_INTERVAL_MS,
        ERROR_HISTORY_GC_INTERVAL_MS,
        ERROR_HISTORY_THRESHOLD,
        FeedRegistry,
    )

    reg = FeedRegistry(str(tmp_path / "adm"))
    reg.create("f")
    now = 1_000_000_000_000
    # 5 stale errors beyond the GC interval
    for i in range(5):
        reg.record_error("f", "old", now_ms=now - ERROR_HISTORY_GC_INTERVAL_MS - 1000 - i)
    # threshold-1 fresh errors inside the check window
    for i in range(ERROR_HISTORY_THRESHOLD - 1):
        reg.record_error("f", "fresh", now_ms=now - 1000 - i)
    need_save, can_init = reg.check_error_history("f", now_ms=now)
    assert need_save  # stale records pruned + persisted
    assert can_init  # threshold-1 < threshold
    assert len(reg.query("f")["error_his"]) == ERROR_HISTORY_THRESHOLD - 1
    # one more fresh error reaches the threshold -> rate limited
    reg.record_error("f", "fresh", now_ms=now)
    need_save, can_init = reg.check_error_history("f", now_ms=now + 1)
    assert not need_save and not can_init
    # ... and the limit clears once the errors age past the check window
    later = now + ERROR_HISTORY_CHECK_INTERVAL_MS + 1000
    need_save, can_init = reg.check_error_history("f", now_ms=later)
    assert can_init
    # state stayed normal throughout: transient errors retry, never fail
    assert reg.state("f") == STATE_NORMAL


def test_record_error_fast_fail_marks_failed(tmp_path):
    reg = FeedRegistry(str(tmp_path / "adm"))
    reg.create("f")
    reg.record_error("f", "start-ts before GC", fast_fail=True, now_ms=123)
    info = reg.query("f")
    assert info["state"] == STATE_FAILED
    assert info["error_his"] == [123]
    # resume clears the error and re-enables the feed (owner.go:1100-1104)
    reg.resume("f")
    assert reg.state("f") == STATE_NORMAL
    assert reg.query("f")["error"] is None


def test_supervisor_retries_rate_limits_and_fast_fails(tmp_path):
    """FeedSupervisor = owner.go loadChangeFeeds: transient errors retry,
    5 errors in 2 minutes rate-limit, FastFailError fails the feed, failed
    feeds are skipped (log-once) until resumed."""
    from ticdc_spark.streaming.admin import (
        ERROR_HISTORY_CHECK_INTERVAL_MS,
        FastFailError,
        FeedRegistry,
        FeedSupervisor,
    )

    reg = FeedRegistry(str(tmp_path / "adm"))
    reg.create("flaky")
    reg.create("doomed")
    reg.create("steady")
    sup = FeedSupervisor(reg)
    calls = {"flaky": 0, "doomed": 0, "steady": 0}

    def flaky():
        calls["flaky"] += 1
        raise RuntimeError("transient sink hiccup")

    def doomed():
        calls["doomed"] += 1
        raise FastFailError("ErrStartTsBeforeGC")

    def steady():
        calls["steady"] += 1

    runners = {"flaky": flaky, "doomed": doomed, "steady": steady}
    t0 = 2_000_000_000_000
    out = sup.tick(runners, now_ms=t0)
    assert out == {
        "flaky": "error-retry",
        "doomed": "error-failed",
        "steady": "ran",
    }
    assert reg.state("flaky") == STATE_NORMAL  # will retry
    assert reg.state("doomed") == STATE_FAILED

    # ticks 2..5: flaky keeps erroring and RETRYING; doomed is skipped and
    # its runner never invoked again (failInitFeeds log-once)
    for i in range(1, 5):
        out = sup.tick(runners, now_ms=t0 + i * 1000)
        assert out["doomed"] == f"skipped:{STATE_FAILED}"
        assert out["flaky"] == "error-retry"
    assert calls["doomed"] == 1
    assert calls["flaky"] == 5
    # the 5th error reached the threshold: now rate-limited, runner not called
    out = sup.tick(runners, now_ms=t0 + 6000)
    assert out["flaky"] == "rate-limited" and calls["flaky"] == 5

    # after the 2-minute window passes, flaky is retried again
    out = sup.tick(runners, now_ms=t0 + ERROR_HISTORY_CHECK_INTERVAL_MS + 7000)
    assert out["flaky"] == "error-retry" and calls["flaky"] == 6

    # resume the failed feed -> supervisor clears its log-once entry and runs
    reg.resume("doomed")
    ok = lambda: calls.__setitem__("doomed", calls["doomed"] + 1)  # noqa: E731
    out = sup.tick({"doomed": ok}, now_ms=t0 + ERROR_HISTORY_CHECK_INTERVAL_MS + 8000)
    assert out == {"doomed": "ran"} and "doomed" not in sup.fail_init_feeds
    assert calls["doomed"] == 2
    assert calls["steady"] >= 6  # healthy feed ran every full tick


def test_ctl_create_subcommand(spark, tmp_path):
    """`changefeed_ctl.py create` registers a feed, refuses duplicates and
    below-safepoint start-ts (via --gc-table-root, Spark-free metadata
    read), honors --disable-gc-check."""
    import json
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ctl = os.path.join(repo, "jobs", "changefeed_ctl.py")
    admin = str(tmp_path / "feeds")

    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    for e in range(4):
        ch = spark.createDataFrame(
            [(f"d{e}", [e], 1, "web", "I", 100 + e * 10, e)],
            "doc_id string, tokens array<int>, n_tok int, source string, "
            "op string, commit_ts long, seq long",
        )
        t.merge_epoch(ch, f"e{e}", watermarks={"0": 100 + e * 10})
    t.expire_versions(keep_last=2)
    from ticdc_spark.streaming.admin import table_gc_safepoint

    floor = table_gc_safepoint(t)

    def run(*extra):
        return subprocess.run(
            [_sys.executable, ctl, "--admin-dir", admin, "create", *extra],
            capture_output=True, text=True,
        )

    ok = run("f1", "--start-ts", str(floor), "--target-ts", "99999",
             "--sink-uri", "kafka://b/topic", "--gc-table-root", t.root)
    assert ok.returncode == 0, ok.stderr
    info = json.loads(ok.stdout)
    assert info["state"] == "normal"
    assert info["config"]["sink_uri"] == "kafka://b/topic"

    dup = run("f1")
    assert dup.returncode == 1 and "already exists" in dup.stderr

    old = run("f2", "--start-ts", str(floor - 1), "--gc-table-root", t.root)
    assert old.returncode == 1 and "GC safepoint" in old.stderr

    forced = run("f2", "--start-ts", str(floor - 1),
                 "--gc-table-root", t.root, "--disable-gc-check")
    assert forced.returncode == 0, forced.stderr
