"""Changefeed admin lifecycle — the `cdc cli changefeed pause/resume/remove`
surface (reference: cdc/owner.go:966-1128 ``handleAdminJob``, state machine in
cdc/model/changefeed.go:46-52).

The reference keeps per-feed *info* (config + state + error history) and
*status* (checkpoint-ts) under etcd keys and mutates them through owner admin
jobs. Spark has no etcd; a driver-side registry over atomic JSON files gives
the same contract:

  * ``pause``  (AdminStop, owner.go:995-1027)  — state → ``stopped``; the
    checkpoint is PRESERVED so ``resume`` continues exactly where the feed
    left off. An operator-supplied error is recorded with a ms timestamp in
    ``error_his`` (owner.go:1012-1016).
  * ``resume`` (AdminResume, owner.go:1077-1116) — no-op on removed/finished
    feeds; otherwise state → ``normal`` and the last error is CLEARED
    (owner.go:1102-1104 ``cfInfo.State = model.StateNormal; cfInfo.Error =
    nil``). The feed restarts from the persisted checkpoint — resumability
    itself is the streaming checkpoint + idempotent epoch commits.
  * ``remove`` (AdminRemove, owner.go:1028-1076) — feed info is deleted;
    the status (checkpoint-ts) is retained with a 24 h TTL so a mistaken
    remove can be diagnosed (owner.go:1068-1072 ``SetChangeFeedStatusTTL``),
    unless ``force`` (``--force`` / ForceRemove) which drops everything.
  * ``finish`` (AdminFinish, owner.go:938-946) — automatic when the
    checkpoint reaches ``target_ts``; a finished feed never runs again and
    cannot be resumed.

State machine (model/changefeed.go:46-52): normal | stopped | failed |
removed | finished. Pause on stopped/removed/finished is an explicit no-op
(owner.go:996-1005); resume on removed/finished is refused
(owner.go:1085-1088).

A ``ChangeFeed`` constructed with ``admin=registry, feed_name=...`` consults
the registry before every run (a non-``normal`` feed processes nothing) and
reports failures into it (state → ``failed`` + error history), mirroring how
processors watch the etcd info key for admin-job changes.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

# model/changefeed.go:46-52
STATE_NORMAL = "normal"
STATE_STOPPED = "stopped"
STATE_FAILED = "failed"
STATE_REMOVED = "removed"
STATE_FINISHED = "finished"

# model/owner.go:43-48
ADMIN_NONE = "none"
ADMIN_STOP = "stop changefeed"
ADMIN_RESUME = "resume changefeed"
ADMIN_REMOVE = "remove changefeed"
ADMIN_FINISH = "finish changefeed"

STATUS_TTL_S = 24 * 3600  # owner.go:1070 SetChangeFeedStatusTTL(…, 24*3600)

# Error-history window constants (model/changefeed.go:54-64): error records
# older than the GC interval are pruned from the info; a feed whose errors
# within the CHECK interval reach the threshold is rate-limited — the owner
# stops re-initializing it until the window clears.
ERROR_HISTORY_GC_INTERVAL_MS = 10 * 60 * 1000
ERROR_HISTORY_CHECK_INTERVAL_MS = 2 * 60 * 1000
ERROR_HISTORY_THRESHOLD = 5


class FeedLifecycleError(RuntimeError):
    """An admin operation that the reference refuses (e.g. resume of a
    removed feed, create of a live duplicate, start-ts below the GC
    safepoint)."""


class FastFailError(FeedLifecycleError):
    """An error that is meaningless to retry (pkg/filter/errors.go
    ChangefeedFastFailError — the reference's only member is
    ErrStartTsBeforeGC): the supervisor marks the feed ``failed``
    immediately instead of retrying with backoff."""


def table_gc_safepoint(table) -> int | None:
    """The oldest upstream ts this lake table can still serve a consistent
    snapshot for: the smallest syncpoint whose manifest survived
    expire_versions. None = unconstrained (fresh table / no syncpoints).
    The analog of the PD service GC safepoint the reference checks at feed
    creation (pkg/util/gc_service.go:31-43)."""
    pts = [
        sp["primary_ts"]
        for sp in getattr(table, "syncpoints", [])
        if os.path.exists(
            os.path.join(table._mdir, f"v{sp['version']:08d}.json")
        )
    ]
    return min(pts) if pts else None


class FeedRegistry:
    """Atomic-JSON-file registry of changefeed info + status.

    One file per feed under ``<root>/<feed>.json`` — the analog of the etcd
    keys ``/tidb/cdc/changefeed/info/<id>`` and ``/job/<id>``. Writes go
    through tmp+rename so a crashed admin command never leaves a torn file.
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ---------- storage ----------
    def _path(self, feed: str) -> str:
        if "/" in feed or feed.startswith("."):
            raise FeedLifecycleError(f"invalid feed id {feed!r}")
        return os.path.join(self.root, f"{feed}.json")

    def _load(self, feed: str) -> dict[str, Any] | None:
        try:
            with open(self._path(feed)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _store(self, feed: str, info: dict[str, Any]) -> None:
        tmp = self._path(feed) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(info, f, indent=1, sort_keys=True)
        os.replace(tmp, self._path(feed))

    # ---------- lifecycle ----------
    def create(
        self,
        feed: str,
        start_ts: int | None = None,
        gc_tables: list | None = None,
        gc_safepoint_ts: int | None = None,
        check_gc_safe_point: bool = True,
        **config: Any,
    ) -> dict[str, Any]:
        """Register a feed in state ``normal``. Re-creating over a REMOVED
        feed is allowed (the reference deletes the info key on remove, so
        the id becomes free); over a live feed it is an error.

        start_ts validation (pkg/util/gc_service.go:31-43
        CheckSafetyOfStartTs, surfaced by `changefeed create`,
        cmd/client_changefeed.go — ErrStartTsBeforeGC): a feed cannot start
        below the point history has been garbage-collected past. The lake
        analog of the PD service GC safepoint is the oldest RETAINED
        syncpoint (expire_versions deletes older snapshots — resuming below
        it is impossible); pass the target tables via ``gc_tables`` or an
        explicit ``gc_safepoint_ts``. ``check_gc_safe_point=False`` is the
        reference's --disable-gc-check escape hatch (config.py's
        check-gc-safe-point toml key)."""
        cur = self._load(feed)
        if cur is not None and cur["state"] != STATE_REMOVED:
            raise FeedLifecycleError(
                f"changefeed {feed!r} already exists in state {cur['state']!r}"
            )
        if start_ts is not None and check_gc_safe_point:
            floor = gc_safepoint_ts
            for t in gc_tables or []:
                sp = table_gc_safepoint(t)
                if sp is not None:
                    floor = sp if floor is None else max(floor, sp)
            if floor is not None and start_ts < floor:
                # the one ChangefeedFastFailError member — retrying cannot
                # help, so supervisors fail the feed outright
                raise FastFailError(
                    f"start-ts {start_ts} is earlier than the GC safepoint "
                    f"{floor}: the required history has been expired "
                    "(ErrStartTsBeforeGC, pkg/util/gc_service.go:39-41)"
                )
        if start_ts is not None:
            config["start_ts"] = start_ts
        info = {
            "feed": feed,
            "state": STATE_NORMAL,
            "admin_job_type": ADMIN_NONE,
            "error": None,
            "error_his": [],  # ms timestamps, owner.go:1015
            "checkpoint_ts": None,
            "config": config,
        }
        self._store(feed, info)
        return info

    def pause(self, feed: str, error: str | None = None) -> dict[str, Any]:
        """AdminStop: state → stopped, checkpoint preserved. No-op (returns
        current info) when already stopped/removed/finished
        (owner.go:996-1005)."""
        info = self._require(feed)
        if info["state"] in (STATE_STOPPED, STATE_REMOVED, STATE_FINISHED):
            return info
        info["state"] = STATE_STOPPED
        info["admin_job_type"] = ADMIN_STOP
        if error is not None:
            info["error"] = error
            info["error_his"].append(int(time.time() * 1000))
        self._store(feed, info)
        return info

    def resume(self, feed: str) -> dict[str, Any]:
        """AdminResume: state → normal, last error cleared
        (owner.go:1100-1104). Removed/finished feeds cannot be resumed
        (owner.go:1085-1088)."""
        info = self._require(feed)
        if info["state"] in (STATE_REMOVED, STATE_FINISHED):
            raise FeedLifecycleError(
                f"changefeed {feed!r} is {info['state']} and cannot be resumed"
            )
        info["state"] = STATE_NORMAL
        info["admin_job_type"] = ADMIN_RESUME
        info["error"] = None
        self._store(feed, info)
        return info

    def update(self, feed: str, **changes: Any) -> dict[str, Any]:
        """`cdc cli changefeed update` (cmd/client_changefeed.go:497-580
        newUpdateChangefeedCommand): mutate the config of an EXISTING feed —
        target-ts, sink-uri, filter rules, cyclic settings, sync-point, free
        opts — refused unless the feed is STOPPED ("can only update
        changefeed config when it is stopped"); removed/finished feeds have
        no updatable info. The applied change set is recorded on the info as
        ``changelog`` entries (the reference diffs old vs new and prints the
        changelog before confirming).

        ``start_ts`` and the feed id are immutable (the reference's cli
        does not expose them as update flags; here passing one raises
        instead of silently ignoring it)."""
        info = self._require(feed)
        if info["state"] in (STATE_REMOVED, STATE_FINISHED):
            raise FeedLifecycleError(
                f"changefeed {feed!r} is {info['state']} and cannot be updated"
            )
        if info["state"] != STATE_STOPPED:
            raise FeedLifecycleError(
                "can only update changefeed config when it is stopped; "
                f"changefeed {feed!r} is {info['state']} "
                "(cmd/client_changefeed.go:570-578)"
            )
        for k in ("feed", "start_ts"):
            if k in changes:
                raise FeedLifecycleError(f"{k} cannot be updated")
        changelog = []
        for k, v in sorted(changes.items()):
            old = info["config"].get(k)
            if old != v:
                changelog.append({"field": k, "old": old, "new": v})
                info["config"][k] = v
        info.setdefault("changelog", []).extend(changelog)
        self._store(feed, info)
        return info

    def remove(self, feed: str, force: bool = False) -> dict[str, Any] | None:
        """AdminRemove: delete feed info. Without ``force`` the status
        (checkpoint_ts) is kept under a TTL marker (owner.go:1068-1072);
        with ``force`` everything is dropped (ForceRemove)."""
        info = self._load(feed)
        if info is None:
            return None
        if force:
            os.unlink(self._path(feed))
            return None
        info["state"] = STATE_REMOVED
        info["admin_job_type"] = ADMIN_REMOVE
        info["status_ttl_s"] = STATUS_TTL_S
        info["removed_at_ms"] = int(time.time() * 1000)
        self._store(feed, info)
        return info

    def finish(self, feed: str) -> dict[str, Any]:
        """AdminFinish: the feed's checkpoint reached target_ts
        (owner.go:938-946). Terminal — resume is refused afterwards."""
        info = self._require(feed)
        if info["state"] in (STATE_REMOVED, STATE_FINISHED):
            return info
        info["state"] = STATE_FINISHED
        info["admin_job_type"] = ADMIN_FINISH
        self._store(feed, info)
        return info

    def set_failed(self, feed: str, error: str) -> dict[str, Any]:
        """Processing error: state → failed with error history — the
        ``StateFailed`` transition the owner takes when a feed exhausts its
        error retries (changefeed.go run loop)."""
        info = self._require(feed)
        if info["state"] in (STATE_REMOVED, STATE_FINISHED):
            return info
        info["state"] = STATE_FAILED
        info["error"] = error
        info["error_his"].append(int(time.time() * 1000))
        self._store(feed, info)
        return info

    def record_error(
        self,
        feed: str,
        error: str,
        fast_fail: bool = False,
        now_ms: int | None = None,
    ) -> dict[str, Any]:
        """A feed-run error, the owner's loadChangeFeeds failure branch
        (owner.go:617-645): the error and an ms timestamp land on the info;
        a FAST-FAIL error (ChangefeedFastFailError — retrying is
        meaningless) flips state → ``failed`` immediately; any other error
        leaves the state alone so the next owner tick retries, subject to
        the ``check_error_history`` rate limit."""
        info = self._require(feed)
        if info["state"] in (STATE_REMOVED, STATE_FINISHED):
            return info
        info["error"] = error
        info["error_his"].append(
            int(time.time() * 1000) if now_ms is None else int(now_ms)
        )
        if fast_fail:
            info["state"] = STATE_FAILED  # owner.go:625-633
        self._store(feed, info)
        return info

    def check_error_history(
        self, feed: str, now_ms: int | None = None
    ) -> tuple[bool, bool]:
        """model/changefeed.go:211-234 ``CheckErrorHistory``:

        returns ``(need_save, can_init)`` — error records older than the
        10-minute GC interval are pruned (``need_save`` = any were; the
        pruned info is persisted here, the analog of the owner's
        LeaseGuardSaveChangeFeedInfo on needSave, owner.go:561-567), and
        ``can_init`` is False while the errors inside the trailing 2-minute
        window have reached the threshold (5) — the owner then skips
        re-initializing the feed until the window clears."""
        info = self._require(feed)
        now = int(time.time() * 1000) if now_ms is None else int(now_ms)
        his = [int(t) for t in info.get("error_his", [])]
        kept = [t for t in his if now - t < ERROR_HISTORY_GC_INTERVAL_MS]
        need_save = len(kept) < len(his)
        if need_save:
            info["error_his"] = kept
            self._store(feed, info)
        recent = sum(
            1 for t in kept if now - t < ERROR_HISTORY_CHECK_INTERVAL_MS
        )
        return need_save, recent < ERROR_HISTORY_THRESHOLD

    def update_checkpoint(self, feed: str, checkpoint_ts: int) -> None:
        """Status write (checkpoint-ts advance) — monotone, like the owner's
        flushChangeFeedInfos."""
        info = self._require(feed)
        cur = info.get("checkpoint_ts")
        if cur is None or checkpoint_ts > cur:
            info["checkpoint_ts"] = checkpoint_ts
            self._store(feed, info)

    # ---------- queries ----------
    def _require(self, feed: str) -> dict[str, Any]:
        info = self._load(feed)
        if info is None:
            raise FeedLifecycleError(f"changefeed {feed!r} does not exist")
        return info

    def query(self, feed: str) -> dict[str, Any] | None:
        """`cdc cli changefeed query` analog."""
        return self._load(feed)

    def state(self, feed: str) -> str:
        """Current state; a feed with no registry entry runs unmanaged
        (state ``normal``) — admin gating is opt-in."""
        info = self._load(feed)
        return info["state"] if info is not None else STATE_NORMAL

    def list(self) -> list[dict[str, Any]]:
        """`cdc cli changefeed list` analog (sorted by feed id)."""
        out = []
        for fn in sorted(os.listdir(self.root)):
            if fn.endswith(".json"):
                with open(os.path.join(self.root, fn)) as f:
                    out.append(json.load(f))
        return out

    def dump_metadata(self) -> list[tuple[str, dict[str, Any]]]:
        """`cdc cli unsafe show-metadata` analog (cmd/client_unsafe.go:77-95
        GetAllCDCInfo): every stored (key, value) pair — here the registry
        file path stands in for the etcd key."""
        out = []
        for fn in sorted(os.listdir(self.root)):
            if fn.endswith(".json"):
                path = os.path.join(self.root, fn)
                with open(path) as f:
                    out.append((path, json.load(f)))
        return out

    def reset(self) -> dict[str, Any]:
        """`cdc cli unsafe reset` analog (cmd/client_unsafe.go:38-75
        ClearAllCDCInfo): delete EVERY feed's registry entry regardless of
        state — running feeds lose their admin gating and run unmanaged
        from their next batch. The reference additionally zeroes the PD
        service GC safepoint; our GC floor derives from the lake tables'
        retained syncpoints (table_gc_safepoint), so there is no separate
        service-side safepoint object to delete."""
        deleted = []
        for fn in sorted(os.listdir(self.root)):
            if fn.endswith(".json"):
                os.remove(os.path.join(self.root, fn))
                deleted.append(fn[: -len(".json")])
        return {"deleted": deleted}


# AdminJobType numbering (cdc/model/owner.go:43-47: None=0 Stop=1 Resume=2
# Remove=3 Finish=4) — the wire vocabulary of the HTTP admin route and the
# `admin_job_type` the registry records.
ADMIN_JOB_TYPES = {
    0: "none",
    1: "stop",
    2: "resume",
    3: "remove",
    4: "finish",
}


def apply_admin_job(
    registry: FeedRegistry, feed: str, job_type: int, force: bool = False
) -> dict[str, Any] | None:
    """Dispatch a numeric AdminJob onto the registry — the single code path
    behind both the CLI verbs and the HTTP POST /capture/owner/admin route
    (cdc/http_handler.go:101-142 handleChangefeedAdmin → owner.EnqueueJob;
    here the registry IS the owner's store, so the job applies directly).

    Raises ValueError for an unknown job type, FeedLifecycleError for a
    missing feed / invalid transition (the owner's own refusals)."""
    kind = ADMIN_JOB_TYPES.get(int(job_type))
    if kind is None:
        raise ValueError(f"invalid admin job type: {job_type}")
    if kind == "none":
        return registry._require(feed)  # validates existence, mutates nothing
    if kind == "stop":
        return registry.pause(feed)
    if kind == "resume":
        return registry.resume(feed)
    if kind == "remove":
        out = registry.remove(feed, force=force)
        if out is None and not force:
            raise FeedLifecycleError(f"changefeed {feed!r} not found")
        return out
    return registry.finish(feed)


def feed_stats(
    registry: FeedRegistry,
    feed: str,
    lineage_dir: str | None = None,
    table_root: str | None = None,
) -> dict[str, Any] | None:
    """`cdc cli changefeed statistics` analog, shared by the CLI and the
    HTTP /metrics exposition: registry state + (with a lineage dir) event
    count / resolved-ts / sink-gap / OPS from the TaskPosition rows +
    (with a table root) the live/retired span universe. Metadata-only
    reads — no Spark session. Returns None for an unknown feed."""
    info = registry.query(feed)
    if info is None:
        return None
    out: dict[str, Any] = {
        "feed": feed,
        "state": info["state"],
        "checkpoint_ts": info.get("checkpoint_ts"),
    }
    if lineage_dir:
        import glob as _g

        import pyarrow.parquet as _pq

        batch_dirs = sorted(_g.glob(os.path.join(lineage_dir, "batch-*")))
        count = 0
        resolved = None
        for d in batch_dirs:
            t = _pq.read_table(d, columns=["event_count", "resolved_ts"])
            count += sum(t.column("event_count").to_pylist())
            m = max(t.column("resolved_ts").to_pylist(), default=None)
            if m is not None:
                resolved = m if resolved is None else max(resolved, m)
        out["count"] = count
        out["resolved_ts"] = resolved
        # SinkGap analog: resolved - checkpoint (logical ts units)
        if resolved is not None and info.get("checkpoint_ts") is not None:
            out["sink_gap"] = resolved - info["checkpoint_ts"]
        # OPS over the lineage window, from batch-dir mtimes (the
        # reference samples the count twice over wall time)
        if len(batch_dirs) >= 2:
            span = os.path.getmtime(batch_dirs[-1]) - os.path.getmtime(
                batch_dirs[0]
            )
            if span > 0:
                out["ops"] = round(count / span, 1)
        out["batches"] = len(batch_dirs)
    if table_root:
        # span universe straight from the manifest (no Spark job)
        import json as _json

        mdir = os.path.join(table_root, "_manifests")
        with open(os.path.join(mdir, "CURRENT")) as f:
            v = int(f.read().strip())
        with open(os.path.join(mdir, f"v{v:08d}.json")) as f:
            m = _json.load(f)
        wm = m.get("part_watermarks", {})
        out["spans"] = {
            "live": {k: wm[k] for k in sorted(wm, key=int)},
            "retired": m.get("retired_parts", {}),
        }
    return out


class FeedSupervisor:
    """The owner's per-tick feed-maintenance loop (owner.go:527-660
    ``loadChangeFeeds``) over a :class:`FeedRegistry`: every tick it decides,
    per feed, whether to (re-)run the feed's batch or hold off.

      * ``failed`` feeds are skipped permanently until an operator resumes
        them; the skip is logged ONCE per failure episode via the
        ``fail_init_feeds`` set (owner.go:549-560), and leaving ``failed``
        clears the entry ("changefeed recovered from failure").
      * other non-``normal`` states (stopped/removed/finished) are skipped.
      * ``check_error_history`` gates re-initialization: ≥5 errors in the
        trailing 2 minutes → the tick reports ``rate-limited`` and the run
        is deferred (owner.go:569-575).
      * a run that raises is recorded with :meth:`FeedRegistry.record_error`;
        a :class:`FastFailError` (ErrStartTsBeforeGC analog) flips the feed
        to ``failed``; anything else leaves it ``normal`` for the next tick's
        retry (owner.go:617-645).

    ``now_ms`` is injectable everywhere so the window arithmetic is
    deterministic under test — the reference pins time the same way in
    model/changefeed_test.go TestCheckErrorHistory.
    """

    def __init__(self, registry: FeedRegistry):
        self.registry = registry
        self.fail_init_feeds: set[str] = set()  # owner.go Owner.failInitFeeds

    def tick(
        self,
        runners: dict[str, Any],
        now_ms: int | None = None,
    ) -> dict[str, str]:
        """Run one owner tick over ``{feed_id: zero-arg callable}``. Returns
        the per-feed outcome: ``ran`` | ``skipped:<state>`` |
        ``rate-limited`` | ``error-retry`` | ``error-failed``."""
        out: dict[str, str] = {}
        for feed, run in runners.items():
            st = self.registry.state(feed)
            if st == STATE_FAILED:
                if feed not in self.fail_init_feeds:
                    self.fail_init_feeds.add(feed)  # log-once semantics
                out[feed] = f"skipped:{STATE_FAILED}"
                continue
            if feed in self.fail_init_feeds:
                # "changefeed recovered from failure" (owner.go:557-560)
                self.fail_init_feeds.discard(feed)
            if st in (STATE_STOPPED, STATE_REMOVED, STATE_FINISHED):
                out[feed] = f"skipped:{st}"
                continue
            if self.registry.query(feed) is not None:
                _, can_init = self.registry.check_error_history(feed, now_ms)
                if not can_init:
                    out[feed] = "rate-limited"
                    continue
            try:
                run()
            except FastFailError as e:
                self.registry.record_error(
                    feed, str(e), fast_fail=True, now_ms=now_ms
                )
                out[feed] = "error-failed"
            except Exception as e:  # transient: retry next tick
                self.registry.record_error(
                    feed, str(e), fast_fail=False, now_ms=now_ms
                )
                out[feed] = "error-retry"
            else:
                out[feed] = "ran"
        return out
