"""Owner-side table scheduling across captures — move-table + rebalance.

Reference semantics (re-expressed, not ported):

  * the owner assigns every replicated table to exactly one capture and can
    MOVE a table between captures with a two-phase job — remove from the
    source at a boundary ts, then add to the target at that same boundary —
    never dispatching the add before the remove's checkpoint is durable
    (cdc/changefeed.go:505-590 handleMoveTableJobs, MoveTableStatusNone →
    Deleted → Finished; boundary = the changefeed's global resolved ts,
    changefeed.go:546-552).
  * rebalance picks overflow tables from captures holding more than
    ceil(total/captures) and redistributes them to idle captures
    (pkg/scheduler/table_number.go:46-84 CalRebalanceOperates); workload
    skew is measured as std/mean of per-capture workload sums
    (pkg/scheduler/workload.go:70-93).
  * orphan tables (not yet assigned) are spread to the least-loaded capture
    (table_number.go:85-103 DistributeTables via SelectIdleCapture).

Spark mapping: a "capture" is a MultiTableChangeFeed with its own streaming
checkpoint over the SAME binlog directory (each capture drains every file
and routes only its assigned tables; unassigned rows are dropped by the
table dispatcher, and the above-frontier data tail — ALL tables' — persists
in each capture's pending/ dir). That tail is what makes the handoff exact:

    boundary = source capture's resolved frontier at the move
      * every moved-table event with commit_ts <= boundary was already
        committed by the source (its released prefix);
      * every event ABOVE the boundary from already-consumed files sits in
        the TARGET's own pending tail (the tail is written unfiltered,
        multi.py _process_batch_inner), and future files arrive normally;
      * the target's add-boundary filter (commit_ts > boundary) excludes
        any overlap, so each event applies exactly once — the lake table's
        epoch commits are feed-scoped, so source and target commits never
        collide.

Precondition enforced here: the target's resolved frontier must not be
AHEAD of the source's (it would have already released-and-dropped moved-
table events above the boundary). Captures driven in lockstep by tick()
always satisfy this (same files → same deterministic frontier fold).

Schema note: in typed mode a capture's stream schema is the union of its
OWN tables' payload columns, so a moved table's payload must be covered by
the target's union (homogeneous token tables — the engine's north-rule
shape — always are). raw mode (JSON payload) is schema-free and safe for
heterogeneous moves; validated below.

Crash safety: the job log is a JSON state file written tmp+os.replace (the
same atomic-commit discipline as the lake manifests). Jobs survive a
scheduler restart; re-applying a finished job is idempotent (remove_table /
add_table set plain dict entries).
"""

from __future__ import annotations

import json
import math
import os

from ..lake.table import LakeTable

ST_NONE = "none"
ST_DELETED = "deleted"  # MoveTableStatusDeleted
ST_FINISHED = "finished"  # MoveTableStatusFinished


def skewness(workloads: dict[str, dict[str, float]]) -> float:
    """std/mean of per-capture workload sums (workload.go:70-93); 0.0 for a
    perfectly even assignment, 0 captures → 0."""
    if not workloads:
        return 0.0
    sums = [float(sum(w.values())) for w in workloads.values()]
    mean = sum(sums) / len(sums)
    if mean == 0:
        return 0.0
    var = sum((s - mean) ** 2 for s in sums) / len(sums)
    return math.sqrt(var) / mean


def distribute_tables(
    workloads: dict[str, dict[str, float]], orphans: list[str]
) -> dict[str, list[str]]:
    """Assign each orphan table to the least-loaded capture, updating the
    load as we go (DistributeTables / SelectIdleCapture,
    table_number.go:85-103). Deterministic: ties break on capture id (the
    reference iterates a Go map — nondeterministic there; a replayable
    plan needs a total order)."""
    if not workloads:
        raise ValueError("no captures to distribute to")
    load = {cid: float(sum(w.values())) for cid, w in workloads.items()}
    out: dict[str, list[str]] = {cid: [] for cid in workloads}
    for t in sorted(orphans):
        cid = min(sorted(load), key=lambda c: load[c])
        out[cid].append(t)
        load[cid] += 1.0
    return {cid: ts for cid, ts in out.items() if ts}


def rebalance_plan(
    workloads: dict[str, dict[str, float]],
) -> list[tuple[str, str, str]]:
    """(table, from, to) moves that bring every capture under
    ceil-ish limit = total/num + 1 (CalRebalanceOperates,
    table_number.go:46-84): victims are drained from over-limit captures,
    then redistributed like orphans; moves that land where they started are
    dropped. Deterministic victim choice: smallest table id first."""
    if not workloads:
        return []
    total = sum(len(w) for w in workloads.values())
    limit = total / len(workloads) + 1
    pool = {cid: dict(w) for cid, w in workloads.items()}
    victims: list[tuple[str, str]] = []  # (table, from)
    for cid in sorted(pool):
        w = pool[cid]
        while len(w) >= limit:
            t = sorted(w)[0]
            del w[t]
            victims.append((t, cid))
    placed = distribute_tables(pool, [t for t, _ in victims])
    src_of = dict(victims)
    moves = []
    for cid, ts in placed.items():
        for t in ts:
            if src_of[t] != cid:
                moves.append((t, src_of[t], cid))
    return sorted(moves)


class TableScheduler:
    """Drives a set of capture feeds in lockstep and executes two-phase
    move-table jobs between their batches.

    captures: {capture_id: MultiTableChangeFeed} — all over the same binlog
    dir.  state_path: the atomic job log."""

    def __init__(self, captures: dict, state_path: str):
        if not captures:
            raise ValueError("need at least one capture")
        if len({os.path.abspath(c.binlog_dir) for c in captures.values()}) > 1:
            raise ValueError("captures must share one binlog dir")
        self.captures = dict(captures)
        self.state_path = state_path
        self.jobs: list[dict] = []
        if os.path.exists(state_path):
            with open(state_path) as f:
                self.jobs = json.load(f)["jobs"]
        # re-apply surviving effects of every persisted job (idempotent):
        # a restarted scheduler gets freshly-constructed captures that no
        # longer carry past moves in their config
        for job in self.jobs:
            if job["status"] in (ST_DELETED, ST_FINISHED):
                src = self.captures.get(job["from"])
                if src is not None and job["table"] in src.tables:
                    src.remove_table(job["table"], job["boundary"])
            if job["status"] == ST_FINISHED:
                dst = self.captures.get(job["to"])
                if dst is not None and job["table"] not in dst.tables:
                    dst.add_table(
                        job["table"],
                        LakeTable(dst.spark, job["root"]),
                        boundary_ts=job["boundary"],
                    )

    # -- introspection -----------------------------------------------------
    def workloads(self) -> dict[str, dict[str, float]]:
        """Live assignment as unit workloads (TaskWorkload analog): a
        stopped (moved-away) table no longer counts against its capture."""
        out: dict[str, dict[str, float]] = {}
        for cid, cf in self.captures.items():
            out[cid] = {
                t: 1.0 for t in cf.tables if t not in cf.stop_ts
            }
        return out

    def skewness(self) -> float:
        return skewness(self.workloads())

    # -- the two-phase move job (handleMoveTableJobs analog) ---------------
    def move_table(self, table: str, src_id: str, dst_id: str) -> dict:
        """Enqueue a move job (status=none). Executed by the next tick()
        between batches — mirroring the owner, which only flips job states
        when no operation is still unapplied (changefeed.go:512-516)."""
        src, dst = self.captures[src_id], self.captures[dst_id]
        if table not in src.tables or table in src.stop_ts:
            raise ValueError(f"{table!r} is not live on capture {src_id!r}")
        if getattr(src, "dynamic_spans", False) or getattr(
            dst, "dynamic_spans", False
        ):
            raise ValueError(
                "move_table across dynamic-span (split/merge) captures is "
                "not supported: a retirement committed by the source after "
                "the handoff clamp would race the target's span map"
            )
        if table in dst.tables:
            raise ValueError(f"{table!r} already on capture {dst_id!r}")
        if src.mode == "typed":
            # the target's typed stream schema must already cover the moved
            # table's payload columns (see module docstring); raw mode needs
            # no check
            src_cols = {
                (f["name"], f["type"])
                for ver in src.registries[table].versions
                for f in ver
            }
            dst_cols = {
                (f.name, f.dataType.simpleString())
                for f in dst._stream_schema().fields
            }
            missing = {
                (n, t) for n, t in src_cols if (n, t) not in dst_cols
            }
            if missing:
                raise ValueError(
                    f"typed-mode move of {table!r} needs payload columns "
                    f"{sorted(missing)} in the target capture's stream "
                    "schema; use mode='raw' for heterogeneous moves"
                )
        job = {
            "table": table,
            "from": src_id,
            "to": dst_id,
            "status": ST_NONE,
            "boundary": None,
            "root": src.tables[table].root,
        }
        self.jobs.append(job)
        self._save()
        return job

    def rebalance(self) -> list[dict]:
        """Enqueue the moves of the deterministic rebalance plan
        (CalRebalanceOperates analog)."""
        return [
            self.move_table(t, s, d)
            for t, s, d in rebalance_plan(self.workloads())
        ]

    # -- lockstep driver ----------------------------------------------------
    def tick(self) -> dict[str, list[dict]]:
        """One scheduling round: drain every capture's available binlog,
        then advance move jobs. Phase 1 (none→deleted) stops the table on
        the source at boundary = the source's resolved frontier, persisted
        BEFORE phase 2 — a crash between phases resumes with the stop
        already in force (the reference guards the add on the flushed
        checkpoint, changefeed.go:558-565). Phase 2 (deleted→finished) adds
        the table to the target at the same boundary."""
        summaries = {
            cid: cf.run_available() for cid, cf in sorted(self.captures.items())
        }
        for job in self.jobs:
            if job["status"] == ST_NONE:
                src = self.captures[job["from"]]
                dst = self.captures[job["to"]]
                s_res = self._resolved(src)
                d_res = self._resolved(dst)
                if s_res is None:
                    continue  # source never ran — nothing to hand off yet
                if d_res is not None and d_res > s_res:
                    raise RuntimeError(
                        f"target capture {job['to']!r} frontier {d_res} is "
                        f"ahead of source {job['from']!r} frontier {s_res}: "
                        "it has already released (and dropped) events above "
                        "the boundary — captures must run in lockstep"
                    )
                job["boundary"] = int(s_res)
                src.remove_table(job["table"], job["boundary"])
                # hand the span map over clean: positions above the boundary
                # were the source pipeline's observations — the target's
                # puller starts at StartTs = boundary (changefeed.go:546-552)
                # and must rebuild its own view above it. Idempotent epoch id
                # → a crash between phases replays to the same state.
                t = src.tables.get(job["table"]) or LakeTable(
                    src.spark, job["root"]
                )
                t.clamp_watermarks(
                    job["boundary"],
                    f"move-{job['table']}-{job['from']}-{job['to']}-clamp",
                )
                job["status"] = ST_DELETED
                self._save()
            if job["status"] == ST_DELETED:
                dst = self.captures[job["to"]]
                dst.add_table(
                    job["table"],
                    LakeTable(dst.spark, job["root"]),
                    boundary_ts=job["boundary"],
                )
                job["status"] = ST_FINISHED
                self._save()
        return summaries

    @staticmethod
    def _resolved(cf) -> int | None:
        if cf.batch_summaries:
            return int(cf.batch_summaries[-1]["resolved_ts"])
        # restart: the durable frontier lives in the tables' span maps —
        # min over the capture's live tables' own positions
        vals = []
        for name, t in cf.tables.items():
            if name in cf.stop_ts:
                continue
            m = {int(k): int(v) for k, v in t.part_watermarks.items()}
            if m:
                vals.append(min(m.values()))
        return min(vals) if vals else None

    def _save(self) -> None:
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"jobs": self.jobs}, f, indent=1)
        os.replace(tmp, self.state_path)
