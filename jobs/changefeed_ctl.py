"""Changefeed admin CLI — the `cdc cli changefeed pause/resume/update/remove/
query/list` analog (reference: cmd/client_changefeed.go, admin jobs handled in
cdc/owner.go:966-1128).

Operates purely on the feed registry (no Spark session): a running
changefeed started with ``--admin-dir`` checks the registry at every
micro-batch boundary, so a pause here stops it at the next batch without
committing that batch (resume replays it — exactly-once preserved).

    python jobs/changefeed_ctl.py --admin-dir /ckpt/_admin pause  feed1
    python jobs/changefeed_ctl.py --admin-dir /ckpt/_admin pause  feed1 --error "operator stop"
    python jobs/changefeed_ctl.py --admin-dir /ckpt/_admin resume feed1
    python jobs/changefeed_ctl.py --admin-dir /ckpt/_admin update feed1 --set target_ts=2000000
    python jobs/changefeed_ctl.py --admin-dir /ckpt/_admin remove feed1 [--force]
    python jobs/changefeed_ctl.py --admin-dir /ckpt/_admin stats  feed1 --lineage-dir /ckpt/lineage
    python jobs/changefeed_ctl.py --admin-dir /ckpt/_admin query  feed1
    python jobs/changefeed_ctl.py --admin-dir /ckpt/_admin list
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--admin-dir",
        default=None,
        help="feed registry dir (required for changefeed commands)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser(
        "create",
        help="register a feed (cmd/client_changefeed.go changefeed create: "
        "start-ts validated against the GC safepoint unless "
        "--disable-gc-check; the running job picks the config up via "
        "--admin-dir/--feed)",
    )
    sp.add_argument("feed")
    sp.add_argument("--start-ts", type=int, default=None)
    sp.add_argument("--target-ts", type=int, default=None)
    sp.add_argument("--sink-uri", default=None)
    sp.add_argument(
        "--gc-table-root", action="append", default=[],
        help="lake table root whose retained syncpoints bound start-ts "
        "(repeatable); metadata-only read, no Spark",
    )
    sp.add_argument("--gc-safepoint-ts", type=int, default=None)
    sp.add_argument(
        "--disable-gc-check", action="store_true",
        help="the reference's --disable-gc-check escape hatch",
    )
    sp.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        help="extra config fields (values parse as JSON when possible)",
    )

    sp = sub.add_parser("pause", help="AdminStop: halt, keep checkpoint")
    sp.add_argument("feed")
    sp.add_argument("--error", default=None, help="record an operator error")

    sp = sub.add_parser("resume", help="AdminResume: clear error, restart")
    sp.add_argument("feed")

    sp = sub.add_parser(
        "update",
        help="update a STOPPED feed's config (cmd/client_changefeed.go:497-580)",
    )
    sp.add_argument("feed")
    sp.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        help="config field to change (repeatable); values parse as JSON "
        "when possible, else strings — e.g. --set target_ts=2000000 "
        "--set sink_uri=kafka://broker/topic",
    )

    sp = sub.add_parser("remove", help="AdminRemove: delete feed info")
    sp.add_argument("feed")
    sp.add_argument(
        "--force", action="store_true",
        help="drop the status too (ForceRemove); default keeps checkpoint "
        "info under a 24 h TTL marker (owner.go:1068-1072)",
    )

    sp = sub.add_parser(
        "stats",
        help="one statistics snapshot (profileStatus analog: Count/OPS/"
        "SinkGap, cmd/client_changefeed.go:628-680)",
    )
    sp.add_argument("feed")
    sp.add_argument(
        "--lineage-dir", default=None,
        help="the feed's lineage dir (TaskPosition rows): enables "
        "count/OPS/sink-gap; without it only registry state is shown",
    )
    sp.add_argument(
        "--table-root", default=None,
        help="the feed's lake-table root: adds the span universe (live "
        "span positions + retired spans with their final checkpoints — "
        "the region-topology view after splits/merges)",
    )

    sp = sub.add_parser("query", help="show one feed's info + status")
    sp.add_argument("feed")

    sub.add_parser("list", help="list all feeds")

    sp = sub.add_parser(
        "unsafe-reset",
        help="delete ALL feed metadata (cdc cli unsafe reset analog; the "
        "GC floor lives in the lake tables' syncpoints, so nothing else "
        "to truncate)",
    )
    sp.add_argument(
        "--no-confirm", action="store_true",
        help="skip the Y/N prompt (cmd/client_unsafe.go confirmMetaDelete)",
    )

    sub.add_parser(
        "unsafe-show-metadata", help="dump every stored registry entry"
    )

    sp = sub.add_parser(
        "tso",
        help="`cdc cli tso query` analog: the upstream's current ts — max "
        "commit_ts across the binlog dir, from parquet FOOTER stats only "
        "(no data read, no Spark)",
    )
    sp.add_argument("--binlog", required=True, help="binlog directory")

    # capture / processor keyspace reads (cmd/client_capture.go:34-57,
    # cmd/client_processor.go:21-99) — over the scheduler state file +
    # table manifests, no Spark session and no feed registry needed
    sp = sub.add_parser(
        "capture-list",
        help="`cdc cli capture list` analog: captures + table counts",
    )
    sp.add_argument("--scheduler-state", required=True, help="TableScheduler state file")

    sp = sub.add_parser(
        "processor-list",
        help="`cdc cli processor list` analog: every (capture, table)",
    )
    sp.add_argument("--scheduler-state", required=True)

    sp = sub.add_parser(
        "processor-query",
        help="`cdc cli processor query` analog: a capture's per-table "
        "positions (checkpoint ts, spans, schema version) from manifests",
    )
    sp.add_argument("--scheduler-state", required=True)
    sp.add_argument("capture")
    sp.add_argument("--table", default=None)

    args = p.parse_args()

    if args.cmd == "tso":
        # cmd/client_tso.go prints the PD TSO; our upstream clock is the
        # binlog's committed frontier. Footer statistics only — O(files)
        # metadata reads, zero row data.
        import glob as _g

        import pyarrow.parquet as _pq

        mx, n_rows, n_files = None, 0, 0
        for f in sorted(
            _g.glob(os.path.join(args.binlog, "**", "*.parquet"), recursive=True)
        ):
            md = _pq.ParquetFile(f).metadata
            n_files += 1
            n_rows += md.num_rows
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            if "commit_ts" not in idx:
                continue
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx["commit_ts"]).statistics
                if st is not None and st.has_min_max:
                    v = int(st.max)
                    mx = v if mx is None else max(mx, v)
        if n_files == 0:
            print(f"no parquet files under {args.binlog!r}", file=sys.stderr)
            return 1
        if mx is None:
            # files exist but none carries commit_ts column statistics —
            # the query is unanswerable; an explicit error, not {"tso":null}
            print(
                f"no commit_ts statistics in any parquet file under "
                f"{args.binlog!r}",
                file=sys.stderr,
            )
            return 1
        print(json.dumps(
            {"tso": mx, "n_files": n_files, "n_events": n_rows}, sort_keys=True
        ))
        return 0

    if args.cmd in ("capture-list", "processor-list", "processor-query"):
        from ticdc_spark.streaming.scheduler import (
            capture_list,
            processor_list,
            processor_query,
        )

        try:
            if args.cmd == "capture-list":
                out = capture_list(args.scheduler_state)
            elif args.cmd == "processor-list":
                out = processor_list(args.scheduler_state)
            else:
                out = processor_query(
                    args.scheduler_state, args.capture, table=args.table
                )
        except (KeyError, OSError) as e:
            print(str(e), file=sys.stderr)
            return 1
        print(json.dumps(out, indent=1, sort_keys=True))
        return 0

    if not args.admin_dir:
        print("--admin-dir is required for changefeed commands", file=sys.stderr)
        return 1

    from ticdc_spark.streaming.admin import FeedLifecycleError, FeedRegistry

    reg = FeedRegistry(args.admin_dir)
    try:
        if args.cmd == "create":
            changes = {}
            # keys with dedicated flags/positional args must not ride in
            # via --set: splatting them into reg.create(start_ts=..., **)
            # would raise a bare TypeError (cmd/client_changefeed.go parses
            # these from dedicated flags for the same reason)
            reserved = {"start_ts", "gc_tables", "gc_safepoint_ts",
                        "check_gc_safe_point", "target_ts", "sink_uri"}
            for kv in args.set:
                k, _, v = kv.partition("=")
                if k in reserved:
                    print(
                        f"--set {k}=... is not allowed: use the dedicated "
                        f"--{k.replace('_', '-')} flag",
                        file=sys.stderr,
                    )
                    return 1
                try:
                    changes[k] = json.loads(v)
                except ValueError:
                    changes[k] = v
            if args.target_ts is not None:
                # verifyTargetTs (cmd/client_changefeed.go): a feed whose
                # end precedes its start can never replicate anything
                if args.start_ts is not None and args.target_ts <= args.start_ts:
                    print(
                        f"target-ts {args.target_ts} must be > start-ts "
                        f"{args.start_ts}",
                        file=sys.stderr,
                    )
                    return 1
                changes["target_ts"] = args.target_ts
            if args.sink_uri is not None:
                changes["sink_uri"] = args.sink_uri
            gc_tables = []
            if args.gc_table_root:
                # metadata-only table handles: syncpoints/_mdir reads need
                # no Spark session
                from ticdc_spark.lake.table import LakeTable

                gc_tables = [LakeTable(None, r) for r in args.gc_table_root]
            out = reg.create(
                args.feed,
                start_ts=args.start_ts,
                gc_tables=gc_tables,
                gc_safepoint_ts=args.gc_safepoint_ts,
                check_gc_safe_point=not args.disable_gc_check,
                **changes,
            )
        elif args.cmd == "pause":
            out = reg.pause(args.feed, error=args.error)
        elif args.cmd == "resume":
            out = reg.resume(args.feed)
        elif args.cmd == "update":
            changes = {}
            for kv in args.set:
                k, _, v = kv.partition("=")
                try:
                    changes[k] = json.loads(v)
                except ValueError:
                    changes[k] = v
            out = reg.update(args.feed, **changes)
        elif args.cmd == "remove":
            out = reg.remove(args.feed, force=args.force) or {
                "feed": args.feed, "state": "removed", "force": args.force
            }
        elif args.cmd == "stats":
            info = reg.query(args.feed)
            if info is None:
                print(f"changefeed {args.feed!r} not found", file=sys.stderr)
                return 1
            # shared with the HTTP /metrics exposition (admin.feed_stats)
            from ticdc_spark.streaming.admin import feed_stats

            out = feed_stats(
                reg,
                args.feed,
                lineage_dir=args.lineage_dir,
                table_root=args.table_root,
            )
        elif args.cmd == "query":
            out = reg.query(args.feed)
            if out is None:
                print(f"changefeed {args.feed!r} not found", file=sys.stderr)
                return 1
        elif args.cmd == "unsafe-reset":
            if not args.no_confirm:
                # cmd/client_unsafe.go confirmMetaDelete
                print(
                    "Confirm that you know what this command will do and "
                    "use it at your own risk [Y/N]"
                )
                if input().strip().lower() != "y":
                    print("abort meta command", file=sys.stderr)
                    return 1
            out = reg.reset()
        elif args.cmd == "unsafe-show-metadata":
            out = [
                {"key": k, "value": v} for k, v in reg.dump_metadata()
            ]
        else:
            out = reg.list()
    except FeedLifecycleError as e:
        print(str(e), file=sys.stderr)
        return 1
    print(json.dumps(out, indent=1, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
