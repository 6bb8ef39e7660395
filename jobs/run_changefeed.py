"""Run a changefeed with spark-submit (the `cdc cli changefeed create`
analog, SURVEY.md §3.1):

    spark-submit --py-files ticdc_spark.zip jobs/run_changefeed.py \
        --binlog /data/binlog/'chunk-*' --table /lake/target_tokens \
        --checkpoint /ckpt/feed1 --lineage /lake/_lineage/feed1 \
        [--mode typed|raw] [--ddl /data/ddl] [--trigger "10 seconds"] \
        [--available-now] [--max-files-per-trigger 32] [--buckets 256]

On a cluster, masters/executors come from spark-submit; locally this builds
a local[*] session. The job creates the lake table if missing, then runs the
Structured Streaming changefeed (resumable from the checkpoint; exactly-once
via idempotent epoch merges).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--binlog", required=True, help="binlog dir or glob")
    p.add_argument("--table", help="lake table root (single-table feed)")
    p.add_argument(
        "--tables",
        help="multi-table feed: comma list of name=path (events routed by "
        "the binlog's `table` column; DDLs routed per table)",
    )
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--lineage", default=None)
    p.add_argument("--mode", choices=["typed", "raw"], default="typed")
    p.add_argument("--ddl", default=None, help="DDL-events parquet dir")
    p.add_argument("--trigger", default="10 seconds")
    p.add_argument("--available-now", action="store_true")
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument(
        "--n-parts", type=int, default=None,
        help="binlog partition universe: unseen parts hold the resolved "
             "frontier back (required when the DDL stream carries "
             "truncate/partition-drop data operations)",
    )
    p.add_argument(
        "--dynamic-spans", action="store_true",
        help="accept span-topology control events (op S/M: region "
             "split/merge — children resubscribe at the parent's "
             "checkpoint; per-table universes in multi-table feeds)",
    )
    p.add_argument("--buckets", type=int, default=256)
    p.add_argument(
        "--start-ts", type=int, default=None,
        help="replicate events with commit_ts > start_ts (pair with a "
        "LakeTable.bootstrap snapshot at start_ts)",
    )
    p.add_argument(
        "--derived-dedup", default=None, metavar="ROOT",
        help="maintain an incremental near-dup index (pipeline.incremental."
        "IncrementalLSHDeduper) at ROOT, synced after every micro-batch via "
        "the post_batch hook; dedup text = the token array rendered to a "
        "string (single-table feeds only)",
    )
    p.add_argument(
        "--derived-decontam", default=None, metavar="ROOT",
        help="maintain an incremental decontamination index (pipeline."
        "incremental.IncrementalDecontaminator) at ROOT, synced after every "
        "micro-batch; requires --eval-docs on first creation (single-table "
        "feeds only)",
    )
    p.add_argument(
        "--eval-docs", default=None, metavar="PARQUET",
        help="eval/benchmark docs parquet (doc_id, text) whose 8-grams "
        "define contamination for --derived-decontam",
    )
    p.add_argument(
        "--metrics-dir", default=None,
        help="write Prometheus textfile-collector metrics (<feed>.prom, "
        "atomically replaced after every micro-batch) to this dir "
        "(single-table feeds)",
    )
    p.add_argument(
        "--config", default=None,
        help="changefeed config file, .toml or .json — the reference's "
        "ReplicaConfig surface (filter rules, sink protocol/dispatchers, "
        "enable-old-value, cyclic). Explicit CLI flags override it.",
    )
    p.add_argument(
        "--sink-uri", default=None,
        help="reference-style sink-uri (mysql://…, blackhole://, "
        "file:///path, kafka://host/topic?protocol=…&partition-num=…); "
        "kafka URIs need --mq-base (file MQ stands in for the broker)",
    )
    p.add_argument("--mq-base", default=None, help="base dir for kafka:// sink-uris")
    p.add_argument("--mq-dir", default=None, help="MQ sink output dir")
    p.add_argument("--mq-partitions", type=int, default=16)
    p.add_argument(
        "--mq-protocol", default="open",
        choices=["open", "canal-json", "maxwell", "avro", "canal-pb"],
        help="MQ value codec (the reference's protocol= sink-uri option)",
    )
    p.add_argument(
        "--mq-old-value", action="store_true",
        help="enable-old-value: every MQ message carries its pre-change "
        "image (protocols open/maxwell/canal-json; requires ordered "
        "arrival — late events become a hard error)",
    )
    p.add_argument(
        "--mq-dispatch", default="index-value",
        help="single-table dispatch rule (index-value|table|ts|default) OR "
        "multi-table rule list 'glob=rule,glob=rule' (first match wins)",
    )
    p.add_argument(
        "--target-ts", type=int, default=None,
        help="replicate events with commit_ts <= target_ts; the feed "
        "FINISHES when its checkpoint reaches it (changefeed create "
        "--target-ts, model/changefeed.go:74-75)",
    )
    p.add_argument(
        "--admin-dir", default=None,
        help="feed registry dir for pause/resume/remove (jobs/changefeed_ctl.py)",
    )
    p.add_argument(
        "--feed-name", default=None,
        help="feed id in the admin registry (default: basename of --checkpoint)",
    )
    p.add_argument(
        "--supervised", type=int, default=0, metavar="MAX_ATTEMPTS",
        help="run the feed under the owner retry loop (FeedSupervisor): "
        "a failed run records an error in the admin registry and retries "
        "up to MAX_ATTEMPTS times (checkpoint resume makes the retry "
        "idempotent); fast-fail errors mark the feed failed and stop. "
        "Requires --admin-dir and --available-now",
    )
    p.add_argument(
        "--keyless", action="store_true",
        help="force-replicate feed into a KEYLESS (no handle index) table: "
        "the multiset lake table keyed by the full row value "
        "(lake.keyless.KeylessTable via streaming.keyless_feed.KeylessFeed); "
        "binlog must carry old_* pre-image columns for updates "
        "(model.KEYLESS_BINLOG_SCHEMA). Plain single-table feeds only",
    )
    p.add_argument(
        "--derived-shards", default=None, metavar="DIR[:N]",
        help="maintain a training-shard export from the changelog "
        "(pipeline/shards.IncrementalShards): refreshed after each batch, "
        "only dirtied shards rewritten. N = shard count (default 4, must "
        "divide --buckets). Multi-table feeds export per table under "
        "DIR/<table>/ (configured tables only)",
    )
    p.add_argument(
        "--derived-profile", default=None, metavar="GROUP[:STAT1,STAT2]",
        help="maintain per-GROUP corpus stats (n_docs / Σstat / Σstat²) "
        "from the changelog (pipeline/profile.IncrementalProfile), synced "
        "after each batch; state lives under each table root (multi-table "
        "feeds profile every configured table)",
    )
    p.add_argument(
        "--cyclic", default=None,
        help="cyclic replication: 'replica_id:filter_ids:source_marks:own_marks' "
        "e.g. '1:2,3:/marks/src:/marks/own' (filter_ids comma-separated)",
    )
    args = p.parse_args()

    from ticdc_spark.lake.table import LakeTable
    from ticdc_spark.session import build_session
    from ticdc_spark.streaming.changefeed import ChangeFeed
    from ticdc_spark.streaming.multi import MultiTableChangeFeed

    if bool(args.table) == bool(args.tables):
        p.error("exactly one of --table / --tables is required")

    spark = build_session("ticdc-changefeed")

    def open_table(root: str) -> LakeTable:
        if os.path.exists(os.path.join(root, "_manifests", "CURRENT")):
            return LakeTable(spark, root)
        return LakeTable.create(spark, root, n_buckets=args.buckets)

    ddl_rows = None
    if args.ddl:
        ddl_rows = (
            spark.read.parquet(args.ddl)
            .orderBy("commit_ts")
            .collect()
        )

    admin = None
    feed_name = None
    if args.admin_dir:
        from ticdc_spark.streaming.admin import FeedRegistry

        admin = FeedRegistry(args.admin_dir)
        feed_name = args.feed_name or os.path.basename(
            os.path.abspath(args.checkpoint)
        )
        if admin.query(feed_name) is None:
            admin.create(
                feed_name,
                binlog=args.binlog,
                table=args.table or args.tables,
                start_ts=args.start_ts,
                target_ts=args.target_ts,
            )

    if args.supervised and (admin is None or not args.available_now):
        p.error("--supervised requires --admin-dir and --available-now")

    def supervised_run(run_fn):
        """Owner retry loop around one available-now run: each attempt is a
        supervisor tick; transient errors retry (the streaming checkpoint +
        idempotent epoch merges make re-running safe), fast-fail errors or
        the error-history rate limit stop the job (owner.go:527-660)."""
        from ticdc_spark.streaming.admin import FeedSupervisor

        sup = FeedSupervisor(admin)
        box: dict = {}

        def run():
            box["summaries"] = run_fn()

        outcome = "never-ran"
        for attempt in range(1, args.supervised + 1):
            outcome = sup.tick({feed_name: run})[feed_name]
            if outcome != "error-retry":
                break
            print(
                f"supervised: attempt {attempt} failed "
                f"({admin.query(feed_name)['error']}); retrying",
                file=sys.stderr,
            )
        return outcome, attempt, box.get("summaries")

    # config file + sink-uri provide defaults; explicit CLI flags override
    cfg_kw: dict = {}
    notes: list[str] = []
    replica_cfg = None
    if args.config:
        from ticdc_spark.config import load_replica_config

        replica_cfg = load_replica_config(args.config)
        kw, n = replica_cfg.feed_kwargs(multi=bool(args.tables))
        cfg_kw.update(kw)
        notes += n
    if args.sink_uri:
        from ticdc_spark.config import parse_sink_uri

        kw, n = parse_sink_uri(args.sink_uri, mq_base=args.mq_base)
        cfg_kw.update(kw)
        notes += n
    for note in notes:
        print(f"config: {note}", file=sys.stderr)

    def mq_kwargs() -> dict:
        out = dict(cfg_kw)
        out.pop("cyclic", None)
        out.pop("mq_dispatch_rule", None)
        out.pop("mq_dispatch_rules", None)
        if args.mq_dir is not None:
            out["mq_dir"] = args.mq_dir
        if args.mq_partitions != 16:
            out["mq_partitions"] = args.mq_partitions
        if args.mq_protocol != "open":
            out["mq_protocol"] = args.mq_protocol
        if args.mq_old_value:
            out["mq_old_value"] = True
        out.setdefault("mq_dir", args.mq_dir)
        out.setdefault("mq_partitions", args.mq_partitions)
        out.setdefault("mq_protocol", args.mq_protocol)
        out.setdefault("mq_old_value", args.mq_old_value)
        return out

    if args.tables:
        tables = {}
        for part in args.tables.split(","):
            name, _, root = part.partition("=")
            if not root:
                p.error(f"--tables entry {part!r} is not name=path")
            tables[name.strip()] = open_table(root.strip())
        if replica_cfg is not None:
            kept = replica_cfg.filter_tables(tables)
            for dropped in sorted(set(tables) - set(kept)):
                print(f"config: table {dropped!r} excluded by filter rules",
                      file=sys.stderr)
            tables = kept
            if not tables:
                p.error("filter rules exclude every table")
        rules = cfg_kw.get("mq_dispatch_rules")
        if args.mq_dir and "=" in args.mq_dispatch:
            rules = [
                tuple(x.split("=", 1)) for x in args.mq_dispatch.split(",")
            ]
        # per-table derived artifacts (configured tables only; tables that
        # join in-stream via create_table DDL are not covered — add them to
        # --tables and resume to pick them up)
        multi_shards = {}
        multi_profiles = {}
        multi_post = None
        if args.derived_shards or args.derived_profile:
            if args.derived_shards:
                from ticdc_spark.pipeline.shards import IncrementalShards

                sdir, _, n = args.derived_shards.rpartition(":")
                if not sdir or not n.isdigit():
                    sdir, n = args.derived_shards, "4"
                for name, tbl in tables.items():
                    multi_shards[name] = IncrementalShards(
                        tbl, os.path.join(sdir, name), n_shards=int(n)
                    )
            if args.derived_profile:
                from ticdc_spark.pipeline.profile import IncrementalProfile

                grp, _, stats = args.derived_profile.partition(":")
                for name, tbl in tables.items():
                    multi_profiles[name] = IncrementalProfile(
                        tbl, grp, tuple(x for x in stats.split(",") if x)
                    )

            def multi_post(summary):
                for sh in multi_shards.values():
                    sh.refresh()
                for pr in multi_profiles.values():
                    pr.sync()

        cf = MultiTableChangeFeed(
            tables,
            args.binlog,
            checkpoint_dir=args.checkpoint,
            max_files_per_trigger=args.max_files_per_trigger,
            n_parts=args.n_parts,
            dynamic_spans=args.dynamic_spans,
            ddl_rows=ddl_rows,
            mq_dispatch_rules=rules,
            admin=admin,
            feed_name=feed_name,
            post_batch=multi_post,
            **mq_kwargs(),
        )
        if args.available_now:
            if args.supervised:
                outcome, attempts, summaries = supervised_run(cf.run_available)
                print(json.dumps({
                    "outcome": outcome, "attempts": attempts,
                    "state": admin.state(feed_name),
                    "batches": len(summaries) if summaries else 0,
                }))
                return 0 if outcome == "ran" else 1
            summaries = cf.run_available()
            out = {"batches": len(summaries), "summaries": summaries[-3:]}
            if multi_shards:
                out["shards_synced_versions"] = {
                    n: sh.synced_version for n, sh in multi_shards.items()
                }
            if multi_profiles:
                out["profile_versions"] = {
                    n: pr.meta["version"] for n, pr in multi_profiles.items()
                }
            print(json.dumps(out))
            return 0
        q = cf.start(processing_time=args.trigger)
        q.awaitTermination()
        return 0

    if args.keyless:
        if (args.ddl or args.derived_dedup or args.derived_decontam
                or args.derived_shards or args.derived_profile or args.cyclic):
            p.error(
                "--keyless supports a single-table feed with an optional "
                "MQ sink (no DDL/derived-index/cyclic options)"
            )
        from ticdc_spark.lake.keyless import KeylessTable
        from ticdc_spark.streaming.keyless_feed import KeylessFeed

        root = args.table
        if os.path.exists(os.path.join(root, "_manifests", "CURRENT")):
            kt = KeylessTable(spark, root)
        else:
            kt = KeylessTable.create(
                spark,
                root,
                value_fields=[
                    {"id": 1, "name": "doc_id", "type": "string"},
                    {"id": 2, "name": "tokens", "type": "array<int>"},
                    {"id": 3, "name": "n_tok", "type": "int"},
                    {"id": 4, "name": "source", "type": "string"},
                ],
                n_buckets=args.buckets,
            )
        feed = KeylessFeed(
            kt,
            args.binlog,
            args.checkpoint,
            max_files_per_trigger=args.max_files_per_trigger,
            mq_dir=args.mq_dir,
            mq_partitions=args.mq_partitions,
        )
        if args.available_now:
            summaries = feed.run_available()
            print(json.dumps({"batches": len(summaries), "summaries": summaries[-3:]}))
            return 0
        q = feed.start(processing_time=args.trigger)
        q.awaitTermination()
        return 0

    table = open_table(args.table)
    cyclic = cfg_kw.get("cyclic")
    if args.cyclic:
        rid, fids, src_marks, own_marks = args.cyclic.split(":")
        cyclic = {
            "replica_id": int(rid),
            "filter_replica_ids": [int(x) for x in fids.split(",") if x],
            "source_marks_dir": src_marks or None,
            "marks_dir": own_marks or None,
        }
    dispatch_rule = cfg_kw.get("mq_dispatch_rule", args.mq_dispatch)
    if args.mq_dispatch != "index-value":
        dispatch_rule = args.mq_dispatch
    post_batch = None
    derived_feeds = []
    dfeed = None
    if args.derived_dedup or args.derived_decontam:
        from pyspark.sql import functions as F

        from ticdc_spark.pipeline.incremental import DerivedIndexFeed

        to_text = F.concat_ws(" ", F.col("tokens").cast("array<string>"))
        to_text_rows = lambda df: df.select(  # noqa: E731
            "doc_id", "op", "commit_ts", "seq", to_text.alias("text")
        )
        if args.derived_dedup:
            from ticdc_spark.pipeline.incremental import IncrementalLSHDeduper

            dfeed = DerivedIndexFeed(
                table,
                IncrementalLSHDeduper(
                    table.spark, args.derived_dedup, id_type="string"
                ),
                transform=to_text_rows,
            )
            derived_feeds.append(dfeed)
        if args.derived_decontam:
            from ticdc_spark.pipeline.incremental import IncrementalDecontaminator

            ev = (
                table.spark.read.parquet(args.eval_docs)
                if args.eval_docs
                else None
            )
            derived_feeds.append(
                DerivedIndexFeed(
                    table,
                    IncrementalDecontaminator(
                        table.spark, args.derived_decontam,
                        eval_docs=ev, id_type="string",
                    ),
                    transform=to_text_rows,
                )
            )
        post_batch = lambda summary: [f.sync() for f in derived_feeds]  # noqa: E731

    shards_obj = None
    profile_obj = None
    if args.derived_shards or args.derived_profile:
        extra_sync = []
        if args.derived_shards:
            from ticdc_spark.pipeline.shards import IncrementalShards

            sdir, _, n = args.derived_shards.rpartition(":")
            if not sdir or not n.isdigit():
                # no :N suffix (or the colon belongs to a URI scheme)
                sdir, n = args.derived_shards, "4"
            shards_obj = IncrementalShards(table, sdir, n_shards=int(n))
            extra_sync.append(shards_obj.refresh)
        if args.derived_profile:
            from ticdc_spark.pipeline.profile import IncrementalProfile

            grp, _, stats = args.derived_profile.partition(":")
            profile_obj = IncrementalProfile(
                table, grp, tuple(s for s in stats.split(",") if s)
            )
            extra_sync.append(profile_obj.sync)
        prev_derived = post_batch

        def post_batch(summary, _prev=prev_derived):  # noqa: F811
            if _prev is not None:
                _prev(summary)
            for g in extra_sync:
                g()

    if args.metrics_dir:
        from ticdc_spark.streaming.metrics import MetricsExporter

        exporter = MetricsExporter(args.metrics_dir)
        mfeed = args.feed_name or os.path.basename(os.path.abspath(args.checkpoint))
        prev_hook = post_batch

        def post_batch(summary, _prev=prev_hook):  # noqa: F811
            if _prev is not None:
                _prev(summary)
            exporter.emit(mfeed, cf)

    cf = ChangeFeed(
        table,
        args.binlog,
        checkpoint_dir=args.checkpoint,
        mode=args.mode,
        ddl_rows=ddl_rows,
        lineage_dir=args.lineage,
        max_files_per_trigger=args.max_files_per_trigger,
        n_parts=args.n_parts,
        dynamic_spans=args.dynamic_spans,
        start_ts=args.start_ts,
        mq_dispatch_rule=dispatch_rule,
        cyclic=cyclic,
        target_ts=args.target_ts,
        admin=admin,
        feed_name=feed_name,
        post_batch=post_batch,
        **mq_kwargs(),
    )
    if args.available_now:
        if args.supervised:
            outcome, attempts, summaries = supervised_run(cf.run_available)
            print(json.dumps({
                "outcome": outcome, "attempts": attempts,
                "state": admin.state(feed_name),
                "batches": len(summaries) if summaries else 0,
            }))
            return 0 if outcome == "ran" else 1
        summaries = cf.run_available()
        out = {"batches": len(summaries), "summaries": summaries[-3:]}
        if args.derived_dedup:
            out["dedup_live_pairs"] = dfeed.deduper.live_pairs().count()
        if args.derived_decontam:
            from pyspark.sql import functions as F

            rep = derived_feeds[-1].deduper.report()
            out["decontam_contaminated"] = rep.filter(
                F.col("contaminated") == 1
            ).count()
        if shards_obj is not None:
            out["shards_synced_version"] = shards_obj.synced_version
            out["shards"] = shards_obj.manifest().get("shards", {})
        if profile_obj is not None:
            out["profile_version"] = profile_obj.meta["version"]
            out["profile_groups"] = profile_obj.profile().count()
        print(json.dumps(out))
        return 0
    q = cf.start(processing_time=args.trigger)
    q.awaitTermination()
    return 0


if __name__ == "__main__":
    sys.exit(main())
