"""Changefeed ReplicaConfig: the reference's configuration surface mapped
onto ChangeFeed / MultiTableChangeFeed keyword arguments.

Mirrors pkg/config/config.go:59-70 (ReplicaConfig), sink.go (SinkConfig /
DispatchRule), filter.go (FilterConfig), cyclic.go (CyclicConfig),
mounter.go (MounterConfig), and cdc/sink/codec/interface.go:148-165
(protocol name parsing, unknown → default with a warning). A user of the
reference can hand this loader their changefeed.toml and get a feed with
the same semantics; options that are meaningless on Spark (worker counts,
GC-safepoint probing) are reported as explicit notes, never silently
dropped.

Table-filter rules follow tidb-tools table-filter semantics as used by
pkg/filter/filter.go:34-58: ordered glob rules, optional '!' prefix for
exclusion, LAST matching rule wins, no match -> not replicated, empty
rule list -> ["*.*"] (everything). Matching is case-insensitive unless
case-sensitive = true (filter.go:49-51).
"""
from __future__ import annotations

import fnmatch
import json
import re
from dataclasses import dataclass, field

# codec/interface.go:148-165 — reference protocol name -> our codec name
PROTOCOL_MAP = {
    "default": "open",
    "canal": "canal-pb",
    "canal-json": "canal-json",
    "avro": "avro",
    "maxwell": "maxwell",
}

# dispatcher/interface.go:43-59 — all reference rule names are native here
# (dispatch.DISPATCH_RULES includes rowid as an index-value alias)
DISPATCH_RULE_NAMES = ("default", "ts", "rowid", "table", "index-value")

DEFAULT_SCHEMA = "cdc"


@dataclass
class ReplicaConfig:
    """Parsed changefeed configuration (pkg/config/config.go:61-70)."""

    case_sensitive: bool = False
    enable_old_value: bool = False
    force_replicate: bool = False
    check_gc_safe_point: bool = True
    filter_rules: list[str] = field(default_factory=list)
    ignore_txn_start_ts: list[int] = field(default_factory=list)
    ddl_allowlist: list[str] = field(default_factory=list)
    mounter_worker_num: int = 16
    sink_protocol: str = "default"
    # flattened [(matcher glob, dispatcher rule)] — one entry per matcher
    # (sink.go DispatchRule has a matcher LIST per rule)
    sink_dispatchers: list[tuple[str, str]] = field(default_factory=list)
    cyclic: dict | None = None

    # ---------------- table filter ----------------
    def table_matches(self, table: str, schema: str = DEFAULT_SCHEMA) -> bool:
        """tidb-tools table-filter: last matching rule wins; no match ->
        excluded; empty rules -> include everything (filter.go:42-45).
        Patterns may be bare ("tbl*") or qualified ("db.tbl*"); bare table
        names are qualified under the default schema."""
        rules = self.filter_rules or ["*.*"]
        qualified = f"{schema}.{table}"
        decision = False
        matched = False
        for rule in rules:
            neg = rule.startswith("!")
            pat = rule[1:] if neg else rule
            target = qualified if "." in pat else table
            p, t = (pat, target) if self.case_sensitive else (pat.lower(), target.lower())
            if re.fullmatch(fnmatch.translate(p), t):
                decision, matched = (not neg), True
        return decision if matched else False

    def filter_tables(self, tables: dict) -> dict:
        """Apply the rule set to a {name: LakeTable} dict (the multi-table
        feed's replication set — ShouldIgnoreTable per table)."""
        return {k: v for k, v in tables.items() if self.table_matches(k)}

    # ---------------- feed kwargs ----------------
    def feed_kwargs(self, multi: bool = False) -> tuple[dict, list[str]]:
        """ChangeFeed (multi=False) or MultiTableChangeFeed (multi=True)
        keyword arguments, plus human-readable notes for every option that
        has no Spark-side knob (reported, never silently dropped)."""
        notes: list[str] = []
        kw: dict = {}
        protocol = PROTOCOL_MAP.get(self.sink_protocol.lower())
        if protocol is None:
            # codec/interface.go:160-163 — unknown protocol falls back
            notes.append(
                f"unknown sink protocol {self.sink_protocol!r} -> default (open)"
            )
            protocol = "open"
        kw["mq_protocol"] = protocol
        if self.enable_old_value:
            kw["mq_old_value"] = True
        if self.sink_dispatchers:
            if multi:
                kw["mq_dispatch_rules"] = list(self.sink_dispatchers)
            else:
                # single-table feed: first rule wins (there is one table)
                kw["mq_dispatch_rule"] = self.sink_dispatchers[0][1]
        if self.cyclic and self.cyclic.get("enable"):
            kw["cyclic"] = {
                "replica_id": int(self.cyclic.get("replica-id", 1)),
                "filter_replica_ids": [
                    int(x) for x in self.cyclic.get("filter-replica-ids", [])
                ],
            }
            if not self.cyclic.get("sync-ddl", True):
                notes.append("cyclic sync-ddl=false: DDLs replicate regardless "
                             "(single DDL stream feeds every table)")
        if self.force_replicate:
            notes.append(
                "force-replicate: keyless tables replicate as multisets via "
                "lake.keyless.KeylessTable (operators.handle.replication_mode "
                "routes them); keyed feeds are unaffected"
            )
        if not self.check_gc_safe_point:
            notes.append("check-gc-safe-point: n/a — no TiKV GC here; lake "
                         "snapshot GC is expire_keep_last")
        if self.mounter_worker_num != 16:
            notes.append(
                f"mounter worker-num={self.mounter_worker_num}: n/a — decode "
                "parallelism is Spark task parallelism (mounter is from_json "
                "over partitions)"
            )
        if self.ignore_txn_start_ts:
            notes.append(
                "ignore-txn-start-ts: n/a — the binlog carries commit_ts/seq "
                "only (events are post-commit, start_ts is not recorded)"
            )
        if self.ddl_allowlist:
            notes.append(
                "ddl-allow-list: custom additions beyond the built-in "
                "allowlist are discarded-with-warning by the schema registry "
                "(filter.go:115-171 semantics; registry.SUPPORTED_DDL is the "
                "built-in list)"
            )
        return kw, notes


def load_replica_config(path: str) -> ReplicaConfig:
    """Load changefeed config from .toml (the reference's format) or .json."""
    if path.endswith(".toml"):
        import tomllib

        with open(path, "rb") as f:
            raw = tomllib.load(f)
    else:
        with open(path) as f:
            raw = json.load(f)
    flt = raw.get("filter") or {}
    mounter = raw.get("mounter") or {}
    sink = raw.get("sink") or {}
    dispatchers: list[tuple[str, str]] = []
    for d in sink.get("dispatchers") or []:
        rule = d.get("dispatcher", "default")
        for matcher in d.get("matcher") or ["*.*"]:
            dispatchers.append((matcher, rule))
    return ReplicaConfig(
        case_sensitive=bool(raw.get("case-sensitive", False)),
        enable_old_value=bool(raw.get("enable-old-value", False)),
        force_replicate=bool(raw.get("force-replicate", False)),
        check_gc_safe_point=bool(raw.get("check-gc-safe-point", True)),
        filter_rules=list(flt.get("rules") or []),
        ignore_txn_start_ts=[int(x) for x in flt.get("ignore-txn-start-ts") or []],
        ddl_allowlist=list(flt.get("ddl-allow-list") or []),
        mounter_worker_num=int(mounter.get("worker-num", 16)),
        sink_protocol=str(sink.get("protocol") or "default"),
        sink_dispatchers=dispatchers,
        cyclic=raw.get("cyclic-replication"),
    )


def parse_sink_uri(uri: str, mq_base: str | None = None) -> tuple[dict, list[str]]:
    """The changefeed sink-uri (cdc/sink/sink.go dispatch on scheme;
    mq.go:278-320 kafka option parsing) mapped to feed kwargs.

    mysql/tidb -> the lake MERGE path (no extra kwargs: the lake table IS
    the downstream). blackhole -> mq-less, merge-only. kafka://host/topic
    -> the file-MQ sink: messages land under <mq_base>/<topic> (this
    sandbox has no broker; the MQ layout is the Kafka analog, one dir per
    partition). file:///path -> MQ dir at that path. Recognized query
    params: protocol, partition-num, enable-old-value."""
    from urllib.parse import parse_qs, urlparse

    u = urlparse(uri)
    q = {k: v[-1] for k, v in parse_qs(u.query).items()}
    kw: dict = {}
    notes: list[str] = []
    scheme = u.scheme.lower()
    if scheme in ("mysql", "tidb", "mysql+ssl", "tidb+ssl"):
        notes.append(f"{scheme} sink: the lake table is the downstream "
                     "(set-oriented MERGE supersedes SQL generation)")
        return kw, notes
    if scheme == "blackhole":
        notes.append("blackhole sink: merge-only, no MQ emission")
        return kw, notes
    if scheme == "kafka":
        topic = u.path.lstrip("/") or "changefeed"
        if mq_base is None:
            raise ValueError("kafka sink-uri needs mq_base (no broker here; "
                             "the file MQ is the Kafka analog)")
        import os

        kw["mq_dir"] = os.path.join(mq_base, topic)
    elif scheme == "file":
        kw["mq_dir"] = u.path
    else:
        raise ValueError(f"unsupported sink scheme {scheme!r}")
    if "protocol" in q:
        kw["mq_protocol"] = PROTOCOL_MAP.get(q["protocol"].lower(), "open")
    if "partition-num" in q:
        kw["mq_partitions"] = int(q["partition-num"])
    if q.get("enable-old-value") in ("true", "1"):
        kw["mq_old_value"] = True
    # kafka message sizing (mq.go:278-320 params; json.go:38-41 defaults) —
    # setting either opts into the batch-framed wire form
    if "max-message-bytes" in q:
        kw["mq_max_message_bytes"] = int(q["max-message-bytes"])
        kw["mq_framing"] = "sized"
    if "max-batch-size" in q:
        kw["mq_max_batch_size"] = int(q["max-batch-size"])
        kw["mq_framing"] = "sized"
    return kw, notes
