"""Multi-version schema registry — the SchemaStorage analog.

Reference: cdc/entry/schema_storage.go:638-651 keeps an append-only list of
schema snapshots keyed by DDL FinishedTS; a row decodes against the snapshot
current at CRTs-1 (mounter.go:242-247: a DML whose commit-ts EQUALS a DDL's
finished-ts uses the schema *before* the DDL).

Ours: ordered versions of field lists with stable field ids (shared with
lake.table). version_at(commit_ts) = number of DDLs with finished_ts
STRICTLY BELOW commit_ts — the `<` encodes the equals-uses-pre-DDL rule.
"""

from __future__ import annotations

import bisect
import json
import warnings

from pyspark.sql import types as T

# DDL kinds the engine can replicate; anything else is discarded with a
# warning and the feed CONTINUES (pkg/filter/filter.go:115-171 skip
# semantics; entry/schema_storage.go:818-824 skips cancelled/unsupported
# jobs) — one exotic DDL in the stream must not halt replication.
SUPPORTED_DDL = (
    "add_column", "widen_column", "rename_column", "drop_column",
    "modify_column", "truncate_table",
    # partition-table ops (schema_storage.go:586-624 ActionAddTablePartition
    # / ActionDropTablePartition / ActionTruncateTablePartition): no field
    # change; drop/truncate are barrier-ordered DATA operations — the spec
    # carries the partition's row predicate ({"where": "<sql bool expr>"})
    "add_partition", "drop_partition", "truncate_partition",
)

# Feed-level lifecycle DDL: these change the TABLE SET, not a table's
# columns (reference applies them in the schema snapshot,
# cdc/entry/schema_storage.go:539-624 ActionCreateTable / ActionDropTable /
# ActionRecoverTable; ActionRenameTable at 566-577 = dropTable(old id) +
# createTable(new info); stressed by tests/multi_source/main.go:74-131).
# They are routed to MultiTableChangeFeed's lifecycle handling, never into
# a per-table SchemaRegistry.
LIFECYCLE_DDL = ("create_table", "drop_table", "recover_table", "rename_table")

# Database-level DDL (schema_storage.go:550-565 ActionCreateSchema /
# ActionDropSchema, 556 ActionModifySchemaCharsetAndCollate). Table names
# here use the reference's "<schema>.<table>" form; drop_schema stops every
# feed table under the schema at its barrier (the reference removes the
# whole database's tables from the snapshot), while create/modify schema
# are metadata-only — replicated tables always arrive via create_table.
SCHEMA_DDL = ("create_schema", "drop_schema", "modify_schema")


def apply_ddl_to_fields(fields: list[dict], ddl_type: str, spec: dict) -> list[dict]:
    out = [dict(f) for f in fields]
    if ddl_type == "add_column":
        nf = {"id": max(f["id"] for f in out) + 1, "name": spec["name"], "type": spec["type"]}
        if spec.get("default") is not None:
            # ADD COLUMN ... DEFAULT x: TiDB fills existing rows instantly
            # (no rewrite) and TiCDC's downstream DDL carries the default, so
            # pre-DDL rows read x downstream. Iceberg's initial-default rule:
            # the default applies ONLY to rows written before the column
            # existed (projected at read); post-DDL events always carry the
            # column explicitly (TiDB emits full row images).
            nf["initial_default"] = spec["default"]
        out.append(nf)
    elif ddl_type in ("widen_column", "modify_column"):
        # widen = declared-lossless direction (metadata-only downstream);
        # modify = arbitrary type change (schema_storage.go:539-624
        # ActionModifyColumn) — same field-list effect, different lake
        # application (modify physically rewrites, see LakeTable.modify_column)
        for f in out:
            if f["name"] == spec["name"]:
                f["type"] = spec["to"]
                return out
        raise KeyError(spec["name"])
    elif ddl_type == "rename_column":
        for f in out:
            if f["name"] == spec["from"]:
                f["name"] = spec["to"]
                return out
        raise KeyError(spec["from"])
    elif ddl_type == "drop_column":
        kept = [f for f in out if f["name"] != spec["name"]]
        if len(kept) == len(out):
            raise KeyError(spec["name"])
        return kept
    elif ddl_type in (
        "truncate_table", "add_partition", "drop_partition",
        "truncate_partition",
    ):
        # no field change — the version exists so the barrier splits slices
        # and the lake's data operation (bucket wipe / partition delete)
        # lands between them (ActionTruncateTable is on the reference's
        # built-in allowlist, filter.go:149; partition ops
        # schema_storage.go:586-624)
        return out
    else:
        raise ValueError(f"unsupported ddl_type {ddl_type}")
    return out


class SchemaRegistry:
    """versions[0] = base; versions[v] = base + first v DDLs applied."""

    def __init__(self, base_fields: list[dict], ddls: list[tuple[int, str, dict]] | None = None):
        """ddls: ordered [(finished_ts, ddl_type, spec)]."""
        self.versions: list[list[dict]] = [[dict(f) for f in base_fields]]
        self.ddl_ts: list[int] = []
        self.ddl_kinds: list[str] = []  # kind of the DDL creating version i+1
        self.ddl_specs: list[dict] = []  # spec of that DDL (partition preds)
        for ts, typ, spec in ddls or []:
            self.add_ddl(ts, typ, spec)

    def add_ddl(
        self, finished_ts: int, ddl_type: str, spec: dict, on_unsupported: str = "skip"
    ) -> int:
        """Returns the new version, or -1 when the DDL was discarded.
        on_unsupported: "skip" (reference semantics — warn and continue,
        the DDL creates no version and no barrier) or "raise"."""
        if ddl_type not in SUPPORTED_DDL:
            if on_unsupported == "skip":
                warnings.warn(
                    f"discarding unsupported DDL {ddl_type!r} at ts={finished_ts} "
                    "(pkg/filter/filter.go:115-171 skip-with-warning)"
                )
                return -1
            raise ValueError(f"unsupported ddl_type {ddl_type}")
        if self.ddl_ts and finished_ts <= self.ddl_ts[-1]:
            raise ValueError("DDL finished-ts must be strictly increasing")
        self.versions.append(apply_ddl_to_fields(self.versions[-1], ddl_type, spec))
        self.ddl_ts.append(finished_ts)
        self.ddl_kinds.append(ddl_type)
        self.ddl_specs.append(dict(spec))
        return len(self.versions) - 1

    def fields(self, version: int) -> list[dict]:
        return self.versions[version]

    def struct(self, version: int) -> T.StructType:
        return T.StructType(
            [T.StructField(f["name"], T._parse_datatype_string(f["type"])) for f in self.fields(version)]
        )

    def version_at(self, commit_ts: int) -> int:
        """Snapshot-at-CRTs-1 rule: DDL at finished_ts == commit_ts NOT yet
        visible (mounter.go:242-247)."""
        return bisect.bisect_left(self.ddl_ts, commit_ts)

    @classmethod
    def from_ddl_rows(cls, base_fields: list[dict], rows: list) -> "SchemaRegistry":
        """rows: (commit_ts, ddl_type, table, spec-json) sorted by commit_ts."""
        ddls = [(r["commit_ts"], r["ddl_type"], json.loads(r["spec"])) for r in rows]
        return cls(base_fields, ddls)
