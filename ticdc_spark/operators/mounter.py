"""Mounter — decode raw change payloads against the schema version each row
was written under, then project to a target schema by stable field id.

Reference: cdc/entry/mounter.go:228-288 (route + decode), 410-442
(datum2Column): TiKV row bytes are decoded row-at-a-time by 32 hash-parallel
workers against the snapshot at CRTs-1. Spark-first version: ONE vectorized
`from_json` per distinct schema version in the batch (JVM-side, codegen'd),
then a field-id projection (select/cast/alias) — no Python in the hot path,
and usually only 1-2 versions alive per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..streaming.registry import SchemaRegistry

RAW_META_COLS = ["commit_ts", "seq", "table", "op", "doc_id", "part", "schema_version"]


def project_fields(df: DataFrame, from_fields: list[dict], to_fields: list[dict], keep: list[str]) -> DataFrame:
    """Field-id projection: select by old name → current name, cast, missing
    id → NULL. The engine-side mirror of LakeTable._read_files."""
    by_id = {f["id"]: f for f in from_fields}
    sel = [F.col(c) for c in keep]
    for f in to_fields:
        o = by_id.get(f["id"])
        if o is None:
            # column didn't exist at the row's schema version: initial
            # default (ADD COLUMN ... DEFAULT x) or NULL — same rule as
            # LakeTable._read_files, so mount-time and read-time projection
            # of a pre-DDL row agree
            sel.append(
                F.lit(f.get("initial_default")).cast(f["type"]).alias(f["name"])
            )
        else:
            sel.append(F.col(o["name"]).cast(f["type"]).alias(f["name"]))
    return df.select(*sel)


def mount_raw(
    raw: DataFrame,
    registry: SchemaRegistry,
    target_version: int,
    versions_present: list[int] | None = None,
) -> DataFrame:
    """Decode raw rows (payload JSON + schema_version) → typed columns at
    target_version. Key column comes from the envelope (doc_id), payload
    carries the remaining fields.

    versions_present: optional hint to skip the distinct() scan. A row whose
    schema_version is OUTSIDE the hint is dropped by the per-version union —
    callers deriving the hint from version_at(hi_ts) must guard the producer
    contract (schema_version <= version_at(commit_ts)); the changefeeds do
    this in their part_stats job (schema_version_violation) and raise.
    """
    if versions_present is None:
        if len(registry.versions) == 1:
            versions_present = [0]  # no DDLs -> no scan needed
        else:
            versions_present = [
                r["schema_version"] for r in raw.select("schema_version").distinct().collect()
            ]
    to_fields = [f for f in registry.fields(target_version) if f["name"] != "doc_id"]
    parts = []
    for v in sorted(versions_present):
        vfields = [f for f in registry.fields(v) if f["name"] != "doc_id"]
        vstruct = registry.struct(v)
        payload_struct = type(vstruct)([fld for fld in vstruct.fields if fld.name != "doc_id"])
        dec = (
            raw.filter(F.col("schema_version") == v)
            .withColumn("_p", F.from_json(F.col("payload"), payload_struct))
            .select(*RAW_META_COLS, "_p.*")
        )
        parts.append(project_fields(dec, vfields, to_fields, keep=RAW_META_COLS))
    if not parts:
        return mount_raw(raw.limit(0), registry, target_version, versions_present=[0])
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def mount_typed(
    df: DataFrame,
    registry: SchemaRegistry,
    target_version: int,
    versions_present: list[int] | None = None,
) -> DataFrame:
    """Fast path for an already-typed binlog written at ONE schema version
    (schema_version column says which): pure projection, no JSON decode.

    versions_present: optional hint (e.g. all versions at or below the
    slice's upper commit-ts bound) to skip the distinct() scan; versions
    with no rows only add an empty union branch."""
    if versions_present is not None:
        versions = versions_present
    elif len(registry.versions) == 1:
        versions = [0]
    else:
        versions = [r["schema_version"] for r in df.select("schema_version").distinct().collect()]
    to_fields = [f for f in registry.fields(target_version) if f["name"] != "doc_id"]
    parts = []
    for v in sorted(versions):
        vfields = [f for f in registry.fields(v) if f["name"] != "doc_id"]
        sub = df.filter(F.col("schema_version") == v)
        parts.append(project_fields(sub, vfields, to_fields, keep=RAW_META_COLS))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
