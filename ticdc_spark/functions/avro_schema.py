"""Avro schema generation + registry analog (SURVEY.md §2.9).

Reference: cdc/sink/codec/avro.go:233-264 generates one Avro record schema
per (table, schema-version) — every column nullable-union except implicit
not-null handles — and cdc/sink/codec/schema_registry.go:117-278 registers it
with a Confluent registry, caching (subject → id, schema) lookups.

Binary Avro encoding needs the spark-avro connector jar (not bundled here),
and our lake's columnar parquet + stable-field-id evolution already covers
the wire format; what we keep is the *schema protocol*: deterministic Avro
JSON per registry version, and a subject-versioned cache with the same
lookup/register/evict behavior, so an Avro sink could be attached without
touching the engine.
"""

from __future__ import annotations

import json

_AVRO_PRIMITIVE = {
    "string": "string",
    "long": "long",
    "bigint": "long",
    "int": "int",
    "integer": "int",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "binary": "bytes",
}


def _avro_type(sql_type: str):
    t = sql_type.strip().lower()
    if t in _AVRO_PRIMITIVE:
        return _AVRO_PRIMITIVE[t]
    if t.startswith("array<") and t.endswith(">"):
        return {"type": "array", "items": _avro_type(t[6:-1])}
    if t in ("timestamp", "timestamp_ntz"):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if t.startswith("decimal"):
        return {"type": "bytes", "logicalType": "decimal"}
    raise ValueError(f"no avro mapping for SQL type {sql_type!r}")


def avro_schema(
    table: str, fields: list[dict], namespace: str = "ticdc_spark", handle_key: str = "doc_id"
) -> str:
    """Registry fields (``[{id, name, type}]`` as in streaming.registry) →
    canonical Avro record-schema JSON. Columns are ``["null", T]`` unions
    with null default (avro.go:246-258), except the handle key which is
    not-null (HandleKey flag, cdc/model/sink.go:264-286)."""
    avro_fields = []
    for f in sorted(fields, key=lambda f: f["id"]):
        at = _avro_type(f["type"])
        if f["name"] == handle_key:
            avro_fields.append({"name": f["name"], "field-id": f["id"], "type": at})
        else:
            avro_fields.append(
                {
                    "name": f["name"],
                    "field-id": f["id"],
                    "type": ["null", at],
                    "default": None,
                }
            )
    rec = {
        "type": "record",
        "name": table,
        "namespace": namespace,
        "fields": avro_fields,
    }
    return json.dumps(rec, sort_keys=True, separators=(",", ":"))


class AvroSchemaRegistry:
    """Subject-versioned schema cache (schema_registry.go:117-278 semantics):
    `register` is idempotent per exact schema string, `lookup` returns the
    latest (id, schema) for a subject, `clear_subject` evicts."""

    def __init__(self) -> None:
        self._by_subject: dict[str, list[str]] = {}
        self._ids: dict[tuple[str, str], int] = {}
        self._next_id = 1

    def subject(self, table: str) -> str:
        return f"{table}-value"

    def register(self, table: str, schema_json: str) -> int:
        subj = self.subject(table)
        key = (subj, schema_json)
        if key in self._ids:  # registry returns the existing id for a re-post
            return self._ids[key]
        sid = self._next_id
        self._next_id += 1
        self._ids[key] = sid
        self._by_subject.setdefault(subj, []).append(schema_json)
        return sid

    def lookup(self, table: str) -> tuple[int, str]:
        subj = self.subject(table)
        versions = self._by_subject.get(subj)
        if not versions:
            raise KeyError(subj)
        latest = versions[-1]
        return self._ids[(subj, latest)], latest

    def n_versions(self, table: str) -> int:
        return len(self._by_subject.get(self.subject(table), []))

    def clear_subject(self, table: str) -> None:
        subj = self.subject(table)
        for s in self._by_subject.pop(subj, []):
            self._ids.pop((subj, s), None)
