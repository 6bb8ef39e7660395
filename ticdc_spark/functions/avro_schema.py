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


# Avro spec "schema resolution": writer type (left) promotable to reader
# type (right). The Confluent registry's BACKWARD check relies on these.
_PROMOTABLE = {
    ("int", "long"),
    ("int", "float"),
    ("int", "double"),
    ("long", "float"),
    ("long", "double"),
    ("float", "double"),
    ("string", "bytes"),
    ("bytes", "string"),
}


def _union_parts(t):
    """(nullable, base-type) for plain types and ["null", T] unions."""
    if isinstance(t, list):
        base = [x for x in t if x != "null"]
        return True, (base[0] if base else "null")
    return False, t


def _base_name(t):
    if isinstance(t, dict):
        return t.get("type")
    return t


def _type_compatible(old_t, new_t) -> bool:
    """Can a reader with new_t decode data written with old_t?"""
    old_null, old_b = _union_parts(old_t)
    new_null, new_b = _union_parts(new_t)
    if old_null and not new_null:
        return False  # reader lost the null branch an old writer may emit
    ob, nb = _base_name(old_b), _base_name(new_b)
    if isinstance(old_b, dict) and isinstance(new_b, dict):
        if ob == "array" and nb == "array":
            return _type_compatible(old_b["items"], new_b["items"])
    if ob == nb:
        return True
    return (ob, nb) in _PROMOTABLE


def check_backward_compatible(old_json: str, new_json: str) -> list[str]:
    """BACKWARD compatibility (the Confluent registry's default subject
    rule, enforced server-side on every register — the reference relies on
    it at schema_registry.go:117-180): a consumer on the NEW schema must be
    able to read data written with the OLD one. Violations returned, empty
    = compatible. Rules: a field added without a default breaks old data;
    a type change must be an Avro-resolution promotion; dropping a field is
    fine (readers skip unknown writer fields)."""
    old_f = {f["name"]: f for f in json.loads(old_json)["fields"]}
    problems = []
    for f in json.loads(new_json)["fields"]:
        name = f["name"]
        if name not in old_f:
            nullable, _ = _union_parts(f["type"])
            if "default" not in f and not nullable:
                problems.append(
                    f"new field {name!r} has no default and no null branch — "
                    "unreadable against data written pre-add"
                )
            continue
        if not _type_compatible(old_f[name]["type"], f["type"]):
            problems.append(
                f"field {name!r}: {old_f[name]['type']!r} is not promotable "
                f"to {f['type']!r}"
            )
    return problems


class SchemaCompatibilityError(ValueError):
    """A register() that the subject's compatibility rule refuses (the
    Confluent server answers 409; the reference surfaces it as a sink
    error and halts the feed)."""


class AvroSchemaRegistry:
    """Subject-versioned schema cache (schema_registry.go:117-278 semantics):
    `register` is idempotent per exact schema string, `lookup` returns the
    latest (id, schema) for a subject, `clear_subject` evicts.

    compatibility: "BACKWARD" (Confluent default — every register is
    checked against the subject's current latest version) or "NONE"."""

    def __init__(self, compatibility: str = "BACKWARD") -> None:
        if compatibility not in ("BACKWARD", "NONE"):
            raise ValueError(f"unsupported compatibility {compatibility!r}")
        self.compatibility = compatibility
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
        if self.compatibility == "BACKWARD" and self._by_subject.get(subj):
            problems = check_backward_compatible(
                self._by_subject[subj][-1], schema_json
            )
            if problems:
                raise SchemaCompatibilityError(
                    f"subject {subj!r}: " + "; ".join(problems)
                )
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
