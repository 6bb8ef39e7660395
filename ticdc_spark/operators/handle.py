"""Handle-index selection — which column set identifies a row (the thing
the LWW key, dispatchers, and MERGE condition all hang off).

Reference: cdc/model/schema_storage.go:76-141 (PK-is-handle / common
handle), 148-173 (findHandleIndex: among UNIQUE-eligible indices prefer
primary, else fewest columns, ties by lowest index id), 320-336
(IsIndexUnique: primary always; unique only if every column is
non-nullable and not virtual-generated), 175-230 (column flags: handle-key
flag set on the chosen index's columns).

The engine's input contract guarantees a keyed table (doc_id), so this
module is the PRE-FLIGHT: given a table description, pick the handle the
reference would pick — or declare the table ineligible (the reference
skips ineligible tables, mounter.go:249-259) — and validate it against the
lake table's configured key before a feed starts.
"""

from __future__ import annotations

HANDLE_PK = "pk"
INELIGIBLE = None


def is_index_unique(index: dict, columns_by_name: dict) -> bool:
    """schema_storage.go:320-336."""
    if index.get("primary"):
        return True
    if not index.get("unique"):
        return False
    for name in index["columns"]:
        col = columns_by_name[name]
        if col.get("nullable", True):
            return False
        if col.get("generated") and not col.get("generated_stored", False):
            return False
    return True


def select_handle_index(table_info: dict) -> dict:
    """table_info: {pk_is_handle: bool, columns: [{name, nullable,
    generated?, generated_stored?, primary?}], indices: [{id, name,
    primary, unique, columns: [name]}]}.

    Returns {eligible, handle_index (id|'pk'|None), handle_cols} mirroring
    TableInfo.findHandleIndex exactly."""
    cols = {c["name"]: c for c in table_info.get("columns", [])}
    if table_info.get("pk_is_handle"):
        pk_cols = [c["name"] for c in table_info.get("columns", []) if c.get("primary")]
        if pk_cols:
            return {"eligible": True, "handle_index": HANDLE_PK, "handle_cols": pk_cols}
    best = None
    for idx in table_info.get("indices", []):
        if not is_index_unique(idx, cols):
            continue
        if idx.get("primary"):
            best = idx
            break
        if best is None:
            best = idx
        elif len(best["columns"]) > len(idx["columns"]) or (
            len(best["columns"]) == len(idx["columns"]) and best["id"] > idx["id"]
        ):
            best = idx
    if best is None:
        return {"eligible": False, "handle_index": INELIGIBLE, "handle_cols": []}
    return {
        "eligible": True,
        "handle_index": best["id"],
        "handle_cols": list(best["columns"]),
    }


def column_flags(table_info: dict) -> dict[str, set]:
    """Per-column flag sets (schema_storage.go:175-230 initColumnsFlag
    subset): primary/unique/nullable/generated/handle-key."""
    sel = select_handle_index(table_info)
    handle = set(sel["handle_cols"]) if sel["eligible"] else set()
    out: dict[str, set] = {}
    for c in table_info.get("columns", []):
        flags = set()
        if c.get("primary"):
            flags.add("primary_key")
        if c.get("nullable", True):
            flags.add("nullable")
        if c.get("generated"):
            flags.add("generated")
        if c["name"] in handle:
            flags.add("handle_key")
        out[c["name"]] = flags
    return out


def validate_feed_key(table_info: dict, configured_key: str) -> None:
    """Pre-flight for a changefeed: the lake table's configured key must be
    exactly the handle the reference would select; an ineligible table is
    refused (the reference silently skips them — we fail loudly because a
    feed was explicitly configured)."""
    sel = select_handle_index(table_info)
    if not sel["eligible"]:
        raise ValueError(
            "table is ineligible for replication: no PK and no unique index "
            "over non-null, non-virtual columns (mounter.go:249-259)"
        )
    if sel["handle_cols"] != [configured_key]:
        raise ValueError(
            f"configured key {configured_key!r} != selected handle "
            f"{sel['handle_cols']} (index {sel['handle_index']!r})"
        )


def replication_mode(table_info: dict, force_replicate: bool = False) -> str:
    """The reference's eligibility decision (model/schema_storage.go:309-317
    IsEligible + mounter.go:249-259 skip): 'keyed' when a handle index
    exists, else 'keyless' under force-replicate (multiset replication via
    lake.keyless.KeylessTable — whereSlice's all-columns fallback,
    mysql.go:1203-1221), else 'skip' (the reference drops the table's DMLs
    with a debug log)."""
    sel = select_handle_index(table_info)
    if sel["eligible"]:
        return "keyed"
    return "keyless" if force_replicate else "skip"
