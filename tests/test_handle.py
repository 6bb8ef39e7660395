"""Handle-index selection parity (cdc/model/schema_storage.go:76-173,
320-336): PK-is-handle, unique-index eligibility (non-null, non-virtual),
fewest-columns / lowest-id tie-breaks, ineligible tables."""

import pytest

from ticdc_spark.operators.handle import (
    column_flags,
    select_handle_index,
    validate_feed_key,
)


def _cols(*specs):
    return [
        {"name": n, "nullable": nul, "primary": pk, "generated": gen,
         "generated_stored": stored}
        for n, nul, pk, gen, stored in specs
    ]


def test_pk_is_handle_wins():
    ti = {
        "pk_is_handle": True,
        "columns": _cols(("id", False, True, False, False),
                         ("v", True, False, False, False)),
        "indices": [{"id": 5, "name": "uk", "primary": False, "unique": True,
                     "columns": ["v"]}],
    }
    assert select_handle_index(ti) == {
        "eligible": True, "handle_index": "pk", "handle_cols": ["id"]
    }
    assert "handle_key" in column_flags(ti)["id"]


def test_primary_index_beats_any_unique():
    ti = {
        "pk_is_handle": False,
        "columns": _cols(("a", False, True, False, False),
                         ("b", False, False, False, False)),
        "indices": [
            {"id": 1, "name": "uk_b", "primary": False, "unique": True, "columns": ["b"]},
            {"id": 2, "name": "pk", "primary": True, "unique": True, "columns": ["a"]},
        ],
    }
    assert select_handle_index(ti)["handle_index"] == 2


def test_fewest_columns_then_lowest_id():
    cols = _cols(("a", False, False, False, False),
                 ("b", False, False, False, False),
                 ("c", False, False, False, False))
    ti = {
        "pk_is_handle": False,
        "columns": cols,
        "indices": [
            {"id": 9, "name": "u_ab", "primary": False, "unique": True, "columns": ["a", "b"]},
            {"id": 7, "name": "u_c", "primary": False, "unique": True, "columns": ["c"]},
            {"id": 3, "name": "u_b", "primary": False, "unique": True, "columns": ["b"]},
        ],
    }
    # fewest columns wins; among 1-col indices the LOWER id (3) wins
    assert select_handle_index(ti)["handle_index"] == 3
    assert select_handle_index(ti)["handle_cols"] == ["b"]


def test_nullable_or_virtual_unique_index_not_eligible():
    ti = {
        "pk_is_handle": False,
        "columns": _cols(("a", True, False, False, False),      # nullable
                         ("g", False, False, True, False)),     # virtual gen
        "indices": [
            {"id": 1, "name": "u_a", "primary": False, "unique": True, "columns": ["a"]},
            {"id": 2, "name": "u_g", "primary": False, "unique": True, "columns": ["g"]},
        ],
    }
    sel = select_handle_index(ti)
    assert not sel["eligible"] and sel["handle_cols"] == []
    # stored generated columns ARE eligible (IsIndexUnique:331-333)
    ti["columns"][1]["generated_stored"] = True
    assert select_handle_index(ti)["handle_index"] == 2


def test_validate_feed_key():
    ti = {
        "pk_is_handle": False,
        "columns": _cols(("doc_id", False, False, False, False)),
        "indices": [{"id": 1, "name": "u", "primary": False, "unique": True,
                     "columns": ["doc_id"]}],
    }
    validate_feed_key(ti, "doc_id")  # ok
    with pytest.raises(ValueError, match="selected handle"):
        validate_feed_key(ti, "other")
    with pytest.raises(ValueError, match="ineligible"):
        validate_feed_key({"pk_is_handle": False, "columns": [], "indices": []}, "doc_id")
