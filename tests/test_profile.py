"""IncrementalProfile — changelog-maintained per-group corpus stats.

Invariant under every scenario: profile() equals a groupBy recount of the
table's live state at the synced version (pipeline/profile docstring)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ticdc_spark.lake.table import LakeTable
from ticdc_spark.pipeline.profile import IncrementalProfile

FIELDS = [
    {"id": 1, "name": "doc_id", "type": "string", "nullable": False},
    {"id": 2, "name": "source", "type": "string"},
    {"id": 3, "name": "n_tok", "type": "long"},
]


def _ep(t, rows, eid):
    df = t.spark.createDataFrame(
        rows,
        "doc_id string, source string, n_tok long, op string, "
        "commit_ts long, seq long",
    )
    t.merge_epoch(df, eid)


def _want(t):
    return {
        r["source"]: (r["n"], r["s"], r["q"])
        for r in t.read()
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_tok").alias("s"),
            F.sum(F.col("n_tok") * F.col("n_tok")).alias("q"),
        )
        .collect()
    }


def _got(p):
    return {
        r["grp"]: (r["n_docs"], r["n_tok_sum"], r["n_tok_sq"])
        for r in p.profile().collect()
    }


def _check(t, p, tag):
    assert p.verify() == [], tag
    assert _got(p) == _want(t), tag


def test_incremental_profile_tracks_changelog(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), fields=FIELDS, n_buckets=4)
    p = IncrementalProfile(t, "source", ("n_tok",))
    _ep(
        t,
        [
            ("a", "web", 3, "U", 10, 1),
            ("b", "web", 5, "U", 10, 2),
            ("c", "wiki", 7, "U", 11, 1),
        ],
        "e0",
    )
    assert p.sync()["mode"] == "full"  # first sync = full recount
    _check(t, p, "insert")
    # update (n_tok change), source move, delete
    _ep(
        t,
        [
            ("a", "web", 4, "U", 20, 1),
            ("c", "web", 7, "U", 20, 2),  # wiki -> web: group nets to zero
            ("b", None, None, "D", 21, 1),
        ],
        "e1",
    )
    r = p.sync()
    assert r["mode"] == "incremental" and r["changed_keys"] == 3
    _check(t, p, "update+move+delete")
    # the emptied group must be DROPPED, not kept as a zero row
    assert "wiki" not in _got(p)
    # out-of-order straggler loses the LWW merge: profile unchanged
    _ep(t, [("a", "web", 99, "U", 5, 1)], "e2")
    assert p.sync()["mode"] == "incremental"
    _check(t, p, "straggler")
    assert _got(p)["web"][1] == 4 + 7
    # redelivered epoch: version unchanged, sync is a no-op
    _ep(t, [("a", "web", 4, "U", 20, 1)], "e1")
    assert p.sync() == {"synced": False, "version": p.meta["version"]}
    _check(t, p, "redelivery")


def test_incremental_profile_reopen_and_fallback(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), fields=FIELDS, n_buckets=4)
    p = IncrementalProfile(t, "source", ("n_tok",))
    _ep(t, [(f"d{i}", f"s{i % 3}", i + 1, "U", 10, i) for i in range(12)], "e0")
    p.sync()
    _check(t, p, "base")
    # reopen from disk: agrees with persisted state, keeps syncing
    p2 = IncrementalProfile(t, "source", ("n_tok",))
    assert p2.meta["version"] == p.meta["version"]
    _ep(t, [("d0", "s1", 50, "U", 20, 0)], "e1")
    assert p2.sync()["mode"] == "incremental"
    _check(t, p2, "reopen")
    # truncate (non-append-only range) forces ONE full recount
    t.truncate(epoch_id="trunc")
    _ep(t, [("x", "s9", 2, "U", 30, 0)], "e2")
    assert p2.sync()["mode"] == "full"
    _check(t, p2, "post-truncate")
    assert set(_got(p2)) == {"s9"}


def test_incremental_profile_rejects_unknown_columns(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), fields=FIELDS, n_buckets=4)
    with pytest.raises(ValueError, match="nope"):
        IncrementalProfile(t, "source", ("nope",))


def test_gopher_rules_branches(spark):
    """One crafted document per rule so each Gopher rule fires at least once
    in both directions (the oracle check covers the corpus; this pins the
    rule semantics)."""
    from ticdc_spark.functions.text import gopher_rules_columns

    good = (
        "the cat and the dog have been walking to that house of cards "
        "with great joy and some more plain words here to pass the floor"
    )
    docs = [
        (1, good),  # passes everything
        (2, "too few words"),  # r_word_count
        (3, "a b c d e f g h i j k l m n o p"),  # mean word len < 3
        (4, good + " ### ## # # # # # # # # # # # # # #"),  # symbol ratio
        (5, "- one\n- two\n- three\n- four"),  # bullet lines (and word count)
        (6, good.replace("cards", "cards...") + " more... and... so... on..."
            + " yes... no... ok... well... hm... right... sure... fine..."),
        (7, "0 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19"),  # alpha
        (8, "purple monkey dishwasher banana elephant quantum pickle "
            "umbrella cactus waffle ninja spatula"),  # no required stopwords
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = {row["doc_id"]: row.asDict() for row in gopher_rules_columns(df).collect()}
    assert r[1]["gopher_keep"] == 1
    assert r[2]["r_word_count"] == 0
    assert r[3]["r_mean_word_len"] == 0
    assert r[4]["r_symbol_ratio"] == 0
    assert r[5]["r_bullet_lines"] == 0
    assert r[6]["r_ellipsis_lines"] == 0 or r[6]["r_symbol_ratio"] == 0
    assert r[7]["r_alpha_words"] == 0
    assert r[8]["r_stop_words"] == 0
    assert all(r[i]["gopher_keep"] == 0 for i in range(2, 9))


def test_randomized_epochs_shards_and_profile_invariant(spark, tmp_path):
    """Property soak: N seeded random epochs of mixed insert/update/delete
    (incl. group moves and out-of-order commit timestamps); after EVERY
    epoch both derived states equal their from-scratch recomputation."""
    import random

    from ticdc_spark.pipeline.shards import IncrementalShards

    rng = random.Random(1234)
    t = LakeTable.create(spark, str(tmp_path / "t"), fields=FIELDS, n_buckets=8)
    p = IncrementalProfile(t, "source", ("n_tok",))
    sh = IncrementalShards(t, str(tmp_path / "sh"), n_shards=4, seed=1)
    universe = [f"d{i}" for i in range(60)]
    alive: set[str] = set()
    seq = 0
    for epoch in range(6):
        rows = []
        for _ in range(rng.randint(5, 20)):
            seq += 1
            d = rng.choice(universe)
            # out-of-order commit timestamps across epochs
            ts = rng.randint(1, 1000)
            if d in alive and rng.random() < 0.3:
                rows.append((d, None, None, "D", ts, seq))
            else:
                rows.append(
                    (d, f"s{rng.randint(0, 3)}", rng.randint(1, 99), "U", ts, seq)
                )
        _ep(t, rows, f"e{epoch}")
        alive = {r["doc_id"] for r in t.read().select("doc_id").collect()}
        assert p.sync()["synced"]
        assert p.verify() == [], f"profile diverged at epoch {epoch}"
        sh.refresh()
        assert sh.verify(), f"shards diverged at epoch {epoch}"
    assert _got(p) == _want(t)


def test_profile_double_stat_column_not_truncated(spark, tmp_path):
    """Fractional stat columns sum as double — a long cast would silently
    zero 0.7 contributions while verify() still passed."""
    fields = [
        {"id": 1, "name": "doc_id", "type": "string", "nullable": False},
        {"id": 2, "name": "source", "type": "string"},
        {"id": 3, "name": "score", "type": "double"},
    ]
    t = LakeTable.create(spark, str(tmp_path / "t"), fields=fields, n_buckets=4)
    p = IncrementalProfile(t, "source", ("score",))
    df = spark.createDataFrame(
        [("a", "s", 0.7, "U", 10, 1), ("b", "s", 0.6, "U", 10, 2)],
        "doc_id string, source string, score double, op string, "
        "commit_ts long, seq long",
    )
    t.merge_epoch(df, "e0")
    p.sync()
    row = {r["grp"]: r for r in p.profile().collect()}["s"]
    assert abs(row["score_sum"] - 1.3) < 1e-9
    assert abs(row["score_sq"] - (0.49 + 0.36)) < 1e-9
    assert p.verify() == []


def test_profile_keeps_single_snapshot_dir(spark, tmp_path):
    """Superseded snapshots are GC'd — a long-running feed must not leak one
    parquet dir per table version."""
    import os

    t = LakeTable.create(spark, str(tmp_path / "t"), fields=FIELDS, n_buckets=4)
    p = IncrementalProfile(t, "source", ("n_tok",))
    for i in range(4):
        _ep(t, [(f"d{i}", "web", i + 1, "U", 10 + i, i)], f"e{i}")
        p.sync()
    snaps = os.listdir(os.path.join(str(tmp_path / "t"), "_profile", "snap"))
    assert len(snaps) == 1, snaps
    assert p.verify() == []


def test_profile_rejects_non_numeric_stat(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), fields=FIELDS, n_buckets=4)
    with pytest.raises(ValueError, match="non-numeric"):
        IncrementalProfile(t, "source", ("source",))
