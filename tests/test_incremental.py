"""Incremental LSH dedup over the CDC change stream: the live pair set must
equal the batch minhash_lsh_pairs over the current corpus after ANY sequence
of inserts / updates / deletes and any epoch redelivery."""

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
ROOT = "/tmp/ticdc_spark_test_incremental"


def _mk(spark, sub):
    from ticdc_spark.pipeline.incremental import IncrementalLSHDeduper

    root = os.path.join(ROOT, sub)
    shutil.rmtree(root, ignore_errors=True)
    return IncrementalLSHDeduper(spark, root, n=3, threshold=0.7, id_type="bigint")


def _batch_pairs(docs):
    from ticdc_spark.pipeline.dedup import minhash_lsh_pairs

    return {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_lsh_pairs(docs, n=3, threshold=0.7).collect()
    }


def _live(dd):
    return {
        (r["doc_a"], r["doc_b"], r["jaccard"]) for r in dd.live_pairs().collect()
    }


def _as_changes(docs, commit_ts, op="I"):
    return docs.select(
        "doc_id",
        F.lit(op).alias("op"),
        F.lit(commit_ts).alias("commit_ts"),
        F.row_number()
        .over(__import__("pyspark").sql.window.Window.orderBy("doc_id"))
        .cast("long")
        .alias("seq"),
        "text",
    )


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text").cache()
    )


def test_insert_only_equals_batch(spark, docs):
    dd = _mk(spark, "ins")
    # deterministic 3-way arrival split
    part = F.pmod(F.xxhash64("doc_id"), F.lit(3))
    for e in range(3):
        chunk = docs.filter(part == e)
        dd.process_epoch(_as_changes(chunk, commit_ts=e + 1), f"ep{e}")
    assert _live(dd) == _batch_pairs(docs)
    assert len(_live(dd)) > 0


def test_updates_and_deletes_converge(spark, docs):
    dd = _mk(spark, "upd")
    dd.process_epoch(_as_changes(docs, commit_ts=1), "ep0")
    # mutate: delete some clustered docs, rewrite others to new content,
    # and rewrite one doc to be a near-dup of a doc it wasn't paired with
    pairs0 = sorted(_live(dd))
    assert pairs0, "fixture must produce near-dup pairs"
    kill = pairs0[0][0]  # delete one side of the first pair
    retext = pairs0[1][1]  # re-text one side of the second pair
    donor = docs.filter(F.col("doc_id") == pairs0[2][0]).collect()[0]["text"]
    newdoc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    ch = spark.createDataFrame(
        [
            (kill, "D", 2, 1, None),
            (retext, "U", 2, 2, "completely different content now " * 5),
            (newdoc, "I", 2, 3, donor + " tail"),
        ],
        "doc_id bigint, op string, commit_ts long, seq long, text string",
    )
    dd.process_epoch(ch, "ep1")
    final = (
        docs.filter(~F.col("doc_id").isin([kill, retext]))
        .unionByName(
            spark.createDataFrame(
                [
                    (retext, "completely different content now " * 5),
                    (newdoc, donor + " tail"),
                ],
                "doc_id bigint, text string",
            )
        )
    )
    assert _live(dd) == _batch_pairs(final)
    # the new doc must have been matched against the OLD corpus member
    assert any(newdoc in (a, b) for (a, b, _) in _live(dd))


def test_epoch_redelivery_is_idempotent(spark, docs):
    dd = _mk(spark, "redeliver")
    part = F.pmod(F.xxhash64("doc_id"), F.lit(2))
    c0 = _as_changes(docs.filter(part == 0), commit_ts=1)
    c1 = _as_changes(docs.filter(part == 1), commit_ts=2)
    dd.process_epoch(c0, "ep0")
    dd.process_epoch(c1, "ep1")
    want = _live(dd)
    # redeliver BOTH epochs out of order — table merges no-op, the pair
    # log re-probes against the current store; live set must not change
    dd.process_epoch(c1, "ep1")
    dd.process_epoch(c0, "ep0")
    assert _live(dd) == want == _batch_pairs(docs)
    # lake tables saw each epoch exactly once
    assert dd.corpus.read().count() == docs.count()


def test_band_index_bucketed_by_band_prefix(spark, docs):
    """bucket_col layout: every band_pfx's rows land in ONE bucket, so the
    probe can prune to the batch's band buckets."""
    dd = _mk(spark, "layout")
    dd.process_epoch(_as_changes(docs.limit(200), commit_ts=1), "ep0")
    raw = dd.band_index.read_raw().filter(~F.col("_deleted"))
    got = (
        raw.select(
            "band_pfx",
            F.pmod(F.xxhash64("band_pfx"), F.lit(dd.band_index.n_buckets)).alias("want_b"),
        )
        .distinct()
        .count()
    )
    per_pfx = raw.groupBy("band_pfx").agg(F.count("*").alias("n")).count()
    assert got == per_pfx  # one bucket per prefix — deterministic placement
    # and key lookups still work on the non-key-bucketed table
    k = raw.limit(1).collect()[0]["bkey"]
    assert dd.band_index.lookup([k]).count() == 1


def test_deduper_fed_by_lake_changelog(spark, docs):
    """Lake-to-lake derived index: a text LakeTable is maintained by CDC
    merges; the deduper consumes LakeTable.read_changes slices (the Iceberg
    incremental-scan analog) and its live pairs track the table's state —
    including through an update/delete epoch."""
    from ticdc_spark.lake.table import LakeTable

    root = os.path.join(ROOT, "changelog")
    shutil.rmtree(root, ignore_errors=True)
    tbl = LakeTable.create(
        spark,
        os.path.join(root, "src"),
        fields=[
            {"id": 1, "name": "doc_id", "type": "bigint", "nullable": False},
            {"id": 2, "name": "text", "type": "string"},
        ],
        n_buckets=4,
    )
    from ticdc_spark.pipeline.incremental import IncrementalLSHDeduper

    dd = IncrementalLSHDeduper(
        spark, os.path.join(root, "dd"), n=3, threshold=0.7, id_type="bigint"
    )

    def _feed(since, upto, ep):
        dd.process_epoch(tbl.read_changes(since, upto), ep)

    part = F.pmod(F.xxhash64("doc_id"), F.lit(2))
    v0 = tbl.version
    tbl.merge_epoch(_as_changes(docs.filter(part == 0), commit_ts=1), "e0")
    v1 = tbl.version
    _feed(v0, v1, "e0")
    tbl.merge_epoch(_as_changes(docs.filter(part == 1), commit_ts=2), "e1")
    v2 = tbl.version
    _feed(v1, v2, "e1")
    assert _live(dd) == _batch_pairs(tbl.read())
    # an update + delete epoch, still via the changelog
    pairs0 = sorted(_live(dd))
    kill, retext = pairs0[0][0], pairs0[0][1]
    ch = spark.createDataFrame(
        [
            (kill, "D", 3, 1, None),
            (retext, "U", 3, 2, "now something else entirely " * 6),
        ],
        "doc_id bigint, op string, commit_ts long, seq long, text string",
    )
    tbl.merge_epoch(ch, "e2")
    _feed(v2, tbl.version, "e2")
    assert _live(dd) == _batch_pairs(tbl.read())


def test_derived_index_feed_cursor_and_crash_replay(spark, docs):
    """DerivedIndexFeed: persisted version cursor, idempotent catch-up, and
    crash-between-epoch-and-cursor replay converges."""
    from ticdc_spark.lake.table import LakeTable
    from ticdc_spark.pipeline.incremental import (
        DerivedIndexFeed,
        IncrementalLSHDeduper,
    )

    root = os.path.join(ROOT, "feed")
    shutil.rmtree(root, ignore_errors=True)
    tbl = LakeTable.create(
        spark,
        os.path.join(root, "src"),
        fields=[
            {"id": 1, "name": "doc_id", "type": "bigint", "nullable": False},
            {"id": 2, "name": "text", "type": "string"},
        ],
        n_buckets=4,
    )
    dd = IncrementalLSHDeduper(
        spark, os.path.join(root, "dd"), n=3, threshold=0.7, id_type="bigint"
    )
    feed = DerivedIndexFeed(tbl, dd)
    part = F.pmod(F.xxhash64("doc_id"), F.lit(2))
    tbl.merge_epoch(_as_changes(docs.filter(part == 0), commit_ts=1), "e0")
    s1 = feed.sync()
    assert s1["to_version"] == tbl.version and feed.cursor == tbl.version
    tbl.merge_epoch(_as_changes(docs.filter(part == 1), commit_ts=2), "e1")
    feed.sync()
    assert _live(dd) == _batch_pairs(tbl.read())
    # idle sync is a no-op
    assert feed.sync()["pairs"] == 0
    # crash simulation: roll the cursor back one sync and replay
    with open(feed._cursor_path, "w") as f:
        f.write(str(s1["to_version"]))
    feed.sync()
    assert _live(dd) == _batch_pairs(tbl.read())


# ---------------- IncrementalIVF ----------------


def _ivf_batch(emb, queries):
    from ticdc_spark.pipeline.similarity import ivf_topk

    return {
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"])
        for r in ivf_topk(
            emb, queries, k=5, cell_bits=4, dim=64, n_probe_hamming=1
        ).collect()
    }


def _ivf_live(ivf, queries):
    return {
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"])
        for r in ivf.topk(queries, k=5, n_probe_hamming=1).collect()
    }


def _vec_changes(emb, commit_ts, op="I"):
    return emb.select(
        "vec_id",
        F.lit(op).alias("op"),
        F.lit(commit_ts).cast("long").alias("commit_ts"),
        F.col("vec_id").alias("seq"),
        "embedding",
    )


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .cache()
    )


def test_ivf_incremental_equals_batch(spark, emb):
    from ticdc_spark.pipeline.incremental import IncrementalIVF

    root = os.path.join(ROOT, "ivf")
    shutil.rmtree(root, ignore_errors=True)
    ivf = IncrementalIVF(spark, root, cell_bits=4, dim=64)
    part = F.pmod(F.xxhash64("vec_id"), F.lit(2))
    ivf.process_epoch(_vec_changes(emb.filter(part == 0), 1), "e0")
    ivf.process_epoch(_vec_changes(emb.filter(part == 1), 2), "e1")
    queries = emb.filter(F.col("vec_id") < 10)
    assert _ivf_live(ivf, queries) == _ivf_batch(emb, queries)


def test_ivf_cell_move_update_and_delete(spark, emb):
    """Re-embedding a vector to the NEGATED vector flips every hyperplane
    sign — it must vanish from its old cell's probes and appear in the new
    cell; deletes must vanish everywhere."""
    from ticdc_spark.pipeline.incremental import IncrementalIVF
    from ticdc_spark.pipeline.similarity import cell_signature

    root = os.path.join(ROOT, "ivf_move")
    shutil.rmtree(root, ignore_errors=True)
    ivf = IncrementalIVF(spark, root, cell_bits=4, dim=64)
    ivf.process_epoch(_vec_changes(emb, 1), "e0")
    moved_id, killed_id = 42, 43
    neg = emb.filter(F.col("vec_id") == moved_id).select(
        "vec_id",
        F.lit("U").alias("op"),
        F.lit(2).cast("long").alias("commit_ts"),
        F.lit(1).cast("long").alias("seq"),
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    kill = emb.filter(F.col("vec_id") == killed_id).select(
        "vec_id",
        F.lit("D").alias("op"),
        F.lit(2).cast("long").alias("commit_ts"),
        F.lit(2).cast("long").alias("seq"),
        F.lit(None).cast("array<float>").alias("embedding"),
    )
    ivf.process_epoch(neg.unionByName(kill), "e1")
    # the index's live vec set matches the mutated corpus, cell by cell
    final = (
        emb.filter(~F.col("vec_id").isin([moved_id, killed_id]))
        .unionByName(
            emb.filter(F.col("vec_id") == moved_id).select(
                "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
            )
        )
    )
    queries = emb.filter(F.col("vec_id") < 10)
    assert _ivf_live(ivf, queries) == _ivf_batch(final, queries)
    live = ivf.vecs.read()
    got_cells = {
        (r["vec_id"], r["cell"])
        for r in live.filter(F.col("vec_id").isin([moved_id, killed_id])).collect()
    }
    want_cell = (
        final.filter(F.col("vec_id") == moved_id)
        .select(cell_signature("embedding", 4, 64).alias("c"))
        .collect()[0]["c"]
    )
    assert got_cells == {(moved_id, want_cell)}
    # redelivery of both epochs changes nothing
    ivf.process_epoch(_vec_changes(emb, 1), "e0")
    ivf.process_epoch(neg.unionByName(kill), "e1")
    assert _ivf_live(ivf, queries) == _ivf_batch(final, queries)


def test_full_system_binlog_to_derived_dedup_index(spark):
    """The whole engine end-to-end: token-payload binlog → Structured
    Streaming ChangeFeed → lake tokens table → incremental changelog →
    DerivedIndexFeed (tokens rendered to text via transform) → live
    near-dup pairs over the PRE-TOKENIZED sequences equal the batch LSH
    over the table's current state."""
    from ticdc_spark.lake.table import LakeTable
    from ticdc_spark.pipeline.incremental import (
        DerivedIndexFeed,
        IncrementalLSHDeduper,
    )
    from ticdc_spark.streaming.changefeed import ChangeFeed

    import random

    root = os.path.join(ROOT, "fullsys")
    shutil.rmtree(root, ignore_errors=True)
    binlog = os.path.join(root, "binlog")
    # crafted token corpus: 10 templates x 3 variants -> real near-dup
    # clusters in the PRE-TOKENIZED payload; plus updates and a delete
    rng = random.Random(7)
    rows, seq = [], 0
    for t in range(10):
        base = [rng.randrange(50_000) for _ in range(30)]
        for v in range(3):
            toks = list(base)
            if v == 1:
                toks[-1] = (toks[-1] + 1) % 50_000
            if v == 2:
                toks = toks + [rng.randrange(50_000)]
            seq += 1
            rows.append(
                (100 + seq, seq, "t", "I", f"doc_{t}_{v}", toks, len(toks), "web",
                 seq % 2, 0)
            )
    # update one variant away from its cluster, delete another
    seq += 1
    rows.append((200 + seq, seq, "t", "U", "doc_0_1",
                 [rng.randrange(50_000) for _ in range(30)], 30, "web", 0, 0))
    seq += 1
    rows.append((200 + seq, seq, "t", "D", "doc_1_2", None, None, None, 1, 0))
    os.makedirs(binlog)
    from ticdc_spark.model import BINLOG_SCHEMA

    spark.createDataFrame(rows, BINLOG_SCHEMA).repartition(1).write.mode(
        "overwrite"
    ).parquet(binlog)
    tbl = LakeTable.create(spark, os.path.join(root, "tbl"), n_buckets=8)
    cf = ChangeFeed(tbl, binlog, os.path.join(root, "ckpt"), max_files_per_trigger=16)
    cf.run_available()

    to_text = F.concat_ws(" ", F.col("tokens").cast("array<string>"))
    dd = IncrementalLSHDeduper(
        spark, os.path.join(root, "dd"), n=3, threshold=0.7, id_type="string"
    )
    feed = DerivedIndexFeed(
        tbl,
        dd,
        transform=lambda df: df.select(
            "doc_id", "op", "commit_ts", "seq", to_text.alias("text")
        ),
    )
    feed.sync()
    corpus = tbl.read().select("doc_id", to_text.alias("text"))
    assert _live(dd) == _batch_pairs(corpus)
    assert len(_live(dd)) > 0


def test_maintenance_preserves_state(spark, docs, emb):
    """Compaction + snapshot expiry on the derived tables never changes
    live_pairs()/topk(); delta file chains actually shrink."""
    from ticdc_spark.pipeline.incremental import IncrementalIVF

    dd = _mk(spark, "maint")
    part = F.pmod(F.xxhash64("doc_id"), F.lit(4))
    for e in range(4):
        dd.process_epoch(_as_changes(docs.filter(part == e), commit_ts=e + 1), f"e{e}")
    before = _live(dd)
    files_before = sum(
        len(v) for v in dd.band_index._manifest["buckets"].values()
    )
    out = dd.maintain(max_deltas=1, keep_versions=2)
    assert any(v["compacted"] for v in out.values())
    dd_files = sum(len(v) for v in dd.band_index._manifest["buckets"].values())
    assert dd_files < files_before
    assert _live(dd) == before == _batch_pairs(docs)

    root = os.path.join(ROOT, "ivf_maint")
    shutil.rmtree(root, ignore_errors=True)
    ivf = IncrementalIVF(spark, root, cell_bits=4, dim=64)
    vpart = F.pmod(F.xxhash64("vec_id"), F.lit(3))
    for e in range(3):
        ivf.process_epoch(_vec_changes(emb.filter(vpart == e), e + 1), f"e{e}")
    queries = emb.filter(F.col("vec_id") < 10)
    want = _ivf_live(ivf, queries)
    ivf.maintain(max_deltas=1, keep_versions=2)
    assert _ivf_live(ivf, queries) == want == _ivf_batch(emb, queries)


def test_post_batch_hook_keeps_derived_index_in_lockstep(spark):
    """post_batch wiring: the derived index syncs after EVERY micro-batch
    (not just at the end), and the final live set equals batch LSH."""
    from ticdc_spark.lake.table import LakeTable
    from ticdc_spark.model import BINLOG_SCHEMA
    from ticdc_spark.pipeline.incremental import (
        DerivedIndexFeed,
        IncrementalLSHDeduper,
    )
    from ticdc_spark.streaming.changefeed import ChangeFeed
    import random
    import time

    root = os.path.join(ROOT, "lockstep")
    shutil.rmtree(root, ignore_errors=True)
    binlog = os.path.join(root, "binlog")
    os.makedirs(binlog)
    rng = random.Random(11)
    seq = 0
    for fidx in range(2):  # two files -> two micro-batches at mfpt=1
        rows = []
        for t in range(4):
            base = [rng.randrange(50_000) for _ in range(25)]
            for v in range(2):
                toks = list(base) + ([rng.randrange(50_000)] if v else [])
                seq += 1
                rows.append(
                    (100 * (fidx + 1) + seq, seq, "t", "I",
                     f"doc_{fidx}_{t}_{v}", toks, len(toks), "web", seq % 2, 0)
                )
        spark.createDataFrame(rows, BINLOG_SCHEMA).repartition(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(binlog, f"f{fidx}"))
        # distinct mtimes so the file source orders the two batches
        time.sleep(1.1)
    tbl = LakeTable.create(spark, os.path.join(root, "tbl"), n_buckets=4)
    to_text = F.concat_ws(" ", F.col("tokens").cast("array<string>"))
    dd = IncrementalLSHDeduper(
        spark, os.path.join(root, "dd"), n=3, threshold=0.7, id_type="string"
    )
    feed = DerivedIndexFeed(
        tbl,
        dd,
        transform=lambda df: df.select(
            "doc_id", "op", "commit_ts", "seq", to_text.alias("text")
        ),
    )
    syncs = []
    cf = ChangeFeed(
        tbl,
        os.path.join(binlog, "f*"),
        os.path.join(root, "ckpt"),
        max_files_per_trigger=1,
        post_batch=lambda summary: syncs.append(feed.sync()),
    )
    cf.run_available()
    assert len(syncs) >= 2  # one sync per micro-batch
    assert all(s["to_version"] > s["from_version"] for s in syncs)
    corpus = tbl.read().select("doc_id", to_text.alias("text"))
    assert _live(dd) == _batch_pairs(corpus)
    assert len(_live(dd)) > 0


def test_multi_table_post_batch_hook(spark):
    """MultiTableChangeFeed fires the same post_batch hook: one derived
    index per routed table stays in lockstep."""
    from ticdc_spark.lake.table import LakeTable
    from ticdc_spark.model import BINLOG_SCHEMA
    from ticdc_spark.pipeline.incremental import (
        DerivedIndexFeed,
        IncrementalLSHDeduper,
    )
    from ticdc_spark.streaming.multi import MultiTableChangeFeed
    import random

    root = os.path.join(ROOT, "multi_hook")
    shutil.rmtree(root, ignore_errors=True)
    binlog = os.path.join(root, "binlog")
    os.makedirs(binlog)
    rng = random.Random(5)
    rows, seq = [], 0
    for tname in ("ta", "tb"):
        for t in range(3):
            base = [rng.randrange(50_000) for _ in range(25)]
            for v in range(2):
                toks = list(base) + ([rng.randrange(50_000)] if v else [])
                seq += 1
                rows.append(
                    (100 + seq, seq, tname, "I", f"{tname}_d{t}_{v}", toks,
                     len(toks), "web", seq % 2, 0)
                )
    spark.createDataFrame(rows, BINLOG_SCHEMA).repartition(1).write.parquet(
        os.path.join(binlog, "f0")
    )
    tables = {
        n: LakeTable.create(spark, os.path.join(root, n), n_buckets=4)
        for n in ("ta", "tb")
    }
    to_text = F.concat_ws(" ", F.col("tokens").cast("array<string>"))
    tr = lambda df: df.select("doc_id", "op", "commit_ts", "seq", to_text.alias("text"))
    feeds = {
        n: DerivedIndexFeed(
            tables[n],
            IncrementalLSHDeduper(
                spark, os.path.join(root, f"dd_{n}"), id_type="string"
            ),
            transform=tr,
        )
        for n in tables
    }
    mf = MultiTableChangeFeed(
        tables,
        os.path.join(binlog, "f*"),
        os.path.join(root, "ckpt"),
        post_batch=lambda s: [f.sync() for f in feeds.values()],
    )
    mf.run_available()
    for n, f in feeds.items():
        corpus = tables[n].read().select("doc_id", to_text.alias("text"))
        assert _live(f.deduper) == _batch_pairs(corpus)
        assert len(_live(f.deduper)) > 0


def test_derived_feed_handles_source_truncate(spark, docs):
    """TRUNCATE on the source cannot appear as change rows; the feed must
    detect the manifest marker, wipe the derived state, and reindex only
    the post-truncate appends — no stale pairs survive."""
    from ticdc_spark.lake.table import LakeTable
    from ticdc_spark.pipeline.incremental import (
        DerivedIndexFeed,
        IncrementalLSHDeduper,
    )

    root = os.path.join(ROOT, "trunc")
    shutil.rmtree(root, ignore_errors=True)
    tbl = LakeTable.create(
        spark,
        os.path.join(root, "src"),
        fields=[
            {"id": 1, "name": "doc_id", "type": "bigint", "nullable": False},
            {"id": 2, "name": "text", "type": "string"},
        ],
        n_buckets=4,
    )
    dd = IncrementalLSHDeduper(
        spark, os.path.join(root, "dd"), n=3, threshold=0.7, id_type="bigint"
    )
    feed = DerivedIndexFeed(tbl, dd)
    part = F.pmod(F.xxhash64("doc_id"), F.lit(2))
    tbl.merge_epoch(_as_changes(docs, commit_ts=1), "e0")
    feed.sync()
    assert len(_live(dd)) > 0
    # wipe + reload a smaller corpus
    tbl.truncate(epoch_id="trunc-1")
    tbl.merge_epoch(_as_changes(docs.filter(part == 0), commit_ts=2), "e1")
    feed.sync()
    corpus = tbl.read()
    assert _live(dd) == _batch_pairs(corpus)
    # every surviving pair references only post-truncate docs
    live_ids = {r["doc_id"] for r in corpus.collect()}
    assert all(a in live_ids and b in live_ids for (a, b, _) in _live(dd))


def test_derived_feed_drives_ivf(spark, emb):
    """The same subscription machinery maintains the ANN index: an
    embeddings LakeTable's changelog feeds IncrementalIVF via
    DerivedIndexFeed; probes equal the batch IVF after each sync."""
    from ticdc_spark.lake.table import LakeTable
    from ticdc_spark.pipeline.incremental import DerivedIndexFeed, IncrementalIVF

    root = os.path.join(ROOT, "ivf_feed")
    shutil.rmtree(root, ignore_errors=True)
    tbl = LakeTable.create(
        spark,
        os.path.join(root, "src"),
        fields=[
            {"id": 1, "name": "vec_id", "type": "bigint", "nullable": False},
            {"id": 2, "name": "embedding", "type": "array<float>"},
        ],
        n_buckets=4,
        key_col="vec_id",
    )
    ivf = IncrementalIVF(spark, os.path.join(root, "ivf"), cell_bits=4, dim=64)
    feed = DerivedIndexFeed(
        tbl,
        ivf,
        transform=lambda df: df.select("vec_id", "op", "commit_ts", "seq", "embedding"),
    )
    part = F.pmod(F.xxhash64("vec_id"), F.lit(2))
    for e, cts in ((0, 1), (1, 2)):
        ch = emb.filter(part == e).select(
            F.col("vec_id"),
            F.lit("I").alias("op"),
            F.lit(cts).cast("long").alias("commit_ts"),
            F.col("vec_id").alias("seq"),
            "embedding",
        )
        tbl.merge_epoch(ch, f"e{e}")
        feed.sync()
    queries = emb.filter(F.col("vec_id") < 10)
    assert _ivf_live(ivf, queries) == _ivf_batch(emb, queries)


# ---------------------------------------------------------------------------
# IncrementalDecontaminator
# ---------------------------------------------------------------------------


def _mk_decon(spark, sub, eval_docs):
    from ticdc_spark.pipeline.incremental import IncrementalDecontaminator

    root = os.path.join(ROOT, sub)
    shutil.rmtree(root, ignore_errors=True)
    return IncrementalDecontaminator(
        spark, root, eval_docs=eval_docs, n=8, id_type="bigint"
    )


def _decon_report(dd):
    return {
        (r["doc_id"], r["n_hit_grams"], r["contaminated"])
        for r in dd.report().collect()
    }


def _batch_decon(docs, eval_docs):
    from ticdc_spark.pipeline.decontam import decontaminate

    return {
        (r["doc_id"], r["n_hit_grams"], r["contaminated"])
        for r in decontaminate(docs, eval_docs, n=8).collect()
    }


@pytest.fixture(scope="module")
def eval_docs(spark, docs):
    # a slice of the corpus itself guarantees real 8-gram overlap
    return (
        docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(7)) == 0)
        .select(F.col("doc_id"), "text")
        .cache()
    )


def test_decontam_insert_epochs_equal_batch(spark, docs, eval_docs):
    dd = _mk_decon(spark, "dc_ins", eval_docs)
    part = F.pmod(F.xxhash64("doc_id"), F.lit(3))
    for e in range(3):
        dd.process_epoch(_as_changes(docs.filter(part == e), e + 1), f"ep{e}")
    got = _decon_report(dd)
    assert got == _batch_decon(docs, eval_docs)
    assert any(c == 1 for _, _, c in got)  # overlap actually detected


def test_decontam_update_delete_redelivery(spark, docs, eval_docs):
    dd = _mk_decon(spark, "dc_upd", eval_docs)
    base = docs.limit(300)
    dd.process_epoch(_as_changes(base, 1), "ep0")
    third = F.pmod(F.xxhash64("doc_id"), F.lit(3))
    # update: a third gets clean text (no 8 consecutive shared words)
    upd = base.filter(third == 0).withColumn(
        "text", F.concat_ws(" ", F.lit("clean"), F.col("doc_id").cast("string"))
    )
    dels = base.filter(third == 1)
    c_upd = _as_changes(upd, 2, op="U")
    c_del = dels.select(
        "doc_id", F.lit("D").alias("op"), F.lit(2).alias("commit_ts"),
        F.lit(0).cast("long").alias("seq"), F.lit(None).cast("string").alias("text"),
    )
    dd.process_epoch(c_upd.unionByName(c_del), "ep1")
    # redeliver the SAME epoch (crash-replay) — idempotent
    dd.process_epoch(c_upd.unionByName(c_del), "ep1")
    live = base.filter(third == 2).unionByName(upd)
    assert _decon_report(dd) == _batch_decon(live, eval_docs)


def test_decontam_reset_keeps_eval_grams(spark, docs, eval_docs):
    dd = _mk_decon(spark, "dc_reset", eval_docs)
    dd.process_epoch(_as_changes(docs.limit(50), 1), "ep0")
    n_grams = dd.eval_grams().count()
    dd.reset()
    assert dd.report().count() == 0
    assert dd.eval_grams().count() == n_grams  # config survives the wipe
    dd.process_epoch(_as_changes(docs.limit(50), 1), "ep0")
    assert _decon_report(dd) == _batch_decon(docs.limit(50), eval_docs)


# ---------------- IncrementalAsofView ----------------


def _asof_view(spark, tmp_path):
    from ticdc_spark.pipeline.incremental import IncrementalAsofView

    return IncrementalAsofView(spark, str(tmp_path / "asof"), n_buckets=4, k_buckets=4)


def _fc(spark, rows):
    return spark.createDataFrame(
        rows, "fact_id long, op string, commit_ts long, seq long, k long, ts long, value double"
    )


def _dc(spark, rows):
    return spark.createDataFrame(
        rows, "k long, ts long, pvalue double, commit_ts long, seq long"
    )


def _assert_view_equals_batch(v):
    got = sorted(map(tuple, v.view.read().select(
        "fact_id", "k", "ts", "value", "asof_pvalue", "asof_ts").collect()))
    want = sorted(map(tuple, v.expected().collect()))
    assert got == want


def test_asof_view_inserts_then_late_version(spark, tmp_path):
    v = _asof_view(spark, tmp_path)
    # epoch 1: facts only — no dims yet, all matches NULL
    v.process_epoch(
        _fc(spark, [(1, "I", 10, 0, 7, 100, 1.0), (2, "I", 10, 1, 7, 200, 2.0),
                    (3, "I", 10, 2, 9, 150, 3.0)]),
        None, "e1",
    )
    _assert_view_equals_batch(v)
    # epoch 2: dims arrive — including a LATE version (ts=50 < every fact)
    v.process_epoch(
        None,
        _dc(spark, [(7, 150, 10.0, 20, 0), (7, 50, 5.0, 20, 1), (9, 150, 7.0, 20, 2)]),
        "e2",
    )
    _assert_view_equals_batch(v)
    r = {x.fact_id: (x.asof_pvalue, x.asof_ts) for x in v.view.read().collect()}
    assert r[1] == (5.0, 50)     # late version matched retroactively
    assert r[2] == (10.0, 150)
    assert r[3] == (7.0, 150)    # allow-exact at equal ts


def test_asof_view_update_delete_and_k_move(spark, tmp_path):
    v = _asof_view(spark, tmp_path)
    v.process_epoch(
        _fc(spark, [(1, "I", 10, 0, 7, 100, 1.0), (2, "I", 10, 1, 8, 100, 2.0)]),
        _dc(spark, [(7, 90, 5.0, 10, 2), (8, 90, 6.0, 10, 3)]),
        "e1",
    )
    _assert_view_equals_batch(v)
    # epoch 2: fact 1 MOVES key 7 -> 8 (old-bucket tombstone path),
    # fact 2 deleted, new fact on key 7
    v.process_epoch(
        _fc(spark, [(1, "U", 20, 0, 8, 100, 1.5), (2, "D", 20, 1, 8, 100, None),
                    (4, "I", 20, 2, 7, 80, 4.0)]),
        None, "e2",
    )
    _assert_view_equals_batch(v)
    r = {x.fact_id: (x.value, x.asof_pvalue) for x in v.view.read().collect()}
    assert set(r) == {1, 4}
    assert r[1] == (1.5, 6.0)    # enriched from key 8's history now
    assert r[4] == (4.0, None)   # ts=80 precedes key 7's version at 90
    # facts store has no stale copy under the old k bucket
    assert v.facts.read().filter("fact_id = 1").count() == 1


def test_asof_view_redelivery_and_interleaved_epochs(spark, tmp_path):
    v = _asof_view(spark, tmp_path)
    f1 = _fc(spark, [(i, "I", 10, i, i % 3, 100 + i, float(i)) for i in range(12)])
    d1 = _dc(spark, [(0, 95, 1.0, 10, 100), (1, 105, 2.0, 10, 101)])
    v.process_epoch(f1, d1, "e1")
    d2 = _dc(spark, [(2, 103, 3.0, 20, 0), (0, 104, 9.0, 20, 1)])
    v.process_epoch(None, d2, "e2")
    _assert_view_equals_batch(v)
    before = sorted(map(tuple, v.view.read().collect()))
    # redeliver BOTH epochs (same ids): all merges idempotent, state fixed
    v.process_epoch(f1, d1, "e1")
    v.process_epoch(None, d2, "e2")
    assert sorted(map(tuple, v.view.read().collect())) == before
    _assert_view_equals_batch(v)


def test_asof_view_feed_follows_two_changelogs(spark, tmp_path):
    from ticdc_spark.lake.table import LakeTable
    from ticdc_spark.pipeline.incremental import AsofViewFeed, IncrementalAsofView

    facts_src = LakeTable.create(
        spark, str(tmp_path / "facts_src"),
        fields=[
            {"id": 1, "name": "fact_id", "type": "bigint", "nullable": False},
            {"id": 2, "name": "k", "type": "bigint"},
            {"id": 3, "name": "ts", "type": "bigint"},
            {"id": 4, "name": "value", "type": "double"},
        ],
        n_buckets=4, key_col="fact_id",
    )
    dims_src = LakeTable.create(
        spark, str(tmp_path / "dims_src"),
        fields=[
            {"id": 1, "name": "vkey", "type": "string", "nullable": False},
            {"id": 2, "name": "k", "type": "bigint"},
            {"id": 3, "name": "ts", "type": "bigint"},
            {"id": 4, "name": "pvalue", "type": "double"},
        ],
        n_buckets=4, key_col="vkey",
    )
    v = IncrementalAsofView(spark, str(tmp_path / "asofv"), n_buckets=4, k_buckets=4)
    feed = AsofViewFeed(facts_src, dims_src, v)

    def fmerge(rows, eid, cts):
        facts_src.merge_epoch(
            spark.createDataFrame(
                [(fid, k, ts, val, op, cts, i) for i, (fid, k, ts, val, op) in enumerate(rows)],
                "fact_id long, k long, ts long, value double, op string, commit_ts long, seq long",
            ), eid,
        )

    def dmerge(rows, eid, cts):
        dims_src.merge_epoch(
            spark.createDataFrame(
                [(f"{k}|{ts}", k, ts, pv, "I", cts, i) for i, (k, ts, pv) in enumerate(rows)],
                "vkey string, k long, ts long, pvalue double, op string, commit_ts long, seq long",
            ), eid,
        )

    fmerge([(1, 7, 100, 1.0, "I"), (2, 7, 200, 2.0, "I"), (3, 9, 150, 3.0, "I")], "f1", 10)
    dmerge([(7, 150, 5.0)], "d1", 10)
    r1 = feed.sync()
    assert r1["invalidated"] == 3
    _assert_view_equals_batch(v)

    # second round: late version for k=7, fact 3 deleted, fact 1 updated
    dmerge([(7, 50, 4.0), (9, 140, 6.0)], "d2", 20)
    fmerge([(3, 9, 150, None, "D"), (1, 7, 120, 1.5, "U")], "f2", 20)
    r2 = feed.sync()
    _assert_view_equals_batch(v)
    got = {x.fact_id: (x.asof_pvalue, x.asof_ts) for x in v.view.read().collect()}
    assert set(got) == {1, 2}
    assert got[1] == (4.0, 50)    # late version matched
    assert got[2] == (5.0, 150)

    # idempotent: nothing new -> no-op; cursor crash -> identical replay
    assert feed.sync()["invalidated"] == 0
    import os as _os
    _os.remove(feed._cursor_path)
    before = sorted(map(tuple, v.view.read().collect()))
    feed.sync()  # replays f0-.. d0-.. ranges; epoch ids collide per-table? no: full range
    _assert_view_equals_batch(v)
    assert sorted(map(tuple, v.view.read().collect())) == before


def test_asof_view_feed_follows_live_changefeed(spark):
    """End-to-end composition: binlog -> streaming ChangeFeed maintains the
    fact table -> post_batch hook syncs the enriched as-of view after EVERY
    micro-batch; final view equals the batch as-of join over the final
    state."""
    import random
    import time

    from ticdc_spark.lake.table import LakeTable
    from ticdc_spark.model import BINLOG_SCHEMA
    from ticdc_spark.pipeline.incremental import AsofViewFeed, IncrementalAsofView
    from ticdc_spark.streaming.changefeed import ChangeFeed

    root = os.path.join(ROOT, "asof_lockstep")
    shutil.rmtree(root, ignore_errors=True)
    binlog = os.path.join(root, "binlog")
    os.makedirs(binlog)
    rng = random.Random(23)
    seq = 0
    for fidx in range(2):
        rows = []
        for t in range(12):
            seq += 1
            toks = [rng.randrange(100, 1000), rng.randrange(50_000)]
            rows.append(
                (100 * (fidx + 1) + seq, seq, "t", "I",
                 f"doc_{fidx}_{t}", toks, len(toks) + t, "web", seq % 2, 0)
            )
        spark.createDataFrame(rows, BINLOG_SCHEMA).repartition(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(binlog, f"f{fidx}"))
        time.sleep(1.1)
    tbl = LakeTable.create(spark, os.path.join(root, "tbl"), n_buckets=4)
    dims_src = LakeTable.create(
        spark, os.path.join(root, "dims_src"),
        fields=[
            {"id": 1, "name": "vkey", "type": "string", "nullable": False},
            {"id": 2, "name": "k", "type": "bigint"},
            {"id": 3, "name": "ts", "type": "bigint"},
            {"id": 4, "name": "pvalue", "type": "double"},
        ],
        n_buckets=4, key_col="vkey",
    )
    dims_src.merge_epoch(
        spark.createDataFrame(
            [(f"{k}|{t}", k, t, float(k * 1000 + t), "I", 1, k * 10 + t)
             for k in range(3) for t in (150, 600)],
            "vkey string, k long, ts long, pvalue double, op string, commit_ts long, seq long",
        ), "d1",
    )
    # facts derived from the tokens payload: event time = first token,
    # entity key = n_tok % 3, value = n_tok
    fact_tf = lambda df: df.select(  # noqa: E731
        F.col("doc_id").alias("fact_id"), "op", "commit_ts", "seq",
        (F.col("n_tok") % 3).cast("long").alias("k"),
        F.element_at("tokens", 1).cast("long").alias("ts"),
        F.col("n_tok").cast("double").alias("value"),
    )
    v = IncrementalAsofView(
        spark, os.path.join(root, "view"), n_buckets=4, k_buckets=4,
        id_type="string",
    )
    feed = AsofViewFeed(tbl, dims_src, v, fact_transform=fact_tf)
    syncs = []
    cf = ChangeFeed(
        tbl,
        os.path.join(binlog, "f*"),
        os.path.join(root, "ckpt"),
        max_files_per_trigger=1,
        post_batch=lambda summary: syncs.append(feed.sync()),
    )
    cf.run_available()
    assert len(syncs) >= 2
    # the resolved-ts frontier may hold the final event as carry-over
    # (min-over-parts contract) — everything RELEASED must be enriched
    n_released = tbl.read().count()
    assert n_released >= 23
    assert sum(s["invalidated"] for s in syncs) == n_released
    got = sorted(map(tuple, v.view.read().select(
        "fact_id", "k", "ts", "value", "asof_pvalue", "asof_ts").collect()))
    want = sorted(map(tuple, v.expected().collect()))
    assert got == want and len(got) == n_released


def test_asof_view_randomized_epochs_hypothesis(spark, tmp_path):
    """Randomized epoch interleavings (fact I/U/D + dim version appends in
    arbitrary per-epoch groupings) must always leave the view equal to the
    batch as-of join over the final state."""
    from hypothesis import given, settings, strategies as st

    from ticdc_spark.pipeline.incremental import IncrementalAsofView

    counter = [0]

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(  # per epoch: (facts, dims)
            st.tuples(
                st.lists(st.tuples(st.integers(0, 5),      # fact_id
                                   st.integers(0, 1),      # op 0=put 1=del
                                   st.integers(0, 2),      # k
                                   st.integers(0, 30)),    # ts
                         max_size=6),
                st.lists(st.tuples(st.integers(0, 2),      # k
                                   st.integers(0, 30)),    # ts
                         max_size=4),
            ),
            min_size=1, max_size=4,
        )
    )
    def run(epochs):
        counter[0] += 1
        v = _asof_view(spark, tmp_path / f"h{counter[0]}")
        cts = 0
        for ei, (fr, dr) in enumerate(epochs):
            cts += 100
            fc = _fc(spark, [
                (fid, "D" if d else "I", cts, i, k, ts, float(fid))
                for i, (fid, d, k, ts) in enumerate(fr)
            ]) if fr else None
            dr = sorted({(k, t) for k, t in dr})
            dc = _dc(spark, [
                (k, t, float(k * 100 + t), cts, i)
                for i, (k, t) in enumerate(dr)
            ]) if dr else None
            v.process_epoch(fc, dc, f"e{ei}")
        _assert_view_equals_batch(v)

    run()


# ---------------- IncrementalPQ ----------------


def _pq_batch(emb, queries, books):
    from ticdc_spark.pipeline.pq import ivfpq_topk

    return {
        (r["query_id"], r["neighbor_id"], r["adc_dist"], r["rank"])
        for r in ivfpq_topk(
            emb, queries, k_top=5, cell_bits=4, n_probe_hamming=1,
            m=4, k=8, iters=1, dim=64, books=books,
        ).collect()
    }


def _pq_live(ipq, queries):
    return {
        (r["query_id"], r["neighbor_id"], r["adc_dist"], r["rank"])
        for r in ipq.topk(queries, k_top=5, n_probe_hamming=1).collect()
    }


def test_pq_incremental_equals_batch_and_reopens(spark, emb):
    """Frozen-codebook invariant: after split epochs the probe equals the
    batch IVFADC over the same books; a reopened index loads the books
    from disk and answers identically."""
    from ticdc_spark.pipeline.incremental import IncrementalPQ
    from ticdc_spark.pipeline.pq import pq_train

    root = os.path.join(ROOT, "pq")
    shutil.rmtree(root, ignore_errors=True)
    books = pq_train(emb, m=4, k=8, iters=1, dim=64)
    ipq = IncrementalPQ(spark, root, books=books, cell_bits=4,
                        m=4, k=8, iters=1, dim=64)
    part = F.pmod(F.xxhash64("vec_id"), F.lit(2))
    ipq.process_epoch(_vec_changes(emb.filter(part == 0), 1), "e0")
    ipq.process_epoch(_vec_changes(emb.filter(part == 1), 2), "e1")
    queries = emb.filter(F.col("vec_id") < 10)
    want = _pq_batch(emb, queries, books)
    assert _pq_live(ipq, queries) == want

    reopened = IncrementalPQ(spark, root, cell_bits=4, m=4, k=8, iters=1, dim=64)
    assert reopened.books == books
    assert _pq_live(reopened, queries) == want


def test_pq_incremental_move_delete_redelivery(spark, emb):
    """Negation flips every hyperplane sign (cell move) AND lands in other
    code cells; deletes vanish from every probe; epoch redelivery is
    absorbed."""
    from ticdc_spark.pipeline.incremental import IncrementalPQ
    from ticdc_spark.pipeline.pq import pq_train

    root = os.path.join(ROOT, "pq_move")
    shutil.rmtree(root, ignore_errors=True)
    books = pq_train(emb, m=4, k=8, iters=1, dim=64)
    ipq = IncrementalPQ(spark, root, books=books, cell_bits=4,
                        m=4, k=8, iters=1, dim=64)
    ipq.process_epoch(_vec_changes(emb, 1), "e0")
    moved_id, killed_id = 42, 43
    neg = emb.filter(F.col("vec_id") == moved_id).select(
        "vec_id",
        F.lit("U").alias("op"),
        F.lit(2).cast("long").alias("commit_ts"),
        F.lit(1).cast("long").alias("seq"),
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    kill = emb.filter(F.col("vec_id") == killed_id).select(
        "vec_id",
        F.lit("D").alias("op"),
        F.lit(2).cast("long").alias("commit_ts"),
        F.lit(2).cast("long").alias("seq"),
        F.lit(None).cast("array<float>").alias("embedding"),
    )
    batch = neg.unionByName(kill).localCheckpoint(eager=True)
    ipq.process_epoch(batch, "e1")
    ipq.process_epoch(batch, "e1")  # redelivery: absorbed
    final = emb.filter(~F.col("vec_id").isin([moved_id, killed_id])).unionByName(
        emb.filter(F.col("vec_id") == moved_id).select(
            "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
        )
    )
    queries = emb.filter(F.col("vec_id") < 10)
    assert _pq_live(ipq, queries) == _pq_batch(final, queries, books)
    # the store really holds codes, not floats
    assert "codes" in ipq.vecs.read().columns
    assert "embedding" not in ipq.vecs.read().columns


def test_derived_feed_drives_pq_with_truncate(spark, emb):
    """DerivedIndexFeed maintains the compressed IVFADC index too: inserts
    through the changelog, a source TRUNCATE wipes the derived rows but
    KEEPS the frozen books (post-truncate codes stay comparable), and the
    re-indexed probe equals the batch IVFADC over the post-truncate set."""
    from ticdc_spark.lake.table import LakeTable
    from ticdc_spark.pipeline.incremental import DerivedIndexFeed, IncrementalPQ
    from ticdc_spark.pipeline.pq import pq_train

    root = os.path.join(ROOT, "pq_feed")
    shutil.rmtree(root, ignore_errors=True)
    tbl = LakeTable.create(
        spark,
        os.path.join(root, "src"),
        fields=[
            {"id": 1, "name": "vec_id", "type": "bigint", "nullable": False},
            {"id": 2, "name": "embedding", "type": "array<float>"},
        ],
        n_buckets=4,
        key_col="vec_id",
    )
    books = pq_train(emb, m=4, k=8, iters=1, dim=64)
    ipq = IncrementalPQ(spark, os.path.join(root, "pq"), books=books,
                        cell_bits=4, m=4, k=8, iters=1, dim=64)
    feed = DerivedIndexFeed(
        tbl, ipq,
        transform=lambda df: df.select("vec_id", "op", "commit_ts", "seq", "embedding"),
    )
    part = F.pmod(F.xxhash64("vec_id"), F.lit(2))
    for e, cts in ((0, 1), (1, 2)):
        ch = emb.filter(part == e).select(
            "vec_id",
            F.lit("I").alias("op"),
            F.lit(cts).cast("long").alias("commit_ts"),
            F.col("vec_id").alias("seq"),
            "embedding",
        )
        tbl.merge_epoch(ch, f"e{e}")
        feed.sync()
    queries = emb.filter(F.col("vec_id") < 10)
    assert _pq_live(ipq, queries) == _pq_batch(emb, queries, books)

    # truncate, then re-index a subset: derived state rebuilt, books kept
    keep = emb.filter(part == 0)
    tbl.truncate("trunc1")
    tbl.merge_epoch(
        keep.select(
            "vec_id", F.lit("I").alias("op"),
            F.lit(3).cast("long").alias("commit_ts"),
            F.col("vec_id").alias("seq"), "embedding",
        ),
        "e2",
    )
    feed.sync()
    assert ipq.books == books
    assert _pq_live(ipq, queries) == _pq_batch(keep, queries, books)
