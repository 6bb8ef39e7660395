"""Round-3 fixes: deterministic prefix-sum machinery (pack/shuffle/rank),
as-of join hardening, atomic shard manifest.

Reference analog for determinism-as-a-contract: TiCDC's resume-replay tests
(tests/availability/) require bit-identical state after recomputation; here
the contract is that a rank/offset plan evaluates identically under cache
eviction and re-execution.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_str(spark):
    """Documents with STRING ids (exercises the sampled-boundary path)."""
    rows = [(f"doc_{i:05d}", (i * 37) % 19 + 1) for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id string, n_tok long")


@pytest.fixture(scope="module")
def docs_num(spark):
    rows = [(i, (i * 13) % 23 + 1) for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, n_tok long")


def _collect_map(df, key, *vals):
    return {r[key]: tuple(r[v] for v in vals) for r in df.collect()}


def test_shuffle_order_stable_under_cache_eviction(spark, docs_str):
    """The r2 driver flake: sampled repartitionByRange boundaries shifted
    between the plan-build totals fold and the final execution once the
    persist pin was evicted. The fix makes the range id a pure function of
    the key, so clearing every cache between evaluations must not change a
    single rank."""
    from ticdc_spark.pipeline.pack import shuffle_order

    out = shuffle_order(docs_str, seed=7, range_partitions=8)
    first = _collect_map(out, "doc_id", "rank")
    spark.catalog.clearCache()
    second = _collect_map(out, "doc_id", "rank")
    assert first == second
    # and a freshly-built plan agrees too (cross-plan determinism)
    spark.catalog.clearCache()
    rebuilt = shuffle_order(docs_str, seed=7, range_partitions=8)
    assert _collect_map(rebuilt, "doc_id", "rank") == first
    # ranks are a dense permutation 1..N
    assert sorted(r for (r,) in first.values()) == list(range(1, 2001))


def test_pack_offsets_string_key_matches_single_window(spark, docs_str):
    """String order key takes the deterministic hash-sample boundary path;
    offsets must equal the naive single-window ground truth."""
    from pyspark.sql import Window

    from ticdc_spark.pipeline.pack import pack_offsets

    got = _collect_map(
        pack_offsets(docs_str, seq_len=64, range_partitions=8),
        "doc_id", "start_off", "end_off", "seq_id",
    )
    w = Window.orderBy("doc_id")
    truth = _collect_map(
        docs_str.withColumn("_cum", F.sum("n_tok").over(w)).select(
            "doc_id",
            (F.col("_cum") - F.col("n_tok")).alias("start_off"),
            F.col("_cum").alias("end_off"),
            (((F.col("_cum") - F.col("n_tok")) / 64).cast("long")).alias(
                "seq_id"
            ),
        ),
        "doc_id", "start_off", "end_off", "seq_id",
    )
    assert got == truth
    spark.catalog.clearCache()
    again = _collect_map(
        pack_offsets(docs_str, seq_len=64, range_partitions=8),
        "doc_id", "start_off", "end_off", "seq_id",
    )
    assert again == truth


def test_rank_by_numeric_fixed_width_ranges(spark, docs_num):
    from ticdc_spark.pipeline.pack import rank_by

    out = rank_by(docs_num, ["n_tok", "doc_id"], range_partitions=8)
    first = _collect_map(out, "doc_id", "_rank")
    spark.catalog.clearCache()
    assert _collect_map(out, "doc_id", "_rank") == first
    # ground truth: ranks follow (n_tok, doc_id) total order
    truth = {
        r["doc_id"]: (i + 1,)
        for i, r in enumerate(
            sorted(docs_num.collect(), key=lambda r: (r["n_tok"], r["doc_id"]))
        )
    }
    assert first == truth


def test_deterministic_range_id_constant_key(spark):
    """Degenerate domains (all keys equal, or a single row) collapse to one
    range without error."""
    from ticdc_spark.pipeline.pack import rank_by

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c")], "k long, id string"
    )
    out = rank_by(df.withColumnRenamed("k", "n"), ["n", "id"], 8)
    assert sorted(r["_rank"] for r in out.collect()) == [1, 2, 3]


def test_asof_null_payload_propagates_with_its_version(spark):
    """A dimension version whose payload is legitimately NULL must win the
    as-of match and deliver that NULL — never an older version's value, and
    multi-column payloads must never mix fields across versions (DuckDB
    ASOF semantics; the r2 per-column last(ignorenulls) bug)."""
    from ticdc_spark.operators.asof import asof_join, asof_join_salted

    dims = spark.createDataFrame(
        [("k", 10, "v10", 1), ("k", 20, None, 2), ("k", 30, "v30", None)],
        "key string, ts long, a string, b long",
    )
    facts = spark.createDataFrame(
        [("k", 15), ("k", 25), ("k", 35)], "key string, ts long"
    )
    for fn in (asof_join, asof_join_salted):
        got = {
            r["ts"]: (r["asof_a"], r["asof_b"], r["asof_ts"])
            for r in fn(
                facts, dims, key="key", payload=("a", "b")
            ).collect()
        }
        assert got[15] == ("v10", 1, 10)
        # version@20 has a NULL — it must NOT fall back to v10's value
        assert got[25] == (None, 2, 20)
        # and fields must come from ONE version: (v30, NULL), not (v30, 2)
        assert got[35] == ("v30", None, 30)


def test_asof_rejects_colliding_fact_columns(spark):
    from ticdc_spark.operators.asof import asof_join, asof_join_salted

    dims = spark.createDataFrame([("k", 1, "x")], "key string, ts long, v string")
    for bad in ("_side", "_ats", "asof_v", "asof_ts"):
        facts = spark.createDataFrame(
            [("k", 2, "z")], f"key string, ts long, `{bad}` string"
        )
        for fn in (asof_join, asof_join_salted):
            with pytest.raises(ValueError, match="collide"):
                fn(facts, dims, key="key", payload=("v",))
    # "_r" is salted-only internal state
    facts_r = spark.createDataFrame(
        [("k", 2, "z")], "key string, ts long, _r string"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join_salted(facts_r, dims, key="key", payload=("v",))


def test_cdclog_executor_side_rotation(spark, tmp_path):
    """The r2 structural scale-killer: emit() folded a table's whole batch
    into one driver row. Now executors stream size-rotated files; this
    drives a batch big enough to rotate into >1 file per table and checks
    (a) rotation happened, (b) every event survives the round-trip in
    order, (c) file names carry each file's max commit ts."""
    import os

    from pyspark.sql import types as T

    from ticdc_spark.streaming.cdclog import CdclogSink, read_cdclog

    n = 3000
    df = spark.range(n).select(
        (F.lit(1000) + F.col("id")).alias("commit_ts"),
        F.col("id").alias("seq"),
        F.lit("ta").alias("table"),
        F.when(F.col("id") % 10 == 0, "D").otherwise("I").alias("op"),
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.sequence(F.lit(0), F.lit(30)).cast("array<int>").alias("tokens"),
        F.lit(31).alias("n_tok"),
        F.lit("web").alias("source"),
    )
    root = str(tmp_path / "cdclog")
    sink = CdclogSink(spark, root, {"ta": 7})
    # tiny rotate size so 3000 events split into several files
    paths = sink.emit(
        df, {"ta": ["tokens", "n_tok", "source"]},
        rotate_bytes=64 * 1024, flush_bytes=16 * 1024,
    )
    assert len(paths["ta"]) > 1, "batch must rotate into multiple files"
    # every file exists, no tmp leftovers, names sorted by their max ts
    tdir = os.path.join(root, "t_7")
    assert not [f for f in os.listdir(tdir) if f.startswith(".cdclog.tmp")]
    max_ts = [int(os.path.basename(p).split(".")[1]) for p in paths["ta"]]
    assert max_ts == sorted(max_ts)
    assert max_ts[-1] == 1000 + n - 1
    # round-trip: all events come back, deletes as null payloads
    schema = T.StructType([
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ])
    back = read_cdclog(spark, root, schema)
    assert back.count() == n
    assert back.filter(F.col("op") == "D").count() == n // 10
    # per-file byte size stays in the rotate ballpark (no giant single file)
    sizes = [os.path.getsize(p) for p in paths["ta"]]
    assert max(sizes) < 3 * 64 * 1024


def test_write_shards_manifest_atomic(spark, docs_str, tmp_path):
    from ticdc_spark.pipeline.pack import write_shards

    out = str(tmp_path / "shards")
    m = write_shards(docs_str, out, n_shards=4, seed=1)
    path = os.path.join(out, "_shard_manifest.json")
    assert os.path.exists(path)
    assert not os.path.exists(path + ".tmp")  # tmp was os.replace'd away
    with open(path) as f:
        assert json.load(f) == json.loads(json.dumps(m))
