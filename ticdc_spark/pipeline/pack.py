"""Training-sequence packing — turn a corpus of variable-length token
documents into fixed-length training sequences (the "packed dataset" layout:
documents concatenated in a deterministic order, sequences cut every L
tokens; a document may span a boundary, recorded by its start/end offsets —
cu_seqlens-style metadata).

    offset(doc) = Σ n_tok of docs before it (order: doc_id)
    seq_id(doc) = offset // L

Scale shape: a naive global running-sum window is ONE partition — a single
task folding the whole corpus. The global path here is the classic
distributed prefix sum instead:

  1. range-partition by the order key (S ranges, S-way parallel)
  2. local cumulative sum within each range (window partitioned by range id)
  3. per-range totals → driver prefix-scan (O(S) metadata fold, the same
     pattern as the engine's watermark folds) → broadcast offsets back
  4. global offset = range prefix + local cumsum

Shuffle carries only (order_key, n_tok) ≈ 16 B/row; every stage is S-way
parallel. Exact same numbers as the global window — range boundaries affect
only WHERE the work happens, never the offsets. With shard_col set, packing
is per-shard (fully parallel single window, ≤ S partially-filled tails).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _global_cumsum(
    docs: DataFrame, n_tok_col: str, order_col, range_partitions: int
) -> DataFrame:
    """docs + `_cum` = inclusive global running sum of n_tok in order_col
    order (a str or a list of cols — extra cols break ties so the running
    sum is a total order), computed with range-parallel prefix sums (no
    single-partition window)."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    ranged = docs.repartitionByRange(
        range_partitions, *[F.col(c) for c in order_cols]
    ).withColumn("_pid", F.spark_partition_id())
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    # persist BEFORE the totals fold: repartitionByRange samples its
    # boundaries per execution, so without pinning, the totals job and the
    # downstream job could assign different _pid ranges. The cached slice is
    # (order, n_tok, pid, cum) ≈ 24 B/row, MEMORY_AND_DISK.
    local = ranged.withColumn("_cum_local", F.sum(n_tok_col).over(w_local)).persist()
    # per-range totals: O(range_partitions) rows to the driver — a metadata
    # fold, not a data collect
    totals = {
        int(r["_pid"]): int(r["t"])
        for r in local.groupBy("_pid").agg(F.max("_cum_local").alias("t")).collect()
    }
    prefix: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        prefix[pid] = acc
        acc += totals[pid]
    # broadcast the prefix map as a literal CASE — range count is small
    off = F.lit(0)
    for pid, p in prefix.items():
        if p:
            off = F.when(F.col("_pid") == pid, F.lit(p)).otherwise(off)
    return local.withColumn("_cum", F.col("_cum_local") + off).drop(
        "_pid", "_cum_local"
    )


def pack_offsets(
    docs: DataFrame,
    seq_len: int,
    n_tok_col: str = "n_tok",
    order_col: str = "doc_id",
    shard_col: str | None = None,
    range_partitions: int = 32,
) -> DataFrame:
    """Per-document packing metadata: (order cols..., start_off, end_off,
    seq_id, spans_boundary)."""
    if shard_col:
        # per-shard pack: the shard IS the window partition — parallel as-is
        w = Window.partitionBy(shard_col).orderBy(order_col)
        cum = docs.select(shard_col, order_col, n_tok_col).withColumn(
            "_cum", F.sum(n_tok_col).over(w)
        )
        keep = [shard_col, order_col, n_tok_col]
    else:
        cum = _global_cumsum(
            docs.select(order_col, n_tok_col), n_tok_col, order_col, range_partitions
        )
        keep = [order_col, n_tok_col]
    out = cum.select(
        *keep,
        (F.col("_cum") - F.col(n_tok_col)).alias("start_off"),
        F.col("_cum").alias("end_off"),
    )
    return out.select(
        "*",
        (F.col("start_off") / seq_len).cast("long").alias("seq_id"),
        (
            (F.col("start_off") / seq_len).cast("long")
            != ((F.col("end_off") - 1) / seq_len).cast("long")
        ).alias("spans_boundary"),
    )


def pack_stats(docs: DataFrame, seq_len: int, **kw) -> DataFrame:
    """Per-sequence fill stats: docs starting in each sequence, tokens
    contributed, boundary-spanning count."""
    off = pack_offsets(docs, seq_len, **kw)
    return off.groupBy("seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.sum(F.col("spans_boundary").cast("long")).alias("n_spanning"),
        F.min("start_off").alias("first_off"),
    )


def shuffle_order(
    docs: DataFrame,
    seed: int = 0,
    id_col: str = "doc_id",
    range_partitions: int = 32,
) -> DataFrame:
    """Deterministic global training shuffle: every doc gets a dense rank
    1..N by hash order — the reproducible "shuffle the corpus before
    packing/sharding" step every training pipeline needs (reshuffling =
    changing the seed; resuming = recomputing the same order bit-exact, no
    stored permutation).

    rank = row_number over (h60(seed ++ doc_id), doc_id) — the hash makes
    the order pseudorandom, the id tie-break makes it total. Same
    range-partitioned prefix-sum machinery as packing: no single-partition
    window, shuffle carries ~16 B/row, O(ranges) driver fold.

    Output: (doc_id, shuffle_key, rank).
    """
    from ..functions.hashing import h60

    h = h60(
        F.concat_ws(
            "\x1f", F.lit(str(seed)), F.col(id_col).cast("string")
        )
    )
    base = (
        docs.select(F.col(id_col).alias("doc_id"))
        .withColumn("_h", h)
        .withColumn("_one", F.lit(1))
    )
    cum = _global_cumsum(base, "_one", ["_h", "doc_id"], range_partitions)
    return cum.select(
        "doc_id",
        F.col("_h").alias("shuffle_key"),
        F.col("_cum").cast("long").alias("rank"),
    )


def shuffle_order_sql(seed: int = 0) -> str:
    from ..functions.hashing import h60_sql

    h = h60_sql(
        f"concat_ws(chr(31), '{seed}', cast(doc_id AS varchar))"
    )
    return f"""
WITH h AS (
  SELECT doc_id, {h} AS shuffle_key FROM documents
)
SELECT doc_id, shuffle_key,
       row_number() OVER (ORDER BY shuffle_key, doc_id) AS rank
FROM h
"""


def shard_assign(
    docs: DataFrame,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
    range_partitions: int = 32,
) -> DataFrame:
    """Deterministic contiguous-balanced shard assignment over the seeded
    shuffle order: shard_id = ((rank-1) * n_shards) div N, so shard sizes
    differ by at most one and each shard is a CONTIGUOUS rank range (the
    layout a sequential-reading trainer wants — shard s = the s-th slice of
    the global shuffled order). N comes from max(rank) as a broadcast 1-row
    aggregate; integer `div` keeps the cut exact at any N.

    Output: (doc_id, rank, shard_id).
    """
    ranked = shuffle_order(
        docs, seed=seed, id_col=id_col, range_partitions=range_partitions
    ).select("doc_id", "rank")
    n = ranked.agg(F.max("rank").alias("_n_total"))
    return ranked.crossJoin(F.broadcast(n)).select(
        "doc_id",
        "rank",
        F.expr(f"((rank - 1) * {int(n_shards)}) div _n_total")
        .cast("long")
        .alias("shard_id"),
    )


def shard_assign_sql(n_shards: int, seed: int = 0) -> str:
    from ..functions.hashing import h60_sql

    h = h60_sql(f"concat_ws(chr(31), '{seed}', cast(doc_id AS varchar))")
    return f"""
WITH h AS (
  SELECT doc_id, {h} AS sk
  FROM documents
), r AS (
  SELECT doc_id, row_number() OVER (ORDER BY sk, doc_id) AS rank FROM h
)
SELECT doc_id, rank,
       ((rank - 1) * {int(n_shards)}) // (SELECT max(rank) FROM r) AS shard_id
FROM r
"""


def write_shards(
    docs: DataFrame,
    out_dir: str,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> dict:
    """Materialize the training shards: every doc's full payload written
    under shard_id=<s>/ in its shuffle-rank order slice, plus a manifest
    (per-shard doc counts) at <out_dir>/_shard_manifest.json. Deterministic:
    same corpus + seed + n_shards => byte-identical assignment (re-running
    a failed export is safe). One payload shuffle (repartition on shard_id);
    rows are rank-sorted within each shard file.
    """
    import json
    import os

    asg = shard_assign(docs, n_shards, seed=seed, id_col=id_col)
    full = docs.join(asg, docs[id_col] == asg["doc_id"]).drop(asg["doc_id"])
    from ..functions.partitioning import identity_repartition

    (
        identity_repartition(full, n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "rank")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out_dir)
    )
    stats = {
        int(r["shard_id"]): int(r["n"])
        for r in asg.groupBy("shard_id").agg(F.count("*").alias("n")).collect()
    }
    manifest = {
        "n_shards": n_shards,
        "seed": seed,
        "shards": {str(k): v for k, v in sorted(stats.items())},
    }
    with open(os.path.join(out_dir, "_shard_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def rank_by(
    df: DataFrame, order_cols: list[str], range_partitions: int = 32
) -> DataFrame:
    """Global dense rank 1..N over `order_cols` (pass enough columns for a
    TOTAL order — ties would share a rank through the RANGE window frame).
    Same range-partitioned prefix-sum machinery as packing/shuffling: no
    single-partition window at any N. Adds a `_rank` column."""
    base = df.withColumn("_one", F.lit(1))
    cum = _global_cumsum(base, "_one", order_cols, range_partitions)
    return cum.withColumnRenamed("_cum", "_rank").drop("_one")
