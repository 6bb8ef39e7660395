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

  1. assign each row a DETERMINISTIC range id from the primary order key —
     fixed-width numeric ranges (one min/max metadata agg) or, for string
     keys, quantile boundaries from a key-hash-selected sample (the sample
     is a pure function of the key VALUE, never of partition layout)
  2. local cumulative sum within each range (window partitioned by range id)
  3. per-range totals → driver prefix-scan (O(S) metadata fold, the same
     pattern as the engine's watermark folds) → broadcast offsets back
  4. global offset = range prefix + local cumsum

Determinism contract (the reference treats replay determinism as a hard
invariant — resume/replay tests under tests/availability/): the range id is
a pure function of the row's own key, NOT of spark_partition_id() or of
sampled repartitionByRange boundaries, so cache eviction, recomputation, or
plan re-execution can never shift a row between ranges and corrupt offsets.

Shuffle carries only (order_key, n_tok) ≈ 16 B/row; every stage is S-way
parallel. Exact same numbers as the global window — range boundaries affect
only WHERE the work happens, never the offsets. With shard_col set, packing
is per-shard (fully parallel single window, ≤ S partially-filled tails).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType,
)


def _deterministic_range_id(
    docs: DataFrame,
    key: str,
    n_ranges: int,
    key_domain: tuple[int, int] | None = None,
) -> Column:
    """A Column mapping the primary order key to a range id in [0, n_ranges)
    that is (a) monotone non-decreasing in the key's sort order and (b) a
    pure function of the key value — never of execution-time partitioning.

    Numeric keys: fixed-width buckets over [min, max] (one column-pruned
    min/max agg — a deterministic metadata fold). Uniform keys (h60 hashes,
    dense ranks) bucket perfectly evenly.

    String keys: fixed-width buckets over a MONOTONE numeric proxy — the
    first 7 UTF-8 bytes as a big-endian integer (keys sharing a 7-byte
    prefix collapse into one bucket, which affects balance, never
    correctness; UTF-8 byte order equals Spark's binary string order). One
    min/max metadata agg, no sampling, no key collect.
    """
    dt = docs.schema[key].dataType
    k = F.col(key)
    if key_domain is not None:
        # caller-declared key domain (e.g. a h60 hash is uniform in
        # [0, 2^60)): skip the min/max job entirely
        lo_i, hi_i = int(key_domain[0]), int(key_domain[1])
        width = max(1, (hi_i - lo_i) // n_ranges + 1)
        pid = ((k.cast("long") - F.lit(lo_i)) / F.lit(width)).cast("long")
        return F.least(F.greatest(pid, F.lit(0)), F.lit(n_ranges - 1)).cast(
            "int"
        )
    if isinstance(dt, _NUMERIC):
        row = docs.agg(
            F.min(key).alias("lo"), F.max(key).alias("hi")
        ).collect()[0]
        lo, hi = row["lo"], row["hi"]
        if lo is None or hi is None or lo == hi:
            return F.lit(0)
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            span = float(hi) - float(lo)
            pid = F.floor((k - F.lit(float(lo))) / F.lit(span) * n_ranges)
        else:
            lo_i, hi_i = int(lo), int(hi)
            width = max(1, (hi_i - lo_i) // n_ranges + 1)
            pid = ((k.cast("long") - F.lit(lo_i)) / F.lit(width)).cast("long")
        return F.least(F.greatest(pid, F.lit(0)), F.lit(n_ranges - 1)).cast(
            "int"
        )
    # string / other orderable key: monotone 7-byte-prefix proxy (fits a
    # signed long: 2^56 < 2^63), right-padded with 0x00 so shorter strings
    # order first — then the numeric fixed-width path on the proxy
    proxy = F.coalesce(
        F.conv(
            F.rpad(F.hex(F.encode(F.substring(k.cast("string"), 1, 7), "UTF-8")), 14, "0"),
            16, 10,
        ).cast("long"),
        F.lit(0),
    )
    row = docs.agg(
        F.min(proxy).alias("lo"), F.max(proxy).alias("hi")
    ).collect()[0]
    lo, hi = row["lo"], row["hi"]
    if lo is None or hi is None or lo == hi:
        return F.lit(0)
    width = max(1, (int(hi) - int(lo)) // n_ranges + 1)
    pid = ((proxy - F.lit(int(lo))) / F.lit(width)).cast("long")
    return F.least(F.greatest(pid, F.lit(0)), F.lit(n_ranges - 1)).cast("int")


def _global_cumsum(
    docs: DataFrame,
    n_tok_col: str,
    order_col,
    range_partitions: int,
    key_domain: tuple[int, int] | None = None,
) -> DataFrame:
    """docs + `_cum` = inclusive global running sum of n_tok in order_col
    order (a str or a list of cols — extra cols break ties so the running
    sum is a total order), computed with range-parallel prefix sums (no
    single-partition window, no sampled repartitionByRange: the range id is
    a deterministic function of the primary key, see module docstring)."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    pid_expr = _deterministic_range_id(
        docs, order_cols[0], range_partitions, key_domain=key_domain
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    # persist the WINDOWED frame: the totals fold reuses the local cumsums
    # (max per range) and the final job is a cheap projection over the
    # cache. Unlike the r2 design, this persist is a recompute-avoidance
    # cache ONLY — the pid is a pure function of the key value, so eviction
    # or recomputation can never shift a row between ranges.
    local = (
        docs.withColumn("_pid", pid_expr)
        .withColumn("_cum_local", F.sum(n_tok_col).over(w_local))
        .persist()
    )
    # per-range totals: O(range_partitions) rows to the driver
    totals = {
        int(r["_pid"]): int(r["t"])
        for r in local.groupBy("_pid")
        .agg(F.max("_cum_local").alias("t"))
        .collect()
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
    order_col: str | list = "doc_id",
    shard_col: str | None = None,
    range_partitions: int = 32,
    key_domain: tuple[int, int] | None = None,
) -> DataFrame:
    """Per-document packing metadata: (order cols..., start_off, end_off,
    seq_id, spans_boundary). order_col may be a list (extra columns break
    ties); key_domain declares the primary key's value range (e.g. a h60
    hash is uniform in [0, 2^60)) so range assignment needs no min/max
    job."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    if shard_col:
        # per-shard pack: the shard IS the window partition — parallel as-is
        w = Window.partitionBy(shard_col).orderBy(*order_cols)
        cum = docs.select(shard_col, *order_cols, n_tok_col).withColumn(
            "_cum", F.sum(n_tok_col).over(w)
        )
        keep = [shard_col, *order_cols, n_tok_col]
    else:
        cum = _global_cumsum(
            docs.select(*order_cols, n_tok_col), n_tok_col, order_cols,
            range_partitions, key_domain=key_domain,
        )
        keep = [*order_cols, n_tok_col]
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


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    tokens_col: str = "tokens",
    order_col: str = "doc_id",
    range_partitions: int = 32,
) -> DataFrame:
    """Materialize the packed training sequences themselves — the step
    AFTER pack_offsets' metadata: documents concatenated in order_col
    order, cut every seq_len tokens; each output row is one training
    sequence with its assembled token array (cu_seqlens consumers read
    pack_offsets; data loaders read THIS).

    Plan shape: the same deterministic global prefix sum as pack_offsets
    for start offsets (no single-partition window), then ONE posexplode +
    hash shuffle keyed by seq_id, per-sequence assembly as a native
    array_sort over (slot, token) structs — no UDF, no driver collect.
    Every shuffle group is <= seq_len tokens regardless of document
    length (a boundary-spanning doc feeds both neighbor sequences), so
    group size is bounded by construction at any corpus size.

    Output: (seq_id, n_fill, tokens) — the final sequence may be
    partially filled (n_fill < seq_len).
    """
    base = docs.select(order_col, tokens_col).withColumn(
        "_n", F.size(F.col(tokens_col)).cast("long")
    )
    cum = _global_cumsum(base, "_n", [order_col], range_partitions)
    ex = cum.select(
        (F.col("_cum") - F.col("_n")).alias("_start"),
        F.posexplode(F.col(tokens_col)).alias("_pos", "_tok"),
    )
    g = F.col("_start") + F.col("_pos")
    ex = ex.select(
        (g / seq_len).cast("long").alias("seq_id"),
        (g % seq_len).cast("int").alias("_slot"),
        F.col("_tok"),
    )
    return ex.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_fill"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("_slot", "_tok"))),
            lambda s: s["_tok"],
        ).alias("tokens"),
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
    # h60 is uniform in [0, 2^60): declare the domain so range assignment
    # needs no min/max job at all — zero sampling, zero extra passes
    cum = _global_cumsum(
        base, "_one", ["_h", "doc_id"], range_partitions,
        key_domain=(0, (1 << 60) - 1),
    )
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
    # tmp + os.replace: same atomic-commit discipline as _commit_manifest
    # and the cursor writers — a crash mid-write never leaves a truncated
    # manifest behind
    path = os.path.join(out_dir, "_shard_manifest.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    return manifest


def pack_bins(
    docs: DataFrame,
    seq_len: int,
    n_tok_col: str = "n_tok",
    id_col: str = "doc_id",
    block_size: int = 512,
    range_partitions: int = 32,
) -> DataFrame:
    """Whole-document (SFT-style) packing: every document lands ENTIRELY in
    one fixed-capacity bin of seq_len tokens — no boundary-spanning, the
    layout instruction-tuning loaders want (vs pack_offsets' concatenative
    cut-every-L layout where documents straddle sequences).

    Algorithm: blocked first-fit-decreasing. Docs get a deterministic global
    rank by (n_tok DESC, id) via the range-partitioned prefix sum (rank_by —
    no single-partition window), blocks of `block_size` consecutive ranks
    are packed independently with exact FFD inside an applyInPandas task.
    Oversize docs (n_tok > seq_len) fit no bin and open their own.

    Scale shape: blocks are independent → embarrassingly parallel; FFD cost
    is O(block_size²) per task, constant in corpus size → linear overall.
    Blocking costs a little fill quality vs global FFD (a block can't reach
    across its boundary for a complementary doc) but FFD sorts decreasing,
    so same-block docs are near-equal length — the classic streaming-FFD
    approximation. Determinism: rank is a pure function of (n_tok, id), so
    block membership, slot order, and the greedy fold never depend on
    partition layout — re-running is bit-identical (replay contract, same
    as pack_offsets).

    Output: (id_col, n_tok, rank, bin_id) — bin_id globally unique
    (block * block_size + local bin index).
    """
    import pandas as pd  # noqa: F401  (applyInPandas payload)

    L, B = int(seq_len), int(block_size)
    base = docs.select(id_col, n_tok_col).withColumn(
        "_negtok", -F.col(n_tok_col).cast("long")
    )
    ranked = rank_by(base, ["_negtok", id_col], range_partitions)
    blocked = ranked.select(
        F.col(id_col),
        F.col(n_tok_col).cast("long").alias("n_tok"),
        F.col("_rank").alias("rank"),
        ((F.col("_rank") - 1) / B).cast("long").alias("_block"),
    )
    id_field = docs.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField(id_field.name, id_field.dataType),
            T.StructField("n_tok", T.LongType()),
            T.StructField("rank", T.LongType()),
            T.StructField("bin_id", T.LongType()),
        ]
    )

    def _ffd(pdf):
        pdf = pdf.sort_values("rank")
        block = int(pdf["_block"].iloc[0])
        fills: list[int] = []
        out = []
        for n in pdf["n_tok"]:
            n = int(n)
            idx = next((i for i, f in enumerate(fills) if f + n <= L), None)
            if idx is None:
                fills.append(n)
                idx = len(fills) - 1
            else:
                fills[idx] += n
            out.append(block * B + idx)
        res = pdf[[id_field.name, "n_tok", "rank"]].copy()
        res["bin_id"] = out
        return res

    return blocked.groupBy("_block").applyInPandas(_ffd, schema=out_schema)


def pack_bins_stats(docs: DataFrame, seq_len: int, **kw) -> DataFrame:
    """Per-bin fill stats for pack_bins: docs per bin, tokens, waste
    (capacity left; negative only for a single-oversize-doc bin)."""
    asg = pack_bins(docs, seq_len, **kw)
    return asg.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("fill"),
        (F.lit(int(seq_len)) - F.sum("n_tok")).alias("waste"),
    )


def pack_bins_sql(
    n_tok_sql: str,
    seq_len: int,
    block_size: int = 512,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for pack_bins: the same blocked FFD as a recursive CTE
    — one state row per (block, step) carrying the open-bin fill list;
    list_position finds the first bin that fits, list slicing applies the
    fill. Recursion depth = block_size (per-block fold steps run for all
    blocks in parallel per iteration)."""
    ctes, final = _pack_bins_ctes(
        n_tok_sql, seq_len, block_size, table=table, id_col=id_col
    )
    return f"""
WITH RECURSIVE {ctes}
SELECT {id_col}, n_tok, rank, bin_id FROM {final}
"""


def _pack_bins_ctes(
    n_tok_sql: str,
    seq_len: int,
    block_size: int = 512,
    table: str = "documents",
    id_col: str = "doc_id",
    extra_d_cols: str = "",
) -> tuple[str, str]:
    """The blocked-FFD CTE chain; final CTE `asg` has
    ({id_col}, n_tok, rank, bin_id). extra_d_cols rides along in `d`
    (e.g. the token array for sequence assembly)."""
    L, B = int(seq_len), int(block_size)
    ctes = f"""d AS (
  SELECT {id_col}, {n_tok_sql} AS n_tok{extra_d_cols} FROM {table}
),
r AS (
  SELECT {id_col}, n_tok,
         row_number() OVER (ORDER BY n_tok DESC, {id_col})::BIGINT AS rank
  FROM d
),
b AS (
  SELECT {id_col}, n_tok, rank,
         ((rank - 1) // {B})::BIGINT AS block_id,
         ((rank - 1) % {B})::BIGINT AS slot
  FROM r
),
ffd AS (
  SELECT block_id, 1::BIGINT AS step, {id_col}, n_tok, rank,
         1::BIGINT AS bin_local, [n_tok] AS fills
  FROM b WHERE slot = 0
  UNION ALL
  SELECT block_id, step + 1, {id_col}, n_tok, rank,
         CASE WHEN p > 0 THEN p ELSE len(fills) + 1 END::BIGINT AS bin_local,
         CASE WHEN p > 0
              THEN fills[1:p-1] || [fills[p] + n_tok]
                   || fills[p+1:len(fills)]
              ELSE list_append(fills, n_tok) END AS fills
  FROM (
    SELECT ffd.block_id, ffd.step, ffd.fills, bb.{id_col}, bb.n_tok, bb.rank,
           coalesce(list_position(
             list_transform(ffd.fills, x -> x + bb.n_tok <= {L}), true),
             0) AS p
    FROM ffd JOIN b bb ON bb.block_id = ffd.block_id AND bb.slot = ffd.step
  )
),
asg AS (
  SELECT {id_col}, n_tok, rank, block_id * {B} + bin_local - 1 AS bin_id
  FROM ffd
)"""
    return ctes, "asg"


def pack_bins_sequences(
    docs: DataFrame,
    seq_len: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    block_size: int = 512,
    range_partitions: int = 32,
) -> DataFrame:
    """Materialize the SFT training bins themselves: each output row is one
    bin's assembled token array — documents concatenated WHOLE in rank
    order inside their pack_bins bin, the artifact an instruction-tuning
    loader reads (each doc intact; per-bin fill <= seq_len except a
    single-oversize-doc bin).

    Plan shape: the pack_bins assignment, one broadcast-sized join back to
    the token arrays, then ONE shuffle keyed by bin_id with native
    array_sort(collect_list(struct(rank, tokens)))->flatten assembly — no
    posexplode needed (docs never straddle bins), every group <= seq_len
    tokens by construction.

    Output: (bin_id, n_docs, n_fill, tokens).
    """
    base = docs.select(id_col, tokens_col).withColumn(
        "_n", F.size(F.col(tokens_col)).cast("long")
    )
    asg = pack_bins(
        base, seq_len, n_tok_col="_n", id_col=id_col,
        block_size=block_size, range_partitions=range_partitions,
    )
    joined = asg.join(docs.select(id_col, tokens_col), id_col)
    return joined.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_fill"),
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rank", F.col(tokens_col)))
                ),
                lambda s: s[tokens_col],
            )
        ).alias("tokens"),
    )


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
