"""Last-write-wins dedup — the core CDC collapse operator.

Semantics (SURVEY.md §2.6): the reference applies every change event in
(CRTs, delete-before-put) order (cdc/puller/entry_sorter.go:62-72, apply loop
cdc/sink/mysql.go:947-1034), so the final state per handle key equals the
LAST write under the total order (commit_ts, seq, op_rank) with
op_rank(D)=0 < op_rank(I/U)=1. We collapse explicitly instead of replaying:

  winner(key) = max_{events of key} (commit_ts, seq, op_rank)

Three physical strategies, all producing identical results:

1. lww_latest_agg  — groupBy(key).agg(max_by(payload, rank_struct)).
   THE production path: a hash aggregate with map-side partial aggregation,
   so hot keys collapse before the shuffle — skew-immune, one shuffle,
   no window sort. This is what runs at 10^10 events.
2. lww_latest_window — row_number() over (partition by key order by rank
   desc) = 1. The literal north-rule formulation; used as a semantic
   cross-check. Skew-sensitive (one partition per key lands on one task).
3. lww_latest_salted — explicit two-phase reduce: partial LWW within
   (key, salt) then final LWW over the S survivors per key. Demonstrates the
   hot-region mitigation the reference gets from TiKV region splits
   (pkg/scheduler/table_number.go analog); with strategy 1 Spark's partial
   aggregation already does this implicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..model import KEY_COL, OP_DELETE


def op_rank_col(op: str | Column = "op") -> Column:
    """Delete sorts before put at equal (commit_ts, seq):
    cdc/puller/entry_sorter.go:62-72."""
    c = F.col(op) if isinstance(op, str) else op
    return F.when(c == OP_DELETE, F.lit(0)).otherwise(F.lit(1))


def rank_struct(df: DataFrame) -> Column:
    """The LWW total-order key."""
    return F.struct(
        F.col("commit_ts"), F.col("seq"), op_rank_col().alias("op_rank")
    )


def lww_latest_agg(df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """One winning event per key via max_by — map-side-combining aggregate.

    Returns the original columns of df (winner's values), one row per key.
    """
    key_cols = key_cols or [KEY_COL]
    payload = [c for c in df.columns if c not in key_cols]
    winner = F.max_by(F.struct(*[F.col(c) for c in payload]), rank_struct(df))
    out = df.groupBy(*key_cols).agg(winner.alias("_w"))
    return out.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload])


def lww_latest_window(df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Window-ranking formulation (north-rule literal): rn = 1 keeps winner."""
    key_cols = key_cols or [KEY_COL]
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("commit_ts").desc(), F.col("seq").desc(), op_rank_col().desc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def lww_latest_semijoin(df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Rank-only shuffle + winner join-back — the wide-payload fast path.

    max_by/window shuffle the full payload (token arrays dominate row size);
    here only (key, commit_ts, seq, op_rank) goes through the shuffle
    (~24 B/row), then the winner set joins back against the un-shuffled
    events to pick up payloads map-side. With AQE the join-back is a
    broadcast when the winner set is small (one epoch's keys) and degrades
    to a shuffle join — never worse than max_by — when it isn't.

    PRECONDITION: (commit_ts, seq, op_rank) is unique per key — true for a
    CDC log where seq is the arrival order (ties across op are the
    delete/put pairs, split by op_rank). merge-time re-collapse of
    at-least-once duplicates still uses lww_latest_agg.
    """
    key_cols = key_cols or [KEY_COL]
    rank = F.struct(F.col("commit_ts"), F.col("seq"), op_rank_col().alias("op_rank"))
    wins = (
        df.groupBy(*key_cols)
        .agg(F.max(rank).alias("_r"))
        .select(
            *[F.col(k).alias(f"_wk_{k}") for k in key_cols],
            F.col("_r.commit_ts").alias("_wc"),
            F.col("_r.seq").alias("_ws"),
            F.col("_r.op_rank").alias("_wo"),
        )
    )
    cond = [F.col(k) == F.col(f"_wk_{k}") for k in key_cols] + [
        F.col("commit_ts") == F.col("_wc"),
        F.col("seq") == F.col("_ws"),
        op_rank_col() == F.col("_wo"),
    ]
    # shuffle_hash hint: build the hash map from the NARROW winner side —
    # SMJ would sort the wide payload side (measured 3-5x slower); the
    # per-partition build is |keys|/shuffle_partitions rank tuples, which
    # fits executor memory at any epoch size with sane partitioning. AQE
    # still upgrades to broadcast when the winner set is small.
    joined = df.join(wins.hint("shuffle_hash"), cond, "inner")
    return joined.select(*df.columns)


def lww_collapse_prearranged(
    df: DataFrame, bucket_expr: Column, n_buckets: int, key_cols: list[str] | None = None
) -> DataFrame:
    """Single-shuffle LWW collapse pre-arranged for the bucketed lake write.

    The north-rule's "key-partitioned window ranking", fused with the sink's
    storage layout: repartition the epoch ONCE on the storage bucket id,
    then rank per key INSIDE each bucket partition. Catalyst inserts no
    second exchange for the window because HashPartitioning(_bucket)
    already clusters (_bucket, key) — a key lives in exactly one bucket.
    Output carries `_bucket`, is hash-partitioned by it, and is key-sorted
    within each bucket, which is exactly what
    LakeTable.merge_epoch(prearranged=True) writes with no further exchange
    or sort. Net plan per epoch: ONE payload shuffle + one sort (vs the
    semijoin's rank shuffle + payload join-back shuffle + bucket
    repartition; measured ~30%% faster end-to-end on 1M-event epochs).

    PRECONDITIONS: (commit_ts, seq, op_rank) unique per key (CDC log
    contract, same as lww_latest_semijoin) and bucket_expr a pure function
    of the key (true for key-bucketed tables).

    Skew note: a hot key's events sort in ONE task here (the bucket is the
    unit of parallelism). For feeds with adversarial per-key skew prefer
    collapse="agg" (ChangeFeed/replay option): max_by's map-side partial
    aggregation collapses the hot key across ALL input tasks before any
    shuffle (see BENCH.md skew rows).
    """
    from ..functions.partitioning import identity_repartition

    key_cols = key_cols or [KEY_COL]
    # identity_repartition (vs plain repartition on _bucket): dense bucket
    # ids hash-collide across slots, so the unluckiest task owned 3-4
    # buckets while others idled — the routing slot is kept so the window
    # below reuses this exchange (its partition keys must NAME the column
    # the data is partitioned by; _slot is 1:1 with _bucket, so the key
    # grouping is unchanged)
    d = identity_repartition(
        df.withColumn("_bucket", bucket_expr.cast("int")),
        n_buckets,
        "_bucket",
        keep_slot=True,
    )
    w = Window.partitionBy("_slot", *key_cols).orderBy(
        F.col("commit_ts").desc(), F.col("seq").desc(), op_rank_col().desc()
    )
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_slot")
    )


def lww_latest_salted(
    df: DataFrame, key_cols: list[str] | None = None, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase salted reduce for hot keys (explicit skew mitigation).

    Phase 1 groups by (key, salt) — hot keys split across `salt_buckets`
    reducers; phase 2 reduces the ≤S survivors per key. Equivalent to
    lww_latest_agg because max_by over (commit_ts, seq, op_rank) is
    associative and commutative.
    """
    key_cols = key_cols or [KEY_COL]
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col("seq")), F.lit(salt_buckets)))
    p1 = lww_latest_agg(salted, key_cols + ["_salt"]).drop("_salt")
    return lww_latest_agg(p1, key_cols)


def final_state(deduped: DataFrame, payload_cols: list[str]) -> DataFrame:
    """Drop tombstone winners → the visible final table (delete ⟺ removed,
    cdc/model/sink.go:238-240)."""
    return deduped.filter(F.col("op") != OP_DELETE).select(KEY_COL, *payload_cols)


def with_old_image(
    feed,
    payload_cols: list[str],
    key_cols: list[str] | None = None,
    mark_first: bool = False,
):
    """Attach the pre-change image to every event (the old-value mode of
    cdc/sink/codec/maxwell.go:90-150 / canal's beforeColumns): the old
    image of an event is the payload of the PREVIOUS write to the same key
    in apply order (commit_ts, seq, delete-before-put), and NULL when the
    previous event was a delete (row absent) or the event is the key's
    first.

    One window over the key partition — the same shuffle shape as the LWW
    rank, carrying payload columns only for keys that need them.
    Output: feed columns + old_<col> for each payload col + had_old flag.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    keys = key_cols or ["doc_id"]
    w = Window.partitionBy(*keys).orderBy(
        F.col("commit_ts").asc(), F.col("seq").asc(), op_rank_col().asc()
    )
    prev_op = F.lag("op").over(w)
    out = feed
    for c in payload_cols:
        out = out.withColumn(
            f"old_{c}",
            F.when(prev_op.isNull() | (prev_op == "D"), F.lit(None)).otherwise(
                F.lag(c).over(w)
            ),
        )
    out = out.withColumn("had_old", prev_op.isNotNull() & (prev_op != "D"))
    if mark_first:
        # first event of the key WITHIN this feed slice — its true pre-image
        # (if any) lives in the table, not the slice; callers with table
        # access resolve it there (cross-batch old value)
        out = out.withColumn("first_in_batch", prev_op.isNull())
    return out
