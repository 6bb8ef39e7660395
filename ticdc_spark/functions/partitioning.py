"""Collision-free repartitioning over small dense id domains.

`df.repartition(n, "bucket")` hash-routes bucket b to shuffle slot
murmur3(b) % n. Over a SMALL domain (bucket ids 0..n-1, MQ partition ids,
shard ids) that map is far from a permutation — measured with Spark's own
hash: n=32 uses 18 slots (worst slot 3 ids), n=64 uses 37 slots (worst
slot 4 ids). The stage's critical path is then the unluckiest task at up
to 4x the balanced work while ~40% of the slots sit idle. This module
makes the same repartition exactly balanced by remapping each id to a
probe integer whose hash occupies a distinct slot (one id, one task).

At local[32]/sf0.1 the end-to-end replay and MQ-emission deltas are within
run noise (the affected stages are seconds-scale and other waves overlap
the straggler); the change is a 100-TB posture fix: at production bucket
counts every epoch's merge stage otherwise carries a built-in 3-4x
straggler and a matching file-size skew in the partitioned write.

The probe table is discovered with one tiny `spark.range` job per distinct
n — using Spark's own `hash()` so it is the exact function HashPartitioning
applies (nothing reimplemented to drift) — and cached process-wide; the
data path gains a single `element_at` projection and no extra job.

Used by: the LWW bucket-window collapse (operators/lww.py), every lake
bucket write (lake/table.py, lake/keyless.py), the MQ sink writers
(streaming/changefeed.py, multi.py, keyless_mq.py), and shard export
(pipeline/pack.py). Reference analog: TiCDC sizes its sink worker pool to
the partition count and routes one partition per worker
(cdc/sink/mq.go:187-226 flushes per-partition queues) — the skew this
fixes simply cannot arise there; on Spark it must be engineered away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SLOT_REPS: dict[int, list[int]] = {}


def slot_representatives(spark, n: int) -> list[int]:
    """reps[p] = smallest probed int v with pmod(murmur3(v), n) == p, for
    every slot p in 0..n-1."""
    reps = _SLOT_REPS.get(n)
    if reps is not None:
        return reps
    found: dict[int, int] = {}
    lo = 0
    while len(found) < n:
        rows = (
            spark.range(lo, lo + 32 * n)
            .select(
                F.col("id").cast("int").alias("v"),
                F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("slot"),
            )
            .collect()
        )
        for r in rows:
            found.setdefault(r["slot"], r["v"])
        lo += 32 * n
    reps = [found[p] for p in range(n)]
    _SLOT_REPS[n] = reps
    return reps


def identity_repartition(
    df: DataFrame,
    n: int,
    part_col: str = "partition",
    domain: list[int] | None = None,
    keep_slot: bool = False,
) -> DataFrame:
    """Shuffle df into n tasks with each distinct `part_col` id owned by
    one task alone. Rows-in/rows-out equivalent to
    `df.repartition(n, part_col)`; only the slot assignment changes.

    domain: the distinct ids actually present, when they are NOT the dense
    0..n-1 (e.g. the touched-bucket subset of a lake write). Ids are
    assigned slots round-robin in domain order. If len(domain) > n a
    perfect assignment is impossible (pigeonhole) — falls back to the
    plain hash repartition.

    keep_slot: retain the `_slot` routing column so a downstream
    Window.partitionBy("_slot", ...) can reuse this exchange (Spark's
    distribution-satisfaction check is syntactic: the window must name the
    very column the data is partitioned by). Callers drop it when done.
    """
    if domain is not None and len(domain) > n:
        out = df.repartition(n, part_col)
        return out.withColumn("_slot", F.col(part_col).cast("int")) if keep_slot else out
    reps = slot_representatives(df.sparkSession, n)
    if domain is None:
        slot = F.element_at(
            F.array(*[F.lit(v) for v in reps]), F.col(part_col).cast("int") + 1
        )
    else:
        mapping = F.map_from_arrays(
            F.array(*[F.lit(int(d)) for d in domain]),
            F.array(*[F.lit(reps[i % n]) for i in range(len(domain))]),
        )
        # ids outside the declared domain (shouldn't occur) route by their
        # own value rather than all colliding on hash(NULL)
        slot = F.coalesce(
            F.element_at(mapping, F.col(part_col).cast("int")),
            F.col(part_col).cast("int"),
        )
    out = df.withColumn("_slot", slot).repartition(n, "_slot")
    return out if keep_slot else out.drop("_slot")
