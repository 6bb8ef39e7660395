"""KeylessTable — force-replicate multiset state for tables with no handle
index, layered on LakeTable.

The reference replicates a keyless table by keying every UPDATE/DELETE on
ALL columns with `LIMIT 1` (cdc/sink/mysql.go:1203-1221): the downstream
state is a multiset of row values. The set-oriented equivalent stored
here: one row per DISTINCT value tuple, keyed by the tuple's canonical
hash (_vh), carrying a `mult` multiplicity column. An epoch applies as

    delta  = keyless_delta(events)              # one shuffle, combiner
    stored = read_raw(touched buckets only)     # bucket-pruned scan
    new    = coalesce(stored.mult, 0) + delta   # left join on _vh
    rows with new == 0 tombstone; new > 0 upsert; new < 0 RAISES
    (a valid upstream history never deletes a row that isn't there —
    exactly the assumption the reference's LIMIT 1 silently makes; we
    fail loudly instead of silently dropping the retraction)

so it inherits every LakeTable guarantee unchanged: idempotent epoch
commits (exactly-once under redelivery), bucketed MOR + compaction, time
travel, incremental changelog reads.

Scale shape per epoch: the delta aggregation is the only full-epoch
shuffle (duplicate-heavy values collapse map-side); the stored-state join
reads only the buckets the epoch touches (same pattern as the old-value
snapshot join); the merge reuses the bucketed epoch write path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import SYS_DELETED
from ..operators.keyless import keyless_delta, value_hash
from .table import LakeTable

VH = "_vh"


class KeylessTable:
    def __init__(self, spark, root: str):
        self.t = LakeTable(spark, root)
        self.spark = spark
        self.root = root

    # ---------------- lifecycle ----------------
    @classmethod
    def create(
        cls,
        spark,
        root: str,
        value_fields: list[dict],
        n_buckets: int = 16,
    ) -> "KeylessTable":
        """value_fields: the keyless table's own columns,
        [{"id","name","type"}, ...] — _vh and mult are added around them."""
        fields = (
            [{"id": 0, "name": VH, "type": "string", "nullable": False}]
            + value_fields
            + [{"id": len(value_fields) + 1, "name": "mult", "type": "bigint"}]
        )
        LakeTable.create(spark, root, fields=fields, n_buckets=n_buckets, key_col=VH)
        return cls(spark, root)

    @property
    def value_cols(self) -> list[str]:
        return [
            f["name"] for f in self.t.current_fields if f["name"] not in (VH, "mult")
        ]

    # ---------------- apply ----------------
    def apply_epoch(
        self,
        events: DataFrame,
        epoch_id: str,
        old_cols: dict[str, str] | None = None,
        epoch_ts: int | None = None,
    ) -> dict:
        """Fold one epoch of keyless events (op/commit_ts/seq + value cols,
        'U' pre-images via old_cols) into the stored multiplicities.
        Idempotent by epoch_id. epoch_ts stamps the merged rows' recency;
        defaults to the epoch's max commit_ts (O(1) driver fold)."""
        if epoch_id in self.t.committed_epochs:
            return {"committed": False, "reason": "epoch already committed"}
        vcols = self.value_cols
        delta = keyless_delta(events, vcols, old_cols).withColumn(
            VH, value_hash(vcols)
        )
        if epoch_ts is None:
            row = events.agg(F.max("commit_ts").alias("m")).collect()[0]
            epoch_ts = int(row["m"]) if row["m"] is not None else 0
        touched = sorted(
            int(r["b"])
            for r in delta.select(self.t._bucket_expr(VH).alias("b"))
            .distinct()
            .collect()
        )
        stored = (
            self.t.read_raw(buckets=touched)
            .filter(~F.col(SYS_DELETED))
            .select(VH, F.col("mult").alias("_stored_mult"))
        )
        new_mult = F.coalesce(F.col("_stored_mult"), F.lit(0)) + F.col("delta")
        # negative multiplicity = the stream retracted a row that does not
        # exist: corrupt history, refuse loudly (assert runs in-plan, no
        # second pass over the data)
        checked = F.when(
            F.assert_true(
                new_mult >= 0,
                "keyless multiset went negative: delete/update-pre without "
                "a matching live row (corrupt or reordered history)",
            ).isNull(),
            new_mult,
        )
        changes = delta.join(stored, VH, "left").select(
            F.col(VH),
            *[F.col(c) for c in vcols],
            checked.alias("mult"),
            F.when(new_mult == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
            F.lit(epoch_ts).cast("long").alias("commit_ts"),
            F.lit(0).cast("long").alias("seq"),
        )
        return self.t.merge_epoch(changes, epoch_id, assume_deduped=True)

    # ---------------- read ----------------
    def read(self) -> DataFrame:
        """One row per distinct live value tuple, with its multiplicity."""
        return self.t.read().filter(F.col("mult") > 0)

    def read_bag(self) -> DataFrame:
        """The multiset expanded back to one row per instance — what the
        downstream MySQL table would contain (order-free)."""
        return (
            self.read()
            .withColumn("_i", F.explode(F.sequence(F.lit(1), F.col("mult"))))
            .select(*self.value_cols)
        )
