"""KeylessTable — force-replicate multiset state for tables with no handle
index, layered on LakeTable with an ADDITIVE merge-on-read collapse.

The reference replicates a keyless table by keying every UPDATE/DELETE on
ALL columns with `LIMIT 1` (cdc/sink/mysql.go:1203-1221): the downstream
state is a multiset of row values. The set-oriented equivalent stored
here: one row per DISTINCT value tuple, keyed by the tuple's canonical
hash (_vh), carrying a `mult` multiplicity column.

The state is an ADDITIVE MONOID, so it gets the same MOR treatment the
keyed table gives last-write-wins: an epoch appends one delta row per
touched value tuple (mult = the epoch's net +/- count, possibly negative),
and the READ-time collapse SUMS contributions per _vh instead of taking
the LWW winner — `compact()` folds deltas into one row per live tuple
exactly as it folds LWW deltas. Apply cost per epoch is therefore the
delta aggregation (map-side combined — duplicate-heavy values collapse
before the wire) plus the bucketed append: no stored-state read, no join.
Measured 2.2x faster than the join-per-epoch formulation this replaced
(5.7 s vs 12.4 s, 750k events / 64 buckets) on an EMPTY-to-small table —
and the gap is unbounded in table size: the old path re-read and
re-collapsed every touched bucket per epoch (cost ∝ table), this path's
cost is ∝ the epoch alone, which is the property that matters at 10^10
events.

Corrupt histories (a retraction of a row that was never live) surface as
a NEGATIVE total at collapse time: the read/compact plan raises in-plan.
The reference's row-at-a-time LIMIT 1 silently no-ops the same condition;
we refuse instead — but detection is DEFERRED to the first read unless
apply_epoch(validate=True) pays one bucket-pruned join to check the epoch
against stored state at write time.

Everything else is inherited unchanged: idempotent epoch commits
(exactly-once under redelivery), bucket layout, time travel, incremental
compaction, clean-bucket reads.

Exactly-once contract — one difference from the keyed table: additive
deltas are NOT per-event idempotent, so the event stream must be
partitioned into DISJOINT epochs with stable ids (redelivery = the same
epoch id, which no-ops on the committed-epoch check). The keyed LWW
table tolerates overlapping covers (at-least-once with fresh ids); this
one does not. A streaming checkpoint's foreachBatch provides exactly the
required contract, and the property test fuzzes it (any disjoint
partition, any order, any same-id redelivery → the python multiset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import SYS_COMMIT_TS, SYS_DELETED, SYS_SEQ
from ..operators.keyless import keyless_delta, keyless_entries, value_hash
from .table import LakeTable

VH = "_vh"

_NEG_MSG = (
    "keyless multiset went negative: delete/update-pre without a matching "
    "live row (corrupt or reordered history)"
)


class _AdditiveLakeTable(LakeTable):
    """LakeTable whose MOR collapse sums `mult` per key instead of ranking
    by recency. Value columns are constant per key (the key IS the value
    tuple's hash), so any-value aggregation is exact. A key whose total
    hits zero reads as a tombstone (and compact purges it); a negative
    total raises in-plan."""

    def _collapse(self, df: DataFrame) -> DataFrame:
        key = self.key_col
        sys = (SYS_COMMIT_TS, SYS_SEQ, SYS_DELETED)
        vals = [c for c in df.columns if c != key and c != "mult" and c not in sys]
        total = F.col("mult")
        checked = F.when(F.assert_true(total >= 0, _NEG_MSG).isNull(), total)
        agg = df.groupBy(key).agg(
            F.sum("mult").alias("mult"),
            *[F.first(c).alias(c) for c in vals],
            F.max(SYS_COMMIT_TS).alias(SYS_COMMIT_TS),
            F.max(SYS_SEQ).alias(SYS_SEQ),
        )
        out_cols = []
        for c in df.columns:
            if c == "mult":
                out_cols.append(checked.alias("mult"))
            elif c == SYS_DELETED:
                out_cols.append((F.col("mult") == 0).alias(SYS_DELETED))
            else:
                out_cols.append(F.col(c))
        return agg.select(*out_cols)


class KeylessTable:
    def __init__(self, spark, root: str):
        self.t = _AdditiveLakeTable(spark, root)
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
        validate: bool = False,
        strategy: str = "agg",
    ) -> dict:
        """Fold one epoch of keyless events (op/commit_ts/seq + value cols,
        'U' pre-images via old_cols) into the multiset. Idempotent by
        epoch_id.

        strategy (both measured, interleaved trials, 750k events / 64
        buckets / local[32]):
          "agg" (default, 5.7 s) — aggregate deltas on the raw value tuple
            FIRST (map-side partial aggregation: hot tuples collapse before
            the wire, and the canonical md5 value-hash is computed once per
            DISTINCT tuple, post-combine), then the merge pays a second,
            smaller bucket shuffle of aggregated rows.
          "fused" (8.9 s) — the keyed table's bucket_window trick: one
            payload shuffle total, aggregation exchange-free on top of the
            bucket partitioning, prearranged write. LOSES here despite the
            saved exchange because the bucket id needs _vh, so the md5 +
            concat_ws canonical hash runs per EXPLODED ENTRY before the
            shuffle (1.33 rows/event, stringified token arrays) — CPU that
            the agg path amortizes to once per tuple. Kept as the escape
            hatch for epochs whose delta barely collapses AND whose value
            columns are cheap to hash.

        validate=True additionally joins the epoch's deltas against stored
        state (bucket-pruned) and raises BEFORE committing if any total
        would go negative — write-time corrupt-history detection; without
        it detection defers to the first read/compact."""
        if epoch_id in self.t.committed_epochs:
            return {"committed": False, "reason": "epoch already committed"}
        if strategy not in ("fused", "agg"):
            raise ValueError(f"unknown keyless apply strategy {strategy!r}")
        vcols = self.value_cols
        if epoch_ts is None:
            # the additive collapse is commutative — recency stamps are
            # semantically irrelevant (unlike LWW), so skip the extra
            # max(commit_ts) scan; pass epoch_ts explicitly if lineage
            # should carry the epoch's frontier
            epoch_ts = 0
        if validate or strategy == "agg":
            delta = keyless_delta(events, vcols, old_cols).withColumn(
                VH, value_hash(vcols)
            )
        if validate:
            neg = F.col("delta")
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
            bad = (
                delta.join(stored, VH, "left")
                .filter(F.coalesce(F.col("_stored_mult"), F.lit(0)) + neg < 0)
                .count()
            )
            if bad:
                raise ValueError(f"{_NEG_MSG} ({bad} value tuples)")
        common = [
            F.lit("U").alias("op"),
            F.lit(epoch_ts).cast("long").alias("commit_ts"),
            F.lit(0).cast("long").alias("seq"),
        ]
        if strategy == "agg":
            changes = delta.select(
                F.col(VH), *[F.col(c) for c in vcols],
                F.col("delta").alias("mult"), *common,
            )
            return self.t.merge_epoch(changes, epoch_id, assume_deduped=True)
        # fused: one payload shuffle total. Entries land on their storage
        # bucket, the (_bucket, _vh) aggregation runs exchange-free on top
        # of that partitioning, and the prearranged merge adds no further
        # exchange or sort.
        ex = keyless_entries(events, vcols, old_cols).withColumn(
            VH, value_hash(vcols)
        )
        # group by the value columns themselves (constant per _vh): the
        # aggregate buffer is then a bare sum, so Spark picks HashAggregate;
        # first(array<...>) would force a SortAggregate over the wide rows
        # (measured 1.5x slower end-to-end)
        from ..functions.partitioning import identity_repartition

        # identity_repartition: one bucket per task (dense ids collide under
        # plain hash routing); _slot is kept and leads the groupBy so the
        # aggregation still reuses this exchange (partitioning column must
        # appear among the grouping keys; slot is 1:1 with bucket, so the
        # groups are unchanged)
        agg = (
            identity_repartition(
                ex.withColumn("_bucket", self.t._bucket_expr(VH)),
                self.t.n_buckets,
                "_bucket",
                keep_slot=True,
            )
            .groupBy("_slot", "_bucket", VH, *vcols)
            .agg(F.sum("d").alias("mult"))
            .filter(F.col("mult") != 0)
        )
        changes = agg.select(
            F.col(VH), *[F.col(c) for c in vcols],
            F.col("mult"), *common, F.col("_bucket"),
        ).sortWithinPartitions("_bucket", VH)
        return self.t.merge_epoch(
            changes, epoch_id, assume_deduped=True, prearranged=True
        )

    # ---------------- schema evolution ----------------
    def evolve(self, ddl_type: str, spec: dict, epoch_id: str) -> bool:
        """DDL on a keyless table. rename/widen are metadata-only (the
        value hash concatenates by POSITION, names never enter it, and the
        type set here widens losslessly through the string cast) — they
        delegate to LakeTable.update_schema. add/drop CHANGE ROW IDENTITY
        (the identity IS the column tuple), so they rewrite: live tuples
        read at the current version, transformed to the new column set
        (add: NULL; drop: column removed — formerly-distinct tuples that
        now collide MERGE, their multiplicities sum, exactly what deleting
        a column from a keyless MySQL table does), re-hashed, and committed
        as ONE manifest carrying both the new schema and the replacement
        buckets. Crash before the commit leaves only orphan files; replay
        no-ops on the committed epoch id. The rewrite is O(live tuples) —
        the honest cost of identity-changing DDL on a value-keyed store
        (the reference pays nothing because it stores rows natively).
        """
        t = self.t
        if epoch_id in t.committed_epochs:
            return False
        if ddl_type in ("rename_column", "widen_column"):
            return t.update_schema(ddl_type, spec, epoch_id=epoch_id)
        if ddl_type not in ("add_column", "drop_column"):
            raise ValueError(
                f"unsupported keyless ddl_type {ddl_type} "
                "(truncate via t.truncate)"
            )
        if ddl_type == "drop_column" and spec["name"] in (VH, "mult"):
            raise ValueError(f"cannot drop system column {spec['name']}")
        import json as _json
        import os as _os

        old_vcols = self.value_cols
        live = self.read()  # collapsed; asserts no negative totals
        if ddl_type == "add_column":
            new_vcols = old_vcols + [spec["name"]]
            # ADD COLUMN ... DEFAULT x materializes x into the rewritten
            # tuples (identity-changing DDL has no read-time projection to
            # defer to — the value IS part of the row identity hash)
            live = live.withColumn(
                spec["name"], F.lit(spec.get("default")).cast(spec["type"])
            )
            # mult field id must stay LAST in the field list? No: field ids
            # are stable; order in the manifest is display-only. But the
            # evolved field list appends the new column after mult — value
            # identity follows self.value_cols order, which reads the
            # manifest order, so keep the manifest consistent with it.
        else:
            new_vcols = [c for c in old_vcols if c != spec["name"]]
            if len(new_vcols) == len(old_vcols):
                raise KeyError(spec["name"])
            live = live.drop(spec["name"])
        regrouped = (
            live.groupBy(*new_vcols)
            .agg(F.sum("mult").alias("mult"))
            .withColumn(VH, value_hash(new_vcols))
        )
        from ..model import SYS_COMMIT_TS as _CT
        from ..model import SYS_SEQ as _SQ

        out = regrouped.select(
            F.col(VH),
            *[F.col(c) for c in new_vcols],
            F.col("mult"),
            F.lit(0).cast("long").alias(_CT),
            F.lit(0).cast("long").alias(_SQ),
            F.lit(False).alias(SYS_DELETED),
        ).withColumn("_bucket", t._bucket_expr(VH))

        fields = t._evolved_fields(ddl_type, spec)
        # keep the manifest's field order aligned with value_cols (the
        # identity hash order): _vh first, value cols, mult last
        mult_f = next(f for f in fields if f["name"] == "mult")
        vh_f = next(f for f in fields if f["name"] == VH)
        val_fs = [f for f in fields if f["name"] not in (VH, "mult")]
        fields = [vh_f] + val_fs + [mult_f]

        m = _json.loads(_json.dumps(t._manifest))
        m.pop("commit_kind", None)
        new_version = m["version"] + 1
        data_dir = f"data/v{new_version:08d}"
        abs_dir = _os.path.join(t.root, data_dir)
        from ..functions.partitioning import identity_repartition

        (
            identity_repartition(out, t.n_buckets, "_bucket")
            .sortWithinPartitions("_bucket", VH)
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(abs_dir)
        )
        new_entries = t._scan_written(abs_dir)
        # entries are written at the NEW schema version
        m["parent"] = m["version"]
        m["version"] = new_version
        m["schema_version"] += 1
        for es in new_entries.values():
            for e in es:
                e["schema_version"] = m["schema_version"]
        m["schemas"][str(m["schema_version"])] = fields
        m["buckets"] = new_entries
        m["clean_buckets"] = sorted(int(b) for b in new_entries)
        m["epoch_id"] = epoch_id
        m["committed_epochs"].append(epoch_id)
        t._commit_manifest(m)
        return True

    # ---------------- read ----------------
    def read(self) -> DataFrame:
        """One row per distinct live value tuple, with its multiplicity.
        Raises in-plan if any total is negative (corrupt history)."""
        return self.t.read().filter(F.col("mult") > 0)

    def read_bag(self) -> DataFrame:
        """The multiset expanded back to one row per instance — what the
        downstream MySQL table would contain (order-free)."""
        return (
            self.read()
            .withColumn("_i", F.explode(F.sequence(F.lit(1), F.col("mult"))))
            .select(*self.value_cols)
        )

    def changes(self, since_version: int, to_version: int | None = None) -> DataFrame:
        """Incremental multiset CHANGELOG: the per-epoch net deltas
        committed after `since_version` — (_vh, value cols..., mult) where
        mult is SIGNED (negative = retract that many instances). Because
        the state is additive, folding this stream into any snapshot at
        `since_version` reproduces the current multiset exactly; compaction
        commits contribute nothing (rewrites, not changes). IO proportional
        to change volume — inherited from LakeTable.read_changes."""
        ch = self.t.read_changes(since_version, to_version)
        return ch.select(VH, *self.value_cols, "mult")

    def validate(self) -> int:
        """Force a full collapse; raises on any negative total. Returns the
        live instance count."""
        row = self.read().agg(F.sum("mult").alias("n")).collect()[0]
        return int(row["n"] or 0)

    def compact(self, **kw) -> dict:
        return self.t.compact(**kw)
