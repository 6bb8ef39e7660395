"""Upstream/downstream consistency verification — bucketed state checksums.

The reference ecosystem verifies a replication pair by checksumming chunks
of both sides and drilling into mismatched chunks (sync-diff-inspector; the
reference's own integration tests gate on exactly this tool — e.g.
tests/simple/run.sh and the dailytest checksum diff). The Spark-native
shape: one column-pruned scan per side computing per-bucket

    (row count, XOR of canonical row hashes, SUM of bounded row hashes)

grouped by the table's own dispatch bucket (hash(key) % N — the same
index-value routing the sink uses, cdc/sink/dispatcher/index_value.go:33-53),
then a tiny N-row join to localize divergent buckets. XOR is the primary
signature (order-insensitive, overflow-free, deletion-sensitive); the count
and the bounded sum guard XOR's blind spots (duplicated row pairs cancel in
XOR but not in count/sum).

100-TB shape: each side is ONE map-side-combined aggregation (no shuffle of
row data — only N partial rows per task fold to the final N buckets); the
diff join is N rows. Drilling into a flagged bucket re-reads just that
bucket's files (the lake's bucket pruning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60

# bounded row-hash for the SUM signature: 2^30 × 10^12 rows ≈ 2^70 would
# overflow int64, but per-BUCKET row counts at sane N stay ≤ ~2^33, keeping
# the sum ≤ 2^63. xor_sig carries the full 60 bits regardless.
_SUM_MOD = 1 << 30


def row_signature(cols: list[str | Column]) -> Column:
    """Canonical 60-bit row hash: md5 of the '|'-joined canonical column
    strings (cross-engine — DuckDB computes the identical value, see
    functions.hashing.h60)."""
    return h60(F.concat_ws("|", *cols))


def state_checksum(
    df: DataFrame,
    key_col: str,
    cols: list[str | Column],
    n_buckets: int = 64,
    bucket: Column | None = None,
) -> DataFrame:
    """Per-bucket (cnt, xor_sig, sum_sig) of the canonical row serialization.
    `cols` must include every replicated column in a canonical rendering
    (arrays joined, floats fixed-point) — the caller owns canonicalization
    so both sides render identically.

    bucket: optional bucket-id expression overriding the default
    h60(key) % n_buckets. Passing the table's PHYSICAL dispatch-bucket
    expression makes a flagged signature bucket identical to a lake bucket,
    so a drill-down read of flagged buckets file-prunes (run_syncdiff);
    the default stays h60 for oracle (DuckDB-twin) parity."""
    sig = row_signature(cols)
    b = bucket if bucket is not None else (h60(key_col) % F.lit(n_buckets))
    return (
        df.select(
            b.alias("bucket"),
            sig.alias("_sig"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("cnt"),
            F.expr("bit_xor(_sig)").alias("xor_sig"),
            F.sum(F.col("_sig") % F.lit(_SUM_MOD)).alias("sum_sig"),
        )
    )


def checksum_diff(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    cols: list[str | Column],
    n_buckets: int = 64,
    bucket: Column | None = None,
) -> DataFrame:
    """Buckets where the two sides disagree — empty ⟺ consistent (at
    signature strength). Full outer join over ≤ n_buckets rows: a bucket
    present on one side only shows the other side's counts as 0."""
    a = state_checksum(left, key_col, cols, n_buckets, bucket=bucket)
    b = state_checksum(right, key_col, cols, n_buckets, bucket=bucket)
    sel = ["cnt", "xor_sig", "sum_sig"]
    a = a.select("bucket", *[F.col(c).alias(f"l_{c}") for c in sel])
    b = b.select("bucket", *[F.col(c).alias(f"r_{c}") for c in sel])
    j = a.join(b, "bucket", "full_outer").select(
        "bucket",
        *[F.coalesce(F.col(f"l_{c}"), F.lit(0)).alias(f"l_{c}") for c in sel],
        *[F.coalesce(F.col(f"r_{c}"), F.lit(0)).alias(f"r_{c}") for c in sel],
    )
    return j.filter(
        (F.col("l_cnt") != F.col("r_cnt"))
        | (F.col("l_xor_sig") != F.col("r_xor_sig"))
        | (F.col("l_sum_sig") != F.col("r_sum_sig"))
    )


def tokens_canonical_cols() -> list[Column]:
    """Canonical rendering of the north-rule token table (doc_id, tokens,
    n_tok, source): arrays join as CSV, which both engines render alike."""
    return [
        F.col("doc_id"),
        F.concat_ws(",", F.col("tokens").cast("array<string>")),
        F.col("n_tok").cast("string"),
        F.col("source"),
    ]


def range_is_append_only(table, v0: int, v1: int) -> bool:
    """True iff every commit in (v0, v1] only ADDED files — i.e. the range
    is fully described by the changelog. Truncate / modify-column /
    rebucket / compaction rewrite files invisibly to the changelog, so an
    incremental consumer must fall back to a full recompute across them."""
    prev = table._load_version_manifest(v0)
    for v in range(v0 + 1, v1 + 1):
        cur = table._load_version_manifest(v)
        if cur.get("commit_kind") == "truncate":
            return False
        for b, old in prev.get("buckets", {}).items():
            new_paths = {e["path"] for e in cur.get("buckets", {}).get(b, [])}
            if not all(e["path"] in new_paths for e in old):
                return False  # rewrite (compact/modify/rebucket/wipe)
        prev = cur
    return True


def change_images(table, v0: int, v1: int, max_lookup_keys: int = 100_000):
    """The (old image, new image) pair for every key changed in the version
    range (v0, v1] — the primitive every changelog-maintained derived state
    shares (checksums, classifiers, secondary indexes):

      * ``old``    — the keys' live rows AT v0 (version-pinned, bucket +
        file-stat pruned point reads, so read volume ∝ change volume);
        schema (key, op, commit_ts, seq, *payload), op ``D`` for rows that
        were tombstones at v0.
      * ``merged`` — the keys' live rows AT v1: the LWW merge of the old
        images with the range's change rows (epochs are ARRIVAL slices, so
        a range winner can still lose to a pre-range straggler — the merge
        reproduces the table's own conditional collapse). Same schema.
      * ``n_changed`` — distinct changed keys (0 → both frames empty).

    Callers subtract what ``old`` contributed and add what ``merged``
    contributes; intermediate versions cancel algebraically. The range must
    be append-only (see :func:`range_is_append_only`)."""
    from ..model import SYS_COMMIT_TS, SYS_DELETED, SYS_SEQ
    from ..operators.lww import lww_latest_agg

    t = table
    key = t.key_col
    ch = t.read_changes(v0, v1)
    last = lww_latest_agg(ch, [key])
    n_changed = last.count()
    payload = [f["name"] for f in t.current_fields if f["name"] != key]
    cols = [key, "op", "commit_ts", "seq", *payload]
    if n_changed == 0:
        empty = last.select(*cols).limit(0)
        return empty, empty, 0
    if n_changed <= max_lookup_keys:
        # bucket-pruned raw read at v0, restricted to the changed keys —
        # read volume ∝ change volume
        keys = [r[0] for r in last.select(key).collect()]
        buckets = sorted(
            int(r[0])
            for r in last.select(t._bucket_expr(key)).distinct().collect()
        )
        old_raw = t.read_version_raw(v0, buckets).filter(
            F.col(key).isin(keys)
        )
    else:  # too many keys for a literal list: bucket-unpruned semi-join
        old_raw = t.read_version_raw(v0).join(
            last.select(key).distinct(), key, "left_semi"
        )
    old = old_raw.select(
        F.col(key),
        F.when(F.col(SYS_DELETED), F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col(SYS_COMMIT_TS).alias("commit_ts"),
        F.col(SYS_SEQ).alias("seq"),
        *[F.col(c) for c in payload],
    )
    merged = lww_latest_agg(old.unionByName(last.select(*cols)), [key])
    return old, merged, int(n_changed)


class IncrementalChecksum:
    """CDC-maintained table signature — state_checksum's incremental
    sibling: the per-bucket (cnt, xor_sig, sum_sig) map is maintained from
    the table's CHANGELOG, never by rescanning the table. XOR is its own
    inverse, so for every changed key

        xor_sig' = xor_sig  ⊕  h(old image)  ⊕  h(new image)

    and the additive pieces adjust by ±h%M and ±1. Old images are read by
    VERSION-PINNED point lookups of just the changed keys (bucket + file-
    stat pruned), so one sync's read volume ∝ the epoch's change volume —
    at 10^10 events the signature stays current without ever paying a
    100-TB scan. Intermediate versions cancel algebraically (a key that
    went A→B→C in the range contributes ⊕h(A)⊕h(C); B never enters).

    Rewrite commits (truncate / modify_column / rebucket / compaction)
    don't appear in the changelog, so a sync whose range contains any
    non-append commit falls back to ONE full recompute at the target
    version — correct, and rare by construction.

    State persists at <table>/_checksum.json (atomic tmp+replace, version-
    stamped): re-syncing an already-covered range is a no-op, so a crashed
    sync replays cleanly. `verify()` recomputes from scratch and compares —
    the audit path."""

    def __init__(self, table, cols_fn=None, n_buckets: int = 64):
        import os

        self.table = table
        self.n_buckets = n_buckets
        self.cols_fn = cols_fn or tokens_canonical_cols
        self.path = os.path.join(table.root, "_checksum.json")
        self.state = {"version": 0, "buckets": {}}
        if os.path.exists(self.path):
            import json

            with open(self.path) as f:
                self.state = json.load(f)

    # -- internals -----------------------------------------------------------
    def _bucket_deltas(self, df: DataFrame) -> list[dict]:
        """Per-bucket (cnt, xor, sum) of df's rows — aggregated IN SPARK so
        the driver folds at most n_buckets rows, however many keys changed."""
        key = self.table.key_col
        sig = row_signature(self.cols_fn())
        return [
            r.asDict()
            for r in df.select(
                (h60(key) % F.lit(self.n_buckets)).alias("bucket"),
                sig.alias("_sig"),
            )
            .groupBy("bucket")
            .agg(
                F.count("*").alias("cnt"),
                F.expr("bit_xor(_sig)").alias("xor_sig"),
                F.sum(F.col("_sig") % F.lit(_SUM_MOD)).alias("sum_sig"),
            )
            .collect()
        ]

    def _apply(self, rows: list[dict], sign: int) -> None:
        for r in rows:
            b = str(int(r["bucket"]))
            s = self.state["buckets"].setdefault(
                b, {"cnt": 0, "xor_sig": 0, "sum_sig": 0}
            )
            s["cnt"] += sign * int(r["cnt"])
            s["xor_sig"] ^= int(r["xor_sig"])  # xor is sign-free
            s["sum_sig"] += sign * int(r["sum_sig"])
            if s == {"cnt": 0, "xor_sig": 0, "sum_sig": 0}:
                del self.state["buckets"][b]

    def _range_is_append_only(self, v0: int, v1: int) -> bool:
        return range_is_append_only(self.table, v0, v1)

    def _recompute(self, version: int) -> None:
        full = state_checksum(
            self.table.read_version(version),
            self.table.key_col,
            self.cols_fn(),
            self.n_buckets,
        ).collect()
        self.state["buckets"] = {
            str(int(r["bucket"])): {
                "cnt": int(r["cnt"]),
                "xor_sig": int(r["xor_sig"]),
                "sum_sig": int(r["sum_sig"]),
            }
            for r in full
        }

    # -- the sync ------------------------------------------------------------
    def sync(self, to_version: int | None = None, max_lookup_keys: int = 100_000) -> dict:
        from pyspark.sql import functions as F  # noqa: F811 — local alias

        t = self.table
        v1 = t._manifest["version"] if to_version is None else int(to_version)
        v0 = int(self.state["version"])
        if v1 <= v0:
            return {"synced": False, "version": v0}
        if not self._range_is_append_only(v0, v1):
            self._recompute(v1)
            self.state["version"] = v1
            self._save()
            return {"synced": True, "version": v1, "mode": "full"}
        old, merged, n_changed = change_images(t, v0, v1, max_lookup_keys)
        if n_changed == 0:
            self.state["version"] = v1
            self._save()
            return {"synced": True, "version": v1, "mode": "empty"}
        minus = self._bucket_deltas(old.filter(F.col("op") != "D"))
        plus = self._bucket_deltas(merged.filter(F.col("op") != "D"))
        self._apply(minus, -1)
        self._apply(plus, +1)
        self.state["version"] = v1
        self._save()
        return {
            "synced": True,
            "version": v1,
            "mode": "incremental",
            "changed_keys": int(n_changed),
        }

    def snapshot(self) -> dict[int, tuple[int, int, int]]:
        return {
            int(b): (s["cnt"], s["xor_sig"], s["sum_sig"])
            for b, s in self.state["buckets"].items()
        }

    def verify(self) -> list[str]:
        """Full recompute at the synced version vs the maintained state —
        [] ⟺ consistent (the audit that catches a broken maintenance
        path, the way sync-diff audits a replica)."""
        full = state_checksum(
            self.table.read_version(int(self.state["version"])),
            self.table.key_col,
            self.cols_fn(),
            self.n_buckets,
        ).collect()
        want = {
            int(r["bucket"]): (int(r["cnt"]), int(r["xor_sig"]), int(r["sum_sig"]))
            for r in full
        }
        got = self.snapshot()
        errs = []
        for b in sorted(set(want) | set(got)):
            if want.get(b, (0, 0, 0)) != got.get(b, (0, 0, 0)):
                errs.append(
                    f"bucket {b}: full={want.get(b)} maintained={got.get(b)}"
                )
        return errs

    def _save(self) -> None:
        import json
        import os

        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.state, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)


def lake_tables_consistent(left, right, n_buckets: int = 64) -> list[dict]:
    """Compare two token-schema lake tables; returns the mismatched-bucket
    rows ([] ⟺ consistent). One aggregation per side + an N-row join."""
    cols = tokens_canonical_cols()
    return [
        r.asDict()
        for r in checksum_diff(
            left.read(), right.read(), "doc_id", cols, n_buckets
        ).collect()
    ]
