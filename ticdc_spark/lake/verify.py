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
) -> DataFrame:
    """Per-bucket (cnt, xor_sig, sum_sig) of the canonical row serialization.
    `cols` must include every replicated column in a canonical rendering
    (arrays joined, floats fixed-point) — the caller owns canonicalization
    so both sides render identically."""
    sig = row_signature(cols)
    return (
        df.select(
            (h60(key_col) % F.lit(n_buckets)).alias("bucket"),
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
) -> DataFrame:
    """Buckets where the two sides disagree — empty ⟺ consistent (at
    signature strength). Full outer join over ≤ n_buckets rows: a bucket
    present on one side only shows the other side's counts as 0."""
    a = state_checksum(left, key_col, cols, n_buckets)
    b = state_checksum(right, key_col, cols, n_buckets)
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
