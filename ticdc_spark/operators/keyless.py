"""Force-replicate support for KEYLESS tables (no usable handle index).

Reference semantics: a table without any UNIQUE-eligible index is skipped
(cdc/entry/mounter.go:249-259, model/schema_storage.go:309-317) unless
`force-replicate` is on, in which case the MySQL sink keys UPDATE/DELETE by
ALL columns with `LIMIT 1` (cdc/sink/mysql.go:1203-1221 whereSlice
fallback, 1133-1201 prepareUpdate/prepareDelete) — i.e. the downstream
table is a MULTISET of row values and each event retracts/adds exactly one
instance of a value tuple.

Spark-first re-expression: instead of row-at-a-time `LIMIT 1` statements,
an epoch of keyless events collapses to a per-value-tuple multiplicity
DELTA (insert +1, delete -1, update -1 pre-image +1 post-image), one
shuffle with map-side combine — heavy duplicate values are the hot keys
and they collapse before the wire. lake/keyless.KeylessTable folds the
delta into stored multiplicities.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# canonical value-tuple hash: row identity for a keyless table is the full
# column tuple; md5 over a separator-joined canonical string form is
# cross-engine reproducible (DuckDB oracle) and collision-safe far below
# birthday bounds at 128 bits. \x1f = unit separator, \x00 = NULL sentinel
# (distinct from any real string so ('a', NULL) != ('a', '')).
_SEP = "\x1f"
_NULL = "\x00"


def value_hash(value_cols: list[str]) -> Column:
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in value_cols
    ]
    return F.md5(F.concat_ws(_SEP, *parts))


def value_hash_sql(value_exprs: list[str]) -> str:
    """DuckDB rendering of value_hash (oracle parity)."""
    parts = ", ".join(
        f"coalesce(cast({e} as varchar), chr(0))" for e in value_exprs
    )
    return f"md5(concat_ws(chr(31), {parts}))"


def keyless_entries(
    events: DataFrame,
    value_cols: list[str],
    old_cols: dict[str, str] | None = None,
) -> DataFrame:
    """One epoch of keyless events exploded to signed multiset entries
    (d, value_cols...): I -> (+1, image), D -> (-1, image), U -> (-1,
    pre-image) + (+1, post-image). The un-aggregated form, so callers can
    pick where the aggregation's shuffle lands (keyless_delta aggregates on
    the value tuple with map-side combine; KeylessTable's fused path
    repartitions by storage bucket first and aggregates exchange-free).

    events: op ('I'/'U'/'D') + `value_cols` carrying the row image (for 'D'
    the deleted row's values — the reference's delete events carry the full
    row for keyless tables since ALL columns form the WHERE key). 'U'
    events additionally need the pre-image in `old_cols` (map value col ->
    old-value col), exactly the reference's PreColumns requirement: keyless
    updates are impossible to apply without old values, so their absence
    raises at plan execution if a 'U' appears.
    """

    def img(cols: dict[str, str]) -> Column:
        return F.struct(*[F.col(src).alias(dst) for dst, src in cols.items()])

    new_map = {c: c for c in value_cols}
    pair = lambda d, v: F.struct(  # noqa: E731
        F.lit(d).cast("long").alias("d"), v.alias("v")
    )
    if old_cols is not None:
        missing = [c for c in value_cols if c not in old_cols]
        if missing:
            raise ValueError(f"old_cols missing pre-image for {missing}")
        u_entries = F.array(
            pair(-1, img({c: old_cols[c] for c in value_cols})),
            pair(+1, img(new_map)),
        )
    else:
        # no pre-images available: a keyless 'U' cannot be applied — fail
        # loudly at execution rather than corrupting the multiset. The
        # assert condition references the op column so Catalyst cannot
        # constant-fold the raise into plans that never see a 'U' row.
        u_entries = F.array(
            pair(
                0,
                F.struct(
                    *[
                        F.when(
                            F.assert_true(
                                F.col("op").isin("I", "D"),
                                "keyless update requires pre-image columns "
                                "(enable old value / pass old_cols)",
                            ).isNull(),
                            F.col(c),
                        ).alias(c)
                        for c in value_cols
                    ]
                ),
            )
        )
    entries = (
        F.when(F.col("op") == "I", F.array(pair(+1, img(new_map))))
        .when(F.col("op") == "D", F.array(pair(-1, img(new_map))))
        .otherwise(u_entries)
    )
    return events.select(F.explode(entries).alias("e")).select(
        F.col("e.d").alias("d"), F.col("e.v.*")
    )


def keyless_delta(
    events: DataFrame,
    value_cols: list[str],
    old_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Per-value-tuple multiplicity deltas for one epoch: the entries of
    keyless_entries aggregated on the value tuple — one shuffle, partial
    aggregation below it (duplicate-heavy values collapse map-side before
    the wire, so hot values cost nothing extra). Returns
    (value_cols..., delta) with delta != 0."""
    ex = keyless_entries(events, value_cols, old_cols)
    return (
        ex.groupBy(*value_cols)
        .agg(F.sum("d").alias("delta"))
        .filter(F.col("delta") != 0)
    )
