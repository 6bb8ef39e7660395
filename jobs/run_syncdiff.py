"""sync-diff CLI — verify a replication pair's table states match.

The reference ecosystem gates every integration test on sync_diff_inspector
(tests/_utils/check_sync_diff:1-37; e.g. tests/simple/run.sh); this is that
gate as an operator-facing job over two lake-table roots: per-dispatch-bucket
(count, XOR-of-row-hash, bounded-sum) signatures on both sides — ONE
map-side-combined column-pruned scan per side, an N-row join — then optional
key-level drill-down restricted to the divergent buckets. When both sides
share a key-bucketed layout (the normal replication pair), signature buckets
ARE the physical dispatch buckets and the drill-down is a manifest-pruned
read of only the flagged buckets' files: IO ∝ divergence, never table size.
Mismatched layouts fall back to h60 signature buckets whose drill-down scans
both tables (drilldown_pruned=false in the output).

    python jobs/run_syncdiff.py --left /lake/a --right /lake/b
    python jobs/run_syncdiff.py --left A --right B --drilldown --limit 20

Exit code 0 = consistent, 1 = divergent (the check_sync_diff contract).
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _canonical_cols(table):
    """UNAMBIGUOUS string rendering of every replicated column, derived
    from the table's own schema — both sides must share the schema for the
    diff to be meaningful, which is checked before scanning.

    Unambiguous matters: row_signature joins these with '|', and concat_ws
    silently drops NULLs, so without encoding {a:'x', b:NULL} and
    {a:NULL, b:'x'} (or NULL vs '', or values containing '|') would
    serialize identically and a divergent downstream could report
    match=true. sync_diff_inspector encodes NULLs explicitly; so do we:
    NULL → '\\N' (after escaping, a real value can never render as '\\N'),
    '\\' → '\\\\' and '|' → '\\|' inside values so the separator cannot be
    forged. Arrays escape PER ELEMENT first ('\\' → '\\\\', ',' → '\\,',
    NULL element → '\\N') and only then join with ',', so ['a,b'] vs
    ['a','b'] and ['a',NULL] vs ['a'] render distinctly (concat_ws would
    otherwise drop NULL elements and a raw ',' would forge the element
    separator); a NULL array is '\\N' (distinct from the empty array's
    '')."""
    from pyspark.sql import functions as F

    def esc(col):
        col = F.replace(col, F.lit("\\"), F.lit("\\\\"))
        return F.replace(col, F.lit("|"), F.lit("\\|"))

    def esc_elem(x):
        e = F.replace(x, F.lit("\\"), F.lit("\\\\"))
        e = F.replace(e, F.lit(","), F.lit("\\,"))
        return F.when(x.isNull(), F.lit("\\N")).otherwise(e)

    null = F.lit("\\N")
    cols = []
    for f in table.current_fields:
        c = F.col(f["name"])
        if f["type"].startswith("array"):
            rendered = F.concat_ws(
                ",", F.transform(c.cast("array<string>"), esc_elem)
            )
        else:
            rendered = c.cast("string")
        cols.append(F.when(c.isNull(), null).otherwise(esc(rendered)))
    return cols


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--left", required=True, help="lake table root (upstream)")
    p.add_argument("--right", required=True, help="lake table root (downstream)")
    p.add_argument("--buckets", type=int, default=64, help="signature buckets")
    p.add_argument(
        "--drilldown", action="store_true",
        help="list divergent keys (bucket-pruned reads of flagged buckets)",
    )
    p.add_argument("--limit", type=int, default=50, help="max keys to list")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from ticdc_spark.lake.table import LakeTable
    from ticdc_spark.lake.verify import checksum_diff, row_signature
    from ticdc_spark.session import build_session

    spark = build_session("syncdiff", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    lt = LakeTable(spark, args.left)
    rt = LakeTable(spark, args.right)

    out: dict = {"left": args.left, "right": args.right}
    lf = [(f["name"], f["type"]) for f in lt.current_fields]
    rf = [(f["name"], f["type"]) for f in rt.current_fields]
    if lf != rf or lt.key_col != rt.key_col:
        out.update(match=False, reason="schema mismatch", left_schema=lf, right_schema=rf)
        print(json.dumps(out, sort_keys=True))
        return 1

    cols = _canonical_cols(lt)
    key = lt.key_col
    # signature buckets = the tables' PHYSICAL dispatch buckets when both
    # sides share a key-bucketed layout: a flagged bucket is then a lake
    # bucket, so the drill-down reads ONLY its files (manifest pruning —
    # IO ∝ divergent buckets). Mismatched layouts fall back to h60
    # signature buckets, whose drill-down must scan both tables
    # (reported as drilldown_pruned=false).
    pruned = (
        lt.n_buckets == rt.n_buckets
        and lt.bucket_col == lt.key_col
        and rt.bucket_col == rt.key_col
    )
    n_buckets = lt.n_buckets if pruned else args.buckets
    bucket_expr = lt._bucket_expr(key) if pruned else None
    div = checksum_diff(
        lt.read(), rt.read(), key, cols, n_buckets=n_buckets, bucket=bucket_expr
    ).collect()
    out["n_buckets"] = n_buckets
    out["drilldown_pruned"] = pruned
    out["divergent_buckets"] = sorted(int(r["bucket"]) for r in div)
    out["match"] = not div

    if div and args.drilldown:
        # drill into flagged buckets only: per-key signatures, full-outer
        # anti-match
        from ticdc_spark.functions.hashing import h60
        from ticdc_spark.model import SYS_DELETED

        flagged = [int(r["bucket"]) for r in div]
        sig = row_signature(cols)

        if pruned:
            def keyed(t):
                # manifest-pruned read of ONLY the flagged buckets' files
                live = t.read_raw(buckets=flagged).filter(~F.col(SYS_DELETED))
                return live.select(F.col(key), sig.alias("s"))
        else:
            def keyed(t):
                return (
                    t.read()
                    .select(
                        F.col(key),
                        (h60(key) % F.lit(n_buckets)).alias("b"),
                        sig.alias("s"),
                    )
                    .filter(F.col("b").isin(flagged))
                )

        a = keyed(lt).select(
            F.col(key).alias("_lk"), F.col("s").alias("_ls")
        )
        b = keyed(rt).select(
            F.col(key).alias("_rk"), F.col("s").alias("_rs")
        )
        j = a.join(b, a["_lk"] == b["_rk"], "full_outer")
        bad = j.filter(
            F.col("_ls").isNull()
            | F.col("_rs").isNull()
            | (F.col("_ls") != F.col("_rs"))
        ).select(
            F.coalesce(F.col("_lk"), F.col("_rk")).alias(key),
            F.when(F.col("_rs").isNull(), "missing_right")
            .when(F.col("_ls").isNull(), "missing_left")
            .otherwise("value_diff")
            .alias("kind"),
        )
        rows = bad.orderBy(key).limit(args.limit).collect()
        out["divergent_keys"] = [{key: r[key], "kind": r["kind"]} for r in rows]

    print(json.dumps(out, sort_keys=True))
    return 0 if out["match"] else 1


if __name__ == "__main__":
    sys.exit(main())
