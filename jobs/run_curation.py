"""Run the training-data curation pipeline with spark-submit (the batch
companion to run_changefeed.py, over the tokens-payload corpus):

    spark-submit --py-files ticdc_spark.zip jobs/run_curation.py \
        --docs /data/documents.parquet --out /data/curated \
        [--eval-docs /data/eval.parquet] [--target-source src0] \
        [--dsir-keep 1000] [--shards 64] [--seed 7] [--strict]

Stages (all pure DataFrame plans from ticdc_spark.pipeline / functions):

  1. curate: quality + langid + exact-dedup survivor + near-dup (MinHash
     LSH) flags — curate_strict additionally requires passing quality and
     English (pipeline/curate.py)
  2. entropy gate (optional, --min-entropy / --max-top-frac): drop
     degenerate-repetition docs by per-doc token-histogram entropy and
     top-token share (functions/text.tokens_entropy_columns over h60
     word ids — the loader-side gate, no external tokenizer)
  3. decontaminate (optional, --eval-docs): drop docs sharing any 8-gram
     with the eval set (pipeline/decontam.py)
  4. DSIR selection (optional, --dsir-keep N): keep the N kept docs whose
     hashed-n-gram profile best matches --target-source (Xie et al. 2023)
  5. shard export: deterministic global shuffle (seeded rank) +
     contiguous-balanced shards with a _shard_manifest.json
     (pipeline/pack.write_shards)

Prints one JSON line with per-stage row counts; idempotent (the shard
export overwrites --out).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--docs", required=True, help="documents parquet (doc_id, text, source)")
    p.add_argument("--out", required=True, help="shard output dir")
    p.add_argument("--eval-docs", default=None, help="eval/benchmark parquet for decontamination")
    p.add_argument("--min-entropy", type=float, default=None,
                   help="drop docs below this token-histogram entropy (nats)")
    p.add_argument("--max-top-frac", type=float, default=None,
                   help="drop docs whose most frequent token exceeds this share")
    p.add_argument("--target-source", default=None, help="DSIR target stratum")
    p.add_argument("--dsir-keep", type=int, default=None, help="DSIR selection size")
    p.add_argument("--shards", type=int, default=16)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--strict", action="store_true",
                   help="require passes_quality and lang_pred='en'")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from ticdc_spark.session import build_session
    from ticdc_spark.pipeline.curate import curate, curate_strict
    from ticdc_spark.pipeline.decontam import decontaminate, dsir_select
    from ticdc_spark.pipeline.pack import write_shards

    active = SparkSession.getActiveSession()
    spark = active or build_session(
        app_name="ticdc-curation", master=args.master or "local[*]"
    )
    counts: dict[str, int] = {}

    docs = spark.read.parquet(args.docs)
    counts["input"] = docs.count()

    curated = (curate_strict if args.strict else curate)(docs)
    kept = docs.join(curated.select("doc_id"), "doc_id")
    counts["after_curate"] = kept.count()

    if args.min_entropy is not None or args.max_top_frac is not None:
        from ticdc_spark.functions.hashing import h60
        from ticdc_spark.functions.text import tokens_col, tokens_entropy_columns

        toks = kept.select(
            "doc_id",
            F.transform(
                tokens_col("text"), lambda w: (h60(w) % 32768).cast("int")
            ).alias("tokens"),
        )
        prof = tokens_entropy_columns(toks)
        cond = F.lit(True)
        if args.min_entropy is not None:
            cond = cond & (F.col("entropy") >= args.min_entropy)
        if args.max_top_frac is not None:
            cond = cond & (F.col("top_frac") <= args.max_top_frac)
        kept = kept.join(prof.filter(cond).select("doc_id"), "doc_id")
        counts["after_entropy_gate"] = kept.count()

    if args.eval_docs:
        ev = spark.read.parquet(args.eval_docs)
        clean = decontaminate(kept, ev).filter(F.col("contaminated") == 0)
        kept = kept.join(clean.select("doc_id"), "doc_id")
        counts["after_decontam"] = kept.count()

    if args.dsir_keep:
        if not args.target_source:
            raise SystemExit("--dsir-keep requires --target-source")
        sel = dsir_select(
            kept, n_select=args.dsir_keep, target_source=args.target_source
        ).select("doc_id")
        kept = kept.join(sel, "doc_id")
        counts["after_dsir"] = kept.count()

    manifest = write_shards(
        kept, args.out, n_shards=args.shards, seed=args.seed
    )
    counts["shards"] = args.shards
    counts["exported"] = sum(manifest["shards"].values())
    print(json.dumps({"out": args.out, "counts": counts}))
    if active is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
