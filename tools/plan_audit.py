"""Physical-plan audit: dump `explain(formatted)` for the headline queries
and grep for the scale-critical properties (what you'd check in the Spark UI
before a 100 TB run):

  * column pruning    — parquet ReadSchema carries only referenced columns
  * predicate pushdown— PushedFilters non-empty where the query filters
  * codegen           — WholeStageCodegen spans cover the hot path
  * join strategy     — broadcasts where a side is small, no accidental
                        cartesian products
  * exchange reuse    — self-joins reuse one shuffle (ReusedExchange)

Usage: python tools/plan_audit.py [query ...]   (default: the audit set)
The pytest guard (tests/test_plans.py) asserts the non-negotiable subset.
"""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"

AUDIT = [
    "q1_pricing",
    "q5_region_orders",
    "cdc_bucket_checksum",
    "corpus_token_budget",
    "cdc_lww_agg",
    "cdc_lww_semijoin",
    "cdc_lww_composite",
    "cdc_final_state",
    "cdc_causality",
    "codec_canal_flat",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_incremental",
    "dedup_simhash",
    "dedup_embedding",
    "dedup_ngram_jaccard",
    "ann_topk",
    "ann_ivf_topk",
    "ann_ivf_incremental",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "multimodal_image_dims",
    "decontam_incremental",
    "curate_corpus",
    "curate_decontaminate",
    "text_vocab_topk",
    "corpus_sample",
    "corpus_mix",
    "tokens_pack",
    "corpus_shuffle",
    "corpus_shards",
    "cdc_training_order",
    "dedup_chunks",
    "dedup_dup_spans",
    "tokens_dup_spans",
    "dedup_span_trim",
    "text_unigram_nll",
    "text_bigram_nll",
    "tokens_entropy",
    "tokens_decontaminate",
    "text_nll_buckets",
    "text_pii",
    "text_repetition",
    "curate_dsir",
    "events_asof_enrich",
    "events_asof_salted",
    "tokens_oov_rate",
    "corpus_profile",
    "cdc_syncpoint_read",
    "corpus_split",
    "tokens_pack_sequences",
    "text_gopher_rules",
    "events_funnel",
    "events_retention",
    "cdc_hot_keys",
    "cdc_snapshot_diff",
    "text_nb_auc",
    "text_nb_calibration",
]


def plan_of(df, executed: bool = True) -> str:
    if executed:
        # materialize THROUGH THIS DataFrame's own QueryExecution (a write
        # would clone the plan) so AQE finalizes: the pre-execution
        # AdaptiveSparkPlan hides codegen spans and runtime join choices
        df.collect()
        return df._jdf.queryExecution().executedPlan().toString()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def audit(name: str, plan: str) -> list[str]:
    findings = []
    # executed trees mark codegen stages with "*(n)" stars
    if "*(" not in plan and "WholeStageCodegen" not in plan:
        findings.append("no WholeStageCodegen span")
    if "CartesianProduct" in plan:
        findings.append("CartesianProduct present")
    # unpartitioned Window over corpus-scale input: a Window fed by an
    # Exchange SinglePartition funnels the whole input through one task.
    # Legitimate single-partition spans are bounded first (TakeOrdered /
    # GlobalLimit compile the bound into the plan) — flag the rest.
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        feeds_window = any("Window" in l for l in lines[max(0, i - 6): i])
        bounded = any(
            ("TakeOrderedAndProject" in l) or ("GlobalLimit" in l) or ("Limit" in l)
            for l in lines[i:]
        )
        if feeds_window and not bounded:
            findings.append("unpartitioned Window over unbounded input")
    for line in plan.splitlines():
        if "ReadSchema" in line and ("text" in line or "comment" in line):
            # full-text columns should only be read by text-processing queries
            if name.startswith(("q1", "q5", "cdc_")):
                findings.append(f"scan reads text/comment column: {line.strip()[:120]}")
    return findings


def main(only: list[str]) -> int:
    from ticdc_spark.session import build_session

    import __spark_entry__ as entrymod

    spark = build_session("plan-audit", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    bad = 0
    for name in only or AUDIT:
        df = qs[name](spark, SF_DIR)
        plan = plan_of(df)
        formatted = plan_of(df, executed=False)
        findings = audit(name, plan)
        status = "WARN" if findings else "OK"
        bad += bool(findings)
        print(f"== {name}: {status}")
        for f in findings:
            print(f"   - {f}")
        if only:  # explicit ask → show scan details + executed tree
            print(formatted)
            print(plan)
    spark.stop()
    return bad


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
