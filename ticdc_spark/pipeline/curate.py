"""End-to-end corpus curation — the composition a pre-training data pipeline
actually runs over the CDC-maintained document table:

    quality filter → language ID → exact dedup → near-dup dedup → corpus

Each stage is one of this repo's operators; the composition stays a single
declarative DataFrame plan (Catalyst fuses the projections; the near-dup
stage is the only join-bearing step). At 100 TB: quality/langid are
scan-fused narrow ops, exact dedup is one hash shuffle, near-dup uses the
MinHash-LSH path (pipeline.dedup) so nothing is quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import langid_columns, quality_columns
from .dedup import exact_dedup, ngram_jaccard_pairs


def curate(
    docs: DataFrame,
    jaccard_threshold: float = 0.8,
    use_lsh: bool = False,
) -> DataFrame:
    """Return the curated corpus: (doc_id, n_words, stopword_ratio, lang_pred).

    Rules (deterministic, oracle-checkable):
      1. quality: passes_quality = 1 (≥5 words, punct ratio < 0.2)
      2. exact dedup: keep only each content group's canonical (min) doc_id
      3. near-dup dedup: for every pair with word-3-gram Jaccard ≥ threshold,
         drop the higher doc_id (survivor = smallest in each dup cluster via
         pairwise rule — matches the greedy keep-first policy)
    use_lsh switches stage 3 to the MinHash-LSH candidate path (same output
    when LSH recall is total; the scale default).
    """
    q = quality_columns(docs)
    lang = langid_columns(docs).select("doc_id", "lang_pred")
    keep_q = q.filter(F.col("passes_quality") == 1).select(
        "doc_id", "n_words", "stopword_ratio"
    )

    canon = exact_dedup(docs).select(F.col("canonical_doc_id").alias("doc_id"))

    if use_lsh:
        from .dedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(docs, n=3, threshold=jaccard_threshold)
    else:
        pairs = ngram_jaccard_pairs(docs, n=3, threshold=jaccard_threshold)
    dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()

    # no broadcast hint on `dropped`: near-dup clusters can cover most of an
    # adversarial corpus — AQE broadcasts at runtime only when it fits
    return (
        keep_q.join(canon, "doc_id", "inner")
        .join(dropped, "doc_id", "left_anti")
        .join(lang, "doc_id", "inner")
        .select("doc_id", "n_words", "stopword_ratio", "lang_pred")
    )


def curate_strict(docs: DataFrame) -> DataFrame:
    """The round-2 strict curation composition — every per-doc filter this
    package implements, in the order a production pipeline runs them:

      1. quality      — passes_quality = 1 (length + punctuation rules)
      2. repetition   — passes_repetition = 1 (Gopher top-2gram/dup-3gram)
      3. PII          — has_pii = 0 (emails/phones/IPs; production would
                        scrub-and-keep — the filter form keeps the
                        composition a pure doc_id semi-join chain)
      4. chunk dedup  — keep = 1 (global boilerplate-chunk mass ≤ 30%)
      5. exact dedup  — canonical (min doc_id) per content group

    Output: (doc_id, n_words, lang_pred). One declarative plan: stages 1-3
    are scan-fused narrow ops over the same scan, stage 4 is the linear
    chunk-hash shuffle, stage 5 one hash shuffle — nothing quadratic, no
    pair joins at all (the LSH near-dup tier stays in `curate`, which this
    composes with at the caller's choice).
    """
    from ..functions.text import pii_columns, repetition_columns
    from .dedup import chunk_dedup

    q = quality_columns(docs).filter(F.col("passes_quality") == 1).select(
        "doc_id", "n_words"
    )
    rep = repetition_columns(docs).filter(F.col("passes_repetition") == 1).select("doc_id")
    pii = pii_columns(docs).filter(F.col("has_pii") == 0).select("doc_id")
    ck = chunk_dedup(docs).filter(F.col("keep") == 1).select("doc_id")
    canon = exact_dedup(docs).select(F.col("canonical_doc_id").alias("doc_id"))
    lang = langid_columns(docs).select("doc_id", "lang_pred")
    return (
        q.join(rep, "doc_id")
        .join(pii, "doc_id")
        .join(ck, "doc_id")
        .join(canon, "doc_id")
        .join(lang, "doc_id")
        .select("doc_id", "n_words", "lang_pred")
    )
