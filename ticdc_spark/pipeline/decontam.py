"""Decontamination, vocabulary stats, and deterministic sampling — the
remaining table-stakes ops of a pre-training data pipeline (alongside
dedup/quality/langid in this package). All pure DataFrame expressions with
cross-engine (md5-based) hashing so the DuckDB oracle reproduces values.

Scale notes:
  * decontaminate — the eval/benchmark set is tiny (10^3-10^6 grams), so
    its shingle set broadcasts; the corpus side is one explode + semi-join,
    shuffle O(corpus grams) worst case and usually map-side only.
  * vocab_stats — explode + count: partial aggregation collapses each
    partition's token multiset before the shuffle (same shape as minhash).
  * sample_deterministic — no shuffle at all: a hash-threshold filter,
    reproducible across engines/runs (no rand()), stratifiable by any key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60
from ..functions.text import tokens_col, word_ngrams


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Flag training docs sharing ANY word n-gram with the eval set (the
    standard n-gram-overlap benchmark-contamination rule). Returns one row
    per training doc: (doc_id, n_hit_grams, contaminated)."""
    grams = lambda df: df.select(  # noqa: E731
        "doc_id", F.explode(word_ngrams(tokens_col(text_col), n)).alias("gram")
    ).distinct()
    eval_grams = grams(eval_docs).select("gram").distinct()
    hits = (
        grams(docs)
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_grams"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hit_grams"), F.lit(0)).alias("n_hit_grams"),
            (F.coalesce(F.col("n_hit_grams"), F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )


def vocab_stats(docs: DataFrame, k: int = 100, text_col: str = "text") -> DataFrame:
    """Top-k corpus vocabulary by token frequency (whitespace tokens,
    lowercased), deterministic tie-break by token string."""
    from pyspark.sql import Window

    counts = (
        docs.select(F.explode(tokens_col(text_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    # orderBy+limit compiles to TakeOrderedAndProject (distributed partial
    # top-k per partition, merge on driver) — never a single-partition sort
    # of the full vocabulary; the rank window then runs over only k rows.
    top = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(w)).select("token", "cnt", "rank")


def sample_deterministic(
    docs: DataFrame, p: float, key_col: str = "doc_id", denom: int = 1_000_000
) -> DataFrame:
    """Deterministic p-sample: keep rows with h60(key) % denom < p*denom.
    Reproducible across runs and engines (no rand()); compose with a
    stratification key by sampling within each stratum's own rows."""
    return docs.filter((h60(F.col(key_col).cast("string")) % denom) < int(p * denom))
