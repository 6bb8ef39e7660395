"""Seed-quality classifier — the fasttext-style "wiki vs web" filter of the
CCNet / LLaMA data pipelines (Wenzek et al. 2020 §4.4; Touvron et al. 2023
train a linear classifier on Wikipedia-referenced pages) re-expressed as an
EXACT-count multinomial Naive Bayes over hashed unigrams, so training is two
aggregations and scoring is one broadcast join — no gradient loop, no model
file, and a DuckDB oracle can reproduce every value.

Model: feature = h60(word) % n_hash (cross-engine md5 hash, the repo's
standard); per-class token counts with add-alpha smoothing over the full
hashed vocabulary H:

    llr(h)  = ln (cnt_pos(h) + a)/(T_pos + aH)  -  ln (cnt_neg(h) + a)/(T_neg + aH)
    score   = ln(N_pos/N_neg)  +  sum_tokens llr(h(w))     (> 0 => positive)

Scale shape (100 TB): training is ONE groupBy(h) shuffle with map-side
combine whose output is bounded by n_hash rows (<= 2^18 by default, a few MB
— broadcastable); the class totals are a 1-row aggregate cross-joined in.
Scoring explodes tokens (narrow), broadcast-joins the model, and re-groups
by doc_id — one shuffle keyed by the document id. Nothing is iterative and
nothing is quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60, h60_sql
from ..functions.text import TOKENS_SQL, tokens_col

N_HASH_DEFAULT = 2**18
ALPHA_DEFAULT = 0.5


def nb_train(
    docs: DataFrame,
    pos_sources: tuple[str, ...] = ("src0",),
    text_col: str = "text",
    n_hash: int = N_HASH_DEFAULT,
    alpha: float = ALPHA_DEFAULT,
) -> DataFrame:
    """Train the NB model on the corpus itself: documents whose ``source``
    is in ``pos_sources`` are the positive (high-quality) class, the rest
    negative. Returns the OBSERVED-feature table (h: long, llr: double);
    an unseen feature's llr is ln((T_neg + aH)/(T_pos + aH)) by the same
    smoothing — a held-out scorer left-joins and coalesces to it.
    """
    toks = docs.select(
        F.col("source").isin(*pos_sources).cast("int").alias("pos"),
        F.explode(tokens_col(text_col)).alias("tok"),
    ).select("pos", (h60(F.col("tok")) % F.lit(n_hash)).alias("h"))
    counts = toks.groupBy("h").agg(
        F.sum("pos").alias("cp"),
        F.sum(F.lit(1) - F.col("pos")).alias("cn"),
    )
    totals = counts.agg(
        F.sum("cp").alias("tp"), F.sum("cn").alias("tn")
    )
    a, hh = float(alpha), float(n_hash)
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "h",
            (
                F.log((F.col("cp") + F.lit(a)) / (F.col("tp") + F.lit(a * hh)))
                - F.log((F.col("cn") + F.lit(a)) / (F.col("tn") + F.lit(a * hh)))
            ).alias("llr"),
        )
    )


def nb_score(
    docs: DataFrame,
    pos_sources: tuple[str, ...] = ("src0",),
    text_col: str = "text",
    n_hash: int = N_HASH_DEFAULT,
    alpha: float = ALPHA_DEFAULT,
) -> DataFrame:
    """Train-and-score in one plan (the driver-query form): every document
    gets its NB log-odds. Unseen features cannot occur here because the
    model is trained on the same corpus, so the observed-feature join is
    total — an inner join, no default fill. (A held-out scorer would left-
    join and coalesce to the defaults; same plan shape.)

    Output: (doc_id, n_terms, nb_llr_mean, nb_pred) — the mean keeps the
    magnitude O(1) for cross-engine float comparison; the prediction is the
    sign of prior + sum.
    """
    model = nb_train(docs, pos_sources, text_col, n_hash, alpha)
    is_pos = F.col("source").isin(*pos_sources)
    priors = docs.agg(
        F.sum(is_pos.cast("int")).alias("np"),
        F.sum((~is_pos).cast("int")).alias("nn"),
    ).select(
        (F.log(F.col("np").cast("double")) - F.log(F.col("nn").cast("double")))
        .alias("prior")
    )
    toks = docs.select(
        "doc_id", F.explode(tokens_col(text_col)).alias("tok")
    ).select("doc_id", (h60(F.col("tok")) % F.lit(n_hash)).alias("h"))
    return (
        toks.join(F.broadcast(model), "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("llr").alias("_s"),
        )
        .crossJoin(F.broadcast(priors))
        .select(
            "doc_id",
            "n_terms",
            F.round(F.col("_s") / F.col("n_terms"), 6).alias("nb_llr_mean"),
            (F.col("prior") + F.col("_s") > 0).cast("int").alias("nb_pred"),
        )
    )


def nb_score_sql(
    pos_sources: tuple[str, ...] = ("src0",),
    n_hash: int = N_HASH_DEFAULT,
    alpha: float = ALPHA_DEFAULT,
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`nb_score` — the identical exact-count NB."""
    toks = TOKENS_SQL.format(t="text")
    h = h60_sql("tok")
    a, hh = float(alpha), float(n_hash)
    inlist = ", ".join(f"'{s}'" for s in pos_sources)
    return f"""
WITH tk AS (
  SELECT doc_id, (source IN ({inlist}))::int AS pos,
         {h} % {n_hash} AS h
  FROM (SELECT doc_id, source, unnest({toks}) AS tok FROM {table})
), c AS (
  SELECT h, sum(pos) AS cp, sum(1 - pos) AS cn FROM tk GROUP BY h
), tot AS (
  SELECT sum(cp) AS tp, sum(cn) AS tn FROM c
), model AS (
  SELECT h, ln((cp + {a}) / (tp + {a * hh})) - ln((cn + {a}) / (tn + {a * hh})) AS llr
  FROM c CROSS JOIN tot
), prior AS (
  SELECT ln(sum((source IN ({inlist}))::int) * 1.0)
       - ln(sum((source NOT IN ({inlist}))::int) * 1.0) AS prior
  FROM {table}
)
SELECT tk.doc_id, count(*) AS n_terms,
       round(sum(model.llr) / count(*), 6) AS nb_llr_mean,
       (any_value(prior.prior) + sum(model.llr) > 0)::int AS nb_pred
FROM tk JOIN model USING (h) CROSS JOIN prior
GROUP BY tk.doc_id
"""
