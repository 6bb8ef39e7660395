"""Text-analysis functions for the training-data pipeline.

All pure Column expressions (codegen'd, no Python in the hot path):
tokenization, word n-gram shingles, quality scoring, n-gram language-ID
heuristic, and rolling-hash document fingerprinting (winnowing-lite).

At 100 TB these run as a single narrow projection over the scan — no shuffle,
no UDF serialization; Catalyst fuses them into the parquet-read stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import h60_sql

# small deterministic stopword lists per language for the lang-ID heuristic
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "for", "it"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une", "pour", "que"),
    "es": ("el", "los", "que", "de", "la", "en", "un", "una", "por", "con"),
}


def tokens_col(text: Column | str = "text") -> Column:
    """Whitespace tokenization (lowercased). BPE-ish variant below."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


TOKENS_SQL = r"regexp_split_to_array(lower(trim({t})), '\s+')"

# BPE-ish sub-word regex: words, numbers, or single punctuation marks —
# the GPT-2 pre-tokenizer shape without the library dependency.
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens_col(text: Column | str = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_RE), 0)


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-gram shingles as space-joined strings; [] when < n tokens.

    transform over a sequence of start offsets — stays in codegen.
    """
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            # slice+concat_ws beats per-position element_at ~4.5x (one array
            # copy vs n chained lookups per gram)
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngrams_sql(n: int, toks_expr: str = "toks") -> str:
    """DuckDB rendering of word_ngrams: per-row generate_series + list slice
    (unnested by the caller)."""
    # caller unnests: unnest(generate_series(1, greatest(len(toks)-n+1, 0))) i
    return f"array_to_string({toks_expr}[i:i+{n - 1}], ' ')"


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: lengths, word stats, punctuation/alpha/digit
    ratios, stopword ratio. Mirrors what a pre-training quality filter keys on
    (C4/Gopher-style rules) — deterministic, oracle-checkable.
    """
    t = F.col(text_col)
    toks = tokens_col(text_col)
    n_chars = F.length(t)
    n_words = F.size(toks)
    all_sw = tuple(w for ws in STOPWORDS.values() for w in ws)
    sw_hits = F.size(F.filter(toks, lambda x: x.isin(*all_sw)))
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[\.,;:!\?\'\"]", ""))
    alpha = F.length(t) - F.length(F.regexp_replace(t, r"[A-Za-z]", ""))
    digit = F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))
    return df.select(
        "doc_id",
        n_chars.alias("n_chars_q"),
        n_words.alias("n_words"),
        F.round(n_chars / n_words, 6).alias("mean_word_len"),
        F.round(punct / n_chars, 6).alias("punct_ratio"),
        F.round(alpha / n_chars, 6).alias("alpha_ratio"),
        F.round(digit / n_chars, 6).alias("digit_ratio"),
        F.round(sw_hits / n_words, 6).alias("stopword_ratio"),
        ((n_words >= 5) & (punct / n_chars < F.lit(0.2))).cast("int").alias("passes_quality"),
    )


def langid_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID: score = #tokens in each language's
    stopword list; argmax wins, ties/zero → 'und'. Deterministic tie-break by
    fixed language order en > de > fr > es."""
    toks = tokens_col(text_col)
    scores = {
        lang: F.size(F.filter(toks, lambda x: x.isin(*ws))) for lang, ws in STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lang in STOPWORDS:  # insertion order = tie-break priority
        pred = pred.when(scores[lang] == best, F.lit(lang))
    out = df.select(
        "doc_id",
        *[s.alias(f"score_{lang}") for lang, s in scores.items()],
        pred.alias("lang_pred"),
    )
    return out


def repetition_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition signals — the Gopher/MassiveText
    repetition rules (Rae et al. 2021, table A1): heavily self-repeating
    documents (boilerplate, keyword stuffing, scraper loops) are dropped
    before training.

      top_2gram_frac — occurrences of the MOST COMMON word 2-gram over all
                       2-grams (Gopher: "fraction in most common n-gram")
      dup_3gram_frac — fraction of 3-grams that are repeats of an earlier
                       one: (total − distinct) / total ("fraction in
                       duplicate n-grams")
      passes_repetition — top_2gram_frac ≤ 0.20 AND dup_3gram_frac ≤ 0.30

    Pure per-row array expressions (no shuffle, no UDF): the mode count is
    max over distinct grams of that gram's occurrence count — O(d·g) per
    row with d distinct grams, bounded by document length, all inside
    whole-stage codegen. Short docs (< n tokens) define both fractions 0.
    """
    toks = tokens_col(text_col)
    g2 = word_ngrams(toks, 2)
    g3 = word_ngrams(toks, 3)
    top2 = F.array_max(
        F.transform(
            F.array_distinct(g2),
            lambda x: F.size(F.filter(g2, lambda y: y == x)),
        )
    )
    top2_frac = F.when(
        F.size(g2) > 0, F.round(top2 / F.size(g2), 6)
    ).otherwise(F.lit(0.0))
    dup3_frac = F.when(
        F.size(g3) > 0,
        F.round((F.size(g3) - F.size(F.array_distinct(g3))) / F.size(g3), 6),
    ).otherwise(F.lit(0.0))
    return df.select(
        "doc_id",
        F.size(g2).cast("long").alias("n_2grams"),
        top2_frac.alias("top_2gram_frac"),
        dup3_frac.alias("dup_3gram_frac"),
        ((top2_frac <= 0.20) & (dup3_frac <= 0.30)).cast("int").alias("passes_repetition"),
    )


def repetition_sql() -> str:
    """DuckDB oracle for repetition_columns (same gram construction as
    ngrams_sql, same rounding)."""
    toks = TOKENS_SQL.format(t="text")
    return f"""
WITH t AS (
  SELECT doc_id, {toks} AS toks FROM documents
), g AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 2
              THEN list_transform(generate_series(1, len(toks) - 1),
                                  i -> array_to_string(toks[i:i+1], ' '))
              ELSE [] END AS g2,
         CASE WHEN len(toks) >= 3
              THEN list_transform(generate_series(1, len(toks) - 2),
                                  i -> array_to_string(toks[i:i+2], ' '))
              ELSE [] END AS g3
  FROM t
), m AS (
  SELECT doc_id, g2, g3,
         CASE WHEN len(g2) > 0
              THEN list_max(list_transform(list_distinct(g2),
                     x -> len(list_filter(g2, y -> y = x))))
              ELSE 0 END AS top2
  FROM g
)
SELECT doc_id,
       len(g2)::BIGINT AS n_2grams,
       CASE WHEN len(g2) > 0 THEN round(top2 * 1.0 / len(g2), 6) ELSE 0.0 END AS top_2gram_frac,
       CASE WHEN len(g3) > 0 THEN round((len(g3) - len(list_distinct(g3))) * 1.0 / len(g3), 6) ELSE 0.0 END AS dup_3gram_frac,
       (CASE WHEN (CASE WHEN len(g2) > 0 THEN top2 * 1.0 / len(g2) ELSE 0 END) <= 0.20
              AND (CASE WHEN len(g3) > 0 THEN (len(g3) - len(list_distinct(g3))) * 1.0 / len(g3) ELSE 0 END) <= 0.30
             THEN 1 ELSE 0 END)::BIGINT AS passes_repetition
FROM m
"""


def fingerprint_columns(df: DataFrame, text_col: str = "text", w: int = 5) -> DataFrame:
    """Document fingerprint: full-content hash + winnowing-lite rolling
    fingerprint = min over word-w-gram hashes (robust to local edits).
    Cross-engine reproducible (md5-based h60)."""
    toks = tokens_col(text_col)
    grams = word_ngrams(toks, w)
    gram_hashes = F.transform(
        grams, lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
    )
    return df.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("content_md5"),
        F.when(F.size(gram_hashes) > 0, F.array_min(gram_hashes))
        .otherwise(F.conv(F.substring(F.md5(F.lower(F.trim(F.col(text_col)))), 1, 15), 16, 10).cast("long"))
        .alias("min_gram_fp"),
        F.size(grams).alias("n_grams"),
    )


def fingerprint_sql(w: int = 5) -> str:
    """DuckDB oracle for fingerprint_columns."""
    toks = TOKENS_SQL.format(t="text")
    gram = "array_to_string(toks[i:i+" + str(w - 1) + "], ' ')"
    return f"""
WITH t AS (
  SELECT doc_id, md5(lower(trim(text))) AS content_md5, {toks} AS toks
  FROM documents
), g AS (
  SELECT doc_id, unnest(generate_series(1, greatest(len(toks)-{w - 1}, 0))) AS i, toks
  FROM t
), agg AS (
  SELECT doc_id, min({h60_sql(gram)}) AS min_fp,
         count(*) AS n_grams
  FROM g GROUP BY doc_id
)
SELECT t.doc_id, t.content_md5,
       coalesce(agg.min_fp, {h60_sql("t.content_md5")}) AS min_gram_fp,
       coalesce(agg.n_grams, 0) AS n_grams
FROM t LEFT JOIN agg USING (doc_id)
"""


# ---------------------------------------------------------------------------
# PII detection / scrubbing

# Kept to the RE2 ∩ java.util.regex common subset (no backrefs, no
# lookaround) so Spark and the DuckDB oracle compile the IDENTICAL pattern.
PII_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scrub_col(text: Column | str = "text") -> Column:
    """Redact emails → <EMAIL>, then phones → <PHONE>, then IPv4 → <IP>.
    Order matters: emails first (their domains contain dots that the IP
    pattern could otherwise bite), IPs last (a phone 555-123-4567 must not
    be half-eaten by the IP rule)."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, PII_PHONE_RE, "<PHONE>")
    c = F.regexp_replace(c, PII_IPV4_RE, "<IP>")
    return c


def pii_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII report + scrub — the redaction pass every public-web
    training pipeline runs before tokenization. Counts are pre-scrub
    occurrences; scrubbed_md5 hashes the redacted text so the oracle
    verifies the whole replace chain, not just the counts. Pure
    regexp_extract_all/regexp_replace column expressions — stays in
    whole-stage codegen, no shuffle."""
    c = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), 0))
    n_phones = F.size(F.regexp_extract_all(c, F.lit(PII_PHONE_RE), 0))
    n_ipv4 = F.size(F.regexp_extract_all(c, F.lit(PII_IPV4_RE), 0))
    return df.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ipv4.alias("n_ipv4"),
        ((n_emails + n_phones + n_ipv4) > 0).cast("int").alias("has_pii"),
        F.md5(pii_scrub_col(c)).alias("scrubbed_md5"),
    )


def pii_sql() -> str:
    """DuckDB oracle for pii_columns (identical patterns; 'g' flag because
    DuckDB regexp_replace is first-match by default where Spark's is
    global)."""
    e, p, i = PII_EMAIL_RE, PII_PHONE_RE, PII_IPV4_RE
    scrub = (
        f"regexp_replace(regexp_replace(regexp_replace(text, '{e}', '<EMAIL>', 'g'),"
        f" '{p}', '<PHONE>', 'g'), '{i}', '<IP>', 'g')"
    )
    return f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{e}'))::BIGINT AS n_emails,
       len(regexp_extract_all(text, '{p}'))::BIGINT AS n_phones,
       len(regexp_extract_all(text, '{i}'))::BIGINT AS n_ipv4,
       (CASE WHEN len(regexp_extract_all(text, '{e}')) + len(regexp_extract_all(text, '{p}'))
                  + len(regexp_extract_all(text, '{i}')) > 0 THEN 1 ELSE 0 END)::BIGINT AS has_pii,
       md5({scrub}) AS scrubbed_md5
FROM documents
"""


def unigram_nll_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """CCNet-style language-model quality proxy: per-doc mean negative
    log-likelihood of its tokens under the CORPUS unigram distribution with
    add-one smoothing, p(tok) = (cnt+1) / (N+V). CCNet ranks by KenLM 5-gram
    perplexity (Wenzek et al. 2020); the unigram form keeps the exact same
    pipeline shape (score -> rank -> head/middle/tail buckets) with no
    external model, and is the honest in-engine stand-in. High nll = rare
    vocabulary (tail), low = stopword-heavy boilerplate (head).

    Output: (doc_id, n_tok, nll) with nll rounded to 6 places.

    Scale shape: two linear shuffles — token counts groupBy(tok) with
    map-side partial agg, then the exploded token stream re-joined to the
    count table on the SAME key (co-partitioned) and one groupBy(doc_id)
    avg. The (N, V) corpus totals are a 1-row aggregate cross-joined in;
    Spark broadcasts it.
    """
    toks = (
        df.select("doc_id", F.explode(tokens_col(text_col)).alias("tok"))
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("n_total"), F.count("*").alias("v_total")
    )
    scored = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            (
                -F.log(
                    (F.col("cnt") + F.lit(1)).cast("double")
                    / (F.col("n_total") + F.col("v_total")).cast("double")
                )
            ).alias("tok_nll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        F.round(F.avg("tok_nll"), 6).alias("nll"),
    )


def unigram_nll_sql() -> str:
    toks = TOKENS_SQL.format(t="text")
    return f"""
WITH t AS (
  SELECT doc_id, unnest({toks}) AS tok FROM documents
), c AS (
  SELECT tok, count(*) AS cnt FROM t GROUP BY tok
), tot AS (
  SELECT sum(cnt) AS n_total, count(*) AS v_total FROM c
)
SELECT t.doc_id, count(*) AS n_tok,
       round(avg(-ln((c.cnt + 1) * 1.0 / (tot.n_total + tot.v_total))), 6) AS nll
FROM t JOIN c USING (tok) CROSS JOIN tot
GROUP BY t.doc_id
"""


def unigram_nll_buckets(
    df: DataFrame, text_col: str = "text", n_buckets: int = 3
) -> DataFrame:
    """CCNet's actual output shape (Wenzek et al. 2020): score every doc,
    rank corpus-wide, cut into equal head/middle/tail thirds — head =
    lowest NLL (most LM-like), tail = rarest vocabulary. The rank is the
    range-partitioned prefix sum (pipeline.pack.rank_by), so no
    single-partition window; the (nll, doc_id) order is total (nll is
    rounded, doc_id breaks ties deterministically in both engines)."""
    from ..pipeline.pack import rank_by

    nll = unigram_nll_columns(df, text_col)
    ranked = rank_by(nll, ["nll", "doc_id"])
    n = ranked.agg(F.max("_rank").alias("_n_total"))
    lbl = F.expr(f"((_rank - 1) * {int(n_buckets)}) div _n_total")
    name = (
        F.when(lbl == 0, F.lit("head"))
        .when(lbl == n_buckets - 1, F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    return ranked.crossJoin(F.broadcast(n)).select(
        "doc_id",
        "n_tok",
        "nll",
        F.col("_rank").cast("long").alias("nll_rank"),
        name.alias("bucket"),
    )


def unigram_nll_buckets_sql(n_buckets: int = 3) -> str:
    return f"""
WITH q AS ({unigram_nll_sql()}),
r AS (
  SELECT doc_id, n_tok, nll,
         row_number() OVER (ORDER BY nll, doc_id) AS nll_rank
  FROM q
)
SELECT doc_id, n_tok, nll, nll_rank,
       CASE ((nll_rank - 1) * {int(n_buckets)}) // (SELECT max(nll_rank) FROM r)
            WHEN 0 THEN 'head'
            WHEN {int(n_buckets) - 1} THEN 'tail'
            ELSE 'middle' END AS bucket
FROM r
"""


def bigram_nll_columns(
    df: DataFrame, text_col: str = "text", lam: float = 0.7
) -> DataFrame:
    """Jelinek-Mercer bigram LM quality score — one step closer to CCNet's
    KenLM 5-gram perplexity (Wenzek et al. 2020) than the unigram proxy:
    per-doc mean negative log-likelihood under

        p(tok | prev) = lam * cnt(prev,tok)/cnt(prev)
                        + (1-lam) * (cnt(tok)+1)/(N+V)

    with the add-one unigram as the doc's first-token model (no prev).
    Counts come from the corpus itself (self-scoring, same as the unigram
    path), so every observed bigram has cnt >= 1 and the MLE term is
    well-defined; interpolation keeps mass on the unigram backoff exactly
    as JM smoothing prescribes.

    Output: (doc_id, n_tok, nll) with nll rounded to 6 places.

    Scale shape: one posexplode, a per-doc lag window (partitioned by
    doc_id — doc-bounded, fully parallel), bigram + unigram count tables
    via map-side-combined groupBys, then joins back on tok / (prev, tok) —
    all linear hash shuffles on high-cardinality keys; the (N, V) totals
    are a broadcast 1-row aggregate.
    """
    from pyspark.sql import Window

    toks = df.select(
        "doc_id", F.posexplode(tokens_col(text_col)).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = toks.withColumn("prev", F.lag("tok").over(w))
    uni = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    totals = uni.agg(
        F.sum("cnt").alias("n_total"), F.count("*").alias("v_total")
    )
    big = (
        pairs.filter(F.col("prev").isNotNull())
        .groupBy("prev", "tok")
        .agg(F.count("*").alias("bcnt"))
    )
    prev_cnt = uni.select(
        F.col("tok").alias("prev"), F.col("cnt").alias("pcnt")
    )
    scored = (
        pairs.join(uni, "tok")
        .join(big, ["prev", "tok"], "left")
        .join(prev_cnt, "prev", "left")
        .crossJoin(F.broadcast(totals))
    )
    p_uni = (F.col("cnt") + F.lit(1)).cast("double") / (
        F.col("n_total") + F.col("v_total")
    ).cast("double")
    p_bi = F.col("bcnt").cast("double") / F.col("pcnt").cast("double")
    p = F.when(
        F.col("prev").isNull(), p_uni
    ).otherwise(F.lit(float(lam)) * p_bi + F.lit(1.0 - float(lam)) * p_uni)
    return (
        scored.select("doc_id", (-F.log(p)).alias("tok_nll"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.round(F.avg("tok_nll"), 6).alias("nll"),
        )
    )


def bigram_nll_sql(lam: float = 0.7) -> str:
    toks = TOKENS_SQL.format(t="text")
    return f"""
WITH t AS (
  SELECT doc_id, unnest({toks}) AS tok,
         generate_subscripts({toks}, 1) AS pos
  FROM documents
), p AS (
  SELECT doc_id, pos, tok,
         lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM t
), c AS (
  SELECT tok, count(*) AS cnt FROM t GROUP BY tok
), tot AS (
  SELECT sum(cnt) AS n_total, count(*) AS v_total FROM c
), b AS (
  SELECT prev, tok, count(*) AS bcnt FROM p WHERE prev IS NOT NULL
  GROUP BY prev, tok
)
SELECT p.doc_id, count(*) AS n_tok,
       round(avg(-ln(CASE WHEN p.prev IS NULL
         THEN (c.cnt + 1) * 1.0 / (tot.n_total + tot.v_total)
         ELSE {float(lam)} * b.bcnt * 1.0 / pc.cnt
              + {1.0 - float(lam)} * (c.cnt + 1) * 1.0
                / (tot.n_total + tot.v_total)
       END)), 6) AS nll
FROM p
JOIN c USING (tok)
LEFT JOIN b ON b.prev = p.prev AND b.tok = p.tok
LEFT JOIN c pc ON pc.tok = p.prev
CROSS JOIN tot
GROUP BY p.doc_id
"""


def tokens_entropy_columns(
    df: DataFrame, tokens_col_name: str = "tokens", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document distributional profile of a PRE-TOKENIZED sequence —
    the loader-side quality gate over the input_hint payload (doc_id,
    tokens array<int>), no raw text needed: distinct-token ratio, Shannon
    entropy of the doc's own token histogram (nats), and the highest
    single-token frequency share (a degenerate-repetition detector — a
    doc that is one token over and over has entropy 0 and top_frac 1).

    Output: (doc_id, n_tok, n_distinct, distinct_ratio, entropy, top_frac),
    ratios rounded to 6.

    Scale shape: explode → ONE (doc_id, tok) map-side-combined count →
    ONE doc_id agg. Both shuffles carry (id, tok/cnt) pairs; per-doc
    histograms never materialize as arrays.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.col(tokens_col_name)).alias("tok"),
    )
    counts = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("cnt"))
    n = F.sum("cnt")
    p = F.col("cnt").cast("double")
    return (
        counts.groupBy("doc_id")
        .agg(
            n.alias("n_tok"),
            F.count("*").alias("n_distinct"),
            F.sum(p * F.log(p)).alias("_sum_clogc"),
            F.max("cnt").alias("_max_cnt"),
        )
        .select(
            "doc_id",
            F.col("n_tok").cast("long").alias("n_tok"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            F.round(F.col("n_distinct") / F.col("n_tok"), 6).alias(
                "distinct_ratio"
            ),
            # H = ln(n) - (1/n) * sum(c * ln c): one pass, no per-token join
            F.round(
                F.log(F.col("n_tok").cast("double"))
                - F.col("_sum_clogc") / F.col("n_tok"),
                6,
            ).alias("entropy"),
            F.round(F.col("_max_cnt") / F.col("n_tok"), 6).alias("top_frac"),
        )
    )


def tokens_entropy_sql(tokens_sql: str, table: str = "documents") -> str:
    """DuckDB oracle over the same derived token arrays; `tokens_sql` is a
    SQL expression producing the array<int> per row of `table`."""
    return f"""
WITH t AS (
  SELECT doc_id, unnest({tokens_sql}) AS tok FROM {table}
), c AS (
  SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY doc_id, tok
)
SELECT doc_id,
       cast(sum(cnt) AS BIGINT) AS n_tok,
       count(*) AS n_distinct,
       round(count(*) * 1.0 / sum(cnt), 6) AS distinct_ratio,
       round(ln(sum(cnt)) - sum(cnt * ln(cnt)) / sum(cnt), 6) AS entropy,
       round(max(cnt) * 1.0 / sum(cnt), 6) AS top_frac
FROM c GROUP BY doc_id
"""


# Gopher document-level quality rules (Rae et al. 2021, "Scaling Language
# Models", table A1) — the MassiveText pre-training filter. Each rule is a
# per-row boolean over native column expressions (no shuffle, no UDF);
# `gopher_keep` is their conjunction. Thresholds are the published ones,
# except the word-count floor (50 → 10) so the small synthetic corpus
# exercises both branches of every rule.
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS = 10
GOPHER_MAX_WORDS = 100_000


def gopher_rules_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher rule table: word count bounds, mean word length in [3, 10],
    symbol-to-word ratios (# and ...), bullet-started / ellipsis-ended line
    fractions, alphabetic-word fraction >= 0.8, >= 2 required stop words.
    Divisions guard empty docs with greatest(n, 1) (mirrored in the oracle).
    """
    t = F.col(text_col)
    toks = tokens_col(text_col)
    lines = F.split(t, "\n")
    n_words = F.size(toks)
    n_lines = F.size(lines)
    dw = F.greatest(n_words, F.lit(1))
    dl = F.greatest(n_lines, F.lit(1))
    mean_wl = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    ) / dw
    n_hash = F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
    n_ellip = (F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))) / 3
    bullet = F.size(F.filter(lines, lambda x: F.trim(x).rlike(r"^[-*•]")))
    ell_end = F.size(F.filter(lines, lambda x: F.trim(x).endswith("...")))
    alpha_w = F.size(F.filter(toks, lambda x: x.rlike(r"[a-z]")))
    req = F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS])
    n_req = F.size(F.filter(req, lambda w: F.array_contains(toks, w)))
    rules = {
        "r_word_count": (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS),
        "r_mean_word_len": (mean_wl >= 3) & (mean_wl <= 10),
        "r_symbol_ratio": (n_hash / dw <= 0.1) & (n_ellip / dw <= 0.1),
        "r_bullet_lines": bullet / dl <= 0.9,
        "r_ellipsis_lines": ell_end / dl <= 0.3,
        "r_alpha_words": alpha_w / dw >= 0.8,
        "r_stop_words": n_req >= 2,
    }
    keep = None
    for c in rules.values():
        keep = c if keep is None else (keep & c)
    return df.select(
        "doc_id",
        n_words.cast("long").alias("n_words_g"),
        F.round(mean_wl, 6).alias("mean_wl_g"),
        F.round(alpha_w / dw, 6).alias("alpha_word_frac"),
        F.round(n_req.cast("double"), 6).alias("n_required_sw"),
        *[c.cast("int").alias(name) for name, c in rules.items()],
        keep.cast("int").alias("gopher_keep"),
    )


def gopher_rules_sql() -> str:
    """DuckDB oracle for gopher_rules_columns — same tokenization
    (TOKENS_SQL), same chr(10) line split, same guards and rounding."""
    toks = TOKENS_SQL.format(t="text")
    req = ", ".join(f"'{w}'" for w in GOPHER_REQUIRED_WORDS)
    return f"""
WITH t AS (
  SELECT doc_id, text, {toks} AS toks, string_split(text, chr(10)) AS lines
  FROM documents
), m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         greatest(len(toks), 1) AS dw,
         greatest(len(lines), 1) AS dl,
         coalesce(list_sum(list_transform(toks, x -> length(x))), 0) * 1.0
           / greatest(len(toks), 1) AS mean_wl,
         length(text) - length(replace(text, '#', '')) AS n_hash,
         (length(text) - length(replace(text, '...', ''))) / 3.0 AS n_ellip,
         len(list_filter(lines, x -> regexp_matches(trim(x), '^[-*•]')))
           AS bullet,
         len(list_filter(lines, x -> ends_with(trim(x), '...'))) AS ell_end,
         len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS alpha_w,
         len(list_filter([{req}], w -> list_contains(toks, w))) AS n_req
  FROM t
), r AS (
  SELECT doc_id, n_words, mean_wl, alpha_w, dw, dl, n_req,
         (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})
           AS r_word_count,
         (mean_wl >= 3 AND mean_wl <= 10) AS r_mean_word_len,
         (n_hash * 1.0 / dw <= 0.1 AND n_ellip / dw <= 0.1) AS r_symbol_ratio,
         (bullet * 1.0 / dl <= 0.9) AS r_bullet_lines,
         (ell_end * 1.0 / dl <= 0.3) AS r_ellipsis_lines,
         (alpha_w * 1.0 / dw >= 0.8) AS r_alpha_words,
         (n_req >= 2) AS r_stop_words
  FROM m
)
SELECT doc_id, n_words::BIGINT AS n_words_g,
       round(mean_wl, 6) AS mean_wl_g,
       round(alpha_w * 1.0 / dw, 6) AS alpha_word_frac,
       round(n_req * 1.0, 6) AS n_required_sw,
       r_word_count::BIGINT AS r_word_count,
       r_mean_word_len::BIGINT AS r_mean_word_len,
       r_symbol_ratio::BIGINT AS r_symbol_ratio,
       r_bullet_lines::BIGINT AS r_bullet_lines,
       r_ellipsis_lines::BIGINT AS r_ellipsis_lines,
       r_alpha_words::BIGINT AS r_alpha_words,
       r_stop_words::BIGINT AS r_stop_words,
       (r_word_count AND r_mean_word_len AND r_symbol_ratio AND r_bullet_lines
        AND r_ellipsis_lines AND r_alpha_words AND r_stop_words)::BIGINT
         AS gopher_keep
FROM r
"""
