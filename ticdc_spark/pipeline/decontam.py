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

from pyspark.sql import DataFrame, Window
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


def mix_sample(
    docs: DataFrame,
    alpha: float = 0.5,
    key_col: str = "doc_id",
    stratum_col: str = "source",
    denom: int = 1_000_000,
) -> DataFrame:
    """Temperature-based dataset mixing (the multilingual-sampling rule of
    Conneau & Lample 2019, standard for balancing pre-training mixtures):
    downsample each stratum so the kept mixture is proportional to
    count^alpha. Keep probability per stratum s:

        p_s = (c_s / c_min) ^ (alpha - 1)      (c_min's stratum keeps all)

    applied as a DETERMINISTIC hash threshold h60(key) % denom < floor(p_s *
    denom) — reproducible across runs and engines, no rand(). Returns a
    per-stratum summary (stratum, n_docs, keep_thresh, n_kept).

    Scale shape: one map-side-combined groupBy for the counts (the stratum
    table is tiny and broadcast back), one broadcast join + filter over the
    corpus — no corpus-wide shuffle at all.

    For oracle-exact cross-engine floats use alpha = 0.5: p_s is then
    sqrt(c_min/c_s), and IEEE 754 requires division and sqrt to be correctly
    rounded, so Spark (JVM) and DuckDB produce bit-identical thresholds.
    Other alphas go through pow(), which is NOT required to be correctly
    rounded — fine in production, not for a bit-exact oracle.
    """
    counts = docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").alias("n_docs")
    )
    # global min via broadcast crossJoin, not a partitionBy() window — the
    # counts table is O(strata) rows either way, but this keeps the plan
    # free of SinglePartition exchanges (and reuses the one counts shuffle)
    c_min = F.col("_cmin")
    if alpha == 0.5:
        p = F.sqrt(c_min / F.col("n_docs"))
    else:
        p = F.pow(F.col("n_docs") / c_min, F.lit(alpha - 1.0))
    with_thresh = counts.crossJoin(
        F.broadcast(counts.agg(F.min("n_docs").alias("_cmin")))
    ).select(
        "stratum", "n_docs", F.floor(p * denom).cast("long").alias("keep_thresh")
    )
    kept = (
        docs.select(
            F.col(stratum_col).alias("stratum"),
            (h60(F.col(key_col).cast("string")) % denom).alias("h"),
        )
        .join(F.broadcast(with_thresh), "stratum")
        .filter(F.col("h") < F.col("keep_thresh"))
        .groupBy("stratum")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        with_thresh.join(kept, "stratum", "left")
        .select(
            "stratum",
            "n_docs",
            "keep_thresh",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        )
    )


def stratified_topn(
    docs: DataFrame,
    n: int,
    strata: tuple[str, ...] = ("lang", "source"),
    key_col: str = "doc_id",
    seed: int = 0,
    safety: int = 4,
) -> DataFrame:
    """Exact per-stratum quota sample: the n docs with the smallest seeded
    hash inside every stratum — deterministic balanced subsets per
    (lang, source, ...) cell, the stratified-eval/ablation op (re-running
    with another seed redraws; same seed is bit-identical).

    Scale shape: NOT one window over the corpus — a 10^9-row stratum would
    be a single straggler task. The seeded h60 is uniform, so a stratum's
    n-th smallest hash concentrates near (n/N_s)·2^60:
      1. per-stratum counts (one map-side-combined agg, O(strata) rows)
      2. map-only prefilter against broadcast per-stratum thresholds
         safety·(n/N_s)·2^60 — the corpus never shuffles, survivors are
         ~safety·n per stratum
      3. exact row_number window over the tiny survivor set
    The prefilter is verified, not trusted: if any stratum kept fewer than
    min(n, N_s) rows (Chernoff-tail event), its threshold doubles and the
    pass repeats — the final window is exact top-n regardless.

    Output: (key_col, *strata, rank) with rank in 1..n per stratum.
    """
    skey = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in strata])
    h = h60(
        F.concat_ws(
            "\x1f", F.lit(str(seed)), F.col(key_col).cast("string")
        )
    )
    base = docs.select(
        key_col, *strata, skey.alias("_sk"), h.alias("_h")
    )
    counts = {
        r["_sk"]: int(r["c"])
        for r in base.groupBy("_sk").agg(F.count("*").alias("c")).collect()
    }
    full = 1 << 60
    factor = {sk: safety for sk in counts}
    while True:
        thr = {
            sk: full if counts[sk] <= n else min(
                full, (factor[sk] * n * full) // counts[sk] + 1
            )
            for sk in counts
        }
        thr_col = F.lit(full)
        for sk, t in thr.items():
            if t < full:
                thr_col = F.when(F.col("_sk") == sk, F.lit(t)).otherwise(thr_col)
        surv = base.filter(F.col("_h") < thr_col).localCheckpoint(eager=True)
        got = {
            r["_sk"]: int(r["c"])
            for r in surv.groupBy("_sk").agg(F.count("*").alias("c")).collect()
        }
        short = [
            sk for sk in counts
            if got.get(sk, 0) < min(n, counts[sk])
        ]
        if not short:
            break
        for sk in short:
            factor[sk] *= 2
    w = Window.partitionBy("_sk").orderBy(F.col("_h").asc(), F.col(key_col).asc())
    return (
        surv.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select(key_col, *strata, "rank")
    )


def stratified_topn_sql(
    n: int,
    strata: tuple[str, ...] = ("lang", "source"),
    seed: int = 0,
    table: str = "documents",
    key_col: str = "doc_id",
) -> str:
    """DuckDB oracle: the plain window form (the prefilter never changes
    the result, only where the work happens)."""
    from ..functions.hashing import h60_sql

    h = h60_sql(f"concat_ws(chr(31), '{seed}', cast({key_col} AS varchar))")
    cols = ", ".join(strata)
    return f"""
WITH h AS (
  SELECT {key_col}, {cols}, {h} AS hh FROM {table}
)
SELECT {key_col}, {cols}, rank FROM (
  SELECT {key_col}, {cols},
         row_number() OVER (PARTITION BY {cols}
                            ORDER BY hh ASC, {key_col} ASC)::BIGINT AS rank
  FROM h
) WHERE rank <= {n}
"""


def mix_sample_sql(denom: int = 1_000_000) -> str:
    """DuckDB oracle for mix_sample(alpha=0.5) — sqrt/division/floor only,
    all IEEE-correctly-rounded, so thresholds match Spark bit-for-bit."""
    from ..functions.hashing import h60_sql

    h = h60_sql("cast(doc_id AS varchar)")
    return f"""
WITH counts AS (
  SELECT source AS stratum, count(*) AS n_docs FROM documents GROUP BY source
), t AS (
  SELECT stratum, n_docs,
         cast(floor(sqrt((min(n_docs) OVER ()) * 1.0 / n_docs) * {denom}) AS bigint)
           AS keep_thresh
  FROM counts
), kept AS (
  SELECT d.source AS stratum, count(*) AS n_kept
  FROM documents d JOIN t ON t.stratum = d.source
  WHERE {h} % {denom} < t.keep_thresh
  GROUP BY d.source
)
SELECT t.stratum, t.n_docs, t.keep_thresh, coalesce(kept.n_kept, 0) AS n_kept
FROM t LEFT JOIN kept USING (stratum)
"""


def decontaminate_fuzzy(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    n_perms: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Fuzzy decontamination: flag training docs that are NEAR-duplicates
    of an eval/benchmark doc (MinHash-LSH candidates across the two sets,
    exact n-gram Jaccard verify >= threshold). Catches the paraphrased /
    lightly-edited contamination the exact n-gram rule (decontaminate)
    misses — the complement GPT-3/PaLM-style dedup-based decontamination
    applies alongside the 8-gram rule.

    Returns one row per training doc:
        (doc_id, n_eval_hits, max_jaccard, contaminated)

    Scale shape — identical to minhash_lsh_pairs but CROSS-set, which is
    strictly cheaper than the self-join:
      * both sides pay one explode + one K-min-agg groupBy (map-side
        combined; shuffle <= K longs per doc per partition);
      * the band join keys on (band_id, band_hash) and the eval side is
        tiny (10^3-10^6 docs), so AQE broadcasts it; candidates are
        (train, eval) pairs only — never train x train;
      * verify re-joins shingles for candidate pairs only. No broadcast
        HINTS anywhere (an adversarial eval set must not OOM the driver).
    """
    from .dedup import band_hash_exprs, minhash_signatures, shingles

    def banded(d: DataFrame, side: str) -> DataFrame:
        sig = minhash_signatures(d, n, n_perms, text_col)
        return sig.select(
            F.col("doc_id").alias(f"{side}_id"),
            F.posexplode(F.array(*band_hash_exprs(n_perms, bands))).alias(
                "band_id", "band_hash"
            ),
        )

    cand = (
        banded(docs, "train")
        .join(banded(eval_docs, "ev"), ["band_id", "band_hash"])
        .select("train_id", "ev_id")
        .distinct()
    )
    sh_t = shingles(docs, n, text_col).select(
        F.col("doc_id").alias("train_id"), "shingle"
    )
    sh_e = shingles(eval_docs, n, text_col).select(
        F.col("doc_id").alias("ev_id"), "shingle"
    )
    sizes_t = sh_t.groupBy("train_id").agg(F.count("*").alias("n_t"))
    sizes_e = sh_e.groupBy("ev_id").agg(F.count("*").alias("n_e"))
    inter = (
        cand.join(sh_t, "train_id")
        .join(sh_e, ["ev_id", "shingle"])
        .groupBy("train_id", "ev_id")
        .agg(F.count("*").alias("n_inter"))
    )
    hits = (
        inter.join(sizes_t, "train_id")
        .join(sizes_e, "ev_id")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_t") + F.col("n_e") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .groupBy("train_id")
        .agg(
            F.count("*").alias("n_eval_hits"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )
    return (
        docs.select(F.col("doc_id"))
        .join(hits, F.col("doc_id") == F.col("train_id"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_eval_hits"), F.lit(0)).alias("n_eval_hits"),
            F.coalesce(F.col("max_jaccard"), F.lit(0.0)).alias("max_jaccard"),
            (F.coalesce(F.col("n_eval_hits"), F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )


def dsir_select(
    docs: DataFrame,
    n_select: int = 100,
    target_source: str = "src0",
    n_buckets: int = 1024,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """DSIR — Data Selection with Importance Resampling (Xie et al. 2023):
    pick the raw-corpus docs whose hashed-n-gram distribution looks most
    like a small TARGET set (here: the ``target_source`` stratum plays the
    curated target, every other stratum is the raw pool).

      1. Features: unigrams + bigrams of whitespace tokens, hashed into
         ``n_buckets`` buckets (the paper's hashed n-gram generative model).
      2. Bag-of-buckets models with add-one smoothing for target and raw;
         each bucket's log-likelihood ratio
         llr(b) = ln( (cnt_t+1)(N_r+B) / ((cnt_r+1)(N_t+B)) ).
      3. Per-doc log importance weight = sum of llr over its gram
         occurrences (= log p_target(doc)/p_raw(doc) under the bag model).
      4. Gumbel-top-k resampling, derandomized: g = -ln(-ln(u)) with
         u = (h60(doc_id||'|dsir') % P + 1) / (P+1) — reproducible across
         engines/runs (no rand()), same trick as sample_deterministic.
         Select the n_select highest (logw + g).

    Returns the selected rows: (doc_id, n_grams, logw, score), floats
    rounded to 6 places for cross-engine comparison.

    Scale shape: the expensive subtree (explode + md5 bucket hash over
    every gram occurrence) runs ONCE, collapsed immediately to per-
    (doc, bucket) counts — a map-side-combined groupBy bounded by
    docs x min(n_buckets, grams-per-doc) — and localCheckpoint-ed, since
    both the bucket models and the per-doc weights read it (re-deriving it
    would re-hash the whole gram stream; the count table is ~1000x smaller
    than the gram stream it summarizes). The bucket llr table is n_buckets
    rows (broadcast join); the only other corpus-sized shuffle is the
    doc_id groupBy; the top-k is a TakeOrdered, never a single-partition
    global sort.
    """
    from ..functions.hashing import MERSENNE_P, h60

    toks = tokens_col(text_col)
    grams = F.concat(toks, word_ngrams(toks, 2))
    g = (
        docs.select(
            "doc_id",
            (F.col(source_col) == target_source).alias("is_t"),
            F.explode(grams).alias("gram"),
        )
        .filter(F.col("gram") != "")
        .select("doc_id", "is_t", (h60("gram") % n_buckets).alias("bucket"))
    )
    db = (
        g.groupBy("doc_id", "is_t", "bucket")
        .agg(F.count("*").alias("n"))
        .localCheckpoint()
    )
    c = db.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_t"), F.col("n")).otherwise(0)).alias("cnt_t"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(F.col("n"))).alias("cnt_r"),
    )
    tot = c.agg(F.sum("cnt_t").alias("n_t"), F.sum("cnt_r").alias("n_r"))
    lr = c.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.log(
            ((F.col("cnt_t") + 1) * (F.col("n_r") + n_buckets)).cast("double")
            / ((F.col("cnt_r") + 1) * (F.col("n_t") + n_buckets)).cast("double")
        ).alias("llr"),
    )
    w = (
        db.filter(~F.col("is_t"))
        .join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_grams"),
            F.sum(F.col("n") * F.col("llr")).alias("logw_raw"),
        )
    )
    u = (
        (h60(F.concat(F.col("doc_id").cast("string"), F.lit("|dsir"))) % MERSENNE_P + 1)
        .cast("double")
        / F.lit(float(MERSENNE_P + 1))
    )
    return (
        w.select(
            "doc_id",
            "n_grams",
            F.round("logw_raw", 6).alias("logw"),
            F.round(F.col("logw_raw") - F.log(-F.log(u)), 6).alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(n_select)
    )


def dsir_select_sql(
    n_select: int = 100, target_source: str = "src0", n_buckets: int = 1024
) -> str:
    """DuckDB oracle for :func:`dsir_select` — same hashing, smoothing,
    rounding, and (rounded-score, doc_id) selection order."""
    from ..functions.hashing import MERSENNE_P, h60_sql
    from ..functions.text import TOKENS_SQL, ngrams_sql

    toks = TOKENS_SQL.format(t="text")
    hu = h60_sql("concat(cast(doc_id AS varchar), '|dsir')")
    return f"""
WITH t AS (
  SELECT doc_id, source = '{target_source}' AS is_t, {toks} AS toks FROM documents
),
gi AS (
  SELECT doc_id, is_t,
         unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS i, toks
  FROM t
),
g AS (
  SELECT doc_id, is_t, unnest(toks) AS gram FROM t
  UNION ALL
  SELECT doc_id, is_t, {ngrams_sql(2, "toks")} AS gram FROM gi
),
b AS (
  SELECT doc_id, is_t, {h60_sql("gram")} % {n_buckets} AS bucket
  FROM g WHERE gram != ''
),
c AS (
  SELECT bucket,
         sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS cnt_t,
         sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS cnt_r
  FROM b GROUP BY bucket
),
tot AS (SELECT sum(cnt_t) AS n_t, sum(cnt_r) AS n_r FROM c),
lr AS (
  SELECT bucket,
         ln(((cnt_t + 1) * (n_r + {n_buckets})) * 1.0
            / ((cnt_r + 1) * (n_t + {n_buckets}))) AS llr
  FROM c CROSS JOIN tot
),
w AS (
  SELECT b.doc_id, count(*) AS n_grams, sum(lr.llr) AS logw_raw
  FROM b JOIN lr USING (bucket) WHERE NOT is_t GROUP BY b.doc_id
)
SELECT doc_id, n_grams, round(logw_raw, 6) AS logw,
       round(logw_raw - ln(-ln((({hu}) % {MERSENNE_P} + 1) * 1.0
                               / {float(MERSENNE_P + 1)})), 6) AS score
FROM w
ORDER BY score DESC, doc_id
LIMIT {n_select}
"""


def decontaminate_tokens(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    tokens_col_name: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination over PRE-TOKENIZED sequences (the
    input_hint payload): flag training docs sharing ANY token-ID n-gram
    with the eval set — the form labs actually run against tokenized
    training shards, where retokenizing raw text is off the table.
    Grams are space-joined token-id strings, so the rule is exact on ids
    (no text normalization ambiguity). Returns one row per training doc:
    (doc_id, n_hit_grams, contaminated).

    Scale shape: identical to the text form — eval grams are the SMALL
    side (distinct, broadcast); the training corpus streams through one
    explode + hash join + per-doc count, never shuffling the token
    payload itself.
    """
    from ..functions.text import word_ngrams

    def grams(df: DataFrame) -> DataFrame:
        toks = F.transform(
            F.col(tokens_col_name), lambda x: x.cast("string")
        )
        return df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_ngrams(toks, n)).alias("gram"),
        ).distinct()

    eval_grams = grams(eval_docs).select("gram").distinct()
    hits = (
        grams(docs)
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_grams"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hit_grams"), F.lit(0)).alias("n_hit_grams"),
            (F.coalesce(F.col("n_hit_grams"), F.lit(0)) > 0)
            .cast("int")
            .alias("contaminated"),
        )
    )


def decontaminate_tokens_oracle_sql(
    train_cte: str, eval_cte: str, n: int = 8
) -> str:
    """DuckDB oracle: `train_cte`/`eval_cte` each yield (doc_id, toks
    array<int>) / (toks array<int>); grams via 1-based list slicing."""
    g = (
        f"list_transform(range(0, len(toks) - {n} + 1), "
        f"s -> array_to_string(toks[s+1:s+{n}], ' '))"
    )
    return f"""
WITH tr AS ({train_cte}),
ev AS ({eval_cte}),
tg AS (
  SELECT DISTINCT doc_id, unnest({g}) AS gram FROM tr WHERE len(toks) >= {n}
),
eg AS (
  SELECT DISTINCT unnest({g}) AS gram FROM ev WHERE len(toks) >= {n}
),
h AS (
  SELECT tg.doc_id, count(*) AS n_hit_grams
  FROM tg JOIN eg USING (gram) GROUP BY tg.doc_id
)
SELECT tr.doc_id,
       coalesce(h.n_hit_grams, 0) AS n_hit_grams,
       (CASE WHEN coalesce(h.n_hit_grams, 0) > 0 THEN 1 ELSE 0 END)::BIGINT
         AS contaminated
FROM tr LEFT JOIN h USING (doc_id)
"""
