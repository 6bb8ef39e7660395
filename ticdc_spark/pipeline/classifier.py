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
       (any_value(prior.prior) + sum(model.llr) > 0)::BIGINT AS nb_pred
FROM tk JOIN model USING (h) CROSS JOIN prior
GROUP BY tk.doc_id
"""


def nb_eval_auc(
    docs: DataFrame,
    pos_sources: tuple[str, ...] = ("src0",),
    text_col: str = "text",
    n_hash: int = N_HASH_DEFAULT,
    alpha: float = ALPHA_DEFAULT,
    range_partitions: int = 32,
) -> DataFrame:
    """Exact ROC-AUC of the NB quality score against the source weak label
    (the filter-evaluation step every quality pipeline needs before trusting
    a classifier's keep/drop decisions — Wenzek et al. 2020 validate their
    LM filter the same way, against held-out labels).

    Mann-Whitney with exact tie handling: AUC = P[score_pos > score_neg] +
    ½·P[tie]. 100-TB shape: NOT a global rank window over docs — scores are
    aggregated per DISTINCT value first (one map-side-combined shuffle,
    output ≤ |distinct scores| rows), the exclusive negative prefix comes
    from the deterministic range-partitioned prefix sum (pipeline.pack
    machinery — no sampling, no single partition), and the final fold is

        AUC = Σ_s  p_s · (cum_neg_below_s + n_s/2)  /  (P·N)

    Scores are the round-6 ``nb_llr_mean`` values, already proven
    bit-identical cross-engine by the `text_nb_quality` hash check — so tie
    groups agree exactly with the DuckDB oracle.

    Output: one row (n_pos, n_neg, n_scores, auc).
    """
    from .pack import _global_cumsum

    scored = nb_score(docs, pos_sources, text_col, n_hash, alpha)
    lab = docs.select(
        "doc_id", F.col("source").isin(*pos_sources).cast("int").alias("pos")
    )
    per_score = (
        scored.join(lab, "doc_id")
        .groupBy(F.col("nb_llr_mean").alias("s"))
        .agg(
            F.sum("pos").alias("p"),
            F.sum(F.lit(1) - F.col("pos")).alias("n"),
        )
    )
    cum = _global_cumsum(per_score, "n", ["s"], range_partitions)
    # inclusive cumsum − own n = negatives strictly below this score
    contrib = cum.select(
        "p",
        "n",
        (
            F.col("p").cast("double")
            * (
                (F.col("_cum") - F.col("n")).cast("double")
                + F.col("n").cast("double") / 2.0
            )
        ).alias("w"),
    )
    return contrib.agg(
        F.sum("p").cast("long").alias("n_pos"),
        F.sum("n").cast("long").alias("n_neg"),
        F.count("*").cast("long").alias("n_scores"),
        # single-class sample (no positives or no negatives): AUC is
        # undefined — explicit NULL, mirrored in nb_eval_auc_sql so the
        # oracle parity check cannot flake on degenerate pos_sources
        F.when(
            (F.sum("p") > 0) & (F.sum("n") > 0),
            F.round(F.sum("w") / (F.sum("p") * F.sum("n")).cast("double"), 6),
        ).alias("auc"),
    )


def nb_eval_auc_sql(
    pos_sources: tuple[str, ...] = ("src0",),
    n_hash: int = N_HASH_DEFAULT,
    alpha: float = ALPHA_DEFAULT,
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`nb_eval_auc` — same per-distinct-score fold
    (window over distinct scores, small by construction)."""
    score_sql = nb_score_sql(pos_sources, n_hash, alpha, table)
    inlist = ", ".join(f"'{s}'" for s in pos_sources)
    return f"""
WITH scored AS ({score_sql}),
lab AS (
  SELECT doc_id, (source IN ({inlist}))::int AS pos FROM {table}
),
per_score AS (
  SELECT s.nb_llr_mean AS s, sum(l.pos) AS p, sum(1 - l.pos) AS n
  FROM scored s JOIN lab l USING (doc_id)
  GROUP BY s.nb_llr_mean
),
cum AS (
  SELECT p, n,
         coalesce(sum(n) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM per_score
)
SELECT sum(p)::bigint AS n_pos, sum(n)::bigint AS n_neg,
       count(*)::bigint AS n_scores,
       CASE WHEN sum(p) > 0 AND sum(n) > 0
            THEN round(sum(p * (below + n / 2.0)) / (sum(p) * sum(n)), 6)
            END AS auc
FROM cum
"""


def nb_calibration(
    docs: DataFrame,
    pos_sources: tuple[str, ...] = ("src0",),
    n_buckets: int = 10,
    text_col: str = "text",
    n_hash: int = N_HASH_DEFAULT,
    alpha: float = ALPHA_DEFAULT,
    range_partitions: int = 32,
) -> DataFrame:
    """Score-decile calibration table: rank every doc by (score, doc_id) —
    the deterministic range-partitioned global rank, no single-partition
    window — cut into ``n_buckets`` equal rank slices, report each slice's
    positive fraction and mean score. A well-ordered filter shows frac_pos
    rising monotonically with the decile; flat deciles mean the score
    carries no signal there (where to put the keep threshold).

    Output: (bucket, n_docs, n_pos, frac_pos, mean_score) × n_buckets.
    """
    from .pack import rank_by

    scored = nb_score(docs, pos_sources, text_col, n_hash, alpha)
    lab = docs.select(
        "doc_id", F.col("source").isin(*pos_sources).cast("int").alias("pos")
    )
    base = scored.join(lab, "doc_id").select(
        "doc_id", F.col("nb_llr_mean").alias("s"), "pos"
    )
    ranked = rank_by(base, ["s", "doc_id"], range_partitions)
    n_total = ranked.agg(F.max("_rank").alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(n_total))
        .select(
            "s",
            "pos",
            F.expr(f"((_rank - 1) * {int(n_buckets)}) div _n")
            .cast("int")
            .alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("pos").cast("long").alias("n_pos"),
            F.round(F.sum("pos") / F.count("*"), 6).alias("frac_pos"),
            F.round(F.avg("s"), 6).alias("mean_score"),
        )
    )


def nb_calibration_sql(
    pos_sources: tuple[str, ...] = ("src0",),
    n_buckets: int = 10,
    n_hash: int = N_HASH_DEFAULT,
    alpha: float = ALPHA_DEFAULT,
    table: str = "documents",
) -> str:
    """DuckDB oracle for :func:`nb_calibration` — row_number over the same
    (score, doc_id) total order, same integer bucket cut."""
    score_sql = nb_score_sql(pos_sources, n_hash, alpha, table)
    inlist = ", ".join(f"'{s}'" for s in pos_sources)
    return f"""
WITH scored AS ({score_sql}),
lab AS (
  SELECT doc_id, (source IN ({inlist}))::int AS pos FROM {table}
),
r AS (
  SELECT s.nb_llr_mean AS s, l.pos,
         row_number() OVER (ORDER BY s.nb_llr_mean, s.doc_id) AS rank,
         count(*) OVER () AS n_total
  FROM scored s JOIN lab l USING (doc_id)
)
SELECT (((rank - 1) * {int(n_buckets)}) // n_total)::BIGINT AS bucket,
       count(*)::bigint AS n_docs, sum(pos)::bigint AS n_pos,
       round(sum(pos) * 1.0 / count(*), 6) AS frac_pos,
       round(avg(s), 6) AS mean_score
FROM r
GROUP BY 1
"""


class IncrementalNB:
    """CDC-maintained NB quality classifier over a documents LakeTable —
    the streaming sibling of :func:`nb_train`: the (h → cp, cn) count table
    and the class doc-counts are EXACTLY additive under the changelog
    algebra, so per epoch the model updates from the changed keys' old
    images (counts out) and new images (counts in), never by re-reading the
    corpus. Same derived-state primitive as lake.verify.IncrementalChecksum
    (version-pinned old-image lookups via lake.verify.change_images), same
    fall-back rule: a non-append-only range (truncate / modify-column /
    compaction) triggers ONE full retrain at the target version.

    Invariant (tested incl. deletes, updates, redelivery, reopen):

        model() ≡ nb_train(live docs at the synced version)

    State: ``<table>/_nb/meta.json`` (atomic tmp+replace; version-stamped —
    re-syncing a covered range is a no-op) + a counts parquet snapshot per
    synced version (the model is bounded by n_hash rows, a few MB, so the
    snapshot rewrite is O(model), not O(corpus)).
    """

    def __init__(
        self,
        table,
        pos_sources: tuple[str, ...],
        text_col: str = "text",
        source_col: str = "source",
        n_hash: int = N_HASH_DEFAULT,
        alpha: float = ALPHA_DEFAULT,
    ):
        import json
        import os

        self.table = table
        self.spark = table.spark
        self.pos_sources = tuple(pos_sources)
        self.text_col = text_col
        self.source_col = source_col
        self.n_hash = int(n_hash)
        self.alpha = float(alpha)
        self.root = os.path.join(table.root, "_nb")
        os.makedirs(os.path.join(self.root, "counts"), exist_ok=True)
        self._meta_path = os.path.join(self.root, "meta.json")
        self.meta = {"version": 0, "np": 0, "nn": 0, "counts": None}
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                self.meta = json.load(f)

    # -- internals -----------------------------------------------------------
    def _is_pos(self):
        return F.col(self.source_col).isin(*self.pos_sources)

    def _count_frame(self, df: DataFrame) -> DataFrame:
        """(h, cp, cn) token-occurrence counts of df's rows."""
        return (
            df.select(
                self._is_pos().cast("long").alias("pos"),
                F.explode(tokens_col(self.text_col)).alias("tok"),
            )
            .select(
                "pos", (h60(F.col("tok")) % F.lit(self.n_hash)).alias("h")
            )
            .groupBy("h")
            .agg(
                F.sum("pos").alias("cp"),
                F.sum(F.lit(1) - F.col("pos")).alias("cn"),
            )
        )

    def _doc_counts(self, df: DataFrame) -> tuple[int, int]:
        r = df.agg(
            F.sum(self._is_pos().cast("long")).alias("np"),
            F.sum((~self._is_pos()).cast("long")).alias("nn"),
        ).collect()[0]
        return int(r["np"] or 0), int(r["nn"] or 0)

    def _counts_df(self) -> DataFrame:
        import os

        if self.meta["counts"] is None:
            return self.spark.createDataFrame(
                [], "h long, cp long, cn long"
            )
        return self.spark.read.parquet(
            os.path.join(self.root, "counts", self.meta["counts"])
        )

    def _write_counts(self, counts: DataFrame, version: int) -> None:
        import json
        import os

        name = f"v{version:08d}"
        out = os.path.join(self.root, "counts", name)
        # the model is bounded by n_hash rows — one output file is right
        counts.coalesce(1).write.mode("overwrite").parquet(out)
        self.meta["counts"] = name
        self.meta["version"] = version
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.meta, f, indent=1, sort_keys=True)
        os.replace(tmp, self._meta_path)

    def _live(self, df: DataFrame) -> DataFrame:
        return df.filter(F.col("op") != "D")

    # -- maintenance -----------------------------------------------------------
    def sync(self, max_lookup_keys: int = 100_000) -> dict:
        from ..lake.verify import change_images, range_is_append_only

        t = self.table
        v1 = int(t._manifest["version"])
        v0 = int(self.meta["version"])
        if v1 <= v0:
            return {"synced": False, "version": v0}
        if self.meta["counts"] is None or not range_is_append_only(t, v0, v1):
            live = t.read_version(v1)
            np_, nn = self._doc_counts(live)
            self.meta["np"], self.meta["nn"] = np_, nn
            self._write_counts(self._count_frame(live), v1)
            return {"synced": True, "version": v1, "mode": "full"}
        old, merged, n_changed = change_images(t, v0, v1, max_lookup_keys)
        if n_changed == 0:
            self._write_counts(self._counts_df(), v1)
            return {"synced": True, "version": v1, "mode": "empty"}
        old_live = self._live(old).localCheckpoint(eager=True)
        new_live = self._live(merged).localCheckpoint(eager=True)
        minus = self._count_frame(old_live).select(
            "h", (-F.col("cp")).alias("cp"), (-F.col("cn")).alias("cn")
        )
        plus = self._count_frame(new_live)
        counts = (
            self._counts_df()
            .unionByName(plus)
            .unionByName(minus)
            .groupBy("h")
            .agg(F.sum("cp").alias("cp"), F.sum("cn").alias("cn"))
            .filter((F.col("cp") != 0) | (F.col("cn") != 0))
        )
        d_np, d_nn = self._doc_counts(new_live)
        o_np, o_nn = self._doc_counts(old_live)
        self.meta["np"] += d_np - o_np
        self.meta["nn"] += d_nn - o_nn
        self._write_counts(counts, v1)
        return {
            "synced": True,
            "version": v1,
            "mode": "incremental",
            "changed_keys": n_changed,
        }

    # -- the model -------------------------------------------------------------
    def model(self) -> DataFrame:
        """(h, llr) from the maintained counts — same formula as nb_train;
        the class token totals derive from the counts table itself (one
        bounded aggregate), so they can never drift from it."""
        counts = self._counts_df()
        totals = counts.agg(
            F.sum("cp").alias("tp"), F.sum("cn").alias("tn")
        )
        a, hh = self.alpha, float(self.n_hash)
        return counts.crossJoin(F.broadcast(totals)).select(
            "h",
            (
                F.log((F.col("cp") + F.lit(a)) / (F.col("tp") + F.lit(a * hh)))
                - F.log((F.col("cn") + F.lit(a)) / (F.col("tn") + F.lit(a * hh)))
            ).alias("llr"),
        )

    def prior(self) -> float:
        import math

        return math.log(self.meta["np"]) - math.log(self.meta["nn"])

    def verify(self) -> list[str]:
        """Maintained counts + doc counts vs a full recount at the synced
        version — [] ⟺ consistent (the audit path)."""
        live = self.table.read_version(int(self.meta["version"]))
        want = self._count_frame(live)
        got = self._counts_df()
        bad = (
            want.withColumnRenamed("cp", "wcp")
            .withColumnRenamed("cn", "wcn")
            .join(got, "h", "full_outer")
            .filter(
                (F.coalesce("wcp", F.lit(0)) != F.coalesce("cp", F.lit(0)))
                | (F.coalesce("wcn", F.lit(0)) != F.coalesce("cn", F.lit(0)))
            )
            .count()
        )
        errs = [f"{bad} feature-count mismatches"] if bad else []
        np_, nn = self._doc_counts(live)
        if (np_, nn) != (self.meta["np"], self.meta["nn"]):
            errs.append(
                f"doc counts: full=({np_},{nn}) "
                f"maintained=({self.meta['np']},{self.meta['nn']})"
            )
        return errs
