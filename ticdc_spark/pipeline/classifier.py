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
