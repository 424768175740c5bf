"""Interpolated bigram language-model scoring — the CCNet-style
"perplexity bucket" quality signal for corpus curation.

The reference engine has no text surface (SURVEY §2.8 is dialect
rendering); this extends the LLM-pipeline quality family
(`operators/quality_rules.py`, `operators/text_analysis.py`): where the
Gopher rules judge a document by surface statistics, an LM score judges
it by how *predictable* its token stream is under a model trained on a
trusted corpus — boilerplate and gibberish both land in the
high-bits-per-token tail (CCNet, Wenzek et al. 2020, buckets corpora by
exactly this signal).

Model: interpolated bigram with add-one-smoothed unigram backoff::

    P(cur | prev) = lam * c2(prev,cur)/c1(prev)
                  + (1-lam) * (c1(cur) + 1) / (N + V)

Per-document score = mean -log2 P over the document's bigrams ("bits per
token"); ``perplexity = 2^bits``.

Scale shape (100 TB corpus):

* **Training** is two partially-aggregated count jobs (unigrams,
  bigrams) — shuffles bounded by VOCABULARY and observed-bigram size,
  not corpus size; both collapse map-side first.  The model join that
  attaches c1(prev)/c1(cur) runs over the bigram table only.
* **Scoring** is per-row bigram explode → two joins against the model
  (broadcast when it fits — a few million bigrams is tens of MB;
  ``broadcast_model=False`` degrades to shuffle joins, mirroring
  `operators.decontam`'s gate) → one partially-aggregated per-doc mean.
  No Python anywhere; everything fuses into the scan.

Engine-reproducibility: the per-bigram log-probability is rounded to 9
decimals and summed as ``DECIMAL(38,9)`` — an EXACT, order-independent
accumulation — before the final divide, so the DuckDB oracle matches
bit-for-bit despite doubles being order-sensitive under ``avg``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from paradump_spark.functions import text as TX

#: interpolation weight on the bigram term
DEFAULT_LAM = 0.8


def _bigrams(toks: Column) -> Column:
    """Adjacent-token bigrams as ``array<struct<prev,cur>>`` (empty for
    <2 tokens).  Structs, not joined strings: tokens are only
    whitespace-free, so no separator char is collision-safe — the model
    joins on the (prev, cur) pair directly."""
    n = F.size(toks)
    pair = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    return F.when(n >= 2, pair).otherwise(
        F.array().cast("array<struct<prev:string,cur:string>>")
    )


def train_bigram_lm(
    docs: DataFrame, text_col: str = "text", lam: float = DEFAULT_LAM
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train on ``docs``; returns ``(model, backoff, floor)``.

    ``model``: (bigram, logp) — ln of the full interpolated probability
    for every OBSERVED bigram.  ``backoff``: (token, logp1) — ln of the
    unigram-only term for every vocabulary token, used when the bigram
    is unseen.  ``floor``: one row (logp_oov) — ln of the add-one floor
    ``(1-lam)/(N+V)`` for fully-OOV tokens.  All rounded to 9 decimals
    (see module docstring).

    The corpus-total token count N and vocabulary size V enter via a
    one-row cross join (broadcast) so training stays fully lazy — no
    driver collect.
    """
    toks = docs.select(TX.tokens(text_col).alias("toks"))
    uni = (
        toks.select(F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    stats = uni.agg(
        F.sum("c1").cast("double").alias("n_tokens"),
        F.count(F.lit(1)).cast("double").alias("vocab"),
    )
    bi = (
        toks.select(F.explode(_bigrams(F.col("toks"))).alias("bg"))
        .select(F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    model = (
        bi.join(
            F.broadcast(uni.withColumnRenamed("token", "prev").withColumnRenamed("c1", "c1_prev")),
            "prev",
        )
        .join(
            F.broadcast(uni.withColumnRenamed("token", "cur").withColumnRenamed("c1", "c1_cur")),
            "cur",
        )
        .crossJoin(F.broadcast(stats))
        .select(
            "prev",
            "cur",
            F.round(
                F.log(
                    F.lit(lam) * F.col("c2") / F.col("c1_prev")
                    + F.lit(1.0 - lam)
                    * (F.col("c1_cur") + 1.0)
                    / (F.col("n_tokens") + F.col("vocab"))
                ),
                9,
            ).alias("logp"),
        )
    )
    backoff = (
        uni.crossJoin(F.broadcast(stats))
        .select(
            "token",
            F.round(
                F.log(
                    F.lit(1.0 - lam)
                    * (F.col("c1") + 1.0)
                    / (F.col("n_tokens") + F.col("vocab"))
                ),
                9,
            ).alias("logp1"),
        )
    )
    floor = stats.select(
        F.round(
            F.log(F.lit(1.0 - lam) / (F.col("n_tokens") + F.col("vocab"))),
            9,
        ).alias("logp_oov")
    )
    return model, backoff, floor


def lm_score(
    docs: DataFrame,
    model: DataFrame,
    backoff: DataFrame,
    floor: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document (id_col, n_bigrams, bits_per_token).

    Seen bigram → the model's interpolated term; unseen bigram → the
    backoff unigram term for ``cur``; fully-OOV ``cur`` → the add-one
    floor row.  Documents with fewer than two tokens produce no bigrams
    and are absent from the result (no probability mass to judge).
    """
    exploded = docs.select(
        F.col(id_col),
        F.explode(_bigrams(TX.tokens(text_col))).alias("bg"),
    ).select(
        F.col(id_col),
        F.col("bg.prev").alias("prev"),
        F.col("bg.cur").alias("cur"),
    )
    m = F.broadcast(model) if broadcast_model else model
    b = F.broadcast(backoff) if broadcast_model else backoff
    scored = (
        exploded.join(m, ["prev", "cur"], "left")
        .join(b.withColumnRenamed("token", "cur"), "cur", "left")
        .crossJoin(F.broadcast(floor))
        .select(
            F.col(id_col),
            F.coalesce("logp", "logp1", "logp_oov").alias("lp"),
        )
    )
    ln2 = 0.6931471805599453
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.col("lp").cast("decimal(38,9)")).alias("_lp_sum"),
        )
        .select(
            F.col(id_col),
            F.col("n_bigrams"),
            F.round(
                -F.col("_lp_sum").cast("double")
                / F.col("n_bigrams")
                / F.lit(ln2),
                6,
            ).alias("bits_per_token"),
        )
    )


def self_perplexity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = DEFAULT_LAM,
    broadcast_model: bool = True,
) -> DataFrame:
    """Train on ``docs`` and score the SAME corpus (self-perplexity):
    the curation-ready outlier signal — documents whose token stream the
    corpus's own statistics cannot predict (spam, mojibake, tables) rank
    highest.  For CCNet-faithful filtering, train on a trusted corpus
    and call :func:`lm_score` with new data instead.
    """
    model, backoff, floor = train_bigram_lm(docs, text_col, lam)
    return lm_score(
        docs, model, backoff, floor, id_col, text_col, broadcast_model
    )


def perplexity_buckets(
    scores: DataFrame,
    id_col: str = "doc_id",
    bits_col: str = "bits_per_token",
    n_buckets: int = 3,
    method: str = "distributed",
) -> DataFrame:
    """CCNet's head/middle/tail split: rank documents by bits/token and
    cut into ``n_buckets`` equal-count buckets (1 = most predictable).

    ``method="distributed"`` (default) computes the EXACT ntile via
    `plans.ranking.global_ntile` — range-partitioned ranking plus the
    SQL fill rule, no single-partition window, so billions of scored
    documents never funnel through one task.  ``method="window"`` is
    the naive global-window spelling, kept as the tiny-frame /
    plan-parity reference; both return identical buckets because ties
    break by id (a total order).
    """
    if method == "window":
        from pyspark.sql import Window

        w = Window.orderBy(F.col(bits_col).asc(), F.col(id_col).asc())
        return scores.withColumn(
            "ppl_bucket", F.ntile(n_buckets).over(w).cast("int")
        )
    if method != "distributed":
        raise ValueError(f"method must be distributed or window, got {method!r}")
    from paradump_spark.plans.ranking import global_ntile

    out = global_ntile(
        scores,
        n_buckets,
        [F.col(bits_col).asc(), F.col(id_col).asc()],
        out_col="ppl_bucket",
    )
    return out.withColumn("ppl_bucket", F.col("ppl_bucket").cast("int"))
