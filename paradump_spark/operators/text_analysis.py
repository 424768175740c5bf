"""Text-analysis operators over a documents table — beyond-reference
LLM-pipeline surface: quality scoring, language-ID, token counting,
document fingerprinting.

All per-row projections built from functions.text — no shuffle, no UDFs;
they fuse into the scan and read only the ``text`` column (column-pruned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from paradump_spark.functions import text as TX


def text_quality(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Quality features per document: token counts, mean token length,
    stopword/alpha/digit/punct ratios.  Ratios rounded to 6 decimals so
    downstream hashing is stable across engines."""
    t = TX.tokens(text_col)
    n_tok = F.size(t)
    sum_len = F.aggregate(
        F.transform(t, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        TX.bpe_token_count(text_col).cast("long").alias("n_bpe_tokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.round(
            F.when(n_tok > 0, sum_len.cast("double") / n_tok).otherwise(F.lit(0.0)), 6
        ).alias("mean_token_len"),
        F.round(TX.stopword_ratio(text_col), 6).alias("stopword_ratio"),
        F.round(TX.char_class_ratio(text_col, "[A-Za-z]"), 6).alias("alpha_ratio"),
        F.round(TX.char_class_ratio(text_col, "[0-9]"), 6).alias("digit_ratio"),
        F.round(TX.char_class_ratio(text_col, "[ ]"), 6).alias("space_ratio"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_alpha_ratio: float = 0.5,
    max_stopword_ratio: float = 0.9,
) -> DataFrame:
    """Keep documents passing the standard quality gates — the filter form
    of :func:`text_quality`, pushed into the scan as plain predicates."""
    n_tok = F.size(TX.tokens(text_col))
    return df.where(
        (n_tok >= min_tokens)
        & (n_tok <= max_tokens)
        & (TX.char_class_ratio(text_col, "[A-Za-z]") >= min_alpha_ratio)
        & (TX.stopword_ratio(text_col) <= max_stopword_ratio)
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, lang_pred, per-language scores) via the stopword-hit heuristic."""
    scores = TX.lang_scores(text_col)
    return df.select(
        F.col(id_col),
        TX.lang_id(text_col).alias("lang_pred"),
        *[F.round(scores[lang], 6).alias(f"score_{lang}") for lang in scores],
    )


def repetition_ratios(
    df: DataFrame, id_col: str, text_col: str, ns: tuple[int, ...] = (2, 3)
) -> DataFrame:
    """Within-document repetition signals: for each ``n`` the fraction of
    duplicate word n-grams (``1 - distinct/total``), plus the duplicate-line
    fraction — the standard quality gates that catch boilerplate, keyword
    stuffing, and decode loops in crawled corpora.

    Pure array expressions over one row (no shuffle, no UDF): tokens →
    sliced n-grams → ``array_distinct`` cardinality.  Cost is linear in
    document length and fuses into the scan.
    """
    t = TX.tokens(text_col)
    cols = [F.col(id_col)]

    for n in ns:
        # shifted-slice fold, not transform(sequence, i -> slice(t,...)):
        # the latter re-tokenizes the document per gram (see
        # functions.text.ngram_fold)
        grams = F.when(
            F.size(t) >= n,
            TX.ngram_fold(t, n, F.size(t) - F.lit(n) + F.lit(1)),
        ).otherwise(F.array().cast("array<string>"))
        frac = F.when(
            F.size(grams) > 0,
            F.lit(1.0)
            - F.size(F.array_distinct(grams)).cast("double")
            / F.size(grams).cast("double"),
        ).otherwise(F.lit(0.0))
        cols.append(F.round(frac, 6).alias(f"dup_{n}gram_frac"))
    lines = F.split(F.col(text_col), "\n")
    line_frac = F.when(
        F.size(lines) > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(lines)).cast("double")
        / F.size(lines).cast("double"),
    ).otherwise(F.lit(0.0))
    cols.append(F.round(line_frac, 6).alias("dup_line_frac"))
    return df.select(*cols)


def token_stats(
    df: DataFrame, id_col: str, text_col: str, min_df: int = 1
) -> DataFrame:
    """Corpus vocabulary statistics: per token its total occurrence count
    (``tf``) and the number of distinct documents containing it (``df``)
    — the inputs to vocabulary construction and IDF-style rarity scores.

    One explode + one aggregation: ``tf`` is a plain count and ``df``
    counts distinct doc ids, both partial-aggregated map-side before the
    single token-keyed shuffle.  Tokens are whitespace tokens
    (``functions.text.tokens``); at 100 TB the token key space is large
    but uniform — no skew mitigation needed beyond AQE.
    """
    ex = df.select(
        F.col(id_col), F.explode(TX.tokens(text_col)).alias("token")
    )
    out = ex.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct(F.col(id_col)).alias("df"),
    )
    if min_df > 1:
        out = out.where(F.col("df") >= min_df)
    return out


def vocab_top_tokens(
    df: DataFrame, id_col: str, text_col: str, k: int = 100
) -> DataFrame:
    """The ``k`` most frequent tokens with deterministic tie-break
    (tf desc, token asc) and their ranks — top-k over the token-stats
    aggregate, i.e. a tiny second shuffle after the big one."""
    stats = token_stats(df, id_col, text_col)
    return (
        stats.orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(k)
        .select(
            F.row_number()
            .over(
                Window.orderBy(F.col("tf").desc(), F.col("token").asc())
            )
            .cast("long")
            .alias("rank"),
            "token",
            "tf",
            "df",
        )
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Per-document top-``k`` terms by TF-IDF (smoothed:
    ``tf_doc · (ln((N+1)/(df+1)) + 1)``), ties broken by term asc —
    the per-document keyword extractor.

    Plan: one token-keyed shuffle for the corpus ``df`` counts (partial
    map-side), a co-partitioned join of per-(doc, token) counts against
    them on the same key, then one doc-keyed aggregation whose top-``k``
    cut is an ``array_sort``+``slice`` AGGREGATE (combinable — no
    per-doc window, and a doc bounds its own term list, so no skew
    funnel).  Scores round to 6 decimals for engine-stable hashing.
    """
    n_docs = df.count()  # plan-time scalar; one cheap count job
    tok = df.select(F.col(id_col), F.explode(TX.tokens(text_col)).alias("token"))
    doc_tf = tok.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("tf_doc")
    )
    corpus_df = tok.groupBy("token").agg(
        F.count_distinct(F.col(id_col)).alias("df")
    )
    idf = F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = doc_tf.join(corpus_df, "token").select(
        F.col(id_col),
        "token",
        F.round(F.col("tf_doc") * idf, 6).alias("tfidf"),
    )
    ranked = (
        scored.groupBy(id_col)
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct((-F.col("tfidf")).alias("neg"), "token"))
                ),
                1,
                k,
            ).alias("top")
        )
        .select(
            F.col(id_col),
            F.posexplode("top").alias("pos0", "t"),
        )
    )
    return ranked.select(
        id_col,
        (F.col("pos0") + 1).cast("long").alias("rank"),
        F.col("t.token").alias("token"),
        (-F.col("t.neg")).alias("tfidf"),
    )


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fingerprint, content_md5) — rolling-hash + exact-hash identities."""
    return df.select(
        F.col(id_col),
        TX.fingerprint(text_col).alias("fingerprint"),
        F.md5(F.col(text_col)).alias("content_md5"),
    )


def source_quality_report(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Per-source quality dashboard: document/token/char volume and mean
    stopword/alpha ratios by ``group_col`` — the monitoring view a
    curation pipeline watches per ingest source.

    One partially-aggregated pass.  Means accumulate the 6-dp-rounded
    per-doc ratios as exact DECIMAL sums before the divide, so the
    result is order-independent and engine-reproducible (same trick as
    `operators.lm`).
    """
    t = TX.tokens(text_col)
    per_doc = df.select(
        F.col(group_col).alias("source"),
        F.size(t).cast("long").alias("__n_tokens"),
        F.length(F.col(text_col)).cast("long").alias("__n_chars"),
        F.round(TX.stopword_ratio(text_col), 6)
        .cast("decimal(20,6)")
        .alias("__sw"),
        F.round(TX.char_class_ratio(text_col, "[A-Za-z]"), 6)
        .cast("decimal(20,6)")
        .alias("__al"),
    )
    n = F.count(F.lit(1))
    return per_doc.groupBy("source").agg(
        n.alias("n_docs"),
        F.sum("__n_tokens").alias("n_tokens"),
        F.sum("__n_chars").alias("n_chars"),
        F.round(F.sum("__sw").cast("double") / n, 6).alias(
            "mean_stopword_ratio"
        ),
        F.round(F.sum("__al").cast("double") / n, 6).alias(
            "mean_alpha_ratio"
        ),
    )
