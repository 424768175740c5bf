"""Byte-pair-encoding vocabulary learning + corpus tokenization.

The engine's token accounting so far uses whitespace and a BPE-ish
regex (`functions.text.bpe_token_count`); training pipelines budget in
REAL subword tokens, so this module learns an actual BPE merge table
(Sennrich et al. 2016) and applies it corpus-wide.

Spark-first shape, mirroring how production tokenizers are actually
trained at corpus scale:

* **word_counts** — ONE partially-aggregated count job; the result is
  vocabulary-bounded (millions of rows, not corpus-sized).  This is the
  only corpus pass training needs: classic BPE trains on the word
  FREQUENCY table, not the raw text.
* **train_bpe** — driver-side pure Python over the (capped,
  deterministically ordered) word-count table — same bounded-sample
  precedent as the PQ codebooks and the linear classifier.  Ties break
  lexicographically so the merge table is reproducible run-to-run.
* **apply** — map-only Arrow-batched UDF with a per-batch word cache
  (real corpora are Zipfian: the cache hits almost always).  No
  shuffle; fuses into whatever scan feeds it.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf hints under PEP 563
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from paradump_spark.functions import text as TX

#: end-of-word sentinel (Sennrich convention) — lets merges distinguish
#: word-final subwords ("est</w>" in "widest" vs "est" in "estimate")
EOW = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over whitespace tokens — the single corpus pass BPE
    training needs."""
    return (
        docs.select(F.explode(TX.tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe(
    counts: DataFrame,
    num_merges: int = 200,
    min_pair_count: int = 2,
    train_cap: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` merges from a word-count table.

    ``train_cap`` bounds the driver-side table to the most frequent
    words (count desc, word asc — deterministic); Zipf's law makes the
    tail irrelevant to pair statistics.  Stops early when no pair
    reaches ``min_pair_count``.
    """
    rows = (
        counts.orderBy(F.desc("n"), F.asc("word")).limit(train_cap).collect()
    )
    # word → (symbol tuple, count)
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        sym = tuple(r["word"]) + (EOW,)
        vocab[sym] = vocab.get(sym, 0) + int(r["n"])

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        # max count, ties lexicographic — deterministic
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        a, b = best[0]
        merges.append((a, b))
        merged = a + b
        out: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            new = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    new.append(merged)
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            t = tuple(new)
            out[t] = out.get(t, 0) + n
        vocab = out
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word, lowest-rank pair first (the standard
    BPE apply order — identical to training order)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col``: the document's BPE token array.

    Arrow-batched, map-only; a per-batch word→tokens cache exploits the
    Zipfian distribution (each distinct word is encoded once per batch).
    """
    import re

    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}
    # Same whitespace convention as training (`TX.tokens`'s JVM `\s+`,
    # which is the ASCII class [ \t\n\x0B\f\r]) — Python's str.split()
    # would also break on Unicode whitespace (U+00A0, U+3000) and make
    # apply-time token streams diverge from the trained distribution.
    ws = re.compile("[ \t\n\x0b\f\r]+")

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def doc_tokens(t):
            if t is None:
                return []
            out = []
            for w in ws.split(t):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    cache[w] = got
                out.extend(got)
            return out

        return texts.map(doc_tokens)

    return docs.withColumn(out_col, enc(F.col(text_col)))


def bpe_token_count(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Append the learned-vocabulary token count — the budget number a
    trainer actually uses (`functions.text.bpe_token_count` is the
    regex approximation for engines without the merge table)."""
    enc = bpe_encode(docs, merges, text_col, "__bpe")
    return enc.withColumn(out_col, F.size("__bpe").cast("long")).drop("__bpe")
