"""Text-analysis expressions for the LLM-data-pipeline operators.

All pure ``pyspark.sql.functions`` expressions (JVM-side, codegen-friendly;
no Python UDFs).  Hash-dependent pieces (MinHash, SimHash, fingerprints) are
built on ``md5`` of UTF-8 strings so any engine — including the DuckDB
correctness oracle — reproduces identical values.

Scale notes (100 TB): every function here is a narrow per-row projection —
no shuffle, no driver traffic; they fuse into whatever scan feeds them and
are column-pruned to ``text`` only.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^31 - 1; keeps the rolling-hash accumulator far from BIGINT overflow
# (acc < 2^31, acc*31 + 0x10FFFF < 2^36).
FINGERPRINT_MOD = 2147483647

# Small per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Deliberately tiny: the operator demonstrates the scoring
# mechanism; swap in real lists for production use.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "you", "that"],
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "mit", "ein", "zu"],
    "es": ["el", "los", "y", "es", "un", "una", "en", "que", "por", "con"],
    "fr": ["le", "les", "et", "est", "dans", "une", "pour", "que", "qui", "sur"],
    "zh": ["de", "le", "shi", "bu", "wo", "ni", "ta", "men", "zai", "you"],
}

# Word-ish tokens or single punctuation marks — a BPE-ish pre-tokenizer.
# Explicit ASCII classes so Java regex (Spark) and RE2 (DuckDB) agree.
BPE_TOKEN_RE = "[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of ``col``, empty-string-free."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), "\\s+"), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    """Token count under the BPE-ish regex (words + punctuation marks)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Overlapping ``n``-word shingles (space-joined) of the token stream.

    A document with fewer than ``n`` tokens yields one shingle holding all
    its tokens, so no document silently drops out of MinHash.

    Formulated as ``zip_with`` over ``n`` shifted slices of the token
    array, NOT as ``transform(sequence(1,k), i -> slice(t, i, n))``: a
    non-lambda-variable expression inside a higher-order-function body is
    re-evaluated PER ELEMENT (Catalyst's common-subexpression elimination
    does not cross lambda boundaries), so the transform form re-tokenizes
    the whole document once per shingle — O(tokens²) per document, and
    measured 10×+ slower at 50k docs.  Arguments to ``zip_with``/``slice``
    sit outside the lambda and are evaluated once per row.
    """
    t = tokens(col)
    k = F.greatest(F.size(t) - F.lit(n) + F.lit(1), F.lit(1))
    # < n tokens: one whole-doc shingle (k clamps to 1; the fold's slices
    # would be ragged there, so take the explicit branch)
    return F.when(
        F.size(t) < F.lit(n), F.array(F.array_join(t, " "))
    ).otherwise(ngram_fold(t, n, k))


def ngram_fold(t: Column, n: int, k: Column) -> Column:
    """``k`` space-joined word ``n``-grams of token array ``t`` —
    gram i = ``t[i..i+n-1]`` — via ``zip_with`` of ``n`` shifted
    ``k``-length slices.  Callers guarantee ``k <= size(t) - n + 1``:
    with a longer ``k`` the later slices run ragged and ``zip_with``
    pads them with NULLs, which ``concat_ws`` silently SKIPS — the tail
    grams come back shorter than ``n`` words (e.g. 2-word "trigrams"),
    not NULL, so the violation does not fail loudly (ADVICE r06; kept
    as a documented contract because a NULL-propagating join would put
    a per-element branch on this hot path).  See :func:`word_shingles`
    for why this beats the textbook
    ``transform(sequence, i -> slice(t, i, n))``: that form re-evaluates
    ``t`` once per gram."""
    out = F.slice(t, 1, k)
    for j in range(1, n):
        out = F.zip_with(
            out, F.slice(t, 1 + j, k), lambda a, b: F.concat_ws(" ", a, b)
        )
    return out


# Universal-hash MinHash family over the 31-bit md5 base hash:
# h_k(x) = (A[k] * base(x) + B[k]) mod MINHASH_P.  One md5 per shingle,
# then num_hashes cheap multiply-adds — the standard permutation family.
MINHASH_P = 2147483647  # 2^31 - 1 (prime); products stay < 2^62

def minhash_params(k: int) -> tuple[int, int]:
    """Deterministic (a, b) for hash k; a is never 0."""
    a = (1103515245 * (k + 1) + 12345) % MINHASH_P
    if a == 0:
        a = 1
    b = (22695477 * k + 7) % MINHASH_P
    return a, b


def base_hash31(col: Column) -> Column:
    """md5-derived 31-bit base hash: first 60 md5 bits mod (2^31-1).
    Engine-portable (md5 + hex parse + mod)."""
    h60 = F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    return h60 % F.lit(MINHASH_P)


def permuted_hash(base: Column, k: int) -> Column:
    a, b = minhash_params(k)
    return (base * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)


def minhash_signature(shingles: Column, num_hashes: int = 12) -> Column:
    """MinHash signature: array of ``num_hashes`` minima of the permuted
    base hash over the shingle set — engine-portable.

    NB: callbacks must be single-argument lambdas built by a factory —
    PySpark dispatches on lambda arity, so a captured-default second
    parameter would silently become the array-index argument.

    Single ``aggregate`` pass over the base hashes, NOT
    ``array(*[array_min(transform(bases, perm_k)) ...])``: the ``bases``
    subtree (an md5 per shingle) is a separate expression occurrence per
    hash function there, and higher-order functions are interpreted
    (no codegen subexpression elimination), so the md5 pass ran
    ``num_hashes`` times — measured 3.5× slower at 50k docs.  Here every
    element is hashed once and folded into the running per-permutation
    minima.  Bit-equal output (min over the same value set); an empty
    shingle array still yields all-NULL, matching ``array_min([])``.
    """
    bases = F.transform(shingles, base_hash31)
    init = F.array_repeat(F.lit(MINHASH_P).cast("long"), num_hashes)

    def step(acc: Column, h: Column) -> Column:
        perms = F.array(*[permuted_hash(h, k) for k in range(num_hashes)])
        return F.zip_with(acc, perms, lambda a, b: F.least(a, b))

    return F.when(
        F.size(shingles) == 0,
        F.array(*[F.lit(None).cast("long")] * num_hashes),
    ).otherwise(F.aggregate(bases, init, step))


def lsh_band_hashes(signature: Column, bands: int, rows_per_band: int) -> Column:
    """LSH banding: md5 of each band's concatenated signature slice.

    Two documents collide on band b iff their signature rows
    ``[b*r, b*r+r)`` are all equal — the standard banding estimator for
    Jaccard similarity.  Returns ``array<string>`` of length ``bands``.
    """
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(signature, b * rows_per_band + r + 1).cast(
                            "string"
                        )
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )


def token_hash60(token: Column) -> Column:
    """First 60 bits of md5(token) as a non-negative BIGINT (15 hex chars,
    so the value stays below 2^60 and never wraps the sign bit)."""
    return F.conv(F.substring(F.md5(token), 1, 15), 16, 10).cast("long")


def simhash_bit_votes(token_h: Column, bits: int = 60) -> list[Column]:
    """Per-bit ±1 vote columns for SimHash aggregation: +1 when bit i of the
    token hash is set, else -1.  Sum these per document, then
    :func:`simhash_from_votes`."""
    return [
        F.when(F.shiftright(token_h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1))
        .otherwise(F.lit(-1))
        .alias(f"__b{i}")
        for i in range(bits)
    ]


def simhash_from_votes(vote_cols: list[Column], bits: int = 60) -> Column:
    """Fold summed bit votes into the final SimHash BIGINT: bit i is set
    iff its vote sum is positive."""
    terms = [
        F.when(vote_cols[i] > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        for i in range(bits)
    ]
    return reduce(lambda a, b: a + b, terms)


def fingerprint(col: Column | str, mod: int = FINGERPRINT_MOD) -> Column:
    """Polynomial rolling hash of the whole text (Rabin–Karp, base 31),
    mod ``mod`` — the document-fingerprint primitive.  Identical math is
    expressible in any SQL engine with a list fold."""
    c = F.col(col) if isinstance(col, str) else col
    # aggregate over character positions keeps everything JVM-side.
    return F.aggregate(
        F.sequence(F.lit(1), F.length(c)),
        F.lit(0).cast("long"),
        lambda acc, i: (acc * 31 + F.ascii(c.substr(i, F.lit(1)))) % mod,
    )


def char_class_ratio(col: Column | str, char_class_re: str) -> Column:
    """Fraction of characters matching ``char_class_re`` (e.g. '[A-Za-z]')."""
    c = F.col(col) if isinstance(col, str) else col
    kept = F.length(F.regexp_replace(c, f"[^{char_class_re[1:-1]}]", ""))
    return F.when(F.length(c) > 0, kept / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English, by default) stopwords."""
    sw = stopwords or LANG_STOPWORDS["en"]
    t = tokens(col)
    arr = F.array(*[F.lit(w) for w in sw])
    hits = F.size(F.filter(t, lambda x: F.array_contains(arr, x)))
    return F.when(F.size(t) > 0, hits / F.size(t)).otherwise(F.lit(0.0))


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit ratios — the language-ID feature vector."""
    t = tokens(col)
    n = F.size(t)
    def contains(arr: Column):
        return lambda x: F.array_contains(arr, x)

    out: dict[str, Column] = {}
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(t, contains(arr)))
        out[lang] = F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))
    return out


def lang_id(col: Column | str) -> Column:
    """Argmax language by stopword score, fixed priority order on ties
    (iteration order of ``LANG_STOPWORDS``) — fully deterministic."""
    scores = lang_scores(col)
    langs = list(scores)
    expr = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        cond = reduce(
            lambda a, b: a & b,
            [scores[lang] >= scores[o] for o in langs if o != lang],
        )
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def base_hash31_fast(col: Column) -> Column:
    """xxhash64-derived 31-bit base hash — the JVM-native fast path.

    ``F.xxhash64`` is one codegen'd long op per shingle vs md5's digest +
    hex text + parse; 2-4x cheaper on shingle-heavy corpora.  NOT
    engine-portable (no DuckDB equivalent), so the oracle-checked queries
    stay on :func:`base_hash31`; pick this via
    ``minhash_signatures(..., hash_fn="xxhash64")`` when cross-engine
    reproducibility isn't required.  Same (a·x+b) mod p permutation family
    applies on top, so only the base hash differs.
    """
    return F.pmod(F.xxhash64(col), F.lit(MINHASH_P))
