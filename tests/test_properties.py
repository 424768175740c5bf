"""Property-based tests (hypothesis): chunking invariants over arbitrary
key sets, SQL-text vs Column predicate equivalence, escaper round-trips."""

import csv
import io

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from paradump_spark.functions.render import csv_cell, mysql_escape
from paradump_spark.plans.split import (
    chunk_filter,
    chunk_predicates_sql,
    plan_chunks,
)

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@_slow
@given(
    keys=st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=300),
    n=st.integers(min_value=2, max_value=12),
)
def test_chunks_partition_any_int_keyset(spark, keys, n):
    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    chunks = plan_chunks(df, ["k"], n, sample_rows=100)
    total = df.count()
    covered = sum(df.where(chunk_filter(c, ["k"], df.schema)).count() for c in chunks)
    assert covered == total  # covering + disjoint (duplicates included once)


@_slow
@given(
    keys=st.lists(
        st.tuples(st.integers(0, 50), st.text(alphabet="ab'x", min_size=0, max_size=4)),
        min_size=1,
        max_size=120,
    ),
    n=st.integers(min_value=2, max_value=6),
)
def test_sql_text_equals_column_path_composite(spark, keys, n):
    """The rendered predicate text selects exactly the same rows as the
    struct-comparison Column for composite (int, string) keys, including
    quotes inside string keys."""
    df = spark.createDataFrame(keys, "a int, b string")
    chunks = plan_chunks(df, ["a", "b"], n, sample_rows=50)
    df.createOrReplaceTempView("prop_t")
    preds = chunk_predicates_sql(chunks, ["a", "b"])
    for c, p in zip(chunks, preds):
        via_col = df.where(chunk_filter(c, ["a", "b"], df.schema)).count()
        via_sql = spark.sql(f"SELECT count(*) c FROM prop_t WHERE {p}").first()["c"]
        assert via_col == via_sql


_MYSQL_UNESCAPE = {
    "\\\\": "\\", "\\0": "\x00", "\\n": "\n", "\\r": "\r",
    "\\Z": "\x1a", "\\'": "'", '\\"': '"',
}


def _mysql_unescape(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        pair = s[i : i + 2]
        if pair in _MYSQL_UNESCAPE:
            out.append(_MYSQL_UNESCAPE[pair])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


@_slow
@given(st.text(alphabet=st.characters(max_codepoint=0x2FF), max_size=40))
def test_mysql_escape_roundtrip(spark, s):
    df = spark.createDataFrame([(s,)], "v string")
    [row] = df.select(mysql_escape(F.col("v")).alias("e")).collect()
    assert _mysql_unescape(row["e"]) == s


@_slow
@given(st.text(alphabet=st.characters(max_codepoint=0xFF, exclude_characters="\x00"), max_size=30))
def test_csv_cell_roundtrip(spark, s):
    """A rendered CSV cell parses back to the original via the csv module
    (quote-if-needed + doubled-quote escaping)."""
    df = spark.createDataFrame([(s,)], "v string")
    [row] = df.select(csv_cell(F.col("v")).alias("c")).collect()
    # cells containing delimiter/quote/newlines come back quoted, so the
    # csv module parses them back verbatim
    if row["c"]:
        [parsed] = next(csv.reader(io.StringIO(row["c"]), strict=True))
    else:
        parsed = ""
    assert parsed == s


@_slow
@given(
    toks=st.lists(st.integers(min_value=1, max_value=400), min_size=1, max_size=120),
    cap=st.integers(min_value=64, max_value=512),
)
def test_packing_matches_python_ffd_reference(spark, toks, cap):
    """Single-partition packing must equal classic first-fit-decreasing
    run in plain Python on the same (tokens desc, id asc) order."""
    from paradump_spark.operators.packing import pack_documents

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, n_tokens long"
    ).coalesce(1)
    got = {
        r["doc_id"]: r["bin_id"] % (1 << 40)
        for r in pack_documents(df, "doc_id", "n_tokens", cap).collect()
    }
    order = sorted(range(len(toks)), key=lambda i: (-toks[i], i))
    bins: list[int] = []
    exp = {}
    for i in order:
        need = toks[i]
        for b, rem in enumerate(bins):
            if rem >= need:
                bins[b] -= need
                exp[i] = b
                break
        else:
            bins.append(max(cap - need, 0))
            exp[i] = len(bins) - 1
    assert got == exp


@_slow
@given(
    w=st.lists(st.floats(min_value=0.05, max_value=1.0), min_size=2, max_size=5),
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=150, unique=True),
)
def test_split_weights_partition_exactly(spark, w, ids):
    """Any normalized weight vector yields disjoint covering splits."""
    from paradump_spark.operators.sampling import split

    total = sum(w)
    weights = {f"s{i}": x / total for i, x in enumerate(w)}
    # fix float-sum drift on the last weight so they sum to exactly 1
    weights[f"s{len(w)-1}"] = 1.0 - sum(list(weights.values())[:-1])
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    parts = split(df, "doc_id", weights)
    seen: set[int] = set()
    n = 0
    for p in parts.values():
        cur = {r[0] for r in p.collect()}
        assert not (seen & cur)
        seen |= cur
        n += len(cur)
    assert n == len(ids)


@_slow
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=2,
        max_size=60,
        unique=True,
    )
)
def test_morton_code_preserves_quadrant_order(spark, pts):
    """Points in a strictly lower quadrant (both coords' high bits smaller)
    always sort before points in a higher quadrant — the property that
    makes Z-order range scans prune files."""
    from paradump_spark.plans.zorder import _interleave

    df = spark.createDataFrame(pts, "x long, y long")
    z = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn(
            "z", _interleave([F.col("x"), F.col("y")], 8)
        ).collect()
    }
    for (x1, y1), z1 in z.items():
        for (x2, y2), z2 in z.items():
            if x1 >> 4 < x2 >> 4 and y1 >> 4 < y2 >> 4:
                assert z1 < z2, ((x1, y1, z1), (x2, y2, z2))


# --- round-4 operators ------------------------------------------------------


@_slow
@given(
    texts=st.lists(
        st.text(
            alphabet="abc @.-0123456789\n",
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_pii_redaction_idempotent_and_match_free(spark, texts):
    """redact(redact(x)) == redact(x) and the redacted text has zero
    residual matches, for arbitrary text near the pattern alphabets."""
    from paradump_spark.operators.pii import pii_stats, redact_pii

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = redact_pii(df, "text")
    twice = redact_pii(once, "text")
    a = sorted(r["text"] for r in once.collect())
    b = sorted(r["text"] for r in twice.collect())
    assert a == b
    residual = pii_stats(once, "doc_id", "text").agg(
        F.sum("n_pii")
    ).collect()[0][0]
    assert residual == 0


@_slow
@given(
    texts=st.lists(
        st.text(alphabet="ab \n.-#", min_size=0, max_size=80),
        min_size=1,
        max_size=10,
    )
)
def test_gopher_filter_is_rules_keep_subset(spark, texts):
    """gopher_filter == rows whose gopher_rules.keep is true, and every
    ratio lies in [0, 1]."""
    from paradump_spark.operators.quality_rules import gopher_filter, gopher_rules

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rules = gopher_rules(df, "doc_id", "text").collect()
    keep_ids = {r["doc_id"] for r in rules if r["keep"]}
    got_ids = {r["doc_id"] for r in gopher_filter(df, "doc_id", "text").collect()}
    assert got_ids == keep_ids
    for r in rules:
        for c in ("symbol_word_ratio", "bullet_line_frac",
                  "ellipsis_line_frac", "alpha_word_frac"):
            if c == "symbol_word_ratio":
                assert r[c] >= 0.0
            else:
                assert 0.0 <= r[c] <= 1.0


@_slow
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(min_value=2, max_value=4),
)
def test_substring_dedup_conserves_and_keeps_first(spark, docs, k):
    """Token conservation (kept + removed == original per doc) and the
    keeper guarantee: the globally-smallest (doc, pos) occurrence of any
    duplicated span is never cut."""
    from paradump_spark.operators.dedup import (
        duplicate_span_occurrences,
        remove_duplicate_spans,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(df, "doc_id", "text", k).collect()
    }
    for i, toks in enumerate(docs):
        kept = [t for t in out[i]["text"].split(" ") if t != ""]
        assert len(kept) + out[i]["n_removed_tokens"] == len(toks)
    # keeper survival: for each duplicated span hash the minimal (doc,pos)
    # is absent from the removal occurrences
    occ = duplicate_span_occurrences(df, "doc_id", "text", k).collect()
    removed = {(r["doc_id"], r["pos"]) for r in occ}
    # recompute spans in python and check the min occurrence never removed
    from collections import defaultdict

    spans = defaultdict(list)
    for i, toks in enumerate(docs):
        for p in range(max(len(toks) - k + 1, 0)):
            spans[" ".join(toks[p:p + k])].append((i, p))
    for gram, occs in spans.items():
        if len(occs) > 1:
            assert min(occs) not in removed
            for o in occs:
                if o != min(occs):
                    assert o in removed


@_slow
@given(
    weights=st.dictionaries(
        st.sampled_from(["s0", "s1", "s2"]),
        st.floats(min_value=0.1, max_value=5.0, allow_nan=False),
        min_size=1,
        max_size=3,
    ),
    budget=st.integers(min_value=100, max_value=10_000_000),
)
def test_mixture_plan_targets_sum_to_budget(spark, weights, budget):
    """Σ target_tokens over weighted-present sources == budget (±rounding),
    and fraction·available == target for every source."""
    from paradump_spark.operators.sampling import mixture_plan

    rows = [
        (i, f"s{i % 3}", "w " * (10 + 7 * i)) for i in range(9)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    plan = mixture_plan(df, "source", "text", weights, budget).collect()
    total_target = sum(r["target_tokens"] for r in plan)
    assert abs(total_target - budget) < 1e-3
    for r in plan:
        assert abs(r["fraction"] * r["available_tokens"] - r["target_tokens"]) < 0.5


@_slow
@given(
    docs=st.lists(
        st.text(alphabet="ab \n", min_size=0, max_size=40),
        min_size=1,
        max_size=25,
    ),
    max_docs=st.integers(min_value=1, max_value=3),
)
def test_line_dedup_idempotent_and_conservative(spark, docs, max_docs):
    """Removing boilerplate lines twice equals once (after the first
    pass every surviving line's fan-out is <= max_docs), and no document
    row is ever dropped."""
    from paradump_spark.operators.dedup import remove_boilerplate_lines

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    once = remove_boilerplate_lines(df, "doc_id", "text", max_docs=max_docs)
    once_rows = {(r["doc_id"], r["text"]) for r in once.collect()}
    twice = remove_boilerplate_lines(
        once.select("doc_id", "text"), "doc_id", "text", max_docs=max_docs
    )
    twice_rows = {(r["doc_id"], r["text"]) for r in twice.collect()}
    assert once_rows == twice_rows
    assert len(once_rows) == len(docs)
    assert twice.agg(F.sum("n_removed_lines")).collect()[0][0] == 0


@_slow
@given(
    ids=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    n_shards=st.integers(min_value=1, max_value=9),
)
def test_shard_plan_partitions_any_idset(spark, ids, n_shards):
    """Shard assignment is a partition of the corpus: plan rows sum to
    the corpus count and every shard id is in range — for ANY id set and
    shard count, including non-power-of-two."""
    from paradump_spark.sinks.shards import shard_plan

    df = spark.createDataFrame([(k,) for k in ids], "doc_id bigint")
    plan = shard_plan(df, "doc_id", n_shards).collect()
    assert sum(r["n_rows"] for r in plan) == len(ids)
    assert all(0 <= r["shard"] < n_shards for r in plan)


@_slow
@given(
    texts=st.lists(
        st.text(alphabet="abc d", min_size=0, max_size=30),
        min_size=1,
        max_size=15,
    )
)
def test_lm_score_partitioning_invariant(spark, texts):
    """bits_per_token depends only on document content, never on the
    physical partitioning of corpus or model."""
    from paradump_spark.operators.lm import self_perplexity

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = {
        (r["doc_id"], r["bits_per_token"])
        for r in self_perplexity(df).collect()
    }
    b = {
        (r["doc_id"], r["bits_per_token"])
        for r in self_perplexity(df.repartition(7)).collect()
    }
    assert a == b


@_slow
@given(
    urls=st.lists(
        st.builds(
            lambda scheme, www, host, port, path, frag, params: (
                scheme
                + "://"
                + ("www." if www else "")
                + host
                + (f":{port}" if port else "")
                + "/"
                + path
                + ("?" + "&".join(params) if params else "")
                + ("#x" if frag else "")
            ),
            st.sampled_from(["http", "https", "HTTP", "Https"]),
            st.booleans(),
            st.sampled_from(["a.example.com", "EXAMPLE.com", "b.co"]),
            st.sampled_from([None, "80", "443", "8080"]),
            st.text(alphabet="ab/c", max_size=6),
            st.booleans(),
            st.lists(
                st.sampled_from(["a=1", "b=2", "utm_source=x", "gclid=9"]),
                max_size=3,
            ),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_canonical_url_idempotent(spark, urls):
    """canonical(canonical(u)) == canonical(u) over arbitrary URL shapes
    — the fixed-point property any normalizer must satisfy."""
    from paradump_spark.operators.urls import canonical_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonical_url(F.col("url")).alias("c1"))
    twice = once.select(
        F.col("c1"), canonical_url(F.col("c1")).alias("c2")
    ).collect()
    for r in twice:
        assert r["c1"] == r["c2"], r


@_slow
@given(
    texts=st.lists(
        st.text(alphabet="ab \t\n", min_size=0, max_size=120),
        min_size=1,
        max_size=20,
    ),
    window=st.integers(min_value=1, max_value=9),
)
def test_chunking_conserves_token_stream(spark, texts, window):
    """stride == window: re-joining each doc's chunks in order must
    reproduce its token stream exactly, for arbitrary whitespace mess."""
    from paradump_spark.operators.packing import chunk_documents

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", window=window)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_text"]))
        assert 1 <= r["n_chunk_tokens"] <= window
    for i, t in rows:
        toks = t.split()
        if not toks:
            assert i not in got
            continue
        rebuilt = " ".join(txt for _, txt in sorted(got[i]))
        assert rebuilt == " ".join(toks), (i, t)


@_slow
@given(
    days=st.lists(
        st.integers(min_value=0, max_value=20000),  # 1970..2024-ish
        min_size=1,
        max_size=200,
    ),
    n=st.integers(min_value=2, max_value=8),
)
def test_chunks_partition_any_date_keyset(spark, days, n):
    """Chunk planning over DATE primary keys: the planned intervals must
    cover every row exactly once, like the int/composite cases — the
    reference's timestamp-PK tables (client_info.insert_ts class) hit
    this path."""
    import datetime

    rows = [(datetime.date(1970, 1, 1) + datetime.timedelta(days=d),)
            for d in days]
    df = spark.createDataFrame(rows, "k date")
    chunks = plan_chunks(df, ["k"], n, sample_rows=64)
    covered = sum(
        df.where(chunk_filter(c, ["k"], df.schema)).count() for c in chunks
    )
    assert covered == df.count()


# ---------------------------------------------------------------------------
# audio fingerprint invariances over GENERATED energy profiles (round 9:
# the media-dedup analogue of the semantic_pairs recursion property) —
# the planted-corpus test pins one generator; these pin the CONTRACT
# for arbitrary segment profiles.


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=65, max_size=65),
    st.sampled_from([8000, 16000, 24000]),
    st.sampled_from([0.25, 0.5, 1.0]),
)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_audio_fingerprint_gain_and_rate_invariant(levels, rate, gain):
    """For ANY 65-segment amplitude profile (adjacent ties broken, the
    fingerprint's documented precondition for re-encode stability), the
    energy-difference hash is identical under uniform gain and under
    rendering at a different sample rate with the same duration."""
    import numpy as np

    from paradump_spark.operators import multimodal as MM

    lv = np.asarray(levels, dtype=np.int64)
    for i in range(1, 65):
        if lv[i] == lv[i - 1]:
            lv[i] = (lv[i] + 1) % 31

    def wav(rate_, gain_):
        amp = (0.08 + 0.88 * lv / 30.0) * gain_
        wave = np.repeat(amp, rate_ // 100)
        wave[1::2] *= -1.0
        return MM._encode_wav(wave, rate_, 16)

    h0 = MM.audio_fingerprint_bytes(wav(16000, 1.0))
    assert MM.audio_fingerprint_bytes(wav(16000, gain)) == h0
    assert MM.audio_fingerprint_bytes(wav(rate, 1.0)) == h0


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=65, max_size=65),
    st.integers(min_value=0, max_value=64),
)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_audio_fingerprint_single_segment_locality(levels, seg):
    """Perturbing ONE segment's amplitude flips at most the two
    comparison bits that touch it — the locality bound the Hamming
    budget of audio_dedup_flags relies on."""
    import numpy as np

    from paradump_spark.operators import multimodal as MM

    lv = np.asarray(levels, dtype=np.int64)
    for i in range(1, 65):
        if lv[i] == lv[i - 1]:
            lv[i] = (lv[i] + 1) % 31

    def wav(perturb):
        amp = 0.08 + 0.88 * lv / 30.0
        if perturb is not None:
            amp = amp.copy()
            amp[perturb] = 0.08 + 0.88 * ((lv[perturb] + 15) % 31) / 30.0
        wave = np.repeat(amp, 160)
        wave[1::2] *= -1.0
        return MM._encode_wav(wave, 16000, 16)

    h0 = MM.audio_fingerprint_bytes(wav(None))
    hp = MM.audio_fingerprint_bytes(wav(seg))
    assert bin((h0 ^ hp) & ((1 << 64) - 1)).count("1") <= 2
