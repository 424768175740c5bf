"""URL features + domain blocklist (operators/urls.py)."""

from pyspark.sql import functions as F

from paradump_spark.operators.urls import (
    filter_blocked_domains,
    url_features,
)


def _urls(spark):
    return spark.createDataFrame(
        [
            (1, "https://www.Example.com/a/b/c?x=1&y=2"),
            (2, "http://sub.deep.blog.org/post"),
            (3, "https://example.com"),
            (4, "https://spam.bad-site.net/buy?now=1"),
            (5, "http://localhost/x"),
        ],
        "id long, url string",
    )


def test_features(spark):
    rows = {
        r["id"]: r
        for r in url_features(_urls(spark), "url").collect()
    }
    assert rows[1]["url_host"] == "www.example.com"
    assert rows[1]["url_domain"] == "example.com"
    assert rows[1]["url_path_depth"] == 3
    assert rows[1]["url_n_params"] == 2
    assert rows[2]["url_domain"] == "blog.org"
    assert rows[3]["url_path_depth"] == 0
    assert rows[3]["url_n_params"] == 0
    assert rows[4]["url_domain"] == "bad-site.net"
    # single-label host: heuristic falls back to the label itself
    assert rows[5]["url_domain"] == "localhost"


def test_blocklist_filters_by_registered_domain(spark):
    kept = filter_blocked_domains(
        _urls(spark), "url", ["bad-site.net", "Blog.org"]
    )
    assert sorted(r["id"] for r in kept.collect()) == [1, 3, 5]


def test_blocklist_accepts_dataframe(spark):
    bl = spark.createDataFrame([("example.com",)], "domain string")
    kept = filter_blocked_domains(_urls(spark), "url", bl)
    assert sorted(r["id"] for r in kept.collect()) == [2, 4, 5]


def test_blocklist_plan_is_broadcast_no_shuffle(spark):
    kept = filter_blocked_domains(_urls(spark), "url", ["example.com"])
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# canonical_url / url_dedup (round 5)

CANON_VECTORS = [
    # (raw, canonical)
    ("HTTPS://WWW.Example.COM/Path/", "https://example.com/Path"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),  # kept
    ("https://example.com", "https://example.com/"),
    ("https://example.com/a?b=2&a=1", "https://example.com/a?a=1&b=2"),
    (
        "https://example.com/a?utm_source=x&q=1&fbclid=y&gclid=z",
        "https://example.com/a?q=1",
    ),
    ("https://example.com/a?utm_source=x", "https://example.com/a"),
    ("https://example.com/a#section", "https://example.com/a"),
    ("ftp://host.net:21/f/", "ftp://host.net/f"),
]


def test_canonical_url_vectors(spark):
    from paradump_spark.operators.urls import canonical_url

    df = spark.createDataFrame([(r,) for r, _ in CANON_VECTORS], "url string")
    got = [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [c for _, c in CANON_VECTORS]


def test_url_dedup_keeper_and_counts(spark):
    from paradump_spark.operators.urls import url_dedup

    df = spark.createDataFrame(
        [
            (1, "https://example.com/a"),
            (2, "HTTPS://www.example.com/a/"),   # same canonical as 1
            (3, "https://example.com/a?utm_source=x"),  # same again
            (4, "https://example.com/b"),
        ],
        "doc_id long, url string",
    )
    got = {r["doc_id"]: r for r in url_dedup(df, "url", "doc_id").collect()}
    assert [got[i]["keep"] for i in (1, 2, 3, 4)] == [True, False, False, True]
    assert [got[i]["n_dupes"] for i in (1, 2, 3, 4)] == [3, 3, 3, 1]
    assert got[2]["canonical_url"] == "https://example.com/a"


def test_canonical_url_malformed_and_null(spark):
    """ADVICE r05 (high): malformed URLs must not abort the job
    (Spark 4 ANSI `parse_url` raises INVALID_URL) and NULL/garbage rows
    must never be dropped by url_dedup."""
    from paradump_spark.operators.urls import canonical_url, url_dedup

    df = spark.createDataFrame(
        [
            (1, "https://example.com/a"),
            (2, "not a url at all %%"),       # malformed → raw kept as key
            (3, None),                         # NULL url
            (4, "not a url at all %%"),       # byte-dup of 2 still groups
            (5, "relative/path/only"),        # no scheme
        ],
        "doc_id long, url string",
    )
    canon = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", canonical_url(F.col("url")).alias("c")
        ).collect()
    }
    assert canon[1] == "https://example.com/a"
    assert canon[2] == "not a url at all %%"   # falls back to raw
    assert canon[3] is None
    assert canon[5] == "relative/path/only"

    got = {r["doc_id"]: r for r in url_dedup(df, "url", "doc_id").collect()}
    assert sorted(got) == [1, 2, 3, 4, 5]      # no row dropped
    assert got[2]["keep"] and not got[4]["keep"]
    assert got[2]["n_dupes"] == 2
    assert got[3]["keep"] and got[3]["n_dupes"] == 1
    assert got[3]["canonical_url"] is None


def test_canonical_url_is_pure_jvm(spark):
    from paradump_spark.operators.urls import canonical_url

    df = spark.createDataFrame([("https://a.b/c",)], "url string")
    plan = (
        df.select(canonical_url(F.col("url")).alias("c"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_url_dedup_skew_split_identical_results(spark):
    """The sampled hot-key escape (ADVICE r09) is a pure plan decision:
    a corpus with one canonical URL holding ~25% of rows must produce
    IDENTICAL (doc_id, canonical_url, keep, n_dupes) whether the skew
    detector is off (window only), armed at a threshold the hot key
    crosses (split plan), or armed too high to trigger."""
    from pyspark.sql import functions as F

    from paradump_spark.operators.urls import url_dedup

    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 4 == 0,
            F.lit("https://hot.example.com/page?utm_source=x"),
        )
        .when(F.col("id") % 97 == 13, F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.lit("https://site"),
                (F.col("id") % 301).cast("string"),
                F.lit(".example.com/p"),
            )
        )
        .alias("url"),
    )

    def snap(threshold):
        rows = url_dedup(
            df, "url", "doc_id", skew_threshold=threshold
        ).collect()
        return sorted(
            (r.doc_id, r.canonical_url, r.keep, r.n_dupes) for r in rows
        )

    base = snap(None)
    # threshold 100 with fraction min(1, 32/100)=0.32: the 1000-row hot
    # key samples ~320 hits >= 8 -> detected; split path engages
    split = snap(100)
    high = snap(10_000_000)
    assert base == split == high
    assert len(base) == 4000
    hot = [r for r in base if r[1] == "https://hot.example.com/page"]
    assert len(hot) == 1000 and sum(1 for r in hot if r[2]) == 1
    nulls = [r for r in base if r[1] is None]
    assert nulls and all(r[2] and r[3] == 1 for r in nulls)
