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
