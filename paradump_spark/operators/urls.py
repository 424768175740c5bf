"""URL analysis and domain blocklist filtering — corpus-curation surface.

Web-crawl pipelines (C4, RefinedWeb) gate documents by their source URL
before any text judgment: known-bad registered domains are dropped, URL
shape (path depth, query-string noise) feeds quality heuristics.  The
reference engine has no URL surface; this sits in the LLM-pipeline
family next to `operators/quality_rules.py`.

All pure JVM expressions (``parse_url`` + array ops) — per-row
projections that fuse into the scan; the blocklist join broadcasts (a
blocklist is at most millions of rows — MBs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _purl(url: Column, part: str) -> Column:
    """``try_parse_url`` — NULL on malformed input instead of the
    INVALID_URL error ``parse_url`` raises under Spark 4 ANSI mode.
    Real crawl data guarantees malformed URLs; one bad row must never
    abort a 100 TB job."""
    return F.try_parse_url(url, F.lit(part))


def url_host(url: Column) -> Column:
    """HOST part, lower-cased (authority without port/user)."""
    return F.lower(_purl(url, "HOST"))


def registered_domain(url: Column) -> Column:
    """Last-two-label heuristic of the host (``a.b.example.com`` →
    ``example.com``).  A public-suffix-list lookup is the production
    refinement (``co.uk`` etc.); the heuristic is deliberate here —
    suffix tables change monthly and belong in caller config, and the
    blocklist join below accepts either convention."""
    labels = F.split(url_host(url), "\\.")
    n = F.size(labels)
    return F.when(
        n >= 2, F.array_join(F.slice(labels, -2, 2), ".")
    ).otherwise(F.array_join(labels, "."))


def path_depth(url: Column) -> Column:
    """Number of non-empty ``/`` segments in the PATH part."""
    path = _purl(url, "PATH")
    return F.size(
        F.filter(F.split(F.coalesce(path, F.lit("")), "/"), lambda s: s != "")
    ).cast("int")


def query_param_count(url: Column) -> Column:
    """Number of ``&``-separated parameters in the QUERY part (0 when
    absent)."""
    q = _purl(url, "QUERY")
    return F.when(
        q.isNull() | (q == ""), F.lit(0)
    ).otherwise(F.size(F.split(q, "&"))).cast("int")


def url_features(
    df: DataFrame, url_col: str, prefix: str = "url_"
) -> DataFrame:
    """Append host / registered domain / path depth / query-param count
    columns derived from ``url_col`` — one narrow projection."""
    u = F.col(url_col)
    return (
        df.withColumn(f"{prefix}host", url_host(u))
        .withColumn(f"{prefix}domain", registered_domain(u))
        .withColumn(f"{prefix}path_depth", path_depth(u))
        .withColumn(f"{prefix}n_params", query_param_count(u))
    )


#: query parameters that never change resource identity (tracking tags)
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|ref|ref_src)(=.*)?$"

#: default ports per scheme — canonical form drops them
_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}


def canonical_url(url: Column) -> Column:
    """Canonical form for URL-level dedup (the first dedup pass of every
    crawl pipeline — two fetches of the same resource must collide
    BEFORE any text comparison):

    * scheme and host lower-cased; leading ``www.`` stripped;
    * default port dropped (``:80`` http, ``:443`` https), non-default
      ports kept — they address different resources;
    * fragment dropped (never sent to the server);
    * tracking parameters removed (``utm_*``, ``gclid``, ``fbclid``,
      ``msclkid``, ``ref``); remaining query params sorted;
    * trailing ``/`` stripped from non-root paths; empty path → ``/``.

    Pure JVM (``parse_url`` + array expressions): a narrow projection
    that fuses into the scan — canonicalizing a 100 TB crawl is
    map-only, and the dedup afterwards is one hash shuffle on the
    canonical string (`url_dedup`).
    """
    scheme = F.lower(_purl(url, "PROTOCOL"))
    host = F.regexp_replace(
        F.lower(_purl(url, "HOST")), r"^www\.", ""
    )
    port = F.regexp_extract(
        _purl(url, "AUTHORITY"), r":(\d+)$", 1
    )
    default_port = F.coalesce(
        *[
            F.when(scheme == s, F.lit(p))
            for s, p in _DEFAULT_PORTS.items()
        ],
        F.lit(""),
    )
    port_part = F.when(
        (port == "") | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    raw_path = F.coalesce(_purl(url, "PATH"), F.lit(""))
    trimmed = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(trimmed == "", F.lit("/")).otherwise(trimmed)
    q = _purl(url, "QUERY")
    kept = F.array_sort(
        F.filter(
            F.split(F.coalesce(q, F.lit("")), "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query_part = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    canon = F.concat(
        scheme, F.lit("://"), host, port_part, path, query_part
    )
    # A URL try_parse_url cannot decompose (no scheme/host — relative
    # refs, garbage bytes) keeps its raw form as its own canonical key:
    # it still groups with byte-identical duplicates and is never
    # dropped.  NULL input stays NULL (callers decide; url_dedup keeps
    # the row via a per-row sentinel key).
    return F.when(scheme.isNull() | host.isNull(), url).otherwise(canon)


def url_dedup(
    df: DataFrame,
    url_col: str,
    id_col: str,
    out_col: str = "canonical_url",
    skew_threshold: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """URL-level exact dedup: append the canonical URL, a ``keep`` flag
    (True on the lowest-id row of each canonical group — deterministic
    keeper), and the group's ``n_dupes``.

    ONE hash shuffle on the canonical string: keeper and group size are
    partition-frame window aggregates over the group key (no orderBy —
    no sort, no rank), which beats the earlier groupBy + join-back
    shape on two counts measured at the sf5 ledger leg: the canonical
    regex chain evaluates ONCE (the join consumed ``keyed`` on both
    sides, re-parsing every URL), and the second shuffle disappears.
    The window is keyed, never SinglePartition (plan-audit safe).

    SKEW (ADVICE r09 asked for a measured check before relying on the
    sf5 exp-0.82 figure — duplicated-URL corpora are this operator's
    target and are skewed by nature).  MEASURED round 10 on this
    harness: the keyed window HOLDS under heavy skew — a hot key
    holding 10% of 2M rows ran 6.4 s vs 0.4 s uniform, 50% of 4M rows
    8.6 s, 67% of 12M rows 17.9 s — near-linear in the hot group, no
    cliff, because the unbounded-frame count/min is one aggregate pass
    over a spillable buffer (no per-row rank sort).  The groupBy +
    broadcast-join-back alternative lost at EVERY measured skew level
    (5.0 / 12.3 / 32.3 s respectively): its second corpus scan costs
    more than the window straggler saves.

    ``skew_threshold`` (default ``None`` = off, the measured winner)
    keeps the escape hatch for the one case the window cannot absorb —
    a single group too large for one task's spill capacity.  When set,
    a ~``32/threshold`` fraction sample (the AQE skew-join technique at
    plan time) finds every key holding ≥ threshold rows w.h.p.; those
    keys are marked via one tiny broadcast join and routed through a
    groupBy + broadcast-join-back path whose partial aggregation
    collapses the hot groups map-side, while everything else keeps the
    single-shuffle window.  Both paths compute identical results — the
    split is a pure plan decision (pytest-asserted).

    NULL-url rows are never dropped: they get a per-row sentinel group
    key (``\\x00null:<id>``), so each survives as its own singleton
    group (``keep=True``, ``n_dupes=1``) with a NULL ``out_col``.
    """
    from pyspark.sql import Window

    keyed = df.withColumn(out_col, canonical_url(F.col(url_col)))
    group_key = F.coalesce(
        F.col(out_col),
        F.concat(F.lit("\x00null:"), F.col(id_col).cast("string")),
    )
    keyed = keyed.withColumn("__ukey", group_key)

    hot_keys: list[str] = []
    if skew_threshold:
        frac = min(1.0, 32.0 / skew_threshold)
        # a key at the threshold appears >= 32x in expectation; the
        # >= 8 cut catches it w.h.p. while keeping the candidate list
        # bounded by ~4N/threshold (false positives just take the agg
        # path — results are identical either way)
        hot_keys = [
            r["__ukey"]
            for r in (
                keyed.sample(fraction=frac, seed=seed)
                .groupBy("__ukey")
                .agg(F.count(F.lit(1)).alias("__c"))
                .where(F.col("__c") >= 8)
                .select("__ukey")
                .limit(65536)
                .collect()
            )
        ]

    w = Window.partitionBy("__ukey")
    if not hot_keys:
        return (
            keyed.withColumn("n_dupes", F.count(F.lit(1)).over(w))
            .withColumn("keep", F.col(id_col) == F.min(F.col(id_col)).over(w))
            .drop("__ukey")
        )
    spark = df.sparkSession
    mark = F.broadcast(
        spark.createDataFrame([(k,) for k in hot_keys], "__ukey string")
        .withColumn("__hot", F.lit(True))
    )
    marked = keyed.join(mark, "__ukey", "left")
    cold = (
        marked.where(F.col("__hot").isNull())
        .withColumn("n_dupes", F.count(F.lit(1)).over(w))
        .withColumn("keep", F.col(id_col) == F.min(F.col(id_col)).over(w))
        .drop("__ukey", "__hot")
    )
    hot_rows = marked.where(F.col("__hot").isNotNull())
    # partial agg collapses each hot group to one row per map task;
    # the stats frame is <= |hot_keys| rows -> broadcast join back
    hot_stats = hot_rows.groupBy("__ukey").agg(
        F.min(F.col(id_col)).alias("__keeper"),
        F.count(F.lit(1)).alias("n_dupes"),
    )
    hot_done = (
        hot_rows.join(F.broadcast(hot_stats), "__ukey")
        .withColumn("keep", F.col(id_col) == F.col("__keeper"))
        .drop("__ukey", "__hot", "__keeper")
    )
    return cold.unionByName(hot_done)


def filter_blocked_domains(
    df: DataFrame,
    url_col: str,
    blocklist: DataFrame | Sequence[str],
    domain_col: str = "domain",
) -> DataFrame:
    """Drop rows whose registered domain appears in ``blocklist``
    (a DataFrame with ``domain_col``, or a plain sequence of domains).

    Broadcast anti-join: the corpus never shuffles, the blocklist ships
    once per executor.
    """
    spark = df.sparkSession
    if not isinstance(blocklist, DataFrame):
        blocklist = spark.createDataFrame(
            [(d,) for d in blocklist], f"{domain_col} string"
        )
    block = blocklist.select(
        F.lower(F.col(domain_col)).alias("__blocked_domain")
    ).distinct()
    return (
        df.withColumn("__dom", registered_domain(F.col(url_col)))
        .join(
            F.broadcast(block),
            F.col("__dom") == F.col("__blocked_domain"),
            "left_anti",
        )
        .drop("__dom")
    )
