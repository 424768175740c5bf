"""Blocked fuzzy join + SemDeDup-style semantic dedup."""

import duckdb
import pytest
from pyspark.sql import functions as F

from paradump_spark.operators.fuzzyjoin import fuzzy_join, fuzzy_self_pairs
from paradump_spark.operators.semdedup import (
    assign_clusters,
    semantic_dedup,
    semantic_dedup_flags,
    semantic_pairs,
)


# ---------------------------------------------------------------- fuzzy join

def _names(spark):
    rows = [
        (1, "acme widget"), (2, "acme widgit"), (3, "acme bolt"),
        (4, "zeta widget"), (5, "completely different"), (6, "acme wídget"),
    ]
    return spark.createDataFrame(rows, "id long, name string")


def test_fuzzy_self_pairs_exact_vs_python(spark):
    df = _names(spark)
    got = {
        (r.id_a, r.id_b): r.lev
        for r in fuzzy_self_pairs(df, "id", "name", max_levenshtein=2).collect()
    }
    # python reference over ALL pairs that share a token
    import itertools
    rows = {r.id: r.name.lower() for r in df.collect()}

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return d[len(b)]

    want = {}
    for ia, ib in itertools.combinations(sorted(rows), 2):
        ta, tb = set(rows[ia].split()), set(rows[ib].split())
        if ta & tb and lev(rows[ia], rows[ib]) <= 2:
            want[(ia, ib)] = lev(rows[ia], rows[ib])
    assert got == want
    assert (1, 2) in got and got[(1, 2)] == 1
    # "acme wídget" shares the "acme" token and is 1 edit away
    assert (1, 6) in got


def test_fuzzy_join_no_cartesian_in_plan(spark):
    df = _names(spark)
    plan = fuzzy_join(
        df, df.withColumnRenamed("id", "rid"), "name", "name",
        max_levenshtein=2,
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_join_block_cap_drops_megablock(spark):
    # every name shares the token "x": with max_block=2 the block is
    # dropped on both sides -> no candidates -> no pairs (conservative)
    rows = [(i, f"x {i}") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, name string")
    out = fuzzy_self_pairs(df, "id", "name", max_levenshtein=9, max_block=2)
    assert out.count() == 0


def test_fuzzy_join_prefix_blocking(spark):
    df = _names(spark)
    out = fuzzy_self_pairs(df, "id", "name", max_levenshtein=2, prefix_len=4)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert (1, 2) in got            # same "acme" prefix, 1 edit
    assert (1, 4) not in got        # "zeta" prefix differs


def test_fuzzy_join_matches_duckdb_on_parts(spark, sf_dir):
    spark_pairs = fuzzy_self_pairs(
        spark.read.parquet(f"{sf_dir}/part.parquet"),
        "p_partkey", "p_name", max_levenshtein=3,
    )
    got = sorted(
        (r.id_a, r.id_b, r.lev) for r in spark_pairs.collect()
    )
    con = duckdb.connect()
    want = sorted(
        con.execute(f"""
            WITH p AS (SELECT p_partkey AS id, lower(p_name) AS nm
                       FROM read_parquet('{sf_dir}/part.parquet')),
            t AS (SELECT id, nm, unnest(string_split_regex(nm, '[^a-z0-9]+')) AS tok
                  FROM p),
            cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.nm AS na, b.nm AS nb
                     FROM t a JOIN t b USING (tok) WHERE a.id < b.id)
            SELECT id_a, id_b, levenshtein(na, nb) AS lev
            FROM cand WHERE levenshtein(na, nb) <= 3
        """).fetchall()
    )
    assert got == want


# ------------------------------------------------------------ semantic dedup

def _emb(spark):
    # two tight groups + one singleton, in two clusters
    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.999, 0.01, 0.0], 0),     # near-dup of 1
        (3, [0.0, 1.0, 0.0], 0),        # distinct direction, same cluster
        (4, [0.0, 0.0, 1.0], 1),
        (5, [0.0, 0.01, 0.999], 1),     # near-dup of 4
        (6, [1.0, 0.0, 0.0], 1),        # same dir as 1 but OTHER cluster
    ]
    return spark.createDataFrame(rows, "vid long, v array<float>, cl int")


def test_semantic_pairs_within_cluster_only(spark):
    pairs = {
        (r.id_a, r.id_b)
        for r in semantic_pairs(
            _emb(spark), "vid", "v", 0.95, cluster_col="cl"
        ).collect()
    }
    assert pairs == {(1, 2), (4, 5)}   # (1,6) blocked by cluster boundary


def test_semantic_dedup_keeps_lowest_id(spark):
    kept = {
        r.vid
        for r in semantic_dedup(
            _emb(spark), "vid", "v", threshold=0.95, cluster_col="cl"
        ).collect()
    }
    assert kept == {1, 3, 4, 6}


def test_semantic_dedup_flags_shape(spark):
    flags = semantic_dedup_flags(_emb(spark), "vid", "v", 0.95, "cl")
    got = {r.vid: r.is_semantic_dup for r in flags.collect()}
    assert got == {1: False, 2: True, 3: False, 4: False, 5: True, 6: False}


def test_semantic_dedup_max_cluster_conservative(spark):
    # recurse=False restores the pre-round-8 skip: both 3-row clusters
    # exceed the cap -> pair generation skips them entirely and every
    # row SURVIVES (conservative direction)
    kept = {
        r.vid
        for r in semantic_dedup(
            _emb(spark), "vid", "v", threshold=0.95,
            cluster_col="cl", max_cluster=2, recurse=False,
        ).collect()
    }
    assert kept == {1, 2, 3, 4, 5, 6}
    # at cap == cluster size the normal dedup result returns
    kept3 = {
        r.vid
        for r in semantic_dedup(
            _emb(spark), "vid", "v", threshold=0.95,
            cluster_col="cl", max_cluster=3,
        ).collect()
    }
    assert kept3 == {1, 3, 4, 6}


def test_semantic_dedup_kmeans_path(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    clustered = assign_clusters(emb, "vec_id", "embedding", num_clusters=8)
    assert clustered.select("cluster_id").distinct().count() <= 8
    n = emb.count()
    kept = semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.999, num_clusters=8
    )
    # near-exact threshold on random embeddings: nothing (or almost
    # nothing) should be dropped, and output schema == input schema
    assert kept.columns == emb.columns
    assert n - kept.count() <= n // 10


def test_semantic_dedup_matches_duckdb_label_oracle(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    kept = semantic_dedup(
        emb, "vec_id", "embedding", threshold=0.6, cluster_col="label"
    ).select("vec_id")
    got = sorted(r.vec_id for r in kept.collect())
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(f"""
            WITH e AS (
              SELECT vec_id, label,
                     CASE WHEN sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) > 0
                          THEN list_transform(CAST(embedding AS DOUBLE[]),
                               x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))))
                          ELSE list_transform(CAST(embedding AS DOUBLE[]), x -> x * 0.0) END AS nv
              FROM read_parquet('{sf_dir}/embeddings.parquet'))
            SELECT a.vec_id FROM e a
            WHERE NOT EXISTS (
              SELECT 1 FROM e b
              WHERE b.label = a.label AND b.vec_id < a.vec_id
                AND round(list_dot_product(a.nv, b.nv), 6) > 0.6)
            ORDER BY a.vec_id
        """).fetchall()
    ]
    assert got == want


def test_semantic_dedup_auto_k(spark, sf_dir):
    """num_clusters=None picks k = max(8, ceil(N/64)) — constant
    expected cluster size, linear pairing (see the semantic_dedup
    docstring) — and for k <= 64 (single-level regime) gives the same
    survivors as passing that k explicitly."""
    from paradump_spark.operators.semdedup import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    k = max(8, -(-n // 64))
    # calibration continuity: the new N/64 rule picks the SAME k=32 at
    # N=2000 that the old sqrt(N/2) rule (and the recall/latency
    # ledgers) were calibrated at
    assert max(8, -(-2000 // 64)) == 32
    auto = semantic_dedup(emb, "vec_id", "embedding", threshold=0.9,
                          num_clusters=None)
    got = sorted(r.vec_id for r in auto.select("vec_id").collect())
    assert 0 < len(got) <= n
    if k <= 64:  # single-level regime: auto == explicit k
        explicit = semantic_dedup(emb, "vec_id", "embedding", threshold=0.9,
                                  num_clusters=k)
        want = sorted(r.vec_id for r in explicit.select("vec_id").collect())
        assert got == want


# ------------------------------------------------- two-level assignment

def test_two_level_assignment_contract(spark):
    """assign_clusters_two_level (VERDICT r06 directive 3): every row
    labeled, at most num_clusters distinct ids, schema = input +
    cluster_id, and the assignment is deterministic."""
    from paradump_spark.operators.semdedup import assign_clusters_two_level

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    n = emb.count()
    cl = assign_clusters_two_level(emb, "vec_id", "embedding", num_clusters=64)
    assert cl.count() == n
    assert cl.where(F.col("cluster_id").isNull()).count() == 0
    k_used = cl.select("cluster_id").distinct().count()
    assert 0 < k_used <= 64
    assert set(cl.columns) == set(emb.columns) | {"cluster_id"}
    cl2 = assign_clusters_two_level(emb, "vec_id", "embedding", num_clusters=64)
    a = sorted(map(tuple, cl.select("vec_id", "cluster_id").collect()))
    b = sorted(map(tuple, cl2.select("vec_id", "cluster_id").collect()))
    assert a == b


def test_two_level_semantic_dedup_drops_planted_dups(spark):
    """Exact copies share every argmax decision at both levels, so they
    ALWAYS co-cluster: semantic_dedup through the two-level path (k>64)
    must drop each planted higher-id copy while keeping the originals."""
    from paradump_spark.operators.semdedup import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    n = emb.count()
    copies = emb.where(F.col("vec_id") < 40).select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(copies.select(*emb.columns))
    kept = semantic_dedup(
        corpus, "vec_id", "embedding", threshold=0.999, num_clusters=128
    )
    kept_ids = {r.vec_id for r in kept.select("vec_id").collect()}
    assert not any(v >= 100_000 for v in kept_ids)  # all copies dropped
    originals = [v for v in kept_ids if v < 100_000]
    # random embeddings at 0.999: essentially every original survives
    assert len(originals) >= n - n // 20


def test_fuzzy_join_auto_salts_planted_hot_block(spark):
    """Directive r06-7: the block join auto-salts through
    salted_join_if_skewed.  A planted hot token (under max_block but
    far over the imbalance threshold) must trigger salting, results
    must equal the unsalted join row-for-row, and the measurement-sized
    salt must actually spread the hot block across buckets."""
    from paradump_spark.plans.skew import salted_join_if_skewed  # noqa: F401

    # 200 names share the hot token "acme"; 60 distinct cold tokens
    rows = [(i, f"acme part{i % 4}") for i in range(200)] + [
        (1000 + i, f"tok{i} widget{i % 3}") for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, name string")

    decision = {}
    salted = fuzzy_self_pairs(
        df, "id", "name", max_levenshtein=2, skew_decision=decision
    )
    plain = fuzzy_self_pairs(df, "id", "name", max_levenshtein=2,
                             skew_threshold=None)
    got = sorted(map(tuple, salted.collect()))
    want = sorted(map(tuple, plain.collect()))
    assert got == want and len(got) > 0          # row-equal under salting
    assert decision["salted"] is True
    assert decision["buckets"] >= 8
    assert decision["hot_key"] == {"__block": "acme"}
    assert decision["imbalance"] > 8.0

    # the deterministic salt spreads the hot block: max rows per
    # (block, salt) reducer key is a fraction of the unsalted hot count
    from pyspark.sql import functions as F2
    lb = df.select("id", F2.lower(F2.col("name")).alias("nm"))
    toks = lb.select("id", "nm", F2.explode(F2.split("nm", "[^a-z0-9]+")).alias("__block"))
    hot_n = toks.where(F2.col("__block") == "acme").count()
    b = decision["buckets"]
    spread = (
        toks.withColumn("__salt", F2.pmod(F2.hash("id", "nm", "__block"), F2.lit(b)))
        .where(F2.col("__block") == "acme")
        .groupBy("__salt").count()
    )
    max_per_salt = max(r["count"] for r in spread.collect())
    assert max_per_salt < hot_n  # hot reducer shrank
    assert spread.count() > 1    # across more than one bucket


def test_salted_join_if_skewed_rejects_unsupported_how(spark):
    """ADVICE r06: unsupported join types must fail deterministically at
    entry, not only when the data happens to be skewed."""
    import pytest as _pytest

    from paradump_spark.plans.skew import salted_join_if_skewed

    a = spark.createDataFrame([(1, "x")], "k long, v string")
    b = spark.createDataFrame([(1, "y")], "k long, w string")
    with _pytest.raises(ValueError, match="inner/left"):
        salted_join_if_skewed(a, b, ["k"], how="full")
    with _pytest.raises(ValueError, match="inner/left"):
        salted_join_if_skewed(a, b, ["k"], how="right")


def test_embedding_cluster_report_contract(spark):
    """Per-cluster profile: counts sum to N, shares sum to 1, cohesion
    bounded; a planted exact-duplicate pile reads cohesion ~= 1.0 and
    a planted two-direction grab-bag reads visibly lower."""
    from paradump_spark.operators.semdedup import embedding_cluster_report

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    n = emb.count()
    rep = embedding_cluster_report(emb, "vec_id", "embedding",
                                   num_clusters=16).collect()
    assert sum(r["n_rows"] for r in rep) == n
    assert abs(sum(r["share"] for r in rep) - 1.0) < 1e-3
    assert all(-1.0 <= r["cohesion"] <= 1.0 + 1e-9 for r in rep)
    assert rep == sorted(rep, key=lambda r: (-r["n_rows"], r["cluster_id"]))
    # determinism
    rep2 = embedding_cluster_report(emb, "vec_id", "embedding",
                                    num_clusters=16).collect()
    assert rep == rep2

    # planted structure, fully deterministic at k=1 (no seeding luck):
    # a pile of exact duplicates reads cohesion ~= 1.0, a half-circle
    # spread of directions reads visibly looser
    import math
    dup = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    r_dup = embedding_cluster_report(dup, "vec_id", "embedding",
                                     num_clusters=1).collect()
    assert len(r_dup) == 1
    assert r_dup[0]["n_rows"] == 60 and r_dup[0]["share"] == 1.0
    assert r_dup[0]["cohesion"] > 0.999

    mix = spark.createDataFrame(
        [(100 + i, [0.0, math.cos(i / 13.0), math.sin(i / 13.0), 0.0])
         for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    r_mix = embedding_cluster_report(mix, "vec_id", "embedding",
                                     num_clusters=1).collect()
    assert r_mix[0]["cohesion"] < 0.95  # spread directions: looser


def test_fine_budgets_never_exceed_num_clusters():
    """ADVICE r07: the max(1,·) bump under skewed coarse cells must not
    push the budget sum past num_clusters (it used to: one mega-cell +
    many singleton cells)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from paradump_spark.operators.semdedup import _fine_budgets

    # the historical failure shape: 1 huge cell + 60 singletons, k=64
    counts = {0: 10_000, **{i: 1 for i in range(1, 61)}}
    b = _fine_budgets(counts, 64)
    assert sum(b.values()) <= 64
    assert all(1 <= b[c] <= counts[c] for c in counts)

    @settings(max_examples=200, deadline=None)
    @given(
        ns=st.lists(st.integers(min_value=1, max_value=100_000),
                    min_size=1, max_size=64),
        k=st.integers(min_value=1, max_value=4096),
    )
    def prop(ns, k):
        counts = dict(enumerate(ns))
        b = _fine_budgets(counts, k)
        assert all(1 <= b[c] <= counts[c] for c in counts)
        # sum <= num_clusters whenever feasible under the >=1-per-cell
        # floor; the floor itself is the only allowed overshoot
        assert sum(b.values()) <= max(k, len(counts))

    prop()


# ------------------------------------------------- mega-cluster recursion

def test_megacluster_ball_flags_equal_brute(spark):
    """VERDICT r07 directive 2: a planted >max_cluster near-dup ball
    must be deduplicated, not skipped — flags equal the unbounded
    (max_cluster=None) brute reference: every ball row except the
    global lowest id flagged, background rows untouched."""
    from paradump_spark.operators.semdedup import semantic_dedup_flags

    # 300 IDENTICAL vectors (k-means cannot split them -> exercises the
    # hash-salt fallback) + 20 mutually-ORTHOGONAL one-hot rows, one
    # cluster; a second normal cluster of 10 orthogonal rows
    def onehot(d):
        v = [0.0] * 32
        v[d] = 1.0
        return v

    rows = [(i, onehot(0), 0) for i in range(300)]
    rows += [(300 + i, onehot(1 + i), 0) for i in range(20)]
    rows += [(500 + i, onehot(21 + i), 1) for i in range(10)]
    emb = spark.createDataFrame(rows, "vid long, v array<float>, cl int")

    got = {
        r.vid: r.is_semantic_dup
        for r in semantic_dedup_flags(
            emb, "vid", "v", 0.95, "cl", max_cluster=50
        ).collect()
    }
    want = {
        r.vid: r.is_semantic_dup
        for r in semantic_dedup_flags(
            emb, "vid", "v", 0.95, "cl", max_cluster=None
        ).collect()
    }
    assert got == want
    assert got[0] is False                      # global min kept
    assert all(got[i] for i in range(1, 300))   # whole ball flagged
    assert not any(got[i] for i in list(range(300, 320)) + list(range(500, 510)))


def test_megacluster_pairs_no_allpairs_plan(spark):
    """The recursive path must stay an equi-join pipeline: no cartesian
    product anywhere in the physical plan."""
    from paradump_spark.operators.semdedup import semantic_pairs

    rows = [(i, [1.0, 0.0, 0.0], 0) for i in range(200)]
    emb = spark.createDataFrame(rows, "vid long, v array<float>, cl int")
    pairs = semantic_pairs(emb, "vid", "v", 0.95, "cl", max_cluster=40)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # and it actually found the intra-ball dups
    flagged = {r.id_b for r in pairs.collect()}
    assert flagged == set(range(1, 200))


def test_megacluster_diverse_stall_exits(spark):
    """A diverse mega-cluster (few dups) must terminate via the stall
    guard with sub-block coverage, not loop: every row pair-examined at
    some granularity, planted near-dup still caught when co-blocked."""
    import math

    from paradump_spark.operators.semdedup import semantic_pairs

    # 150 well-spread unit vectors on a 2-sphere arc: no near-dups
    rows = [
        (i, [math.cos(0.01 * i), math.sin(0.01 * i), 0.0], 0)
        for i in range(150)
    ]
    # plus one exact duplicate pair far apart in id space
    rows.append((900, [math.cos(0.5), math.sin(0.5), 0.0], 0))
    emb = spark.createDataFrame(rows, "vid long, v array<float>, cl int")
    pairs = semantic_pairs(
        emb, "vid", "v", 0.9999, "cl", max_cluster=40, max_rounds=4
    ).collect()
    # terminates (no hang) and keeps only true near-dup pairs
    assert all(r.cosine > 0.9999 for r in pairs)
    # the planted exact dup of vid=50 is found iff co-blocked; with
    # k-means sub-labels it should land with its twin
    assert any(r.id_a == 50 and r.id_b == 900 for r in pairs)


def test_megacluster_cross_wave_dup_found(spark, monkeypatch):
    """ADVICE r08: sub-blocks of one parent that finish in DIFFERENT
    rounds (staggered waves) must still pair their survivors against
    each other.  A deterministic staggered splitter forces wave 1
    (ids < 40, fits immediately) and wave 2 (ids >= 40, needs a second
    refinement round); the planted duplicate pair (34, 89) straddles
    the waves, so the pre-fix recombination — which paired each wave at
    parent level independently — missed it."""
    from paradump_spark.operators import semdedup as SD

    calls = {"n": 0}

    def staggered_refine(work, max_cluster, seed):
        calls["n"] += 1
        if calls["n"] == 1:  # parent (90 rows): 40-row wave + 50-row over
            lbl = F.when(F.col("__id") < 40, "a").otherwise("b")
        else:  # the over block (50 rows): two fitting halves
            lbl = F.when(F.col("__id") < 65, "b1").otherwise("b2")
        return work.withColumn(
            "__bk", F.concat_ws("#", F.col("__bk"), lbl)
        )

    monkeypatch.setattr(SD, "_refine_blocks", staggered_refine)

    def onehot(d, dim=64):
        v = [0.0] * dim
        v[d] = 1.0
        return v

    # wave 1 (ids 0..39): 34-copy ball u + cross-wave row x@34 + 5 distinct
    rows = [(i, onehot(0), 0) for i in range(34)]
    rows += [(34, onehot(1), 0)]
    rows += [(35 + i, onehot(2 + i), 0) for i in range(5)]
    # wave 2a (ids 40..64): 25-copy ball v
    rows += [(40 + i, onehot(10), 0) for i in range(25)]
    # wave 2b (ids 65..89): 24-copy ball w + cross-wave twin x@89
    rows += [(65 + i, onehot(11), 0) for i in range(24)]
    rows += [(89, onehot(1), 0)]
    emb = spark.createDataFrame(rows, "vid long, v array<float>, cl int")

    report = {}
    pairs = SD.semantic_pairs(
        emb, "vid", "v", 0.95, "cl", max_cluster=40, max_rounds=4,
        report=report,
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (34, 89) in got  # the cross-wave duplicate
    # converged cleanly: nothing residual, nothing stalled
    assert report["residual_over_rows"] == 0
    assert report["residual_pending_rows"] == 0
    assert report["stalled_parents"] == 0
    # and flags equal the unbounded reference on this ball structure
    calls["n"] = 0  # fresh stagger sequence for the flags run
    flags = {
        r.vid: r.is_semantic_dup
        for r in semantic_dedup_flags(
            emb, "vid", "v", 0.95, "cl", max_cluster=40
        ).collect()
    }
    want = {
        r.vid: r.is_semantic_dup
        for r in semantic_dedup_flags(
            emb, "vid", "v", 0.95, "cl", max_cluster=None
        ).collect()
    }
    assert flags == want


def test_semantic_pairs_recursion_property(spark):
    """VERDICT r08 directive 7 (hypothesis): generated cluster-size
    distributions — dup balls, Zipf-ish ball mixes, uniform-diverse
    arcs (the stall guard's adversarial shape) — must terminate within
    max_rounds, report coverage accounting, and produce flags that are
    a SUBSET of unbounded pairing's (conservative: recursion may keep
    extra rows, never drop a non-duplicate); on pure ball+orthogonal
    structures the flags are exactly equal."""
    import math

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    cluster_spec = st.tuples(
        st.lists(st.integers(min_value=2, max_value=45),
                 min_size=0, max_size=3),      # ball sizes
        st.integers(min_value=0, max_value=8),  # orthogonal diverse rows
        st.booleans(),                          # add a near-dup arc chain
    )

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(specs=st.lists(cluster_spec, min_size=1, max_size=2),
           max_cluster=st.integers(min_value=20, max_value=35))
    def prop(specs, max_cluster):
        rows, nid, dim = [], 0, 64
        ndim = [0]  # next unused one-hot direction
        has_arc = False
        for cl, (balls, n_div, arc) in enumerate(specs):
            for bs in balls:
                d = ndim[0] % (dim - 2)
                ndim[0] += 1
                for j in range(bs):
                    v = [0.0] * dim
                    v[d] = 1.0
                    v[dim - 1] = 0.001 * (j % 3)  # jitter, cos ~0.9999
                    rows.append((nid, v, cl))
                    nid += 1
            for _ in range(n_div):
                d = ndim[0] % (dim - 2)
                ndim[0] += 1
                v = [0.0] * dim
                v[d] = 1.0
                rows.append((nid, v, cl))
                nid += 1
            if arc:  # 30 spread directions, neighbors cos(0.1)~0.995
                has_arc = True
                for j in range(30):
                    v = [0.0] * dim
                    v[0] = math.cos(0.1 * j)
                    v[1] = math.sin(0.1 * j)
                    rows.append((nid, v, cl))
                    nid += 1
        if not rows:
            return
        emb = spark.createDataFrame(rows, "vid long, v array<float>, cl int")
        report = {}
        rec = {
            r.vid
            for r in semantic_pairs(
                emb, "vid", "v", 0.95, "cl", max_cluster=max_cluster,
                max_rounds=3, report=report,
            ).select(F.col("id_b").alias("vid")).distinct().collect()
        }
        unb = {
            r.vid
            for r in semantic_pairs(
                emb, "vid", "v", 0.95, "cl", max_cluster=None
            ).select(F.col("id_b").alias("vid")).distinct().collect()
        }
        # terminate within budget, account for every exit path
        assert report["rounds"] <= 4
        assert report["residual_over_rows"] >= 0
        assert report["residual_pending_rows"] >= 0
        assert report["stalled_parents"] >= 0
        # conservative: never flags a row unbounded pairing would keep
        assert rec <= unb
        # ball+orthogonal structures converge to exact equality
        if not has_arc:
            assert rec == unb

    prop()


# ------------------------------------------- incremental semantic dedup

def _ball(vid0, d, n, dim=16):
    """n near-identical vectors around one-hot dim d (tiny deterministic
    jitter keeps cosine ~0.9999 — above any dedup threshold)."""
    rows = []
    for i in range(n):
        v = [0.0] * dim
        v[d] = 1.0
        v[(d + 1) % dim] = 0.001 * (i % 3)
        rows.append((vid0 + i, v))
    return rows


def test_incremental_semantic_dedup_two_shards_equal_full_run(spark, tmp_path):
    """VERDICT r07 directive 6: two-shard incremental == full-run flags
    on the label-clustered contract; the store grows without ever
    re-pairing history."""
    from paradump_spark.operators.semdedup import incremental_semantic_dedup

    # cluster 0: a 6-row ball split across shards + 1 distinct row
    # cluster 1: a 4-row ball entirely in shard 2 + 1 distinct row
    all_rows = (
        [(vid, v, 0) for vid, v in _ball(0, 0, 6)]
        + [(100, [0.0] * 15 + [1.0], 0)]
        + [(vid, v, 1) for vid, v in _ball(200, 4, 4)]
        + [(300, [0.0] * 14 + [1.0, 0.0], 1)]
    )
    schema = "vid long, v array<float>, lbl int"
    full = spark.createDataFrame(all_rows, schema)
    shard1 = spark.createDataFrame(
        [r for r in all_rows if r[0] < 3 or r[0] == 100], schema
    )
    shard2 = spark.createDataFrame(
        [r for r in all_rows if not (r[0] < 3 or r[0] == 100)], schema
    )

    store = str(tmp_path / "semstore")
    f1, m1 = incremental_semantic_dedup(
        spark, store, shard1, "vid", "v", threshold=0.95, cluster_col="lbl"
    )
    kept1 = {r.vid for r in f1.collect()}
    f2, m2 = incremental_semantic_dedup(
        spark, store, shard2, "vid", "v", threshold=0.95, cluster_col="lbl"
    )
    kept2 = {r.vid for r in f2.collect()}

    full_kept = {
        r.vid
        for r in __import__(
            "paradump_spark.operators.semdedup", fromlist=["semantic_dedup"]
        ).semantic_dedup(
            full, "vid", "v", threshold=0.95, cluster_col="lbl"
        ).collect()
    }
    assert kept1 | kept2 == full_kept == {0, 100, 200, 300}
    # history is never re-paired: every shard-2 match has a NEW id on
    # the new side only
    new_ids = {r[0] for r in shard2.select("vid").collect()}
    assert all(r.new_id in new_ids for r in m2.collect())
    # shard-2 ball members' HISTORY matches point at the shard-1 keeper
    # (id 0) only — dropped shard-1 rows (1, 2) never re-enter pairing
    hist = {
        r.existing_id
        for r in m2.collect()
        if r.new_id in (3, 4, 5) and r.existing_id not in new_ids
    }
    assert hist == {0}


def test_incremental_semantic_dedup_frozen_centroids(spark, tmp_path):
    """k-means mode: init freezes centroids; a later shard's near-dups
    of historical keepers are caught via map-only assignment + the
    cluster-pruned keeper join."""
    from paradump_spark.operators.semdedup import incremental_semantic_dedup

    shard1 = spark.createDataFrame(
        [(vid, v) for vid, v in _ball(0, 0, 30) + _ball(100, 5, 30)],
        "vid long, v array<float>",
    )
    store = str(tmp_path / "kstore")
    f1, _ = incremental_semantic_dedup(
        spark, store, shard1, "vid", "v", threshold=0.95, num_clusters=4
    )
    assert f1.count() <= 4  # two balls -> ~2 keepers (+jitter margin)
    # shard 2: more members of ball A + a brand-new direction
    shard2 = spark.createDataFrame(
        [(vid, v) for vid, v in _ball(1000, 0, 10)]
        + [(2000, [0.0] * 10 + [1.0] + [0.0] * 5)],
        "vid long, v array<float>",
    )
    f2, m2 = incremental_semantic_dedup(
        spark, store, shard2, "vid", "v", threshold=0.95, num_clusters=4
    )
    kept2 = {r.vid for r in f2.collect()}
    assert 2000 in kept2                       # new direction survives
    assert all(v >= 1000 for v in kept2)
    assert not {v for v in kept2 if 1000 <= v < 1010}  # ball A all matched
    # matched against HISTORY keepers (ids < 100), proving the frozen
    # assignment routed them to the right cell (intra-shard pairs also
    # appear — filter to the history side)
    hist_matches = {
        r.existing_id
        for r in m2.collect()
        if r.new_id < 1010 and r.existing_id < 1000
    }
    assert hist_matches and all(e < 100 for e in hist_matches)


def test_incremental_semantic_dedup_param_mismatch_raises(spark, tmp_path):
    from paradump_spark.operators.semdedup import incremental_semantic_dedup

    shard = spark.createDataFrame(
        [(vid, v) for vid, v in _ball(0, 0, 5)], "vid long, v array<float>"
    )
    store = str(tmp_path / "pstore")
    incremental_semantic_dedup(
        spark, store, shard, "vid", "v", threshold=0.95, num_clusters=2
    )
    with pytest.raises(ValueError, match="incomparable"):
        incremental_semantic_dedup(
            spark, store,
            shard.selectExpr("vid + 50 AS vid", "v"),
            "vid", "v", threshold=0.9, num_clusters=2,
        )
