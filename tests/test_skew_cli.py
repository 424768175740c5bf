"""Salted-skew helpers and CLI flag-contract tests (the reference's
negative CLI tests, /root/reference/test/run_test.sh:132-265)."""

import pytest
from pyspark.sql import functions as F

from paradump_spark.cli import build_parser, main, validate
from paradump_spark.plans.skew import salted_agg, salted_join


# --- skew helpers ---------------------------------------------------------


def test_salted_agg_equals_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "qty_dec", F.col("l_quantity").cast("decimal(18,2)")
    )
    salted = {
        (r["l_returnflag"],): (r["n"], r["s"])
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {"n": ("count", "l_orderkey"), "s": ("sum", "qty_dec")},
            buckets=8,
        ).collect()
    }
    plain = {
        (r["l_returnflag"],): (r["n"], r["s"])
        for r in li.groupBy("l_returnflag")
        .agg(F.count("l_orderkey").alias("n"), F.sum("qty_dec").alias("s"))
        .collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_algebraic():
    with pytest.raises(ValueError):
        salted_agg(None, ["k"], {"a": ("avg", "v")})


def test_salted_join_equals_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    salted = salted_join(orders, cust, ["o_custkey"], buckets=4)
    plain = orders.join(cust, "o_custkey")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


# --- CLI contract ---------------------------------------------------------


def _args(argv):
    return build_parser().parse_args(argv)


@pytest.mark.parametrize(
    "argv",
    [
        ["dump", "--directory", "/x", "--output", "/y", "--mode", "bogus"],
        ["dump", "--directory", "/x", "--mode", "sql"],  # missing --output
        ["dump", "--directory", "/x", "--output", "/y", "--insertsize", "0"],
        ["dump", "--directory", "/x", "--output", "/y", "--compression", "7z"],
        ["dump", "--directory", "/x", "--output", "/y", "--table", "t", "--table", "t"],
        ["sync", "--src", "/a", "--dst", "/b", "--table", "t", "--table", "t"],
    ],
)
def test_invalid_flags_exit_nonzero(argv):
    with pytest.raises(SystemExit) as e:
        validate(_args(argv))
    assert e.value.code not in (0, None)


def test_missing_subcommand_exits_nonzero():
    with pytest.raises(SystemExit):
        _args([])


def test_cli_dump_and_sync_run(spark, sf_dir, tmp_path, capsys):
    rc = main(
        ["dump", "--directory", sf_dir, "--output", str(tmp_path / "out"),
         "--mode", "sql", "--table", "region", "--insertsize", "3"]
    )
    assert rc == 0
    assert "dumped region" in capsys.readouterr().out
    stats = tmp_path / "stats.csv"
    rc = main(
        ["sync", "--src", sf_dir, "--dst", sf_dir, "--table", "region",
         "--statsfile", str(stats)]
    )
    assert rc == 0
    assert stats.read_text().strip() == "region,DstWriter,NoOp,5"


def test_cli_profile_runs_and_validates(spark, sf_dir, capsys):
    from paradump_spark.cli import main

    rc = main(["profile", "--directory", sf_dir, "--table", "nation", "--approx"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "nation.n_name" in out and "nulls=0" in out

    import pytest

    with pytest.raises(SystemExit):
        main(["profile", "--directory", sf_dir, "--table", "nation", "--table", "nation"])


def test_skew_report_identifies_hot_key(spark):
    from paradump_spark.plans.skew import skew_report

    rows = [(1, i) for i in range(900)] + [(k, 0) for k in range(2, 102)]
    df = spark.createDataFrame(rows, "k long, v long")
    rep = skew_report(df, ["k"], top_k=3).collect()
    assert rep[0]["k"] == 1 and rep[0]["n_rows"] == 900
    assert rep[0]["share"] == round(900 / 1000, 6)
    # 101 distinct keys, mean ~9.9 rows/key -> imbalance ~90.9
    assert abs(rep[0]["imbalance"] - round(900 * 101 / 1000, 3)) < 1e-9
    assert all(r["n_rows"] == 1 for r in rep[1:])


def test_skew_report_uniform_keys_near_one(spark, sf_dir):
    from paradump_spark.plans.skew import skew_report

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rep = skew_report(orders, ["o_orderpriority"], top_k=10).collect()
    assert 0 < len(rep) <= 10
    # priorities are near-uniform: hot/average stays close to 1
    assert all(0.5 < r["imbalance"] < 2.0 for r in rep)
    assert abs(sum(r["share"] for r in rep) - 1.0) < 1e-3


# ---------------------------------------------------------------------------
# auto-salt wiring (round 6): skew_report drives the join strategy


def _planted_hot(spark):
    """key 0: 20k rows; keys 1..200: 25 rows each — imbalance ~160x."""
    hot = spark.range(20_000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    cold = spark.range(5_000).select(
        (F.col("id") % 200 + 1).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(cold)


def _dim(spark):
    return spark.range(201).select(
        F.col("id").alias("k"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )


def test_auto_salt_triggers_and_matches_plain_join(spark):
    from paradump_spark.plans.skew import salted_join_if_skewed

    big, dim = _planted_hot(spark), _dim(spark)
    decision = {}
    got = salted_join_if_skewed(big, dim, ["k"], threshold=8.0, decision=decision)
    assert decision["salted"] and decision["imbalance"] > 50
    assert decision["hot_key"] == {"k": 0}
    assert decision["buckets"] >= 8
    want = big.join(dim, "k")
    assert got.count() == want.count() == 25_000
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_auto_salt_shrinks_max_shuffle_partition(spark):
    """The point of salting: the hot key's rows spread over buckets
    reducers — max rows landing in one hash-partition drops ~buckets x."""
    from pyspark.sql import functions as F2

    from paradump_spark.plans.skew import salted_join_if_skewed

    big, dim = _planted_hot(spark), _dim(spark)
    n_part = 32

    def max_part(df, cols):
        return (
            df.repartition(n_part, *cols)
            .groupBy(F2.spark_partition_id().alias("p"))
            .count()
            .agg(F2.max("count"))
            .collect()[0][0]
        )

    plain_max = max_part(big, ["k"])
    decision = {}
    salted_join_if_skewed(big, dim, ["k"], decision=decision)
    b = decision["buckets"]
    salted = big.withColumn(
        "__salt", F2.pmod(F2.hash(*[F2.col(c) for c in big.columns]), F2.lit(b))
    )
    salted_max = max_part(salted, ["k", "__salt"])
    assert plain_max >= 20_000          # hot key funnels one reducer
    assert salted_max < plain_max / 4   # spread over >= buckets reducers


def test_auto_salt_plain_path_when_uniform(spark):
    from paradump_spark.plans.skew import salted_join_if_skewed

    big = spark.range(10_000).select((F.col("id") % 500).alias("k"), "id")
    dim = _dim(spark)
    decision = {}
    got = salted_join_if_skewed(big, dim, ["k"], decision=decision)
    assert not decision["salted"] and decision["buckets"] == 0
    # plain path: no __salt machinery in the plan
    plan = got._jdf.queryExecution().analyzed().toString()
    assert "__salt" not in plan
    assert got.count() == big.where(F.col("k") <= 200).count()


def test_hot_split_salts_only_hot_keys(spark):
    """ADVICE r07: the salted branch must replicate only the hot keys'
    small-side rows, not the whole small side — the plan shows a
    broadcast semi-join feeding the explode, plus a Union of the plain
    cold branch."""
    from paradump_spark.plans.skew import salted_join_if_skewed

    big, dim = _planted_hot(spark), _dim(spark)
    decision = {}
    got = salted_join_if_skewed(big, dim, ["k"], threshold=8.0, decision=decision)
    assert decision["salted"] and decision["hot_keys_n"] == 1
    plan = got._jdf.queryExecution().analyzed().toString()
    assert "LeftSemi" in plan and "Union" in plan and "__salt" in plan
    # row equality vs the plain join
    want = big.join(dim, "k")
    assert got.count() == want.count() == 25_000
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_hot_split_left_join_multiple_hot_keys(spark):
    """Two planted hot keys, left join, some big keys missing from dim:
    hot/cold union must still equal the plain left join row-for-row."""
    hot0 = spark.range(8_000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    hot1 = spark.range(8_000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    # keys 2..301, 10 rows each; keys > 200 have no dim match
    cold = spark.range(3_000).select(
        (F.col("id") % 300 + 2).alias("k"), F.col("id").alias("v")
    )
    big = hot0.unionByName(hot1).unionByName(cold)
    dim = _dim(spark)
    from paradump_spark.plans.skew import salted_join_if_skewed

    decision = {}
    got = salted_join_if_skewed(
        big, dim, ["k"], threshold=8.0, how="left", decision=decision
    )
    assert decision["salted"] and decision["hot_keys_n"] == 2
    want = big.join(dim, "k", "left")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_auto_salt_sampled_probe(spark):
    from paradump_spark.plans.skew import salted_join_if_skewed

    big, dim = _planted_hot(spark), _dim(spark)
    decision = {}
    got = salted_join_if_skewed(
        big, dim, ["k"], sample_fraction=0.3, decision=decision
    )
    assert decision["salted"]  # 160x imbalance survives a 30% sample
    assert got.count() == 25_000
