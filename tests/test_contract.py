"""Driver-contract shape tests (cheap; full oracle parity runs in the
driver and in tools/strict_verify.py)."""

import duckdb
import pandas as pd

import __spark_entry__ as E


def _canon(df):
    """Normalize the representation classes the driver's hasher proved
    harmless (CORRECTNESS_r02): datetime64 resolution and datetime.date
    objects vs datetime64."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt.startswith("datetime64") and "," not in dt:
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object and len(df) and all(
            type(v).__name__ == "date" for v in df[c].dropna().head(5)
        ) and not df[c].dropna().empty:
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def test_driver_window_is_exactly_50():
    # the driver evaluates only the first 50 queries() entries
    # (CORRECTNESS_r02: 66 declared, 50 evaluated) — everything the
    # driver sees must fit the window, nothing is silently skipped
    assert len(E.queries()) == 50
    assert len(E._DRIVER_QUERY_NAMES) == len(set(E._DRIVER_QUERY_NAMES))


def test_oracle_keys_subset_of_queries():
    q = set(E.queries())
    o = set(E.oracle_sql())
    assert o <= q
    # only approximate / non-SQL-expressible ops may be rows-only
    assert q - o == {"pq_topk", "embedding_cluster_report",
                     "image_near_dup", "audio_near_dup", "video_near_dup",
                     "audio_near_dup_robust", "video_near_dup_robust"}
    # every retired (extra) query keeps a DuckDB oracle, except the
    # approximate-by-design ones
    xq, xo = set(E.extra_queries()), set(E.extra_oracle_sql())
    assert xq - xo == {"ivf_topk", "embedding_near_dup_lsh", "pack_stats"}
    assert xo <= xq
    assert not xq & q


def test_readme_query_counts_consistent():
    """README's declared-surface line must track the real contract:
    '<N> declared queries: <K> DuckDB-oracle-checked + <M> rows-only'."""
    import re

    text = open("README.md").read()
    m = re.search(
        r"\((\d+) declared queries: (\d+) DuckDB-oracle-checked "
        r"\+ (\d+) rows-only",
        text,
    )
    assert m, "README declared-queries line missing or reformatted"
    n, k, rows_only = map(int, m.groups())
    allq, allo = E._all_queries(), E._all_oracle_sql()
    assert n == len(allq)
    assert k == len(allo)
    assert rows_only == len(set(allq) - set(allo))
    assert n == k + rows_only


def test_entry_runs_and_has_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert "dmltype" in df.columns


def test_every_query_runs_and_is_driver_sortable_at_sf0001(spark, sf_dir):
    """Every declared query must (a) build, and (b) emit ONLY column
    types the driver's pandas canonicalizer can sort.  The driver
    sorts every output column before hashing; list/dict/bytes cells
    raise `TypeError: unhashable type` there — exactly how
    video_near_dup went driver-red in CORRECTNESS_r10 while the local
    preflight's (since-removed) fallback masked it.  Project
    `F.size(...)`/hex digests instead of raw arrays."""
    from pyspark.sql import types as T

    for name, fn in {**E.queries(), **E.extra_queries()}.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType,
                                       T.BinaryType))
        ]
        assert not bad, (
            f"{name}: columns {bad} are not driver-sortable "
            "(array/map/struct/binary) — project a scalar instead"
        )


def test_extra_queries_match_oracle(spark, sf_dir):
    """Retired-from-the-driver-window queries keep HARD verification:
    row-count + sorted-value parity against their DuckDB oracles."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = E.extra_oracle_sql()
    for name, fn in E.extra_queries().items():
        if name not in oracles:  # approximate rows-only extras (pq_topk)
            assert fn(spark, sf_dir).count() > 0, name
            continue
        spdf = _canon(fn(spark, sf_dir).toPandas())
        opdf = _canon(con.execute(oracles[name]).df())
        assert sorted(spdf.columns) == sorted(opdf.columns), name
        assert len(spdf) == len(opdf), name
        s = sorted(
            "\x1f".join(str(v) for v in row)
            for row in spdf[sorted(spdf.columns)].itertuples(index=False)
        )
        o = sorted(
            "\x1f".join(str(v) for v in row)
            for row in opdf[sorted(opdf.columns)].itertuples(index=False)
        )
        assert s == o, f"{name}: first diff {next((a, b) for a, b in zip(s, o) if a != b)}"
