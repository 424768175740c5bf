"""Driver-contract shape tests (cheap; full oracle parity runs in the
driver and in scratch/verify_contract.py)."""

import __spark_entry__ as E


def test_oracle_keys_subset_of_queries():
    q = set(E.queries())
    o = set(E.oracle_sql())
    assert o <= q
    # only approximate / non-SQL-expressible ops may be rows-only
    assert q - o == {"ivf_topk", "embedding_near_dup_lsh", "pack_stats"}


def test_entry_runs_and_has_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert "dmltype" in df.columns


def test_every_query_runs_at_sf0001(spark, sf_dir):
    for name, fn in E.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
