"""Driver-contract smoke tests: entry(), queries(), oracle_sql() coherence."""

from __future__ import annotations

import importlib

import duckdb
import pytest

entry_mod = importlib.import_module("__spark_entry__")


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_queries_all_run(spark, sf_dir):
    qs = entry_mod.queries()
    assert qs, "no queries registered"
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_oracle_sql_keys_subset_of_queries():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)


def test_oracle_sql_parses_in_duckdb(sf_dir):
    con = duckdb.connect()
    import os

    from medvedi_spark.catalog import TABLES

    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, name)}.parquet')")
    for name, sql in entry_mod.oracle_sql().items():
        con.execute(sql).fetchall()
