"""Guards on the driver-facing contracts so registry edits can't silently
break the scoring pipeline: the 50-slot scored window stays fully
oracle-backed, every bench HEADLINE name resolves, and the oracle SQL
strings at least parse in DuckDB (a syntax error here would zero a
CORRECTNESS row at scoring time, far from the edit that caused it)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
import bench


def test_scored_window_is_curated_and_oracled():
    qs = list(entry_mod.queries())
    oracles = entry_mod.oracle_sql()
    assert len(entry_mod._SCORED_ORDER) == 50
    assert qs[:50] == entry_mod._SCORED_ORDER
    missing = [n for n in qs[:50] if n not in oracles]
    assert not missing, f"scored window has rows-only queries: {missing}"


def test_bench_headline_names_resolve():
    qs = entry_mod.queries()
    unknown = [n for n in bench.HEADLINE if n not in qs]
    assert not unknown, unknown


def test_every_oracle_sql_parses_in_duckdb(sf_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = []
    for name, sql in entry_mod.oracle_sql().items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e).splitlines()[0]))
    con.close()
    assert not bad, bad


def test_queries_are_uniquely_named_and_callable():
    qs = entry_mod.queries()
    assert len(qs) == len(set(qs))
    assert all(callable(f) for f in qs.values())
