"""Every registered __spark_entry__ query vs its DuckDB oracle, under
pytest — including the ones beyond the driver's 50-slot scored window
(VERDICT r3 #2: demoted queries must keep the identical DuckDB
comparison locally).

Runs at sf0.001 by default (SPARK_GRAFT_TEST_SF_DIR to override); the
driver's own gate runs the first 50 at sf0.01. tests/oracle_check.py is
the manual sf0.01 harness for the full set.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from tests.oracle_check import TABLES, compare

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()

# Queries whose semantics need more data than sf0.001 provides (recall
# floors over a handful of vectors; near-dup oracles whose SQL emulation
# of banding matches only above a minimum corpus size): run them at
# sf0.01 regardless of the suite-wide SF.
_MIN_SF001 = {
    "ann_recall",
    "minhash_near_dup",
    # simhash_near_dup / stream_dedup_match no longer pin one tier: their
    # oracles key the per-SF golden off the fixture's content checksum
    # (r9), so they run — and are asserted — at every SF.
}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.fixture(scope="module")
def duck_sf001():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", list(_QUERIES))
def test_oracle(name, spark, sf_dir, duck, duck_sf001):
    if name in _MIN_SF001:
        sf, con = "/root/testdata/sf0.01", duck_sf001
    else:
        sf, con = sf_dir, duck
    sdf = _QUERIES[name](spark, sf).toPandas()
    if name not in _ORACLES:
        # rows-only check (non-SQL-expressible op) — pinned elsewhere by
        # reference-golden fixtures
        assert sdf is not None
        return
    odf = con.sql(_ORACLES[name]).df()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name}: {problems}"
