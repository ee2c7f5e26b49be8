"""Every registered __spark_entry__ query vs its DuckDB oracle, under
pytest — including the ones beyond the driver's 50-slot scored window
(VERDICT r3 #2: demoted queries must keep the identical DuckDB
comparison locally).

Runs at sf0.001 by default (SPARK_GRAFT_TEST_SF_DIR to override); the
driver's own gate runs the first 50 at sf0.01. tests/oracle_check.py is
the manual sf0.01 harness for the full set.

The sweep PRE-COMPUTES all comparisons once per session on a small
thread pool (guide §2.6: actions are only sequential because the driver
calls them sequentially; Spark schedules concurrent jobs fine, and the
per-query fixed cost — plan build + job launch on sf0.001 inputs —
dominates this sweep). Each parametrized test then asserts its own
query's stored result, so per-query reporting and failure attribution
are unchanged while wall clock drops ~4x. DuckDB work stays inside the
worker that owns the query via per-thread connections.
"""

from __future__ import annotations

import os
import sys
import threading
from concurrent.futures import ThreadPoolExecutor

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

# Streaming replays pin spark.sql.shuffle.partitions for the blocking
# run (run_available_now) — a session-wide conf that concurrent query
# builds must not race. Queries that go through the streaming machinery
# run sequentially after the parallel batch sweep.
_SERIAL_MARKERS = ("stream", "tick_")


def _is_serial(name: str) -> bool:
    return any(m in name for m in _SERIAL_MARKERS)


_local = threading.local()


def _compare_one(name: str, spark, sf_dir: str) -> list[str]:
    if name in _MIN_SF001:
        sf = "/root/testdata/sf0.01"
    else:
        sf = sf_dir
    sdf = _QUERIES[name](spark, sf).toPandas()
    if name not in _ORACLES:
        # rows-only check (non-SQL-expressible op) — pinned elsewhere by
        # reference-golden fixtures
        return [] if sdf is not None else [f"{name}: query returned None"]
    con = getattr(_local, "con_" + sf.replace("/", "_").replace(".", "_"), None)
    if con is None:
        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        setattr(_local, "con_" + sf.replace("/", "_").replace(".", "_"), con)
    odf = con.sql(_ORACLES[name]).df()
    return compare(name, sdf, odf)


@pytest.fixture(scope="module")
def sweep(spark, sf_dir):
    results: dict[str, list[str]] = {}

    def run(name: str):
        try:
            results[name] = _compare_one(name, spark, sf_dir)
        except Exception as e:  # surfaced by the owning test
            results[name] = [f"exception: {type(e).__name__}: {e}"]

    parallel = [n for n in _QUERIES if not _is_serial(n)]
    serial = [n for n in _QUERIES if _is_serial(n)]
    with ThreadPoolExecutor(max_workers=6) as pool:
        list(pool.map(run, parallel))
    for n in serial:
        run(n)
    return results


@pytest.mark.parametrize("name", list(_QUERIES))
def test_oracle(name, sweep):
    assert not sweep[name], f"{name}: {sweep[name]}"
