"""Session-cache lifecycle registry for dataprep intermediates.

Several dedup/similarity operators persist a small intermediate (signature
tables, candidate-pair sets, shingle streams) that the RETURNED lazy
DataFrame still references — the cache entry therefore cannot be dropped
inside the operator without un-doing the persist (Spark substitutes
InMemoryRelation at physical-planning time, so an unpersist that runs
before the caller's action simply erases the plan's cache mapping and the
intermediate recomputes once per consumer).

Those caches are deliberate and bounded:

* WITHIN one action, a persisted intermediate consumed by k plan branches
  materializes once instead of k times (Spark caches mid-job).
* ACROSS repeated invocations, Spark's CacheManager dedups by canonical
  plan, so re-running the same query re-uses ONE cache entry rather than
  accumulating copies — memory is bounded by the number of DISTINCT
  operator invocations, not call count.

What was missing is a defined release point. Every such persist site calls
:func:`track`; a long-lived session (or a test asserting cache hygiene)
calls :func:`release_caches` once the results have been consumed, returning
executor storage to baseline. Operators whose intermediate is fully
consumed before return (e.g. the pointer-jumping walk's edge set, which is
only read by the driver loop) still unpersist inline and never appear here.
"""

from __future__ import annotations

import logging
import threading

from pyspark.sql import DataFrame

_log = logging.getLogger("kapacitor_spark.dataprep.cache")
_LOCK = threading.Lock()
# keyed by the analyzed plan's semanticHash: re-invoking the same operator
# re-persists the semantically-identical plan, which Spark's CacheManager
# maps to ONE storage entry — the registry must not grow a handle per call
# (the executor-storage bound in the module docstring covered storage, not
# this driver-side list). Fallback key is object identity.
_TRACKED: dict[int, DataFrame] = {}
_WARN_AT = 512
_warned = False


def _plan_key(df: DataFrame) -> int:
    try:
        return int(df._jdf.queryExecution().analyzed().semanticHash())
    except Exception:
        return id(df)


def track(df: DataFrame) -> DataFrame:
    """Register a persisted DataFrame for deferred release; returns it.

    Dedups by the plan's semantic hash and is thread-safe (streaming
    foreachBatch callers run on Spark's execution threads)."""
    global _warned
    key = _plan_key(df)
    with _LOCK:
        if key not in _TRACKED:
            _TRACKED[key] = df
            if len(_TRACKED) > _WARN_AT and not _warned:
                _warned = True
                _log.warning(
                    "cache registry exceeds %d distinct persisted plans; "
                    "call release_caches() between pipeline stages to "
                    "return executor storage to baseline",
                    _WARN_AT,
                )
    return df


def release_caches() -> int:
    """Unpersist every tracked DataFrame; returns how many were released.

    Safe to call at any time: queries re-materialize their intermediates
    on next use (correctness never depends on the cache). Idempotent —
    the registry is cleared, and double-unpersist is a Spark no-op.
    """
    global _warned
    with _LOCK:
        dfs = list(_TRACKED.values())
        _TRACKED.clear()
        _warned = False
    n = 0
    for df in dfs:
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
