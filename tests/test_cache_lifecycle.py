"""Persist-lifecycle hygiene: every dataprep/operator cache either drops
before its operator returns, or is registered with the cache registry so
``release_caches()`` returns executor storage to baseline.

Why this matters at scale: a long-lived session running many dedup /
autoscale batches would otherwise accumulate cached partitions until LRU
eviction starts thrashing the caches that ARE hot (the round-7 bench's
simhash anomaly was suspected to be exactly this shape). The registry
makes the release point explicit and testable.

The assertions read Spark SQL's CacheManager (DataFrame-level cache
entries) rather than ``getPersistentRDDs``: localCheckpoint blocks are
RDD-level, reclaimed by the ContextCleaner when their DataFrame is GC'd,
and would make an RDD-level count flaky across the session-scoped suite.
"""

from __future__ import annotations

import logging

import pytest
from pyspark.sql import functions as F

from kapacitor_spark.dataprep.cache import release_caches
from tests.conftest import SF_DIR


def _sql_cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def _run(spark, name: str) -> None:
    import __spark_entry__ as entry_mod

    entry_mod.queries()[name](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()


@pytest.mark.parametrize(
    "name",
    [
        "minhash_near_dup",       # signature + candidate-pair caches
        "simhash_near_dup",       # signature cache
        "ngram_jaccard_dedup",    # shingle-set cache
        "image_dhash_near_dup",   # decoded-hash signature cache
        "audio_dhash_near_dup",   # envelope-hash signature cache
        "image_phash_near_dup",   # DCT-hash signature cache
        "ann_recall",             # exact-topk cache
        "span_dedup_stats",       # deliberately persist-free (still checked)
        "bm25_topk",              # r9: persisted postings index
        "lm_perplexity",          # r9: persisted bigram count table
        "bpe_corpus_stats",       # r9: persisted tokenized output
    ],
)
def test_registry_query_caches_release_to_baseline(spark, name):
    release_caches()
    spark.catalog.clearCache()  # clean slate (other tests' leftovers)
    _run(spark, name)
    release_caches()
    assert _sql_cache_empty(spark), name


def test_autoscale_events_unpersists_inline(spark):
    """autoscale_decisions releases its persisted walk output ITSELF (the
    returned events are eagerly materialized via localCheckpoint first),
    so back-to-back autoscale batches never accumulate SQL-cache entries
    — even while the caller still holds the returned DataFrame."""
    release_caches()
    spark.catalog.clearCache()
    import __spark_entry__ as entry_mod

    ev = entry_mod.queries()["autoscale_decisions"](spark, SF_DIR)
    assert _sql_cache_empty(spark)
    assert ev.count() > 0  # returned events stay fully usable


def test_release_caches_idempotent_and_counts(spark, sf_dir):
    from kapacitor_spark.dataprep.dedup import minhash_near_dup

    release_caches()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    minhash_near_dup(docs).count()
    assert release_caches() >= 2  # signature + candidates
    assert release_caches() == 0  # registry cleared


def test_near_dup_clusters_logs_fast_path(spark, caplog):
    from kapacitor_spark.dataprep.dedup import near_dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    with caplog.at_level(logging.INFO, logger="kapacitor_spark.dataprep.dedup"):
        out = {r["doc_id"]: r["keeper"] for r in near_dup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert any("driver union-find fast path" in m for m in caplog.messages)


def test_near_dup_clusters_logs_distributed_path(spark, caplog):
    from kapacitor_spark.dataprep.dedup import near_dup_clusters

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    with caplog.at_level(logging.INFO, logger="kapacitor_spark.dataprep.dedup"):
        out = {
            r["doc_id"]: r["keeper"]
            for r in near_dup_clusters(pairs, max_driver_pairs=0).collect()
        }
    assert out == {1: 1, 2: 1, 3: 1}
    assert any("distributed pointer-jumping walk" in m for m in caplog.messages)


def test_near_dup_clusters_probe_loss_reuses_materialized_pairs(spark, caplog):
    """When the probe LOSES (pair set larger than the cap), the distributed
    walk must consume the persisted probe output and unpersist it on exit —
    the expensive upstream pipeline runs once, and no cache entry leaks."""
    from kapacitor_spark.dataprep.dedup import near_dup_clusters

    release_caches()
    spark.catalog.clearCache()
    rows = [(i, i + 1) for i in range(0, 40, 2)]
    pairs = spark.createDataFrame(rows, "id_a long, id_b long")
    with caplog.at_level(logging.INFO, logger="kapacitor_spark.dataprep.dedup"):
        out = near_dup_clusters(pairs, max_driver_pairs=5)
    assert any("distributed pointer-jumping walk" in m for m in caplog.messages)
    got = {r["doc_id"]: r["keeper"] for r in out.collect()}
    assert got == {i: (i // 2) * 2 for i in range(40)}
    assert _sql_cache_empty(spark)
