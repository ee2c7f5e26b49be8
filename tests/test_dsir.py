"""DSIR (Xie et al. 2023): exact-gram weights pinned against an
independent pure-Python re-derivation, hashed-mode equivalence when the
bucket map is injective, collision folding when it is not, and the
percentile-threshold selection step (fraction, determinism, Gumbel)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kapacitor_spark.dataprep.dsir import dsir_features, dsir_select, dsir_weights

DOCS = [
    (0, "the cat sat on the mat"),          # target slice (doc_id % 3 == 0)
    (1, "stock prices rallied sharply today"),
    (2, "the cat chased the dog"),
    (3, "the dog sat on the rug"),           # target slice
    (4, "quarterly earnings beat expectations again"),
    (5, None),                               # null doc: no features, omitted
]


def _ref_weights(rows, target_ids, alpha=0.5):
    """Independent reference: dict-based bag models, floats, no Spark."""
    def grams(text):
        toks = [t for t in text.lower().strip().split() if t]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    raw_feats = {i: grams(t) for i, t in rows if t is not None}
    cr: dict = {}
    ct: dict = {}
    for i, fs in raw_feats.items():
        for f in fs:
            cr[f] = cr.get(f, 0) + 1
            if i in target_ids:
                ct[f] = ct.get(f, 0) + 1
    tr = float(sum(cr.values()))
    tt = float(sum(ct.values()))
    v = float(len(cr))  # target ⊆ raw, so the union is raw's vocab
    out = {}
    for i, fs in raw_feats.items():
        w = 0.0
        for f in fs:
            lr = math.log((ct.get(f, 0) + alpha) / (tt + alpha * v)) - math.log(
                (cr[f] + alpha) / (tr + alpha * v)
            )
            w += round(lr, 9)
        out[i] = (len(fs), round(w, 6))
    return out


def test_exact_mode_matches_independent_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    target = df.filter("doc_id % 3 = 0")
    got = {
        r["doc_id"]: (r["n_features"], r["log_weight"])
        for r in dsir_weights(df, target, n_buckets=None).collect()
    }
    ref = _ref_weights(DOCS, {0, 3})
    assert got == {k: (n, pytest.approx(w, abs=2e-6)) for k, (n, w) in ref.items()}
    assert 5 not in got  # null doc carries no features
    # the semantic point: target-flavored docs outweigh off-distribution ones
    assert got[2][1] > got[1][1] and got[3][1] > got[4][1]


def test_hashed_mode_equivalence_and_collisions(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    target = df.filter("doc_id % 3 = 0")
    exact = {
        r["doc_id"]: (r["n_features"], r["log_weight"])
        for r in dsir_weights(df, target, n_buckets=None).collect()
    }
    # the smoothing denominators carry V (vocab size vs bucket count),
    # so each feature occurrence's log-ratio differs between modes by
    # the CONSTANT ln((tr+aV)/(tt+aV)) — when the hash is injective the
    # V-independent component w - n_features*const must agree exactly
    # (up to the round-9 partials)
    feats_all = dsir_features(df, n_buckets=None)
    tr = feats_all.count()
    tt = dsir_features(target, n_buckets=None).count()
    feats = feats_all.select("feature").distinct()
    nb = 1 << 20
    hashed_ids = feats.select(
        F.pmod(F.xxhash64("feature"), F.lit(nb)).alias("b")
    ).distinct()
    injective = hashed_ids.count() == feats.count()
    assert injective, "fixture vocabulary collides at 2^20 buckets; pick a new seed corpus"
    hashed = {
        r["doc_id"]: (r["n_features"], r["log_weight"])
        for r in dsir_weights(df, target, n_buckets=nb).collect()
    }

    def deshift(d, v):
        const = math.log((tr + 0.5 * v) / (tt + 0.5 * v))
        return {k: w - n * const for k, (n, w) in d.items()}

    ve = feats.count()
    de, dh = deshift(exact, ve), deshift(hashed, nb)
    for k in de:
        assert de[k] == pytest.approx(dh[k], abs=1e-5)
    hashed = {k: w for k, (_, w) in hashed.items()}
    # tiny bucket count MUST fold counts (pigeonhole): weights change
    folded = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(df, target, n_buckets=4).collect()
    }
    assert folded != hashed


def test_select_fraction_and_determinism(spark):
    rows = [(i, ("the cat sat " if i % 2 == 0 else "stocks fell ") * 5) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    target = df.filter("doc_id % 10 = 0")  # all even-flavored
    sel = dsir_select(df, target, keep_frac=0.5, n_buckets=None).collect()
    kept = {r["doc_id"] for r in sel if r["selected"]}
    # even-flavored docs are the target distribution -> they are the kept half
    assert kept == {i for i in range(40) if i % 2 == 0}
    # Gumbel perturbation is deterministic per seed
    a = sorted(
        (r["doc_id"], r["selected"])
        for r in dsir_select(df, target, keep_frac=0.3, n_buckets=None,
                             gumbel_beta=0.5, seed=11).collect()
    )
    b = sorted(
        (r["doc_id"], r["selected"])
        for r in dsir_select(df, target, keep_frac=0.3, n_buckets=None,
                             gumbel_beta=0.5, seed=11).collect()
    )
    assert a == b
    assert sum(1 for _, s in a if s) >= 1


def test_artifact_builds_without_id_column(spark):
    """ADVICE r10: dsir_artifact needs no document identity — it must
    build from corpora whose id column is named anything (or absent),
    and produce the identical model."""
    from kapacitor_spark.dataprep.dsir import dsir_artifact

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    target = df.filter("doc_id % 3 = 0")
    renamed = df.withColumnRenamed("doc_id", "url")
    rtarget = target.withColumnRenamed("doc_id", "url")
    art = dsir_artifact(df, target, n_buckets=512)
    art2 = dsir_artifact(renamed, rtarget, n_buckets=512)
    art3 = dsir_artifact(
        df.select("text"), target.select("text"), n_buckets=512
    )
    assert art == art2 == art3


def test_artifact_stream_scorer_matches_batch(spark, tmp_path):
    """The frozen-artifact scorer (continuous-ingestion shape) must
    agree with the distributed hashed-mode batch scorer bit-for-bit on
    the same corpus (pre-rounded ratios summed as scaled integers ==
    the DECIMAL(38,9) partial sums), and it must score documents with
    UNSEEN vocabulary via the default bucket ratio — something the
    batch join (whose model derives from the raw corpus) never faces."""
    from kapacitor_spark.dataprep.dsir import dsir_artifact, dsir_score_stream

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    target = df.filter("doc_id % 3 = 0")
    nb = 4096
    art = dsir_artifact(df, target, n_buckets=nb)
    batch = {
        r["doc_id"]: (r["n_features"], r["log_weight"])
        for r in dsir_weights(df, target, n_buckets=nb).collect()
    }
    scored = {
        r["doc_id"]: (r["n_features"], r["log_weight"])
        for r in dsir_score_stream(df, art).collect()
    }
    assert scored == batch
    # truly streaming: same rows through a file-stream micro-batch
    from kapacitor_spark.streaming import run_available_now

    src = tmp_path / "docs"
    df.filter("text IS NOT NULL").coalesce(1).write.parquet(str(src))
    sdf = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    out = run_available_now(
        dsir_score_stream(sdf, art), "dsir_stream", str(tmp_path / "ck"),
        output_mode="append",
    )
    streamed = {
        r["doc_id"]: (r["n_features"], r["log_weight"]) for r in out.collect()
    }
    assert streamed == batch
    # unseen vocabulary scores through the default ratio, never errors
    new = spark.createDataFrame(
        [(99, "zzz qqq completely unseen words")], "doc_id long, text string"
    )
    got = dsir_score_stream(new, art).collect()[0]
    assert got["n_features"] == 9  # 5 unigrams + 4 bigrams
    assert got["log_weight"] is not None
