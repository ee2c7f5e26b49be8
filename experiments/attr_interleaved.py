"""Interleaved (bench-style round-robin) attribution of the simhash
entry per-sample cost: r9-collapse vs r8-direct vs brute-only vs
V2-collapse, each sample = full entry flow (sig fill + one union-agg
action + unpersist). Interleaving makes the four series share ambient
box noise the way bench.py's sampler does."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kapacitor_spark import get_spark  # noqa: E402
from kapacitor_spark.dataprep.dedup import (  # noqa: E402
    _spread,
    signature_classes,
    simhash,
    simhash_band_expr,
    simhash_near_dup,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("attr-interleaved")
docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))


def brute_df(sh):
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("ha"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("hb"))
    return (
        a.crossJoin(b)
        .filter("id_a < id_b")
        .filter(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= 3)
        .select("id_a", "id_b")
    )


def v_r8(sh):
    band_cols = simhash_band_expr("simhash", 3)
    banded = sh.select("doc_id", "simhash", F.posexplode(band_cols).alias("band", "band_val"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band", "band_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .distinct()
    )


def v2(sh):
    # no classes aggregate: band over DISTINCT signatures ordered by the
    # signature value itself; within-class self-pairs from ALL sigs, the
    # __ia<__ib guard drops m=1 diagonals
    sigs = sh.select("simhash").distinct()
    band_cols = simhash_band_expr("simhash", 3)
    banded = sigs.select("simhash", F.posexplode(band_cols).alias("band", "band_val"))
    a, b = banded.alias("a"), banded.alias("b")
    sig_pairs = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("a.simhash") < F.col("b.simhash"))
        .select(
            F.col("a.simhash").alias("__sa"),
            F.col("b.simhash").alias("__sb"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .distinct()
    )
    pair_src = sig_pairs.unionByName(
        sigs.select(
            F.col("simhash").alias("__sa"),
            F.col("simhash").alias("__sb"),
            F.lit(0).cast("integer").alias("hamming"),
        )
    )
    ma = sh.select(F.col("simhash").alias("__sa"), F.col("doc_id").alias("__ia"))
    mb = sh.select(F.col("simhash").alias("__sb"), F.col("doc_id").alias("__ib"))
    return (
        pair_src.join(ma, "__sa")
        .join(mb, "__sb")
        .filter((F.col("__sa") != F.col("__sb")) | (F.col("__ia") < F.col("__ib")))
        .select(
            F.least("__ia", "__ib").alias("id_a"),
            F.greatest("__ia", "__ib").alias("id_b"),
            "hamming",
        )
    )


def empty_blocked(sh):
    return v_r8(sh).limit(0)


def sample(blocked_fn):
    t0 = time.time()
    sh = simhash(_spread(docs)).persist()
    blocked = blocked_fn(sh).select(F.lit("blocked").alias("side"))
    brute = brute_df(sh).select(F.lit("brute").alias("side"))
    _ = (
        blocked.unionAll(brute)
        .groupBy("side")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    sh.unpersist()
    return time.time() - t0


CONFIGS = [
    ("r9 collapse", lambda sh: simhash_near_dup(docs, max_hamming=3, sig_df=sh)),
    ("r8 direct", v_r8),
    ("V2 no-classes", v2),
    ("brute only", empty_blocked),
]

for name, fn in CONFIGS:  # warmups
    sample(fn)
    sample(fn)
res = {name: [] for name, _ in CONFIGS}
for _ in range(5):
    for name, fn in CONFIGS:
        res[name].append(sample(fn))
for name, _ in CONFIGS:
    ts = sorted(res[name])
    print(f"{name:14s} min={ts[0]:6.3f} med={ts[2]:6.3f}", flush=True)
