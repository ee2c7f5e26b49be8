"""Attribute per-sample cost inside the simhash_near_dup ENTRY flow:
the entry persists sh, runs blocked+brute in one union-agg action, then
unpersists sh — so every bench sample re-pays the signature fill, and
(question under test) whether the classes cache entry survives the
parent's unpersist across samples."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kapacitor_spark import get_spark  # noqa: E402
from kapacitor_spark.dataprep.dedup import (  # noqa: E402
    _spread,
    simhash,
    simhash_band_expr,
    simhash_near_dup,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("attr-simhash")
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


def sample(blocked_fn):
    t0 = time.time()
    sh = simhash(_spread(docs)).persist()
    sh.count()
    t_fill = time.time() - t0

    t0 = time.time()
    blocked = blocked_fn(sh).select(F.lit("blocked").alias("side"))
    brute = brute_df(sh).select(F.lit("brute").alias("side"))
    _ = (
        blocked.unionAll(brute)
        .groupBy("side")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    t_act = time.time() - t0

    t0 = time.time()
    sh.unpersist()
    t_unp = time.time() - t0
    return t_fill, t_act, t_unp


def brute_only(sh):
    # blocked replaced by empty — isolates the brute+agg share
    return v_r8(sh).limit(0)


for name, fn in [
    ("r9 collapse", lambda sh: simhash_near_dup(docs, max_hamming=3, sig_df=sh)),
    ("r8 direct", v_r8),
    ("brute only", brute_only),
]:
    for _ in range(2):
        sample(fn)
    rows = [sample(fn) for _ in range(5)]
    fills = sorted(r[0] for r in rows)
    acts = sorted(r[1] for r in rows)
    unps = sorted(r[2] for r in rows)
    print(
        f"{name:12s} fill min={fills[0]:.3f} med={fills[2]:.3f} | "
        f"action min={acts[0]:.3f} med={acts[2]:.3f} | unpersist med={unps[2]:.3f}",
        flush=True,
    )
