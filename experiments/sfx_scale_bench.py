"""VERDICT r11 #7: the sf0.1 bench cannot see scale wins (every 8-vs-32
core ratio ≈ 1 because fixed driver/job overhead dominates). This
spot-bench builds a deterministic 10x tier from sf0.1 (documents/events
replicated with id offsets — same distributions, 10x the rows) and
times the compute-bound rows at a low and a high core count so the
round's shuffle-shape claims are demonstrated where compute dominates.

Usage:
  python experiments/sfx_scale_bench.py gen              # build /dev/shm/sfx1
  SPARK_GRAFT_CPUS=8  python experiments/sfx_scale_bench.py run
  SPARK_GRAFT_CPUS=32 python experiments/sfx_scale_bench.py run

Not a correctness surface: no oracle covers the synthetic tier; the
per-SF golden queries (simhash/minhash counts) are run via their
library operators, not the pinned-golden entry rows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SFX_DIR", "/dev/shm/sfx1")
FACTOR = int(os.environ.get("SFX_FACTOR", "10"))


def gen() -> int:
    from pyspark.sql import functions as F

    from kapacitor_spark import get_spark
    from kapacitor_spark.session import read_table

    spark = get_spark("sfx-gen")
    os.makedirs(DST, exist_ok=True)
    docs = read_table(spark, f"{SRC}/documents.parquet")
    ndocs = docs.count()
    reps = spark.range(FACTOR).withColumnRenamed("id", "__rep")
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("__rep") * (ndocs * 10)).alias("doc_id"),
            # perturb replicated text deterministically so signatures differ
            # across replicas (otherwise dedup finds 10x identical classes,
            # which is NOT how a larger corpus behaves): prefix a replica
            # token. Replica 0 keeps the original text.
            F.when(F.col("__rep") == 0, F.col("text"))
            .otherwise(F.concat(F.lit("r"), F.col("__rep").cast("string"),
                                F.lit(" "), F.col("text"))).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        .repartition(8)
        .write.mode("overwrite").parquet(f"{DST}/documents.parquet")
    )
    ev = read_table(spark, f"{SRC}/events.parquet")
    nev = ev.count()
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("__rep") * (nev * 10)).alias("event_id"),
            *[c for c in ev.columns if c != "event_id"],
        )
        .repartition(8)
        .write.mode("overwrite").parquet(f"{DST}/events.parquet")
    )
    print(f"generated {DST}: docs {ndocs}x{FACTOR}, events {nev}x{FACTOR}")
    return 0


def run() -> int:
    from pyspark.sql import functions as F

    from kapacitor_spark import get_spark
    from kapacitor_spark.dataprep.dedup import (
        _spread, minhash_near_dup, signature_classes, simhash,
        simhash_band_expr,
    )
    from kapacitor_spark.dataprep.dedup import span_dedup_stats
    from kapacitor_spark.dataprep.sketches import cm_rollup
    from kapacitor_spark.session import read_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(f"sfx-run-{cpus}")
    docs = read_table(spark, f"{DST}/documents.parquet")
    ev = read_table(spark, f"{DST}/events.parquet")
    # warmup
    docs.selectExpr("count(*)").collect()
    ev.selectExpr("count(*)").collect()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(label, fn, n=int(os.environ.get("SFX_RUNS", "2"))):
        best = None
        for _ in range(n):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label} cpus={cpus}: {best:.3f}")

    def run_cm():
        noop(cm_rollup(ev, time_col="ts", every="1 day",
                       dims=("event_type",), value_col="user_id"))

    def run_simhash_counts():
        sh = simhash(_spread(docs))
        cl = signature_classes(sh, "simhash", "doc_id").persist()
        cl.count()
        pa = cl.select(F.col("simhash").alias("sa"), F.col("__m").alias("__ma"))
        pb = cl.select(F.col("simhash").alias("sb"), F.col("__m").alias("__mb"))
        pairs = pa.crossJoin(pb).filter(
            (F.col("sa") <= F.col("sb"))
            & (F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= 3)
        )
        share = F.array_contains(
            F.zip_with(simhash_band_expr("sa", 3), simhash_band_expr("sb", 3),
                       lambda x, y: x == y), F.lit(True))
        cross = F.col("sa") < F.col("sb")
        w = F.col("__ma") * F.col("__mb")
        pairs.agg(
            F.sum(F.when(cross & share, w)).alias("blocked"),
            F.sum(F.when(cross, w)).alias("brute"),
        ).collect()
        cl.unpersist()

    def run_minhash():
        noop(minhash_near_dup(docs, threshold=0.5))

    def run_span():
        noop(span_dedup_stats(docs))

    only = set(os.environ.get("SFX_ONLY", "").split(",")) - {""}
    for label, fn in [("cm_rollup", run_cm),
                      ("simhash_counts", run_simhash_counts),
                      ("minhash_near_dup", run_minhash),
                      ("span_dedup_stats", run_span)]:
        if not only or label in only:
            timed(label, fn)
    return 0


if __name__ == "__main__":
    raise SystemExit(gen() if sys.argv[1:] == ["gen"] else run())
