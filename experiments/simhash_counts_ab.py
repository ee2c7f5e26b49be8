"""A/B simhash_near_dup's counts action: the r11 7-branch shape (band
explode+self-join + distinct + union + two weight joins; OLD) vs the r12
single cross-join aggregate with the band-agreement expression (NEW).

One process per timing (python experiments/simhash_counts_ab.py old|new N
[--explain planfile]); an outer shell alternates processes so box drift
hits both variants equally. Inside a process: 1 warmup + N timed runs of
the FULL query (fold + prefill + counts action), min reported.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_counts_df(spark, variant: str):
    """Returns (cl, counts_df, finish) where finish(collected_rows) -> (blocked, brute)."""
    from pyspark.sql import functions as F

    from kapacitor_spark.dataprep.dedup import (
        _spread, signature_classes, simhash, simhash_band_expr,
    )
    from kapacitor_spark.session import read_table

    docs = read_table(spark, os.path.join(SF_DIR, "documents.parquet"))
    sh = simhash(_spread(docs))
    cl = signature_classes(sh, "simhash", "doc_id").persist()
    cl.count()

    if variant == "old":
        banded = cl.select(
            "simhash",
            F.posexplode(simhash_band_expr("simhash", 3)).alias("band", "band_val"),
        )
        ba, bb = banded.alias("a"), banded.alias("b")
        bl = (
            ba.join(bb, ["band", "band_val"])
            .filter(F.col("a.simhash") < F.col("b.simhash"))
            .filter(F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))) <= 3)
            .select(F.col("a.simhash").alias("sa"), F.col("b.simhash").alias("sb"))
            .distinct()
        )
        ca = cl.select(F.col("simhash").alias("sa"))
        cb = cl.select(F.col("simhash").alias("sb"))
        br = (
            ca.crossJoin(cb)
            .filter(F.col("sa") < F.col("sb"))
            .filter(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= 3)
        )
        tagged = bl.withColumn("side", F.lit("blocked")).unionByName(
            br.withColumn("side", F.lit("brute"))
        )
        wa = cl.select(F.col("simhash").alias("sa"), F.col("__m").alias("__ma"))
        wb = cl.select(F.col("simhash").alias("sb"), F.col("__m").alias("__mb"))
        weighted = (
            tagged.join(wa, "sa")
            .join(wb, "sb")
            .groupBy("side")
            .agg(F.sum(F.col("__ma") * F.col("__mb")).alias("n"))
        )
        within_df = (
            cl.filter(F.col("__m") > 1)
            .agg(F.sum(F.expr("__m * (__m - 1) div 2")).alias("n"))
            .select(F.lit("within").alias("side"), "n")
        )
        counts_df = weighted.unionByName(within_df)

        def finish(rows):
            counts = {r["side"]: r["n"] for r in rows if r["n"] is not None}
            within = int(counts.get("within", 0))
            return (
                int(counts.get("blocked", 0)) + within,
                int(counts.get("brute", 0)) + within,
            )

        return cl, counts_df, finish

    pa = cl.select(F.col("simhash").alias("sa"), F.col("__m").alias("__ma"))
    pb = cl.select(F.col("simhash").alias("sb"), F.col("__m").alias("__mb"))
    pairs = pa.crossJoin(pb).filter(
        (F.col("sa") <= F.col("sb"))
        & (F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= 3)
    )
    share_band = F.array_contains(
        F.zip_with(
            simhash_band_expr("sa", 3),
            simhash_band_expr("sb", 3),
            lambda x, y: x == y,
        ),
        F.lit(True),
    )
    cross = F.col("sa") < F.col("sb")
    w = F.col("__ma") * F.col("__mb")
    counts_df = pairs.agg(
        F.sum(F.when(cross & share_band, w)).alias("blocked"),
        F.sum(F.when(cross, w)).alias("brute"),
        F.sum(
            F.when(F.col("sa") == F.col("sb"), F.expr("__ma * (__ma - 1) div 2"))
        ).alias("within"),
    )

    def finish(rows):
        row = rows[0]
        within = int(row["within"] or 0)
        return int(row["blocked"] or 0) + within, int(row["brute"] or 0) + within

    return cl, counts_df, finish


def run_once(spark, variant: str):
    cl, counts_df, finish = build_counts_df(spark, variant)
    rows = counts_df.collect()
    out = finish(rows)
    cl.unpersist()
    return out


def main():
    variant = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from kapacitor_spark import get_spark

    spark = get_spark(f"simhash-counts-ab-{variant}")
    if "--explain" in sys.argv:
        planfile = sys.argv[sys.argv.index("--explain") + 1]
        cl, counts_df, _ = build_counts_df(spark, variant)
        import contextlib, io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            counts_df.explain("formatted")
        with open(planfile, "w") as f:
            f.write(buf.getvalue())
        cl.unpersist()
        print(f"plan -> {planfile}")
        return
    res = run_once(spark, variant)  # warmup (JIT, parquet footers)
    times = []
    for _ in range(n):
        t0 = time.time()
        out = run_once(spark, variant)
        times.append(time.time() - t0)
        assert out == res, (out, res)
    print(
        f"{variant}: blocked={res[0]} brute={res[1]} "
        f"min={min(times):.3f} all={[round(t, 3) for t in times]}"
    )


if __name__ == "__main__":
    main()
