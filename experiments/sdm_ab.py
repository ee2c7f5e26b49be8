"""A/B stream_dedup_match's counts pipeline: shared+prefilled arriving
fold (NEW) vs the r10 shape that folds the arriving half twice and lets
the 3-consumer action race the unfilled hsig cache (OLD).

One process per timing (python experiments/sdm_ab.py old|new N); an outer
shell alternates processes so box drift hits both variants equally.
Inside a process: 1 warmup + N timed runs, min reported.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run(spark, variant: str):
    from pyspark.sql import functions as F

    from kapacitor_spark.dataprep.dedup import _spread, simhash
    from kapacitor_spark.session import read_table
    from kapacitor_spark.streaming import simhash_match_stream

    docs = read_table(spark, os.path.join(SF_DIR, "documents.parquet"))
    hist = docs.filter("doc_id % 2 = 0")
    arriving = docs.filter("doc_id % 2 = 1")
    hsig = simhash(_spread(hist)).persist()
    if variant == "new":
        asig = simhash(_spread(arriving)).persist()
        hsig.count()
        asig.count()
        matches = simhash_match_stream(
            arriving.select("doc_id"), hsig, max_hamming=3, sig_df=asig
        )
    else:
        asig = simhash(_spread(arriving))
        matches = simhash_match_stream(arriving, hsig, max_hamming=3)
    brute = (
        asig.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"))
        .crossJoin(
            hsig.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"))
        )
        .filter(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= 3)
    )
    counts = {
        r["side"]: r["n"]
        for r in matches.select(F.lit("m").alias("side"))
        .unionAll(brute.select(F.lit("b").alias("side")))
        .groupBy("side")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    hsig.unpersist()
    if variant == "new":
        asig.unpersist()
    return counts


def main() -> int:
    from kapacitor_spark import get_spark

    variant = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(f"sdm-ab-{variant}")
    # match bench warmup shape
    import __spark_entry__ as entry

    entry.queries()["lambda_where_regex"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    c0 = run(spark, variant)  # warmup
    ts = []
    for _ in range(n):
        t0 = time.time()
        c = run(spark, variant)
        ts.append(time.time() - t0)
        assert c == c0, (c, c0)
    print(f"{variant}: counts={c0} min={min(ts):.3f} all={[round(t,3) for t in ts]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
