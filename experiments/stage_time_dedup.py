"""Stage-timing harness for the r9 dedup-family regression (VERDICT r9,
What's-wrong #1): where inside simhash_near_dup / minhash_near_dup /
image_dhash_near_dup did the identical-signature collapse spend its
+27-45% at sf0.1, and which restructuring claws it back with collapse
still ON.

Times each variant bench-style (2 warmups, min/med of 5, noop write)
at $SPARK_GRAFT_SF_DIR (default sf0.1). Results feed the SCALE.md
stage table; run:  python experiments/stage_time_dedup.py [simhash|minhash]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from kapacitor_spark import get_spark  # noqa: E402
from kapacitor_spark.dataprep.dedup import (  # noqa: E402
    _spread,
    hashed_shingles,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_near_dup,
    minhash_signature,
    signature_classes,
    simhash,
    simhash_band_expr,
    simhash_near_dup,
    tokenize,
)
from kapacitor_spark.dataprep.cache import track  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("stage-time-dedup")
docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))


def timeit(name, build, warm=2, n=5):
    def once():
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for _ in range(warm):
        once()
    ts = sorted(once() for _ in range(n))
    print(f"{name:44s} min={ts[0]:6.3f}  med={ts[len(ts) // 2]:6.3f}", flush=True)
    return ts[0]


# ------------------------------------------------------------------ #
# shared signature table, persisted once (mirrors the bench entry)
# ------------------------------------------------------------------ #
sh = simhash(_spread(docs)).persist()
sh.count()
n_docs = docs.count()
n_sigs = sh.select("simhash").distinct().count()
print(f"docs={n_docs} sigs={n_sigs} (identical-class rate {1 - n_sigs / n_docs:.4f})")


def v_r8(sig):
    """r8 formulation: band self-join directly over the per-doc table."""
    band_cols = simhash_band_expr("simhash", 3)
    banded = sig.select("doc_id", "simhash", F.posexplode(band_cols).alias("band", "band_val"))
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


def v_r9(sig):
    return simhash_near_dup(docs, max_hamming=3, sig_df=sig)


# V2: no classes aggregate at all — band over DISTINCT signatures with
# sa<sb as the canonical ordering; within-class pairs from unioning ALL
# sigs as self-pairs (the __ia<__ib guard drops m=1 diagonals).
sigs_v2 = sh.select("simhash").distinct().persist()


def v2(sig):
    band_cols = simhash_band_expr("simhash", 3)
    banded = sigs_v2.select("simhash", F.posexplode(band_cols).alias("band", "band_val"))
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
        sigs_v2.select(
            F.col("simhash").alias("__sa"),
            F.col("simhash").alias("__sb"),
            F.lit(0).cast("integer").alias("hamming"),
        )
    )
    ma = sig.select(F.col("simhash").alias("__sa"), F.col("doc_id").alias("__ia"))
    mb = sig.select(F.col("simhash").alias("__sb"), F.col("doc_id").alias("__ib"))
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


# V3: classes kept (m>=2 filter keeps pair_src small) but NOT persisted
# (recomputed from the cached sh — one cheap agg), and the verified
# sig-pair side explicitly broadcast into the expansion joins.
def v3(sig, persist_classes=False, bcast=True):
    classes = signature_classes(sig, "simhash", "doc_id")
    if persist_classes:
        classes = classes.persist()
    band_cols = simhash_band_expr("simhash", 3)
    banded = classes.select("simhash", F.posexplode(band_cols).alias("band", "band_val"))
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
        classes.filter(F.col("__m") > 1).select(
            F.col("simhash").alias("__sa"),
            F.col("simhash").alias("__sb"),
            F.lit(0).cast("integer").alias("hamming"),
        )
    )
    if bcast:
        pair_src = F.broadcast(pair_src)
    ma = sig.select(F.col("simhash").alias("__sa"), F.col("doc_id").alias("__ia"))
    mb = sig.select(F.col("simhash").alias("__sb"), F.col("doc_id").alias("__ib"))
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


def main_simhash():
    print("== simhash_near_dup variants (shared persisted sh) ==")
    # stage components first
    timeit("stage: classes agg (no persist)", lambda: signature_classes(sh))
    classes_p = signature_classes(sh).persist()
    classes_p.count()

    def band_only(src, key):
        band_cols = simhash_band_expr("simhash", 3)
        banded = src.select("simhash", F.posexplode(band_cols).alias("band", "band_val"))
        a, b = banded.alias("a"), banded.alias("b")
        return (
            a.join(b, ["band", "band_val"])
            .filter(F.col(f"a.{key}") < F.col(f"b.{key}"))
            .select(
                F.col("a.simhash").alias("__sa"),
                F.col("b.simhash").alias("__sb"),
                F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("h"),
            )
            .filter(F.col("h") <= 3)
            .distinct()
        )

    timeit("stage: band+distinct over classes(persisted)", lambda: band_only(classes_p, "simhash"))
    timeit("stage: band+distinct over distinct sigs", lambda: band_only(sigs_v2, "simhash"))
    classes_p.unpersist()

    # full variants
    r8 = timeit("r8: band over per-doc sh + distinct", lambda: v_r8(sh))
    r9 = timeit("r9 current: collapse + expansion", lambda: v_r9(sh))
    t2 = timeit("V2: distinct-sigs, no classes agg, no m", lambda: v2(sh))
    t3 = timeit("V3: classes unpersisted + bcast pairs", lambda: v3(sh, False, True))
    t4 = timeit("V4: classes persisted + bcast pairs", lambda: v3(sh, True, True))
    t5 = timeit("V5: classes unpersisted, no bcast", lambda: v3(sh, False, False))
    print(f"r8={r8:.3f} r9={r9:.3f} v2={t2:.3f} v3={t3:.3f} v4={t4:.3f} v5={t5:.3f}")
    # row-count sanity: all collapse variants must equal r8's pair set
    base = v_r8(sh).count()
    for nm, v in [("r9", v_r9(sh)), ("v2", v2(sh)), ("v3", v3(sh))]:
        c = v.count()
        flag = "OK" if c == base else "MISMATCH"
        print(f"count {nm}: {c} vs r8 {base} [{flag}]")


def main_minhash():
    print("== minhash_near_dup stages (collapse OFF — the bench path) ==")

    def sig_r9():
        return minhash_signature(_spread(docs))

    def sig_r8():
        toks = tokenize("text")
        shg = hashed_shingles(toks, 3)
        base = _spread(docs).filter(F.col("text").isNotNull()).select(
            F.col("doc_id"),
            F.transform(shg, lambda h: h.bitwiseAND(F.lit((1 << 61) - 1))).alias("__a"),
            F.transform(shg, lambda h: F.xxhash64(h).bitwiseAND(F.lit((1 << 32) - 1))).alias("__b"),
        )
        mins = [f"array_min(zip_with(__a, __b, (x, y) -> x + {i} * y)) AS __h{i}" for i in range(64)]
        sig = "array(" + ",".join(f"__h{i}" for i in range(64)) + ") AS signature"
        return base.selectExpr("doc_id", *mins).selectExpr("doc_id", sig)

    timeit("stage: signature r9 (two-step, no persist)", sig_r9)
    timeit("stage: signature r8 (inlined, no persist)", sig_r8)
    sp = sig_r9().persist()
    sp.count()
    timeit("stage: lsh_candidate_pairs (off persisted)", lambda: lsh_candidate_pairs(sp))
    cand = lsh_candidate_pairs(sp).persist()
    cand.count()
    timeit("stage: jaccard verify (off persisted cand)", lambda: jaccard_pairs(cand, docs).filter(F.col("jaccard") >= 0.5))
    timeit("full: minhash_near_dup current", lambda: minhash_near_dup(docs, threshold=0.5))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("simhash", "all"):
        main_simhash()
    if which in ("minhash", "all"):
        main_minhash()
