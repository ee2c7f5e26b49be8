"""A/B the simhash signature-fold formulations at sf0.1 (guide §1/§4).

Stages measured separately, same session, interleaved:
  v_cur   — 16 interpreted aggregate() passes over the token-hash array
            (current production code via dedup.simhash)
  v_fused — ONE aggregate() pass with a 16-element array accumulator
  v_np    — JVM tokenize+xxhash64 (unchanged normalization), numpy fold
            in one mapInArrow hop (hash array → 64-bit signature)

All three must produce IDENTICAL signatures (checked via bit_xor fold).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from pyspark.sql import functions as F

    from kapacitor_spark import get_spark
    from kapacitor_spark.dataprep.dedup import _spread, simhash, tokenize
    from kapacitor_spark.session import read_table

    spark = get_spark("simhash-ab")
    docs = read_table(spark, os.path.join(SF_DIR, "documents.parquet"))
    docs.write.format("noop").mode("overwrite").save()  # warm

    base = _spread(docs)

    def v_cur():
        return simhash(base)

    def hashed():
        # shared front end: distinct token hashes (exact production shape)
        return base.select(
            "doc_id",
            F.transform(
                F.array_distinct(tokenize("text")), lambda t: F.xxhash64(t)
            ).alias("__hs"),
        ).filter(
            F.expr(
                "text is not null and length(trim(text)) > 0"
            )
        )

    def v_fused():
        lanes, lane_bits, naggs = 4, 16, 16
        lane_mask = sum(1 << (lane_bits * l) for l in range(lanes))
        acc = "array_repeat(0L, 16)"
        upd = ", ".join(
            f"acc[{a}] + (shiftright(x, {a}) & {lane_mask}L)" for a in range(naggs)
        )
        terms = []
        for j in range(64):
            a, l = j % naggs, j // naggs
            pc = f"(shiftright(__p[{a}], {lane_bits * l}) & {(1 << lane_bits) - 1}L)"
            terms.append(f"shiftleft(shiftright(__n - 2 * {pc}, 63) & 1L, {j})")
        sig = " | ".join(terms)
        return (
            hashed()
            .selectExpr(
                "doc_id",
                f"aggregate(__hs, {acc}, (acc, x) -> array({upd})) AS __p",
                "size(__hs) AS __n",
            )
            .selectExpr("doc_id", f"({sig}) AS simhash")
        )

    def v_np():
        import numpy as np
        import pyarrow as pa

        def fold(batches):
            for b in batches:
                ids = b.column("doc_id")
                hs = b.column("__hs")
                # flatten ragged list<int64> -> (values, offsets)
                offs = hs.offsets.to_numpy(zero_copy_only=False)
                vals = hs.values.to_numpy(zero_copy_only=False).astype(np.uint64)
                n = np.diff(offs)  # tokens per doc
                # per-bit counts: doc index per token
                doc_idx = np.repeat(np.arange(len(n)), n)
                sig = np.zeros(len(n), dtype=np.uint64)
                for j in range(64):
                    bitj = ((vals >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
                    cnt = np.bincount(doc_idx, weights=bitj, minlength=len(n))
                    sig |= (2 * cnt > n).astype(np.uint64) << np.uint64(j)
                yield pa.RecordBatch.from_arrays(
                    [ids, pa.array(sig.astype(np.int64))], ["doc_id", "simhash"]
                )

        return hashed().mapInArrow(fold, "doc_id long, simhash long")

    def t(fn, tag):
        df = fn()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        print(f"  {tag}: {dt:.3f}s")
        return dt

    # verify identical output first
    x = v_cur().agg(F.expr("bit_xor(simhash)"), F.count("*")).collect()[0]
    y = v_fused().agg(F.expr("bit_xor(simhash)"), F.count("*")).collect()[0]
    z = v_np().agg(F.expr("bit_xor(simhash)"), F.count("*")).collect()[0]
    print("checksums cur/fused/np:", tuple(x), tuple(y), tuple(z))

    for rnd in range(4):
        print(f"round {rnd}:")
        t(v_cur, "cur  ")
        t(v_fused, "fused")
        t(v_np, "numpy")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
