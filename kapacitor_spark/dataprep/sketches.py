"""Re-aggregatable sketch rollups — the downsampling pattern the
reference serves with continuous queries + influxDBOut() retention
tiers, upgraded for questions plain rollups cannot answer: DISTINCT
counts over arbitrary window unions, distinct-set ALGEBRA
(intersection/difference — retention and churn), and mergeable
QUANTILES.

A count/sum rollup re-aggregates (hourly → daily is a sum), but
distinct users per hour do NOT sum to distinct users per day. The HLL
sketch column fixes that: store one small binary sketch per (bucket,
dims) — Spark's Datasketches-backed ``hll_sketch_agg`` — and ANY
coarser question (daily, weekly, whole-corpus, any subset of buckets)
is ``hll_union_agg`` over the stored sketches, never a rescan of the
raw 100 TB. Error is the standard HLL bound (~1.04/sqrt(2^lgk); ~1.6%
at the lgConfigK=12 default), and the estimate is DETERMINISTIC — the
sketch hashes values, so the result is a pure function of the value
SET, independent of partitioning, row order, or cluster size.

HLL unions only. Two sibling sketch families round out the algebra:

* **Theta sketches** (``theta_sketch_agg`` / ``theta_union_agg`` /
  ``theta_intersection`` / ``theta_difference``) support set
  INTERSECTION and DIFFERENCE — "users active on day d AND d+1"
  (retention), "on d but not d+1" (churn), "on d+1 but not d" (new) —
  questions no union-only sketch can answer without a rescan. While a
  sketch holds ≤ 2^lgNomEntries hashed keys it is in EXACT mode (it IS
  the hashed set), so estimates — including intersections and
  differences of exact sketches — are exactly the true distinct
  counts; past that they degrade to the published theta bounds. Either
  way the result is a pure function of the value set (keys are hashed,
  order- and partitioning-independent).

* **KLL quantile sketches** (``kll_sketch_agg_double`` /
  ``kll_merge_agg_double`` / ``kll_sketch_get_quantile_double``):
  quantiles do not re-aggregate at all (the p90 of hourly p90s is not
  the daily p90), so plain rollups simply cannot serve them. A KLL
  column per bucket makes any union of buckets answerable by merging
  kilobyte sketches. While the merged item count stays ≤ k the sketch
  retains every item and ``get_quantile`` is the EXACT inclusive order
  statistic (bit-for-bit ``percentile_disc``); beyond k, compaction
  samples (randomized) and answers carry the ~1.65%·(200/k)-scaled
  rank-error bound — callers that need determinism at 100 TB size k to
  the bucket, not the union.

* **Count-Min sketches** (``count_min_sketch``): POINT-FREQUENCY
  queries — "how many events did key X produce over any union of
  buckets" — from stored per-bucket sketches. CM tables are LINEAR
  (merging = element-wise add), so any coarser count is a sum of
  stored tables, never a rescan. Spark ships only the aggregate; the
  merge+query side here parses the documented serialized form
  (version/total/depth/width header, per-row hash coefficients, the
  counter table) and re-implements the same CW-style hash
  (``h = a*x; h += h >>> 32; h &= 2³¹-1; h %= width`` — verified
  cell-for-cell against the JVM's estimateCount in tests), vectorized
  in numpy over the ROLLUP rows only — Python touches bytes ∝ buckets,
  never the corpus. Estimates are deterministic given the seed,
  ≥ the true count always, and equal to it whenever any of the depth
  rows is collision-free for the key — size width to the bucket's key
  cardinality when exactness matters.

Shuffle shape at 100 TB: the rollup is one hash-aggregate with
map-side partial sketches (each task sketches locally; only kilobyte
sketch states shuffle, never values), and every re-aggregation reads
the rollup table — bytes proportional to buckets, not events.
"""

from __future__ import annotations

import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_rollup",
    "hll_distinct_over",
    "theta_rollup",
    "theta_retention",
    "kll_rollup",
    "kll_quantiles_over",
    "cm_rollup",
    "cm_counts_over",
    "mg_rollup",
    "mg_topn_over",
]


def hll_rollup(
    df: DataFrame,
    time_col: str = "ts",
    every: str = "1 hour",
    dims: tuple = (),
    value_col: str = "user_id",
    lgk: int = 12,
) -> DataFrame:
    """Bucketed HLL rollup: (bucket_start, *dims, n_rows, hll binary).

    One hash-aggregate over the raw table — the write-side of the
    retention tier. ``n_rows`` rides along so plain additive rollups
    come from the same table."""
    bucket = F.window(F.col(time_col), every).start.alias("bucket")
    return (
        df.groupBy(bucket, *[F.col(d) for d in dims])
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("hll"),
        )
    )


def hll_distinct_over(
    rollup: DataFrame,
    dims: tuple = (),
) -> DataFrame:
    """Distinct-count estimate over ANY grouping of stored sketches:
    union the sketch column per group, estimate once. Reads the rollup
    table only — the raw corpus is never rescanned."""
    g = rollup.groupBy(*[F.col(d) for d in dims]) if dims else rollup.groupBy()
    return g.agg(
        F.sum("n_rows").alias("n_rows"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col("hll"))).alias("approx_distinct"),
    )


def theta_rollup(
    df: DataFrame,
    time_col: str = "ts",
    every: str = "1 day",
    dims: tuple = (),
    value_col: str = "user_id",
    lgk: int = 14,
) -> DataFrame:
    """Bucketed theta-sketch rollup: (bucket, *dims, n_rows, theta
    binary). Same one-hash-aggregate shape as :func:`hll_rollup`, but
    the stored sketch supports intersection/difference downstream.
    lgk=14 (16384 nominal entries) keeps the sketch in exact mode for
    dimensions-style key spaces; raise it when a single bucket can see
    more distinct keys than that and the consumer needs exactness."""
    bucket = F.window(F.col(time_col), every).start.alias("bucket")
    return df.groupBy(bucket, *[F.col(d) for d in dims]).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.theta_sketch_agg(F.col(value_col), F.lit(lgk)).alias("theta"),
    )


def _theta_est(col: Column) -> Column:
    # Exact-mode estimates are integral-valued doubles; round() guards
    # the (estimation-mode) fractional case before the long cast.
    return F.round(F.theta_sketch_estimate(col)).cast("long")


def theta_retention(
    rollup: DataFrame,
    step: str = "1 day",
    dims: tuple = (),
) -> DataFrame:
    """Consecutive-bucket set algebra over a stored theta rollup:
    for every bucket pair (b, b+step) present in the rollup, the
    distinct keys RETAINED (in both), CHURNED (in b, gone from
    b+step) and NEW (in b+step only) — the retention/churn triple a
    union-only sketch cannot produce. Reads ONLY the rollup table: a
    self-equi-join on (bucket+step, *dims) — broadcastable, since the
    rollup has one row per bucket — then three pure sketch
    expressions per row; the raw corpus is never rescanned.

    Output: (bucket, *dims, n_rows, retained, churned, new_keys)
    where `bucket` is the EARLIER bucket of each pair."""
    a = rollup.alias("a")
    b = rollup.alias("b")
    cond = F.col("b.bucket") == F.col("a.bucket") + F.expr(f"INTERVAL {step}")
    for d in dims:
        cond = cond & (F.col(f"b.{d}") == F.col(f"a.{d}"))
    inter = F.theta_intersection(F.col("a.theta"), F.col("b.theta"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.bucket").alias("bucket"),
            *[F.col(f"a.{d}").alias(d) for d in dims],
            F.col("a.n_rows").alias("n_rows"),
            _theta_est(inter).alias("retained"),
            _theta_est(
                F.theta_difference(F.col("a.theta"), F.col("b.theta"))
            ).alias("churned"),
            _theta_est(
                F.theta_difference(F.col("b.theta"), F.col("a.theta"))
            ).alias("new_keys"),
        )
    )


def kll_rollup(
    df: DataFrame,
    time_col: str = "ts",
    every: str = "1 hour",
    dims: tuple = (),
    value_col: str = "value",
    k: int = 8192,
) -> DataFrame:
    """Bucketed KLL quantile rollup: (bucket, *dims, n_rows, kll
    binary) over a DOUBLE value column. One hash-aggregate with
    map-side partial sketches; only the ~k-item sketch states shuffle.
    While a bucket holds ≤ k items the sketch is exact (see module
    docstring); k=8192 costs ≤ 64 KiB per bucket worst-case."""
    bucket = F.window(F.col(time_col), every).start.alias("bucket")
    return df.groupBy(bucket, *[F.col(d) for d in dims]).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.kll_sketch_agg_double(F.col(value_col), F.lit(k)).alias("kll"),
    )


def kll_quantiles_over(
    rollup: DataFrame,
    dims: tuple = (),
    quantiles: tuple = (0.5, 0.9),
) -> DataFrame:
    """Quantiles over ANY grouping of stored KLL sketches: merge the
    sketch column per group (kilobytes per bucket, never raw values),
    query once per requested quantile. `pNN` columns are the inclusive
    order statistic — exact while the merged item count stays ≤ k,
    within the KLL rank bound beyond."""
    g = rollup.groupBy(*[F.col(d) for d in dims]) if dims else rollup.groupBy()
    merged = g.agg(
        F.sum("n_rows").alias("n_rows"),
        F.kll_merge_agg_double(F.col("kll")).alias("kll"),
    )
    qcols = [
        F.kll_sketch_get_quantile_double(F.col("kll"), F.lit(float(q))).alias(
            "p" + str(q).replace("0.", "").ljust(2, "0")
        )
        for q in quantiles
    ]
    return merged.select(*[F.col(d) for d in dims], F.col("n_rows"), *qcols)


def cm_rollup(
    df: DataFrame,
    time_col: str = "ts",
    every: str = "1 day",
    dims: tuple = (),
    value_col: str = "user_id",
    eps: float = 2e-4,
    confidence: float = 0.99,
    seed: int = 17,
) -> DataFrame:
    """Bucketed Count-Min rollup over an INTEGRAL key column:
    (bucket, *dims, n_rows, cm binary). One hash-aggregate with
    map-side partial sketches. All sketches share (eps, confidence,
    seed), which fixes (depth, width, hash coefficients) — the
    precondition for downstream table-add merging. Spark allocates
    width = ceil(2/eps) (verified against the serialized header in
    tests — e.g. eps=1e-3 → 2000); keep eps small enough that a
    bucket's key cardinality stays well under that width when exact
    point counts are wanted."""
    field = df.schema[value_col].dataType.typeName()
    if field not in ("byte", "short", "integer", "long"):
        raise ValueError(
            f"cm_rollup needs an integral key column, got {field} — "
            "pre-hash other types to BIGINT explicitly so the query side "
            "can hash candidates identically"
        )
    bucket = F.window(F.col(time_col), every).start.alias("bucket")
    # Repartition the NARROW key rows by the group key BEFORE the sketch
    # aggregate (r11 optimization round, guide §2.3/§5): a CM sketch
    # buffer is depth×width longs (~560 KB at the defaults), so map-side
    # partial aggregation materializes tasks × groups × 560 KB of partial
    # state — measured 1.42 s single-task at sf0.1 (150 groups), and at
    # cluster scale 1000 tasks × 150 groups would be ~84 GB of partials
    # (an OOM, then an 84 GB shuffle of sketch bytes). Shuffling the raw
    # (bucket, dims, key) rows first costs rows × ~24 B once, after which
    # each group's sketch is built exactly ONCE on its final task and no
    # sketch bytes ever cross an exchange. Measured 0.28 s at sf0.1 (5x).
    # Sketch contents are insertion-order- and merge-order-independent
    # (per-cell counters), so the output is byte-identical either way
    # (pinned by test_cm_rollup_distributed_build_bytes_identical).
    # Hot-group skew: one group = one task, the same bound any keyed
    # aggregation has; partition count follows spark.sql.shuffle.partitions.
    # explicit partition count (defaultParallelism — scale-adaptive, one
    # per core locally, total cores on a cluster): a bare repartition(cols)
    # is AQE-coalescible, and on a small input AQE folds the row shuffle
    # back to ONE partition — re-serializing the sketch build single-task
    # (measured: 2.5 s coalesced vs 0.28 s at 32 partitions, sf0.1)
    keyed = df.select(
        bucket,
        *[F.col(d) for d in dims],
        F.col(value_col).cast("long").alias("__cmv"),
    ).repartition(
        df.sparkSession.sparkContext.defaultParallelism,
        F.col("bucket"),
        *[F.col(d) for d in dims],
    )
    return keyed.groupBy("bucket", *[F.col(d) for d in dims]).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_min_sketch(
            F.col("__cmv"),
            F.lit(float(eps)),
            F.lit(float(confidence)),
            F.lit(int(seed)),
        ).alias("cm"),
    )


_CM_PRIME = (1 << 31) - 1


def _cm_parse(buf: bytes):
    """Spark CountMinSketch serialized form (format version 1):
    >i version, >q totalCount, >i depth, >i width, depth×>q hash
    coefficients, depth·width×>q counter table."""
    import numpy as np

    ver, total, depth, width = struct.unpack(">iqii", buf[:20])
    if ver != 1:
        raise ValueError(f"unsupported CountMinSketch version {ver}")
    hash_a = np.frombuffer(buf, dtype=">i8", count=depth, offset=20)
    table = np.frombuffer(
        buf, dtype=">i8", count=depth * width, offset=20 + depth * 8
    ).reshape(depth, width)
    return total, hash_a.astype(np.int64), table.astype(np.int64), width


def cm_counts_over(
    rollup: DataFrame,
    keys: list,
    dims: tuple = (),
) -> DataFrame:
    """Point-frequency estimates for ``keys`` over ANY grouping of
    stored CM sketches: per group, tables are element-wise summed
    (CM linearity — identical to having sketched the union) and every
    key is estimated with the same CW hash the JVM writer used. The
    Python hop runs over ROLLUP rows (one Arrow batch per group, bytes
    ∝ buckets × sketch size); the candidate key set is a driver-side
    list by contract — CM answers point lookups, it cannot enumerate
    keys, so callers bring candidates (planted hot keys, a top-k seed
    set, a dictionary)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    if not keys:
        raise ValueError("cm_counts_over needs a non-empty candidate key list")
    keyarr = np.array([int(k) for k in keys], dtype=np.int64)

    out_schema = T.StructType(
        [rollup.schema[d] for d in dims]
        + [T.StructField("key", T.LongType()), T.StructField("est_count", T.LongType())]
    )

    def est_group(pdf: pd.DataFrame) -> pd.DataFrame:
        table = None
        hash_a = width = None
        for buf in pdf["cm"]:
            _, ha, t, w = _cm_parse(bytes(buf))
            if table is None:
                hash_a, table, width = ha, t.copy(), w
            else:
                if w != width or not (ha == hash_a).all():
                    raise ValueError("cannot merge CM sketches with different params")
                table += t
        # CW hash, vectorized over all keys per depth row (uint64 wrap
        # == Java long overflow; >>>32 fold; mask to 2^31-1; mod width)
        ka = keyarr.astype(np.uint64)
        est = None
        for i in range(table.shape[0]):
            h = ka * np.uint64(hash_a[i].item() & 0xFFFFFFFFFFFFFFFF)
            h = h + (h >> np.uint64(32))
            idx = (h & np.uint64(_CM_PRIME)).astype(np.int64) % width
            row = table[i][idx]
            est = row if est is None else np.minimum(est, row)
        out = {d: [pdf[d].iloc[0]] * len(keyarr) for d in dims}
        out["key"] = keyarr
        out["est_count"] = est
        return pd.DataFrame(out)

    if dims:
        return rollup.groupBy(*[F.col(d) for d in dims]).applyInPandas(
            est_group, out_schema
        )
    return (
        rollup.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(est_group, out_schema)
    )


def mg_rollup(
    df: DataFrame,
    time_col: str = "ts",
    every: str = "1 day",
    dims: tuple = (),
    key_col: str = "user_id",
    k: int = 2048,
) -> DataFrame:
    """Bucketed Misra-Gries frequent-items rollup — the heavy-hitters
    member of the sketch family (top keys over ANY union of buckets
    without rescanning the raw table): (bucket, *dims, n_rows, mg
    struct<keys array<long>, counts array<long>, err long>).

    The corpus-scale step is EXACT Spark aggregation — one map-side-
    combining count per (bucket, dims, key) — and only the per-bucket
    COUNT TABLE (rows ∝ distinct keys, not events) enters the Python
    compression hop, which applies the standard mergeable-summaries
    compress (Agarwal et al.): keep the k largest, subtract the
    (k+1)-th count, record it in ``err``. While a bucket's distinct
    keys ≤ k the summary IS the exact count table (err=0); merged
    summaries stay exact while the UNION of keys fits k. Beyond that,
    every reported count is an undercount by at most the summary's
    ``err`` (the published MG bound: Σ errors ≤ N/(k+1)-scaled).
    Integral keys only — pre-hash other types, as with cm_rollup."""
    import pandas as pd

    from pyspark.sql import types as T

    field = df.schema[key_col].dataType.typeName()
    if field not in ("byte", "short", "integer", "long"):
        raise ValueError(
            f"mg_rollup needs an integral key column, got {field} — "
            "pre-hash other types to BIGINT explicitly"
        )
    bucket = F.window(F.col(time_col), every).start.alias("bucket")
    # NULL keys are skipped, matching count_min_sketch's aggregate
    # semantics (a NULL group would otherwise surface as NaN in the
    # pandas hop and fail the Arrow array<long> conversion). NULL
    # timestamps are skipped too (r9 ADVICE): window() maps them to a
    # NULL bucket that would silently flow into every mg_topn_over
    # merge — a row with no event time belongs to no time bucket, same
    # as cm_rollup's bucket handling.
    counts = (
        df.filter(F.col(key_col).isNotNull() & F.col(time_col).isNotNull())
        .groupBy(bucket, *[F.col(d) for d in dims], F.col(key_col).cast("long").alias("__k"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    out_schema = T.StructType(
        [counts.schema["bucket"]]
        + [counts.schema[d] for d in dims]
        + [
            T.StructField("n_rows", T.LongType()),
            T.StructField(
                "mg",
                T.StructType(
                    [
                        T.StructField("keys", T.ArrayType(T.LongType())),
                        T.StructField("counts", T.ArrayType(T.LongType())),
                        T.StructField("err", T.LongType()),
                        # marks a ONE-SHOT compression of exact counts —
                        # the only summaries whose retained-key counts
                        # mg_topn_over may restore by +err (ADVICE r10:
                        # externally merged summaries must not get the
                        # correction)
                        T.StructField("one_shot", T.BooleanType()),
                    ]
                ),
            ),
        ]
    )

    def compress(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["__c", "__k"], ascending=[False, True])
        ks = pdf["__k"].to_list()
        cs = pdf["__c"].to_list()
        err = 0
        if len(ks) > k:
            t = cs[k]  # the (k+1)-th largest
            ks, cs = ks[:k], [c - t for c in cs[:k]]
            keep = [(a, b) for a, b in zip(ks, cs) if b > 0]
            ks, cs = [a for a, _ in keep], [b for _, b in keep]
            err = t
        head = {c: [pdf[c].iloc[0]] for c in ["bucket", *dims]}
        head["n_rows"] = [int(pdf["__c"].sum())]
        head["mg"] = [{"keys": ks, "counts": cs, "err": err, "one_shot": True}]
        return pd.DataFrame(head)

    return counts.groupBy("bucket", *[F.col(d) for d in dims]).applyInPandas(
        compress, out_schema
    )


def mg_topn_over(
    rollup: DataFrame,
    dims: tuple = (),
    n: int = 10,
) -> DataFrame:
    """Heavy hitters over ANY grouping of stored MG summaries: per
    group, summaries merge (counts sum per key — the merge keeps the
    FULL key union, never re-compressing, so the result is the tightest
    summary derivable from the inputs and only the per-summary errs
    carry forward) and the top ``n`` emit — (dims..., rank, key,
    est_count, max_undercount). Deterministic: ties break on key
    ascending.

    Because mg_rollup compresses EXACT per-bucket count tables in one
    shot, a retained key's stored count undercounts its bucket-true
    count by exactly that bucket's ``err`` — so the merge adds ``err``
    back for every summary the key appears in (still never an
    overcount), and ``max_undercount`` is PER KEY: the sum of errs of
    only the summaries the key is ABSENT from (where its true bucket
    count may be anywhere in [0, err]). A key present in every summary
    of the group therefore reports max_undercount 0 and est_count ==
    true count, even in the estimation regime. The correction is sound
    only for one-shot-compressed summaries, so it is GATED on the
    ``one_shot`` marker mg_rollup stamps into the struct (ADVICE r10):
    a summary without the marker — externally produced, or itself the
    result of lossy merging — keeps its stored counts and carries its
    full err as per-key uncertainty instead."""
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [rollup.schema[d] for d in dims]
        + [
            T.StructField("rank", T.LongType()),
            T.StructField("key", T.LongType()),
            T.StructField("est_count", T.LongType()),
            T.StructField("max_undercount", T.LongType()),
        ]
    )

    def merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        total: dict[int, int] = {}
        present_err: dict[int, int] = {}
        err_all = 0
        for mg in pdf["mg"]:
            ks, cs = list(mg["keys"]), list(mg["counts"])
            e = int(mg["err"])
            err_all += e
            # the +err restoration (stored = true - err) is valid ONLY
            # for one-shot compressions of exact counts; a summary
            # without the mg_rollup marker (externally produced or
            # re-merged) keeps its stored counts and its full err as
            # per-key uncertainty — never an overcount either way
            one = bool(mg["one_shot"]) if mg.get("one_shot") is not None else False
            for a, b in zip(ks, cs):
                a = int(a)
                total[a] = total.get(a, 0) + int(b) + (e if one else 0)
                if one:
                    present_err[a] = present_err.get(a, 0) + e
        items = sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[:n]
        out = {d: [pdf[d].iloc[0]] * len(items) for d in dims}
        out["rank"] = list(range(1, len(items) + 1))
        out["key"] = [a for a, _ in items]
        out["est_count"] = [b for _, b in items]
        out["max_undercount"] = [err_all - present_err.get(a, 0) for a, _ in items]
        return pd.DataFrame(out)

    if dims:
        return rollup.groupBy(*[F.col(d) for d in dims]).applyInPandas(
            merge, out_schema
        )
    return (
        rollup.withColumn("__g", F.lit(1)).groupBy("__g").applyInPandas(merge, out_schema)
    )
