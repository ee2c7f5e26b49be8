"""Deduplication operators: exact, token-fingerprint, MinHash+LSH, SimHash,
n-gram Jaccard.

Scale design notes (the point of this module is 100 TB corpora):

* Exact + fingerprint dedup are single hash-aggregates on a digest — one
  shuffle of (16-byte key, id), no text movement.
* MinHash signatures are computed as pure array expressions (tokenize →
  shingle → per-seed min of xxhash64) — NARROW, no shuffle, whole-stage
  codegen; only the 64×8-byte signature shuffles afterwards.
* LSH banding self-joins on (band index, band hash): candidate generation
  is an equi-join that AQE can broadcast when bucket counts are small, and
  skewed buckets (boilerplate docs) get AQE skew-split.
* Exact verification joins the candidate pairs back to shingle sets —
  proportional to candidates, not n².
"""

from __future__ import annotations

import logging
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kapacitor_spark.dataprep.cache import track

# plan-choice visibility: operators that pick between a driver-side fast
# path and the distributed walk LOG which one ran — silent plan changes
# are how 100 TB surprises start
_log = logging.getLogger("kapacitor_spark.dataprep.dedup")

__all__ = [
    "tokenize",
    "shingles",
    "exact_dedup",
    "fingerprint_dedup",
    "minhash_signature",
    "lsh_candidate_pairs",
    "jaccard_pairs",
    "minhash_near_dup",
    "simhash",
    "simhash_near_dup",
    "simhash_band_expr",
    "nonempty_tokens",
    "signature_classes",
    "ngram_jaccard_dedup",
    "embedding_near_dup",
    "decontaminate",
    "hashed_shingles",
    "duplicated_gram_stats",
    "near_dup_clusters",
]

# embedding_near_dup(block_col=None) is an explicit all-pairs escape hatch;
# refuse to build an n² join above this many rows.
_CROSSJOIN_MAX_ROWS = 50_000

def _plan_row_count(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan ROW-COUNT estimate, or None. Only a row
    count can prove the cross-join guard's cap — sizeInBytes is the
    compressed on-disk size for file scans, which a heavily RLE'd
    embedding table of millions of rows could keep tiny. Free (no job)."""
    try:
        rc = df._jdf.queryExecution().optimizedPlan().stats().rowCount()
        if not rc.isDefined():
            return None
        v = rc.get()
        return v if isinstance(v, int) else int(v.toString())
    except Exception:
        return None


def _spread(df: DataFrame) -> DataFrame:
    """Ensure compute-heavy per-doc work is spread across all cores: small
    inputs arrive as one parquet split (one task), so hashing 5k docs would
    run on 1 of 32 cores. At 100 TB the scan naturally yields thousands of
    splits and this no-ops; the round-robin shuffle of the raw text is cheap
    relative to the per-doc hashing it parallelizes.

    The small-input check uses Catalyst's plan-size estimate (optimizedPlan
    stats, shared helper in operators.ordered), NOT ``df.rdd`` — converting
    to RDD would materialize a second, unoptimized copy of the scan plan on
    every dedup entry point."""
    from kapacitor_spark.operators.ordered import _plan_size_bytes

    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
        digits = "".join(ch for ch in raw if ch.isdigit())
        max_split = int(digits) if digits else 128 * 1024 * 1024
        size = _plan_size_bytes(df)
        if size is None:
            raise ValueError("no plan-size estimate")
    except Exception:
        # estimate unavailable → assume small (repartition is the safe side
        # for the CPU-bound per-doc work this wraps)
        return df.repartition(target)
    if size < target * max_split:
        return df.repartition(target)
    return df


def tokenize(text_col: str = "text") -> "F.Column":
    """Lowercased whitespace tokens — the shared normalization step."""
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def nonempty_tokens(text_col: str = "text") -> "F.Column":
    """:func:`tokenize` with empty tokens filtered — the SHARED
    non-empty normalization (retrieval, BPE, readability, chunking and
    the registry fixtures all consume THIS expression; a normalization
    change must happen here, once, or their token streams and the
    DuckDB oracles silently diverge)."""
    return F.filter(tokenize(text_col), lambda x: x != F.lit(""))


def shingles(tokens: "F.Column", k: int = 3) -> "F.Column":
    """Distinct word k-gram shingles as an array expression (no explode):
    transform over a 0..n-k index sequence, concat_ws of token slices."""
    n = F.size(tokens)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, k)))
    # short docs (< k tokens) produce one short shingle; that's fine
    return F.array_distinct(grams)


def hashed_shingles(tokens: "F.Column", k: int = 3) -> "F.Column":
    """Distinct word k-gram shingles as 64-bit HASHES, skipping the gram
    string entirely: each shingle hashes as xxhash64 over the raw token
    slice (arrays hash element-wise in Spark), so no concat_ws string is
    ever built. Warm-measured ~10% faster than string shingles at sf0.1
    and allocates no gram strings — use whenever only gram IDENTITY
    matters (decontamination, frequency counting), not the gram text."""
    n = F.size(tokens)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.xxhash64(F.slice(tokens, i + 1, k)))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content digest: one hash-aggregate.

    Returns (digest, keeper_id, dup_count); keeper = smallest id.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def fingerprint_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup by bag-of-words fingerprint: md5 over the sorted distinct
    token set — catches word-order shuffles and repetition changes."""
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokenize(text_col)))))
    return (
        df.select(fp.alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash signatures as a ZERO-shuffle narrow projection (no UDF).

    The i-th family is h_a + i*h_b over hashed shingles (Kirsch-
    Mitzenmacher double hashing); the per-doc min runs as an expression-
    level ``array_min(zip_with(...))`` fold over the shingle-hash array —
    a pure projection riding the scan, like the r6 simhash win. The r5
    explode + 64-min hash-aggregate pushed ~shingle_count rows through a
    64-column aggregation hashmap; the fold touches each pre-hashed long
    64 times with plain arithmetic and never leaves the task (measured
    0.80s vs 1.72s for the signature stage at sf0.1).

    Shingles hash ONCE as xxhash64 over the raw token slice
    (hashed_shingles — no gram string is ever built); the second family
    seed re-hashes that 8-byte value, not the string. Masks keep
    h_a + i*h_b inside int64 under ANSI (2^61 + 63·2^32 < 2^62). The 64
    min terms are built as ONE selectExpr string — plan construction is a
    single SQL parse, not hundreds of py4j round-trips.
    """
    # null-text docs carry no shingles and must NOT enter the signature
    # table: xxhash64 over a null token slice is a CONSTANT, so without
    # this filter every null doc gets the same signature and LSH bands
    # them all together — O(n_null^2) candidate pairs doing nothing (the
    # Jaccard verify nulls them out, but only after the join paid for
    # them). The pre-r7 explode path dropped these rows implicitly.
    #
    # Tokens and shingle hashes each materialize in their OWN projection
    # (r9): hashed_shingles' slice lambda re-evaluates whatever
    # expression `tokens` is bound to PER SHINGLE (no common-
    # subexpression elimination inside higher-order functions), so
    # passing the inlined tokenize chain made the stage O(tokens²) per
    # doc — measured 7.5x at sf0.1 (2.87 s → 0.38 s for the fold).
    # CollapseProject keeps both boundaries: __toks/__sh are multi-use
    # and non-cheap.
    # Every projection below is ONE selectExpr string (r11 optimization
    # round): the Column-API form of this chain cost ~0.32 s of pure
    # driver time per build in py4j round-trips (measured via cProfile —
    # each transform/lambda/lit is a blocking socket round trip); the
    # string form is a single SQL parse. The expressions are verbatim
    # SQL spellings of the same operators (split/lower/trim == tokenize,
    # the transform lambdas, the int-literal masks), so the analyzed
    # plans — and the signatures — are identical (equivalence pinned by
    # the unchanged oracle rows + test_minhash_signature_is_codegen).
    tk = df.filter(F.col(text_col).isNotNull()).selectExpr(
        f"`{id_col}`",
        f"split(lower(trim(`{text_col}`)), '\\\\s+') AS __toks",
    )
    shd = tk.selectExpr(
        f"`{id_col}`",
        f"array_distinct(transform(sequence(0, greatest(size(__toks) - {shingle_k}, 0)), "
        f"i -> xxhash64(slice(__toks, i + 1, {shingle_k})))) AS __sh",
    )
    base = shd.selectExpr(
        f"`{id_col}`",
        f"transform(__sh, h -> h & {(1 << 61) - 1}) AS __a",
        f"transform(__sh, h -> xxhash64(h) & {(1 << 32) - 1}) AS __b",
    )
    mins = [
        f"array_min(zip_with(__a, __b, (x, y) -> x + {i} * y)) AS __h{i}"
        for i in range(num_hashes)
    ]
    sig = "array(" + ",".join(f"__h{i}" for i in range(num_hashes)) + ") AS signature"
    return base.selectExpr(f"`{id_col}`", *mins).selectExpr(f"`{id_col}`", sig)


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Band the signature and self-join on (band, band-hash).

    Classic LSH: P(candidate) = 1-(1-j^r)^b; 16 bands × 4 rows targets
    Jaccard ≳ 0.5. The explode is bands× row inflation of (id, 8B hash)
    only; the join is an equi-join AQE can re-plan.
    """
    # band array as ONE selectExpr string (r11 optimization round): the
    # Column-API form (bands × rows_per_band element_at/cast/concat_ws/
    # xxhash64 objects) cost ~0.57 s of driver py4j time per build; one
    # SQL parse builds the identical expressions (integer literals stay
    # int32 both ways, so the xxhash64 seeds and hashes are unchanged).
    band_terms = []
    for b in range(bands):
        elems = ", ".join(
            f"cast(element_at(signature, {b * rows_per_band + r + 1}) as string)"
            for r in range(rows_per_band)
        )
        band_terms.append(f"xxhash64({b}, concat_ws(',', {elems}))")
    banded = sig_df.selectExpr(
        f"`{id_col}`",
        f"posexplode(array({', '.join(band_terms)})) AS (band, band_hash)",
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    return pairs


def jaccard_pairs(
    pairs: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (verification step).

    Shingle sets are built only for docs that appear in a candidate pair
    (semi-join first): verification cost is proportional to candidates,
    not corpus size."""
    ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .union(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # persist: joined twice (id_a and id_b side) — avoids scanning the
    # corpus and re-shingling candidate docs a second time.
    # tokens materialize before the shingle lambda touches them (r9 —
    # same reasoning as minhash_signature: the slice lambda re-evaluates
    # its `tokens` expression per shingle, so inlining tokenize here was
    # O(tokens²) per doc)
    sets = track(
        df.join(F.broadcast(ids), id_col, "leftsemi")
        .select(F.col(id_col), tokenize(text_col).alias("__toks"))
        .select(
            F.col(id_col), shingles(F.col("__toks"), shingle_k).alias("sh")
        )
        .persist()
    )
    out = (
        pairs.join(sets.selectExpr(f"`{id_col}` AS id_a", "sh AS sh_a"), "id_a")
        .join(sets.selectExpr(f"`{id_col}` AS id_b", "sh AS sh_b"), "id_b")
    )
    return out.selectExpr(
        "id_a", "id_b",
        "round(cast(size(array_intersect(sh_a, sh_b)) as double) / "
        "cast(size(array_union(sh_a, sh_b)) as double), 6) AS jaccard",
    )


def minhash_near_dup(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    collapse_identical: bool = False,
    expand_identical: bool = True,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: signature → banded candidates →
    exact-Jaccard verify ≥ threshold. Returns (id_a, id_b, jaccard).

    The signature table (num_hashes longs per doc) and the candidate-pair
    set are persisted: the LSH self-join consumes signatures twice and the
    verify step consumes candidates three times (two id projections + the
    pair join), so without materialization the expensive signature fold
    re-runs ~4x. At cluster scale these would be checkpointed to storage
    between stages; MEMORY_AND_DISK is the local equivalent.

    IDENTICAL-TEXT COLLAPSE (r9, ``collapse_identical=True``): unlike
    simhash, collapsing on the SIGNATURE would be unsound here —
    identical minhash signatures do not imply identical shingle sets,
    and the verify step needs true per-pair Jaccard. But identical TEXT
    does: same text → same shingle set → (a) within-class Jaccard is
    exactly 1 (≥ any threshold), and (b) every member pair across two
    classes has the SAME Jaccard and the SAME banding outcome as the
    representative pair (signatures and shingles are pure functions of
    text). With the flag on, the LSH band join and the shingle-set
    verification run over ONE representative per distinct md5(text)
    class — an m-duplicate class no longer pays C(m,2) candidates or
    verifications — and members re-attach through the same one-pipeline
    expansion as simhash_near_dup (class self-pairs at jaccard 1.0, the
    ``__ia < __ib`` guard deduping their double expansion). Output is
    IDENTICAL to the uncollapsed pipeline, including LSH's probabilistic
    recall, because banding outcomes are text-class-invariant
    (property-tested). ``expand_identical=False`` additionally swaps the
    clique for the linear member→representative star (jaccard 1.0) for
    cluster/keeper consumers.

    OFF by default, unlike simhash: the collapse adds ~5 small stages
    (window + rep filter + expansion joins — measured +0.45 s on the
    5k-doc fixture whose dup rate is too low to pay for them), whereas
    simhash's collapse rides joins it needed anyway. Turn it on for
    dup-heavy corpora, or keep the equivalent composition: exact_dedup
    first, near-dup the keepers. TEXT never shuffles either way — the
    member table is a 48 B/doc window over (id, digest), the rep filter
    runs on the 512 B/doc signature table, and verification joins text
    only for candidate pairs, exactly like the uncollapsed path.
    """
    df = _spread(df)
    # signatures for ALL docs — the zero-shuffle projection riding the
    # scan; dup members' signatures are wasted work only at sane dup
    # rates, and TEXT never shuffles here
    sig = track(minhash_signature(df, text_col, id_col, num_hashes, shingle_k).persist())
    if not collapse_identical:
        cand = track(
            lsh_candidate_pairs(sig, id_col, bands, num_hashes // bands).persist()
        )
        verified = jaccard_pairs(cand, df, text_col, id_col, shingle_k)
        return verified.filter(F.col("jaccard") >= threshold)
    # 48 B/doc member→representative table (ONE window shuffle over
    # (id, digest) — a cheap second columnar scan of the text, never a
    # text shuffle): drives the rep filter, the member expansion, and
    # the class-size test
    w = Window.partitionBy("__digest")
    mwr = track(
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.md5(F.col(text_col)).alias("__digest"))
        .withColumn("__rep", F.min(id_col).over(w))
        .withColumn("__m", F.count(F.lit(1)).over(w))
        .drop("__digest")
        .persist()
    )
    # representative filter happens on the SIGNATURE table (512 B/doc),
    # not the text: AQE broadcasts the rep-id list when small; at scale
    # this is a signature-sized co-shuffle that SHRINKS the band join by
    # the dup rate
    sig_reps = sig.join(
        mwr.filter(F.col(id_col) == F.col("__rep")).select(id_col), id_col
    )
    cand = track(lsh_candidate_pairs(sig_reps, id_col, bands, num_hashes // bands).persist())
    verified = jaccard_pairs(cand, df, text_col, id_col, shingle_k).filter(
        F.col("jaccard") >= threshold
    )
    if not expand_identical:
        star = mwr.filter(
            (F.col("__m") > 1) & (F.col(id_col) != F.col("__rep"))
        ).select(
            F.col("__rep").alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
        return verified.unionByName(star)
    # one expansion pipeline keyed directly on REPRESENTATIVE ids (each
    # doc knows its rep — no digest mapping joins): verified rep pairs ∪
    # class self-pairs, two member joins, __ia < __ib deduping the
    # self-pair double expansion — same scheme as simhash_near_dup
    pair_src = verified.select(
        F.col("id_a").alias("__ra"), F.col("id_b").alias("__rb"), "jaccard"
    ).unionByName(
        mwr.filter((F.col("__m") > 1) & (F.col(id_col) == F.col("__rep"))).select(
            F.col("__rep").alias("__ra"),
            F.col("__rep").alias("__rb"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    ma = mwr.select(F.col("__rep").alias("__ra"), F.col(id_col).alias("__ia"))
    mb = mwr.select(F.col("__rep").alias("__rb"), F.col(id_col).alias("__ib"))
    return (
        pair_src.join(ma, "__ra")
        .join(mb, "__rb")
        .filter((F.col("__ra") != F.col("__rb")) | (F.col("__ia") < F.col("__ib")))
        .select(
            F.least("__ia", "__ib").alias("id_a"),
            F.greatest("__ia", "__ib").alias("id_b"),
            "jaccard",
        )
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    keep: "Sequence[str]" = (),
) -> DataFrame:
    """64-bit SimHash: per bit, the sign of the sum of ±1 contributions
    from each token's xxhash64 bit. Narrow, codegen'd, one hash-aggregate.

    ZERO-shuffle formulation (r6 — 7x the r5 explode+groupBy version at
    sf0.1, identical signatures): the per-document fold runs as an
    expression-level ``F.aggregate`` over the token-hash array, so the
    signature is a pure projection riding the scan — no explode of the
    token stream through an aggregation hashmap, no exchange at all.

    Lane packing does the bit-counting 4-wide: for shift a, the mask
    0x0001000100010001 drops hash bits (a, a+16, a+32, a+48) into the
    LSBs of four 16-bit lanes of ONE long, so each of the 16 accumulators
    counts 4 bit positions with a single shift+AND per token (the r5 code
    built each lane term separately — 4 shifts, 4 casts). Bit j is set
    iff 2*popcount > n, extracted branch-free from the sign of
    (n - 2*lane). Lane width bounds distinct tokens per doc at 2^15-1 —
    far above any realistic document.

    The WIDE generated stages (16 folds + 64 packing terms) are built as
    selectExpr strings rather than ~400 chained Column calls: plan
    construction is one SQL parse instead of hundreds of py4j round-trips
    — measured 2.1s of pure driver-side build time, now <10ms. The
    token-hash stage stays a Column so it REUSES tokenize() — signatures
    must normalize exactly like every other dedup op.
    """
    lanes = 4
    lane_bits = 16
    naggs = bits // lanes
    assert bits % lanes == 0
    lane_mask = sum(1 << (lane_bits * l) for l in range(lanes))  # 0x0001000100010001
    folds = [
        f"aggregate(__hs, 0L, (acc, x) -> acc + (shiftright(x, {a}) & {lane_mask}L))"
        f" AS __p{a}"
        for a in range(naggs)
    ]
    terms = []
    for j in range(bits):
        a, l = j % naggs, j // naggs
        pc = f"(shiftright(__p{a}, {lane_bits * l}) & {(1 << lane_bits) - 1}L)"
        # sign bit of (n - 2*pc): 1 iff 2*pc > n — branch-free, no WHEN chain
        terms.append(f"shiftleft(shiftright(__n - 2 * {pc}, 63) & 1L, {j})")
    hashes = F.transform(
        F.array_distinct(tokenize(text_col)), lambda t: F.xxhash64(t)
    )  # the SHARED normalization — simhash must tokenize like every dedup op
    # ``keep``: passthrough columns threaded through the fold stages —
    # lets a STREAMING caller attach the signature as a projection on the
    # full row (joining the stream back to its own signature table would
    # be a watermark-requiring stream-stream self-join)
    kp = [f"`{c}`" for c in keep]
    # null / empty / whitespace-only docs must NOT enter the signature
    # table (same reasoning as minhash_signature's null filter): tokenize
    # maps all of them to [''] or null, so every such doc would get the
    # SAME constant signature — one giant identical-hash class banding
    # against itself. The collapse in simhash_near_dup keeps that linear,
    # but a signature for "no content" is meaningless anyway; drop at the
    # source like minhash does.
    # rlike(\S): any non-whitespace char — trim() only strips SPACES, so a
    # tabs/newlines-only doc would slip a != '' check; null rlike → null →
    # filtered too
    df = df.filter(F.col(text_col).rlike(r"\S"))
    return (
        df.select(F.col(id_col), *[F.col(c) for c in keep], hashes.alias("__hs"))
        .selectExpr(f"`{id_col}`", *kp, "cast(size(__hs) AS bigint) AS __n", *folds)
        .selectExpr(f"`{id_col}`", *kp, "(" + " | ".join(terms) + ") AS simhash")
    )


def simhash_band_expr(hash_col: str, max_hamming: int) -> "F.Column":
    """Pigeonhole band array for Hamming-bounded blocking: split the
    64-bit hash into (max_hamming + 1) disjoint bit bands — any pair
    within Hamming ``max_hamming`` differs in at most ``max_hamming``
    bands, so it AGREES exactly on at least one (pigeonhole), making the
    band equi-join a COMPLETE blocking for the bound. Shared by the
    batch near-dup self-join and the streaming matcher."""
    nbands = max_hamming + 1
    width = 64 // nbands
    if nbands == 1:
        # max_hamming=0 → exact-equality blocking: the single band is the
        # whole hash (a 64-bit mask literal would overflow a signed long)
        return F.array(F.col(hash_col).alias("b0"))
    return F.array(
        *[
            F.shiftright(F.col(hash_col), b * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias(f"b{b}")
            for b in range(nbands)
        ]
    )


def signature_classes(
    sig: DataFrame, hash_col: str = "simhash", id_col: str = "doc_id"
) -> DataFrame:
    """One row per DISTINCT signature value: (hash, __rep, __m) where
    ``__rep`` is the class's min id and ``__m`` its member count. ONE
    hash-aggregate with map-side combine over (8 B hash, id) — linear at
    any scale. The representative's total order makes ``rep_a < rep_b``
    a canonical unordered-pair dedup downstream, and the min-id choice
    matches near_dup_clusters' keeper convention so star edges and
    cluster keepers agree."""
    return sig.groupBy(hash_col).agg(
        F.min(id_col).alias("__rep"), F.count(F.lit(1)).alias("__m")
    )


def simhash_near_dup(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    sig_df: DataFrame | None = None,
    expand_identical: bool = True,
) -> DataFrame:
    """Near-dup pairs with Hamming distance ≤ k over SimHash.

    Blocking: split the 64-bit hash into (k+1) bands — any pair within
    Hamming k agrees exactly on ≥1 band (pigeonhole), so band equi-joins
    find all of them without n².

    IDENTICAL-SIGNATURE COLLAPSE (r9): the band self-join runs over ONE
    representative per distinct signature value, not one row per
    document. An m-document identical-hash class (exact duplicates,
    boilerplate, empty frames) previously pushed C(m,2) rows through the
    join and the distinct exchange — a 1%-identical slice of a 100 TB
    corpus is a ~10^13-pair class. The join, Hamming filter and distinct
    now run over DISTINCT-signature candidates only; members re-attach
    afterwards:

    * ``expand_identical=True`` (default) — exact pair semantics: the
      same output SET as the uncollapsed self-join. Verified signature
      pairs expand to member pairs via two equi-joins against the
      16 B/doc signature table (AQE broadcasts the verified sig-pair
      side when small), and within-class (hamming 0) pairs come from a
      self-join restricted to the signatures with ≥2 members. Output is
      inherently C(m,2) per identical class — that is the pair
      contract's cost — but candidates that fail verification no longer
      pay it inside the join machinery, and the final distinct
      (previously over the full expanded candidate set) now runs over
      signature pairs only: expansion emits each member pair exactly
      once by construction (one signature per doc → one sig pair per
      doc pair).
    * ``expand_identical=False`` — the 100 TB path for cluster/keeper
      consumers: representative–representative pairs plus a LINEAR
      member→representative star (hamming 0) per identical class.
      Connected components over this edge set equal those over the
      exact pair set (each class is a connected star whose
      representative carries the class's cross-class edges), so
      near_dup_clusters output is unchanged while pairs stay
      O(corpus + verified signature pairs).

    ``sig_df``: optionally pass an already-computed (ideally persisted)
    simhash table to share it with other consumers.
    """
    # persist: the signature table feeds the class aggregate and the
    # member-expansion joins; persisting the 16-bytes-per-doc signature
    # output (NOT the text) caps the fold at one evaluation.
    sh = (
        sig_df
        if sig_df is not None
        else track(simhash(_spread(df), text_col, id_col).persist())
    )
    # 24 B per DISTINCT signature, persisted: the band-join branches and
    # the ≥2-member filter consume it 3x and exchange reuse does NOT
    # fire across the aliased self-join branches (measured r10:
    # unpersisted, each action re-runs the aggregate ~3x — 0.49 s →
    # 1.59 s at sf0.1; the "drop the second persist" candidate was a
    # cache-aliasing artifact in the r9 stage timings).
    classes = track(signature_classes(sh, "simhash", id_col).persist())
    band_cols = simhash_band_expr("simhash", max_hamming)
    if not expand_identical:
        banded = classes.select(
            "simhash", "__rep", F.posexplode(band_cols).alias("band", "band_val")
        )
        a, b = banded.alias("a"), banded.alias("b")
        rep_pairs = (
            a.join(b, ["band", "band_val"])
            .filter(F.col("a.__rep") < F.col("b.__rep"))
            .select(
                F.col("a.__rep").alias("id_a"),
                F.col("b.__rep").alias("id_b"),
                F.bit_count(
                    F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
                ).alias("hamming"),
            )
            # filter BEFORE the dedup shuffle: candidates failing the
            # Hamming bound (the vast majority) never reach the distinct
            # exchange
            .filter(F.col("hamming") <= max_hamming)
            .distinct()
        )
        star = (
            sh.select("simhash", id_col)
            .join(classes.filter(F.col("__m") > 1), "simhash")
            .filter(F.col(id_col) != F.col("__rep"))
            .select(
                F.col("__rep").alias("id_a"),
                F.col(id_col).alias("id_b"),
                F.lit(0).cast("integer").alias("hamming"),
            )
        )
        return rep_pairs.unionByName(star)
    # expand path: the band join needs only the DISTINCT signature value
    # (8 B/row — no representative id: the signature itself is the
    # canonical total order for unordered-pair dedup, sa < sb), so the
    # self-join input is the narrowest possible projection of classes
    banded = classes.select(
        "simhash", F.posexplode(band_cols).alias("band", "band_val")
    )
    a, b = banded.alias("a"), banded.alias("b")
    sig_pairs = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("a.simhash") < F.col("b.simhash"))
        .select(
            F.col("a.simhash").alias("__sa"),
            F.col("b.simhash").alias("__sb"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        # filter BEFORE the dedup shuffle: candidates failing the Hamming
        # bound (the vast majority) never reach the distinct exchange
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    # ONE expansion pipeline for both cross-class and within-class pairs:
    # an m≥2 identical class is a signature SELF-pair (s, s, hamming 0) —
    # unioning those with the verified cross pairs lets a single
    # join(members)×2 expand everything. For self-pairs the member join
    # yields each unordered pair twice (plus the diagonal); the
    # __ia < __ib guard keeps exactly one copy, while cross pairs (one
    # member from each side) pass unconditionally and are canonically
    # ordered by least/greatest. No distinct over expanded rows is ever
    # needed: one signature per doc → one source row per doc pair.
    # The m>1 filter keeps pair_src O(verified pairs + dup classes) —
    # small relative to the corpus whenever collapse matters, so AQE can
    # broadcast it into the expansion joins (forcing the hint was tried
    # and measured slightly SLOWER at sf0.1 than letting AQE decide).
    pair_src = sig_pairs.unionByName(
        classes.filter(F.col("__m") > 1).select(
            F.col("simhash").alias("__sa"),
            F.col("simhash").alias("__sb"),
            F.lit(0).cast("integer").alias("hamming"),
        )
    )
    ma = sh.select(F.col("simhash").alias("__sa"), F.col(id_col).alias("__ia"))
    mb = sh.select(F.col("simhash").alias("__sb"), F.col(id_col).alias("__ib"))
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


def ngram_jaccard_dedup(
    df: DataFrame,
    threshold: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple = ("lang",),
    shingle_k: int = 2,
) -> DataFrame:
    """Blocked exact n-gram Jaccard: pairs within the same block columns
    (cheap blocking keys — language, source, length bucket) with shingle
    Jaccard ≥ threshold. The block join bounds the pair count; at corpus
    scale you'd tighten blocks or switch to minhash_near_dup."""
    # Inverted-index formulation: explode distinct shingles, self-join on
    # (block, shingle) and COUNT matches per pair — intersection sizes come
    # out of a codegen'd join+aggregate instead of per-pair interpreted
    # array_intersect over every blocked pair. Pairs sharing no shingle are
    # never materialized, and |A∪B| = |A|+|B|-|A∩B| from per-doc sizes.
    # persist: consumed by the size projection and both sides of the
    # inverted-index self-join (3 reads of the shingle computation).
    # two-step: tokens project before the shingle lambda (r9, the
    # minhash_signature O(tokens²) fix)
    base = track(
        _spread(df)
        .select(
            F.col(id_col),
            *[F.col(c) for c in block_cols],
            tokenize(text_col).alias("__toks"),
        )
        .select(
            F.col(id_col),
            *[F.col(c) for c in block_cols],
            shingles(F.col("__toks"), shingle_k).alias("sh"),
        )
        .persist()
    )
    sizes = base.select(F.col(id_col), *block_cols, F.size("sh").alias("n"))
    ex = base.select(F.col(id_col), *block_cols, F.explode("sh").alias("s"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, [*block_cols, "s"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    j = (F.col("ni").cast("double") / (F.col("na") + F.col("nb") - F.col("ni")).cast("double"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(j, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def embedding_near_dup(
    emb_df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> DataFrame:
    """Embedding-cosine near-dup: pairs with cosine ≥ threshold.

    Blocked self-join (by cluster/label when available) with the dot
    product as a zip_with/aggregate expression — JVM-side, no UDF. For
    unblocked 100 TB-scale input, use similarity.rp_lsh_buckets to
    generate blocks first; ``block_col=None`` (explicit cross join) is
    guarded: it raises above ``_CROSSJOIN_MAX_ROWS`` rows so an
    accidental n² can't ship.
    """
    from kapacitor_spark.dataprep.similarity import with_norm, cosine_expr

    if block_col is None:
        # plan ROW-COUNT estimate first — proves small inputs small for
        # free; an absent estimate pays the bounded count job
        rc = _plan_row_count(emb_df)
        n = (
            rc
            if rc is not None and rc <= _CROSSJOIN_MAX_ROWS
            else emb_df.limit(_CROSSJOIN_MAX_ROWS + 1).count()
        )
        if n > _CROSSJOIN_MAX_ROWS:
            raise ValueError(
                f"embedding_near_dup(block_col=None) on >{_CROSSJOIN_MAX_ROWS} "
                "rows would build an n² cross join. Block first: "
                "similarity.rp_lsh_buckets(df) and pass block_col='bucket'."
            )
    base = with_norm(emb_df, vec_col)
    a, b = base.alias("a"), base.alias("b")
    on = [block_col] if block_col else []
    joined = (
        a.join(b, on) if on else a.crossJoin(b)
    ).filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    cos = cosine_expr(f"a.{vec_col}", f"b.{vec_col}", "a.__norm", "b.__norm")
    return joined.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.round(cos, 6).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/Pile n-gram overlap rule):
    drop every training document sharing ANY word n-gram with the
    benchmark/eval set.

    100 TB shape: the benchmark side is small by definition — its distinct
    n-grams BROADCAST; the corpus explodes to (id, gram) and a broadcast
    semi-join marks contaminated ids, then a left-anti join drops them.
    The corpus text is scanned once; nothing wider than (id, gram) moves.
    """
    # join on the 64-bit gram hash, not the gram text: the broadcast and
    # the probe side carry 8 bytes per gram instead of ~8n characters
    # (collision odds ~|grams|²/2⁶⁴ — immaterial for a contamination test).
    # hashed_shingles hashes the raw token SLICE — the ~8n-char gram
    # string is never materialized on either side.
    df = _spread(df)  # small corpora arrive as one split; hash on all cores
    # tokens project before the gram lambda on BOTH sides (r9, the
    # minhash_signature O(tokens²) fix)
    bench_grams = (
        benchmark.select(tokenize(text_col).alias("__toks"))
        .select(F.explode(hashed_shingles(F.col("__toks"), n)).alias("__gh"))
        .distinct()
    )
    doc_grams = df.select(
        F.col(id_col), tokenize(text_col).alias("__toks")
    ).select(
        F.col(id_col),
        F.explode(hashed_shingles(F.col("__toks"), n)).alias("__gh"),
    )
    dirty = (
        doc_grams.join(F.broadcast(bench_grams), "__gh")
        .select(id_col)
        .distinct()
    )
    return df.join(dirty, id_col, "left_anti")


def duplicated_gram_stats(
    df: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-substring signal — the exact-substring
    dedup rule of "Deduplicating Training Data Makes Language Models
    Better" (Lee et al., 2021) at word n-gram granularity: for each
    document, the fraction of its distinct k-grams that occur in at
    least ``min_docs`` documents corpus-wide. High fractions mark
    boilerplate-heavy or near-copied documents for dropping/trimming —
    the corpus-level complement of pairwise near-dup detection (a gram
    shared by 10k docs never shows up as a "pair").

    Returns (id, n_grams, dup_grams, dup_fraction).

    100 TB shape: grams move as 8-byte hashes (hashed_shingles — the
    text never shuffles); document frequency is one map-side-combining
    hash aggregate; the duplicated-gram set (usually a small fraction)
    semi-joins back against the gram stream; two doc-keyed count
    aggregates and one broadcast-eligible join finish it. Everything is
    codegen'd column expressions — no Python anywhere.
    """
    base = _spread(df.select(F.col(id_col), F.col(text_col)))
    # track()ed, NOT unpersisted inline: an unpersist before the caller's
    # action erases the plan's cache mapping (substitution happens at
    # physical planning), so the 3-consumer gram stream would recompute
    # three times. release_caches() is the defined drop point.
    grams = track(
        base.select(F.col(id_col), tokenize(text_col).alias("__toks"))
        .select(
            F.col(id_col),
            F.explode(hashed_shingles(F.col("__toks"), k)).alias("__gh"),
        )
        .persist()
    )
    dup_set = (
        grams.groupBy("__gh")
        .agg(F.count(F.lit(1)).alias("__df"))  # grams are distinct per doc
        .filter(F.col("__df") >= min_docs)
        .select("__gh")
    )
    n_grams = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    dup_grams = (
        grams.join(dup_set, "__gh", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("dup_grams"))
    )
    out = (
        n_grams.join(dup_grams, id_col, "left")
        .withColumn("dup_grams", F.coalesce(F.col("dup_grams"), F.lit(0)))
        .withColumn(
            "dup_fraction",
            F.round(F.col("dup_grams") / F.col("n_grams"), 6),
        )
    )
    return out


def dup_span_extents(
    df: DataFrame,
    width: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_first: bool = False,
) -> DataFrame:
    """Substring-level (span) duplication: the maximal duplicated token
    EXTENTS per document — suffix-array semantics (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better") at fixed
    shingle width, bucketed, never all-pairs. A token position belongs to
    a duplicated span when the ``width``-token shingle starting there
    occurs ≥ ``min_count`` times corpus-wide; overlapping/adjacent
    duplicated shingles merge into one extent.

    Returns (id, span_start, span_end, span_tokens): token-index extents,
    ``span_end`` exclusive, all longs.

    ``keep_first`` excludes each duplicated shingle's canonical first
    occurrence (smallest (doc_id, pos)) — the "keep one copy" policy for
    stripping, so the corpus retains exactly one instance of every span.

    100 TB shape: shingles shuffle as (8-byte xxhash64, id, pos) — the
    text never moves. Frequency is one map-side-combining hash aggregate
    (hot boilerplate shingles combine before the exchange — skew-proof,
    unlike a count-over-window); the duplicated-hash set (small) joins
    back left-semi (broadcast-eligible under AQE). keep_first instead
    needs per-hash ranking, one shuffle-by-hash window. Extent merging is
    a per-document lag/cumsum window — one shuffle on the doc key.
    xxhash64 stands in for shingle identity (collisions ~n²/2⁶⁴,
    negligible at any corpus size)."""
    base = _spread(df.select(F.col(id_col), F.col(text_col)))
    toks = tokenize(text_col)
    # NOT persisted, deliberately: both the frequency aggregate and the
    # occurrence join-back consume this stream, but re-deriving it rides
    # whole-stage codegen off the scan while persisting forces ~1 row per
    # corpus TOKEN through the block store — measured 1.15s vs 1.42s at
    # sf0.1, and at 100 TB the materialized (id, pos, hash) stream would
    # be token-count-sized. Recompute wins on both ends here.
    pos_sh = (
        base.withColumn("__toks", toks)
        .filter(F.size("__toks") >= width)
        .select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("__toks") - width),
                    lambda i: F.xxhash64(F.slice("__toks", i + 1, width)),
                )
            ).alias("__pos", "__sh"),
        )
    )
    if keep_first:
        # canonical occurrence = min (doc_id, pos) per shingle, found with
        # a map-side-combining aggregate (skew-proof: a boilerplate
        # shingle with millions of occurrences combines before the
        # exchange — a row_number window would sort the hot key in one
        # task); non-canonical occurrences then join back as duplicates
        keepers = (
            pos_sh.groupBy("__sh")
            .agg(
                F.count(F.lit(1)).alias("__c"),
                F.min(F.struct(id_col, "__pos")).alias("__keep"),
            )
            .filter(F.col("__c") >= min_count)
            .select("__sh", "__keep")
        )
        dup_pos = (
            pos_sh.join(keepers, "__sh")
            .filter(F.struct(id_col, "__pos") != F.col("__keep"))
            .select(id_col, "__pos")
        )
    else:
        dup_hashes = (
            pos_sh.groupBy("__sh")
            .agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") >= min_count)
            .select("__sh")
        )
        dup_pos = pos_sh.join(dup_hashes, "__sh", "left_semi").select(
            id_col, "__pos"
        )
    wd = Window.partitionBy(id_col).orderBy("__pos")
    spans = (
        dup_pos.withColumn("__prev", F.lag("__pos").over(wd))
        .withColumn(
            "__new",
            (
                F.col("__prev").isNull()
                | (F.col("__pos") > F.col("__prev") + width)
            ).cast("int"),
        )
        .withColumn(
            "__span",
            F.sum("__new").over(wd.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(id_col, "__span")
        .agg(
            F.min("__pos").cast("long").alias("span_start"),
            (F.max("__pos") + width).cast("long").alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )
    return spans


def span_dedup_stats(
    df: DataFrame,
    width: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document span-duplication accounting over dup_span_extents:
    (id, n_tokens, dup_spans, dup_tokens, max_span_tokens), all longs,
    dup_* = 0 for clean docs. ``dup_tokens`` is the size of the UNION of
    duplicated extents (merged, so no double counting)."""
    ext = dup_span_extents(
        df, width=width, min_count=min_count, text_col=text_col, id_col=id_col
    )
    per_doc = ext.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dup_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
        F.max("span_tokens").alias("max_span_tokens"),
    )
    base = df.select(
        F.col(id_col), F.size(tokenize(text_col)).cast("long").alias("n_tokens")
    )
    return (
        base.join(per_doc, id_col, "left")
        .na.fill({"dup_spans": 0, "dup_tokens": 0, "max_span_tokens": 0})
        .select(id_col, "n_tokens", "dup_spans", "dup_tokens", "max_span_tokens")
    )


def strip_dup_spans(
    df: DataFrame,
    width: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The cleaning pass: remove duplicated token extents from each
    document, keeping each span's canonical first occurrence corpus-wide
    (keep_first extents) — the Lee-et-al substring-dedup transform.
    Returns (id, text) with the stripped text rebuilt from surviving
    tokens (whitespace-normalized, like every tokenize-based op here).

    Extents per doc collect into an array (docs have few extents) and the
    token filter is a pure column expression — no Python."""
    ext = dup_span_extents(
        df, width=width, min_count=min_count, text_col=text_col,
        id_col=id_col, keep_first=True,
    )
    per_doc = ext.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__ext")
    )
    base = df.select(F.col(id_col), tokenize(text_col).alias("__toks"))
    joined = base.join(per_doc, id_col, "left")
    idx = F.sequence(F.lit(0), F.size("__toks") - 1)
    kept = F.filter(
        idx,
        lambda i: ~F.coalesce(
            F.exists(
                F.col("__ext"),
                lambda e: (i >= e["span_start"]) & (i < e["span_end"]),
            ),
            F.lit(False),
        ),
    )
    return joined.select(
        F.col(id_col),
        F.concat_ws(
            " ", F.transform(kept, lambda i: F.element_at("__toks", i + 1))
        ).alias(text_col),
    )


def contamination_spans(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination LOCALIZATION: the merged token extents of
    each corpus document that overlap the benchmark's n-grams —
    decontaminate() tells you WHICH docs to drop; this tells you WHERE
    the overlap sits, enabling surgical trimming instead of deletion
    (strip_contaminated_spans) and contamination auditing.

    Returns (id, span_start, span_end, span_tokens), ends exclusive.

    100 TB shape: the benchmark's distinct gram hashes BROADCAST (eval
    sets are small by definition — same plan as decontaminate); corpus
    shingle positions move as (xxhash64, id, pos) and the membership
    check is a broadcast semi-join; extent merging is the per-doc
    lag/cumsum window from span dedup. The corpus text never shuffles.
    """
    bench_grams = (
        benchmark.select(tokenize(text_col).alias("__toks"))
        .select(F.explode(hashed_shingles(F.col("__toks"), n)).alias("__gh"))
        .distinct()
    )
    base = _spread(df.select(F.col(id_col), F.col(text_col)))
    pos_sh = (
        base.withColumn("__toks", tokenize(text_col))
        .filter(F.size("__toks") >= n)
        .select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("__toks") - n),
                    lambda i: F.xxhash64(F.slice("__toks", i + 1, n)),
                )
            ).alias("__pos", "__gh"),
        )
    )
    hits = pos_sh.join(F.broadcast(bench_grams), "__gh", "left_semi").select(
        id_col, "__pos"
    )
    wd = Window.partitionBy(id_col).orderBy("__pos")
    return (
        hits.withColumn("__prev", F.lag("__pos").over(wd))
        .withColumn(
            "__new",
            (
                F.col("__prev").isNull() | (F.col("__pos") > F.col("__prev") + n)
            ).cast("int"),
        )
        .withColumn(
            "__span",
            F.sum("__new").over(wd.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(id_col, "__span")
        .agg(
            F.min("__pos").cast("long").alias("span_start"),
            (F.max("__pos") + n).cast("long").alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )


def strip_contaminated_spans(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Surgical decontamination: remove only the benchmark-overlapping
    token extents from each document instead of dropping the whole doc
    (the trim alternative to decontaminate()'s left-anti). Returns
    (id, text) with surviving tokens whitespace-joined; fully-overlapped
    docs come back with empty text (filter on it if drop is wanted)."""
    ext = contamination_spans(df, benchmark, n=n, text_col=text_col, id_col=id_col)
    per_doc = ext.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__ext")
    )
    base = df.select(F.col(id_col), tokenize(text_col).alias("__toks"))
    joined = base.join(per_doc, id_col, "left")
    idx = F.sequence(F.lit(0), F.size("__toks") - 1)
    kept = F.filter(
        idx,
        lambda i: ~F.coalesce(
            F.exists(
                F.col("__ext"),
                lambda e: (i >= e["span_start"]) & (i < e["span_end"]),
            ),
            F.lit(False),
        ),
    )
    return joined.select(
        F.col(id_col),
        F.concat_ws(
            " ", F.transform(kept, lambda i: F.element_at("__toks", i + 1))
        ).alias(text_col),
    )


def _driver_union_find(pairs: DataFrame, rows: list) -> DataFrame:
    """Driver-side union-find over a PROVABLY small collected pair list
    (the guarded fast path of near_dup_clusters). Same contract:
    (doc_id, keeper) for every node in a pair, keeper = the component's
    min id."""
    from pyspark.sql import types as T

    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        a, b = r[0], r[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN root so the representative IS the keeper
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    out = [(n, find(n)) for n in parent]
    out.sort()
    id_type = pairs.schema[0].dataType
    schema = T.StructType(
        [T.StructField("doc_id", id_type), T.StructField("keeper", id_type)]
    )
    from kapacitor_spark.session import local_df

    # one slice per ~100k rows: a driver-built cluster table is small by
    # contract (bounded union-find path); the default 32-way slicing costs
    # a Python-worker round trip per slice on every downstream action (r12)
    return local_df(
        pairs.sparkSession, out, schema, slices=1 + len(out) // 100_000
    )


def near_dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    max_driver_pairs: int = 200_000,
) -> DataFrame:
    """Connected components over near-duplicate PAIRS → one cluster keeper
    per document (pairs alone don't dedup a corpus; transitive groups do:
    A~B, B~C must collapse to one keeper even when A~C was never a
    candidate).

    Label propagation with POINTER JUMPING: every node starts labeled with
    itself; each round takes the min label over {self} ∪ neighbors, then
    additionally hops label ← min(label, label[label]) — doubling the
    propagation reach so rounds ≈ O(log diameter) instead of O(diameter).
    Each round is two equi-joins + one min-aggregate (map-side partial) —
    the standard Spark CC without any graph library. The driver loop
    checks convergence with a count — bounded by ``max_iter``.

    Every round ends in ``localCheckpoint`` — WITHOUT lineage truncation
    the iterative plan doubles per round and kills the driver with a
    multi-GB plan string / heap OOM around 12 rounds (measured). On a
    real cluster prefer ``spark.sparkContext.setCheckpointDir`` +
    ``.checkpoint()`` for executor-loss tolerance; localCheckpoint is the
    single-node stand-in.

    SMALL-INPUT FAST PATH: near-dup pair sets are usually control-plane
    small relative to the corpus (dedup rates of a few percent of an
    already-banded candidate set), and the iterative plan pays ~6 Spark
    rounds of joins + checkpoints regardless of size — 15.7s for 158
    clusters at sf0.1 (measured). Unless Catalyst's free row estimate
    proves the pair set LARGE, the edges are collected under a
    ``limit(max_driver_pairs+1)`` guard (ONE evaluation of the possibly
    expensive pair pipeline — a separate count job would pay it twice);
    when they fit (16 bytes each, ≤ ~3 MB) a driver union-find gives the
    same min-keeper answer two orders of magnitude faster. The
    distributed pointer-jumping walk remains THE scale path for
    billion-pair corpora; equality of the two is property-tested. Pass
    ``max_driver_pairs=0`` to force the distributed walk.

    Returns (doc_id, keeper) for every node appearing in a pair.
    """
    probed = None
    if max_driver_pairs > 0:
        rc = _plan_row_count(pairs)
        if rc is None or rc <= max_driver_pairs:
            # persist BEFORE the probe: the limit-collect executes the
            # (possibly expensive) upstream pair pipeline, and when the
            # probe LOSES — Catalyst had no estimate and the set turned
            # out large — the distributed walk below must not pay those
            # shuffles a second time. When the probe wins, the cache is
            # dropped after the driver union-find consumes the rows.
            probed = pairs.select(id_a, id_b).persist()
            rows = probed.limit(max_driver_pairs + 1).collect()
            if len(rows) <= max_driver_pairs:
                _log.info(
                    "near_dup_clusters: driver union-find fast path "
                    "(%d pairs <= max_driver_pairs=%d)",
                    len(rows), max_driver_pairs,
                )
                out = _driver_union_find(probed, rows)
                probed.unpersist()
                return out
            pairs = probed  # reuse the materialized edges in the walk
    _log.info(
        "near_dup_clusters: distributed pointer-jumping walk "
        "(plan estimate %s, max_driver_pairs=%d)",
        _plan_row_count(pairs), max_driver_pairs,
    )
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        stepped = labels.join(
            neighbor_min, labels.node == neighbor_min.src, "left"
        ).select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
            ).alias("label"),
        )
        # pointer jumping: follow my label's label (labels only ever
        # decrease toward the component min, so min() keeps correctness)
        lab2 = stepped.select(
            F.col("node").alias("__ln"), F.col("label").alias("__ll")
        )
        new_labels = (
            stepped.join(lab2, stepped.label == lab2.__ln, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("__ll"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # duplicate chains deeper than max_iter hops would silently split
        # a transitive group into several keepers — surface it
        import warnings

        warnings.warn(
            f"near_dup_clusters: label propagation did not converge after "
            f"{max_iter} rounds ({changed} labels still changing); clusters "
            "with diameter > max_iter are split. Raise max_iter.",
            RuntimeWarning,
            stacklevel=2,
        )
    out = labels.select(F.col("node").alias("doc_id"), F.col("label").alias("keeper"))
    edges.unpersist()
    if probed is not None:
        probed.unpersist()
    return out
