"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: broadcast the (small) query
set, score every corpus vector with a JVM-side zip_with/aggregate dot
product, take per-query top-k with one window. Cost is |Q|·|corpus| dot
products spread across all executors — at 100 TB you bound |Q| or move to
the bucketed path.

The scale path is random-projection LSH (rp_lsh_buckets / rp_lsh_topk):
sign-bit bucket on R fixed hyperplanes, candidates only within the same
bucket (optionally multi-probe neighboring buckets). An IVF variant would
assign to nearest of k centroids — same join shape; the hyperplanes here
are deterministic (hash-derived, no RNG) so results are reproducible.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kapacitor_spark.dataprep.cache import track

__all__ = [
    "with_norm",
    "cosine_expr",
    "brute_force_topk",
    "rp_lsh_buckets",
    "rp_lsh_topk",
    "ivf_index",
    "ivf_topk",
    "ann_recall",
    "assign_clusters",
    "cluster_balanced_sample",
]


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach the L2 norm as a double column (computed once, reused)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    return df.withColumn("__norm", norm)


def cosine_expr(vec_a: str, vec_b: str, norm_a: str, norm_b: str) -> "F.Column":
    """cos(a,b) as a pure column expression — double arithmetic throughout
    (float32 inputs are upcast) so results are engine-comparable."""
    dot = F.aggregate(
        F.zip_with(
            F.col(vec_a), F.col(vec_b), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (F.col(norm_a) * F.col(norm_b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × scan corpus, one window for
    per-query rank. Returns (query_id, neighbor_id, cosine, rank)."""
    from pyspark.sql import Window

    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.col("__norm").alias("__cn"),
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("__norm").alias("__qn"),
    )
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = cosine_expr("__qv", "__cv", "__qn", "__cn")
    scored = scored.select("query_id", "neighbor_id", cos.alias("__cos"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("__cos", 6).alias("cosine"),
            "rank",
        )
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane — hash-derived components
    (no RNG state, reproducible across runs/engines)."""
    comps = []
    for j in range(dim):
        # xorshift-ish integer scramble of (plane, j) → [-1, 1)
        h = (plane * 1_000_003 + j * 37) & 0xFFFFFFFF
        h ^= h >> 13
        h = (h * 0x5BD1E995) & 0xFFFFFFFF
        h ^= h >> 15
        comps.append((h / 2**31) - 1.0)
    n = math.sqrt(sum(c * c for c in comps)) or 1.0
    return [c / n for c in comps]


def rp_lsh_buckets(
    df: DataFrame,
    num_planes: int = 8,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Random-projection LSH bucket id: sign bits of <v, plane_i> packed to
    a long. Narrow projection; bucket cardinality 2^num_planes."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    bucket = F.lit(0).cast("long")
    for i in range(num_planes):
        plane = _hyperplane(dim, i)
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(c) for c in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket.bitwiseOR(
            F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    return df.withColumn("bucket", bucket)


def ivf_index(
    df: DataFrame,
    n_lists: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """IVF(-flat) index: k-means lists with deterministic seeding.

    Seeds = the vectors with the ``n_lists`` smallest xxhash64(id) values
    (hash-ordered sample — reproducible, no RNG), refined by ``iters``
    Lloyd rounds computed distributively: assign via broadcast of the tiny
    centroid table (each row evaluates n_lists dot products JVM-side),
    recenter via one hash-aggregate per round. Centroids are collected to
    the driver — n_lists × dim doubles, kilobytes — the standard IVF
    coarse-quantizer shape.

    Returns (assigned DataFrame with ``list_id``, centroids).
    """
    import numpy as np

    base = df.select(F.col(id_col), F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"))
    seeds = (
        base.withColumn("__h", F.xxhash64(F.col(id_col)))
        .orderBy("__h")
        .limit(n_lists)
        .select("__v")
        .collect()
    )
    cents = np.array([r["__v"] for r in seeds], dtype=float)

    def assigned_df(centroids: np.ndarray):
        """Nearest-centroid assignment as ONE vectorized numpy matmul per
        Arrow batch (mapInPandas) — ||x-c||² = ||x||² - 2x·c + ||c||², so
        argmin is an (n×d)@(d×k) product; interpreted per-centroid array
        expressions were ~20x slower."""
        cent = centroids.copy()
        cnorm = (cent**2).sum(axis=1)

        def run(batches):
            for pdf in batches:
                X = np.stack(pdf["__v"].to_numpy())
                d = cnorm[None, :] - 2.0 * (X @ cent.T)
                pdf = pdf.copy()
                pdf["list_id"] = d.argmin(axis=1).astype("int32")
                yield pdf

        # id keeps the caller's type (same fix as ivf_assign): a
        # hardcoded long would break string-keyed corpora at Arrow cast
        return base.mapInPandas(
            run,
            schema=T.StructType(
                [
                    df.schema[id_col],
                    T.StructField("__v", T.ArrayType(T.DoubleType())),
                    T.StructField("list_id", T.IntegerType()),
                ]
            ),
        )

    for _ in range(iters):
        assigned = assigned_df(cents)
        dim = cents.shape[1]
        sums = assigned.groupBy("list_id").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.element_at("__v", j + 1)).alias(f"s{j}")
                for j in range(dim)
            ],
        )
        for r in sums.collect():
            if r["n"] > 0:
                cents[r["list_id"]] = [r[f"s{j}"] / r["n"] for j in range(dim)]

    out = df.join(assigned_df(cents).select(id_col, "list_id"), id_col)
    return out, cents.tolist()


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: score only corpus vectors in each query's
    ``nprobe`` nearest lists — the classic inverted-file ANN search.

    The probe map (query → candidate lists) is computed DISTRIBUTED: the
    kilobyte centroid table rides into a mapInPandas closure and each
    Arrow batch of queries is assigned its nprobe nearest lists with one
    numpy matmul — the query side never funnels through the driver, so it
    scales with |Q| exactly like the corpus side. The probe map is then
    broadcast-joined against the indexed corpus: one equi-join on list_id
    replaces the cross join, cutting the scored fraction to
    ~nprobe/n_lists. Returns (query_id, neighbor_id, cosine, rank).
    """
    import numpy as np
    from pyspark.sql import Window

    indexed, cents = ivf_index(corpus, n_lists=n_lists, id_col=id_col, vec_col=vec_col)
    cent = np.array(cents)
    cnorm = (cent**2).sum(axis=1)

    qbase = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__qv"),
        F.col("__norm").alias("__qn"),
    )

    # can't probe more lists than exist (nprobe > n_lists would make the
    # argsort slice narrower than the index repeat and crash the Arrow worker)
    k_probe = min(nprobe, cent.shape[0])

    def probe(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["__qv"].to_numpy())
            # argmin of ||q-c||² = ||c||² - 2q·c (+||q||², constant per row)
            d = cnorm[None, :] - 2.0 * (X @ cent.T)
            lists = np.argsort(d, axis=1, kind="stable")[:, :k_probe]
            out = pdf.loc[pdf.index.repeat(k_probe)].copy()
            out["list_id"] = lists.reshape(-1).astype("int32")
            yield out

    # id keeps the caller's type (a hardcoded long breaks string-keyed
    # corpora at the Arrow cast — same contract as ivf_index)
    probes = qbase.mapInPandas(
        probe,
        schema=T.StructType(
            [
                T.StructField("query_id", queries.schema[id_col].dataType),
                T.StructField("__qv", T.ArrayType(T.DoubleType())),
                T.StructField("__qn", T.DoubleType()),
                T.StructField("list_id", T.IntegerType()),
            ]
        ),
    )

    c = with_norm(indexed, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.col("__norm").alias("__cn"),
        "list_id",
    )
    scored = c.join(F.broadcast(probes), "list_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = cosine_expr("__qv", "__cv", "__qn", "__cn")
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", cos.alias("__cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("__cos", 6).alias("cosine"), "rank")
    )


def ann_recall(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    recall_floor: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rp_planes: int = 4,
    ivf_lists: int = 8,
    ivf_nprobe: int = 3,
) -> DataFrame:
    """Deterministic quality gate for the approximate ANN paths: recall@k
    of rp_lsh_topk and ivf_topk against the exact brute_force_topk, one
    summary row per method ``(method, n_queries, recall_ok)``.

    Both approximate methods are fully deterministic (hash-derived
    hyperplanes / hash-ordered k-means seeds, no RNG), so recall on a
    fixed dataset is a fixed number — asserting it ≥ ``recall_floor``
    Spark-side makes the row a golden value an external oracle can check
    without re-implementing LSH/IVF. Everything is computed distributed;
    only the two 1-row summaries move.
    """
    exact = track(brute_force_topk(corpus, queries, k, id_col, vec_col).select(
        "query_id", "neighbor_id"
    ).persist())
    nq = queries.select(id_col).distinct().count()

    def summarize(name: str, approx: DataFrame) -> DataFrame:
        hits = exact.join(
            approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
        ).count()
        recall = hits / float(nq * k) if nq else 0.0
        spark = corpus.sparkSession
        from kapacitor_spark.session import local_df

        return local_df(  # one-row summary: one slice, not 32 (r12)
            spark,
            [(name, nq, bool(recall >= recall_floor))],
            "method string, n_queries long, recall_ok boolean",
        )

    rp = summarize(
        "rp_lsh", rp_lsh_topk(corpus, queries, k, rp_planes, id_col, vec_col)
    )
    ivf = summarize(
        "ivf", ivf_topk(corpus, queries, k, ivf_lists, ivf_nprobe, id_col, vec_col)
    )
    return ivf.unionByName(rp).orderBy("method")


def rp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multi_probe: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket(s). Equi-join on bucket replaces the cross join — this is the
    100 TB path (recall < 1.0, tunable via num_planes / multi_probe).

    ``multi_probe=1`` additionally probes every bucket at Hamming
    distance 1 from the query's bucket (classic multi-probe LSH: the
    vectors most likely to be missed sit just across one hyperplane).
    Only the tiny query side is exploded ×(1+num_planes); the corpus is
    still scanned once and joined on bucket equality.

    Pass ``dim`` when the embedding dimension is known to skip the
    dim-sniffing probe job entirely.
    """
    from pyspark.sql import Window

    if dim is None:
        # sniff the vector dim from the QUERY side — queries are small
        # (often driver-local), so this probe job touches one tiny row
        # group instead of opening the corpus scan.
        dim = len(queries.select(vec_col).first()[0])
    c = rp_lsh_buckets(with_norm(corpus, vec_col), num_planes, vec_col, dim).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.col("__norm").alias("__cn"),
        "bucket",
    )
    q = rp_lsh_buckets(with_norm(queries, vec_col), num_planes, vec_col, dim).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.col("__norm").alias("__qn"),
        "bucket",
    )
    if multi_probe:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), i))
                for i in range(num_planes)
            ],
        )
        q = q.select(
            "query_id", "__qv", "__qn", F.explode(probes).alias("bucket")
        )
    scored = c.join(F.broadcast(q), "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    if multi_probe:
        scored = scored.dropDuplicates(["query_id", "neighbor_id"])
    cos = cosine_expr("__qv", "__cv", "__qn", "__cn")
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", cos.alias("__cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("__cos", 6).alias("cosine"), "rank")
    )


def _auto_n_lists(df: DataFrame, target_cluster_size: int = 4096) -> int:
    """Corpus-aware IVF list count: ceil(rows / target_cluster_size), floor
    16. Uses Catalyst's free optimized-plan row-count estimate when defined;
    otherwise one count job — negligible next to the pair join it sizes."""
    from kapacitor_spark.dataprep.dedup import _plan_row_count

    n = _plan_row_count(df)
    if n is None:
        n = df.count()
    return max(16, -(-int(n) // max(1, target_cluster_size)))


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest IVF lists — one numpy
    matmul per Arrow batch over the (kilobyte) centroid closure, the same
    distributed shape as ivf_index's assignment but emitting nprobe rows
    per vector. Returns (id_col, list_id)."""
    import numpy as np

    cent = np.array(centroids, dtype=float)
    cnorm = (cent**2).sum(axis=1)
    k_probe = min(nprobe, cent.shape[0])
    base = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    # the id column keeps the CALLER's type (string ids are as legal here
    # as longs everywhere else in the dedup surface) — hardcoding long
    # would fail the Arrow cast and corrupt the downstream join keys
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("__v", T.ArrayType(T.DoubleType())),
            T.StructField("list_id", T.IntegerType()),
        ]
    )

    def probe(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["__v"].to_numpy())
            d = cnorm[None, :] - 2.0 * (X @ cent.T)
            lists = np.argsort(d, axis=1, kind="stable")[:, :k_probe]
            out = pdf.loc[pdf.index.repeat(k_probe)].copy()
            out["list_id"] = lists.reshape(-1).astype("int32")
            yield out

    return base.mapInPandas(probe, schema=out_schema).select(id_col, "list_id")


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.9,
    n_lists: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cluster_size: int = 4096,
    nprobe: int = 1,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    the embedding space with the deterministic IVF k-means (ivf_index),
    then find near-duplicate PAIRS only within each cluster — the
    canonical "cluster to bound the n², dedup inside clusters" shape for
    embedding-level dedup of web-scale corpora.

    Returns (id_a, id_b, cosine) pairs with cosine >= threshold; feed to
    dedup.near_dup_clusters for keeper election.

    100 TB shape: cluster assignment is one numpy matmul per Arrow batch
    over broadcast centroids (ivf_index); the pair search is an equi-join
    on list_id — quadratic only WITHIN a cluster, which is exactly the
    blow-up bound n_lists controls (size clusters so the hottest one's
    pair count fits a task; AQE skew-split handles residue). Cross-cluster
    near-dups are missed by construction — the documented SemDeDup
    trade-off; raise n_lists for speed, lower it for recall.

    ``n_lists=None`` (default) SIZES THE INDEX FROM THE CORPUS: n_lists ≈
    corpus_rows / target_cluster_size (floor 16), using Catalyst's free
    row-count estimate when available and one cheap count job otherwise.
    A fixed default would be corpus-size-blind — a 10⁹-vector corpus
    through 16 lists means ~(10⁹/16)²/2 pairs per cluster, a quadratic
    hot task no executor survives; auto-sizing keeps expected per-cluster
    pair counts at ~target_cluster_size²/2 regardless of corpus scale.
    Pass an explicit n_lists to pin the recall/speed trade-off instead.

    ``nprobe`` > 1 MULTI-ASSIGNS each vector to its nprobe nearest lists
    (ivf_assign) — the textbook mitigation for SemDeDup's boundary
    misses: a near-duplicate pair split by a k-means boundary still
    co-occurs in SOME list when each side also joins its second-nearest
    cluster. Costs ≤ nprobe² pair-join inflation (deduped on ids);
    measured on the planted-pair corpus it turns "all but the straddlers"
    into "all".
    """
    if n_lists is None:
        n_lists = _auto_n_lists(df, target_cluster_size)
    assigned, cents = ivf_index(df, n_lists=n_lists, id_col=id_col, vec_col=vec_col)
    if nprobe > 1:
        assigned = df.join(
            ivf_assign(df, cents, nprobe, id_col, vec_col), id_col
        )
    normed = with_norm(assigned.select(id_col, vec_col, "list_id"), vec_col)
    a = normed.select(
        F.col("list_id"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__norm").alias("__na"),
    )
    b = normed.select(
        F.col("list_id"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("__norm").alias("__nb"),
    )
    cos = cosine_expr("__va", "__vb", "__na", "__nb")
    out = (
        a.join(b, "list_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
    if nprobe > 1:
        # a pair can qualify in several shared lists; identical arithmetic
        # → identical rounded cosine, so id-level dedup is exact
        out = out.dropDuplicates(["id_a", "id_b"])
    return out


def pq_train(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 8,
    sample: int = 16384,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Product-quantizer codebooks: the dim splits into ``m`` subspaces,
    each with its own ``ksub``-centroid k-means — a vector then encodes
    as m small integers (m bytes at ksub≤256) instead of dim floats, the
    standard PQ memory story (16 B/vector instead of ~256 B at dim 64 /
    float32, and the ratio grows with dim).

    Training runs on a DETERMINISTIC hash-ordered sample collected to
    the driver (the ``sample`` rows with smallest xxhash64(id) — no RNG,
    reproducible), then plain numpy Lloyd per subspace. Sampling is the
    standard PQ practice (FAISS trains on a bounded sample too): the
    sample size is FIXED regardless of corpus size, so training cost
    does not grow with 100 TB; only encode does, and that is one numpy
    matmul per Arrow batch. Returns codebooks as nested lists
    (m, ksub, dim/m)."""
    import numpy as np

    base = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    rows = (
        base.withColumn("__h", F.xxhash64(F.col(id_col)))
        .orderBy("__h")
        .limit(sample)
        .select("__v")
        .collect()
    )
    X = np.array([r["__v"] for r in rows], dtype=float)
    n, dim = X.shape
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.zeros((m, ksub, dsub))
    for s in range(m):
        Xs = X[:, s * dsub : (s + 1) * dsub]
        cent = Xs[: min(ksub, n)].copy()
        if len(cent) < ksub:  # degenerate tiny corpus: pad by repetition
            cent = np.resize(cent, (ksub, dsub))
        for _ in range(iters):
            d = (cent**2).sum(axis=1)[None, :] - 2.0 * (Xs @ cent.T)
            a = d.argmin(axis=1)
            for j in range(ksub):
                mask = a == j
                if mask.any():
                    cent[j] = Xs[mask].mean(axis=0)
        books[s] = cent
    return books.tolist()


def pq_encode(
    df: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: tuple = (),
) -> DataFrame:
    """PQ codes per vector: one numpy argmin per subspace per Arrow batch.
    Returns (id, *keep, __codes array<int>) — m small ints; at rest these
    are the m-byte codes, full vectors never need to ship to the scan."""
    import numpy as np

    books = np.array(codebooks)
    m, ksub, dsub = books.shape
    bnorm = (books**2).sum(axis=2)  # (m, ksub)
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    out_schema = T.StructType(
        [df.schema[id_col]]
        + [base.schema[c] for c in keep]
        + [T.StructField("__codes", T.ArrayType(T.IntegerType()))]
    )

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["__v"].to_numpy())
            codes = np.empty((len(X), m), dtype="int32")
            for s in range(m):
                Xs = X[:, s * dsub : (s + 1) * dsub]
                d = bnorm[s][None, :] - 2.0 * (Xs @ books[s].T)
                codes[:, s] = d.argmin(axis=1)
            out = pdf.drop(columns="__v")
            out["__codes"] = list(codes)
            yield out

    return base.mapInPandas(run, schema=out_schema)


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    refine: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ approximate top-k with exact re-rank — the 100 TB ANN
    shape: the SCAN reads m-byte PQ codes, never vectors.

    Pipeline: IVF coarse quantizer (ivf_index — hash-seeded, no RNG) →
    PQ-encode each list's members (pq_encode) → per query, assign
    ``nprobe`` nearest lists AND build the ADC lookup table (distance
    from the query's sub-vector to each of the ksub sub-centroids; m·ksub
    doubles per query) in one numpy hop → the candidate scan is a
    broadcast equi-join on list_id whose distance is a PURE JVM fold:
    adc = Σ_s lut[s·ksub + code_s] — no Python, no vectors, just an
    array lookup per subspace over the m-int code column. The ``refine``
    best ADC candidates per query are then re-ranked by EXACT cosine
    against the corpus vectors (one equi-join on id — touches refine
    rows per query, not the list). Cosine ordering is preserved because
    all vectors are L2-normalized before PQ (monotone L2²↔cosine).

    At 100 TB: codes are ~16 B/vector (m=16) against ~256 B of float32
    at dim 64 — the probe scan's IO shrinks ~16x and the full-precision
    vectors are only fetched for refine·|Q| rows. Returns
    (query_id, neighbor_id, cosine, rank)."""
    import numpy as np
    from pyspark.sql import Window

    def normalized(df: DataFrame, out: str) -> DataFrame:
        # two-step projection: the divide lambda must capture __nrm as a
        # COLUMN — capturing the aggregate expression re-evaluates the
        # whole norm PER ELEMENT (O(dim²); see SCALE.md §higher-order
        # lambdas). A single-use alias is NOT enough: CollapseProject
        # inlines it straight back into the lambda (verified on the
        # optimized plan). The zero-norm guard below references __nrm a
        # second time, which both keeps the projection boundary (multi-
        # use, non-cheap) AND fixes the divide-by-zero a null/zero
        # vector would otherwise turn into an all-NaN embedding.
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        staged = df.select(
            F.col(id_col),
            v.alias("__vd"),
            F.sqrt(
                F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x)
            ).alias("__nrm"),
        )
        return staged.select(
            F.col(id_col),
            F.when(
                F.col("__nrm") > 0,
                F.transform(F.col("__vd"), lambda x: x / F.col("__nrm")),
            )
            .otherwise(F.col("__vd"))
            .alias(out),
        )

    corp_n = track(normalized(corpus, "__cv").persist())
    indexed, cents = ivf_index(
        corp_n.select(F.col(id_col), F.col("__cv").alias(vec_col)),
        n_lists=n_lists, id_col=id_col, vec_col=vec_col,
    )
    books = pq_train(
        corp_n.select(F.col(id_col), F.col("__cv").alias(vec_col)),
        m=m, ksub=ksub, id_col=id_col, vec_col=vec_col,
    )
    codes = pq_encode(
        indexed.select(F.col(id_col), "list_id", F.col(vec_col)),
        books, id_col=id_col, vec_col=vec_col, keep=("list_id",),
    )

    cent = np.array(cents)
    cnorm = (cent**2).sum(axis=1)
    bks = np.array(books)
    bnorm = (bks**2).sum(axis=2)
    dsub = cent.shape[1] // m
    k_probe = min(nprobe, cent.shape[0])

    q_n = normalized(queries, "__qv").select(
        F.col(id_col).alias("query_id"), "__qv"
    )

    def probe(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["__qv"].to_numpy())
            d = cnorm[None, :] - 2.0 * (X @ cent.T)
            lists = np.argsort(d, axis=1, kind="stable")[:, :k_probe]
            # ADC tables: ||qs||² + ||c||² - 2 qs·c per subspace (true
            # squared L2 — the constant matters only per-query, but true
            # values keep the fold interpretable)
            lut = np.empty((len(X), m * bks.shape[1]))
            for s in range(m):
                Xs = X[:, s * dsub : (s + 1) * dsub]
                lut[:, s * bks.shape[1] : (s + 1) * bks.shape[1]] = (
                    (Xs**2).sum(axis=1)[:, None]
                    + bnorm[s][None, :]
                    - 2.0 * (Xs @ bks[s].T)
                )
            out = pdf.loc[pdf.index.repeat(k_probe)].copy()
            out["list_id"] = lists.reshape(-1).astype("int32")
            out["__lut"] = list(np.repeat(lut, k_probe, axis=0))
            yield out

    # id keeps the caller's type, as in ivf_index/ivf_topk
    probes = q_n.mapInPandas(
        probe,
        schema=T.StructType(
            [
                T.StructField("query_id", queries.schema[id_col].dataType),
                T.StructField("__qv", T.ArrayType(T.DoubleType())),
                T.StructField("list_id", T.IntegerType()),
                T.StructField("__lut", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(
            F.col("__lut"), i * ksub + F.element_at(F.col("__codes"), i + 1) + 1
        ),
    )
    wa = Window.partitionBy("query_id").orderBy(F.col("__adc"), F.col("neighbor_id"))
    cand = (
        codes.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(probes), "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "__qv", adc.alias("__adc"))
        .withColumn("__arank", F.row_number().over(wa))
        .filter(F.col("__arank") <= refine)
    )
    nb = corp_n.select(F.col(id_col).alias("neighbor_id"), "__cv")
    cos = F.aggregate(
        F.zip_with(F.col("__qv"), F.col("__cv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id"))
    return (
        cand.join(nb, "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("__cos"))
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("__cos", 6).alias("cosine"), "rank")
    )


__all__ += ["pq_train", "pq_encode", "ivf_pq_topk"]


# --------------------------------------------------------------------- #
# cluster-balanced selection (r11): topic balancing for pretraining mixes
# --------------------------------------------------------------------- #


def assign_clusters(
    df: DataFrame,
    centroids: "list[list[float]]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int | None = None,
) -> DataFrame:
    """DECLARATIVE nearest-centroid assignment against k LITERAL
    centroids — pure Catalyst (one sequential ``aggregate`` fold per
    centroid, argmin via array_min/array_position with the
    first-occurrence = lowest-cluster-id tiebreak). No Python in the
    plan, so it rides whole-stage codegen and the parquet scan's column
    pruning at any corpus size; k is expected small (topic-level
    clustering). For large k use the numpy matmul path (ivf_assign).

    ``round_dp``: round vector elements to this many decimals before
    differencing — pins the arithmetic to an exactly-mirrorable form
    (DuckDB's list_sum(list_transform(...)) folds bit-for-bit equal to
    Spark's aggregate(), verified on the fixture corpus).

    Adds ``cluster_id`` (int). Scale: ZERO shuffles — a projection on
    the scan.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if round_dp is not None:
        v = F.transform(v, lambda x: F.round(x, round_dp))
    dists = []
    for c in centroids:
        cl = F.array(*[F.lit(float(x)) for x in c])
        dists.append(
            F.aggregate(
                F.zip_with(v, cl, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        )
    arr = F.array(*dists)
    return df.withColumn(
        "cluster_id",
        (F.array_position(arr, F.array_min(arr)) - 1).cast("int"),
    )


def cluster_balanced_sample(
    df: DataFrame,
    budget: int,
    alpha: float = 0.0,
    centroids: "list[list[float]] | None" = None,
    n_lists: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    order_col: str | None = None,
    round_dp: int | None = None,
) -> DataFrame:
    """Cluster-balanced corpus selection: cluster by embedding, then take
    a per-cluster quota so the selected mix is balanced across topics
    instead of mirroring the crawl's skew — the cluster-sampling stage
    of SemDeDup-style pipelines and temperature-based domain
    reweighting, as one operator.

    quota_c = ceil(budget · n_c^alpha / Σ_c n_c^alpha):
    ``alpha=0`` → equal quotas (full balance), ``alpha=1`` → proportional
    (original mix), between → temperature interpolation. Within a
    cluster rows are taken in ``order_col`` order (default: the
    deterministic hash order xxhash64(id) — a reproducible uniform
    subsample, no RNG).

    ``centroids=None`` runs ivf_index's distributed k-means
    (hash-seeded, Lloyd-refined) — the scale path. Passing centroids
    (e.g. per-label means, or a trained coarse quantizer) keeps the
    whole plan declarative.

    Scale: assignment is a scan-side projection (or one broadcast-side
    matmul hop via ivf_index); sizing is one tiny aggregate (k rows);
    selection is one window over (cluster, order) — a single shuffle of
    the id/order columns. Budget overshoot ≤ k-1 rows (per-cluster
    ceil), never undershoot while clusters have rows.

    Output: the selected rows + ``cluster_id`` + ``c_n`` (cluster size).
    """
    if centroids is None:
        assigned, _cents = ivf_index(
            df, n_lists=n_lists, iters=iters, id_col=id_col, vec_col=vec_col
        )
        assigned = assigned.withColumnRenamed("list_id", "cluster_id")
    else:
        assigned = assign_clusters(
            df, centroids, id_col=id_col, vec_col=vec_col, round_dp=round_dp
        )
    from pyspark.sql import Window

    sizes = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("c_n")
    )
    # Σ n^alpha over the k clusters: exact for alpha in {0, 1} (ints);
    # float alpha sums k doubles — fine for selection, not for oracles
    w = F.pow(F.col("c_n").cast("double"), F.lit(float(alpha)))
    sizes = sizes.withColumn(
        "__quota",
        F.ceil(
            F.lit(int(budget)) * w
            / F.sum(w).over(Window.partitionBy())
        ).cast("long"),
    )
    order = (
        F.col(order_col) if order_col is not None
        else F.xxhash64(F.col(id_col))
    )
    rn = F.row_number().over(
        Window.partitionBy("cluster_id").orderBy(order, F.col(id_col))
    )
    out = (
        assigned.join(F.broadcast(sizes), "cluster_id")
        .withColumn("__rn", rn)
        .filter(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__quota")
    )
    return out
