"""Lexical retrieval over a document corpus: BM25 index + top-k scoring,
and an n-gram language-model perplexity scorer (the CCNet-style quality
signal: score candidate text against an LM trained on a trusted slice).

Everything here is pure DataFrame algebra over the shared ``tokenize``
normalization — no Python in the hot path, no driver-side loops:

- ``bm25_postings(docs)``: the inverted index as three DataFrames —
  per-(doc, term) frequencies with doc length, per-term document
  frequencies, and the 1-row corpus globals (N, avgdl). Build once,
  persist, score many query batches.
- ``bm25_topk(docs, queries, k)``: Okapi BM25 (Lucene IDF variant,
  query-term frequency ignored — each distinct query term contributes
  once) with a deterministic top-k per query.
- ``lm_train(ref)`` / ``lm_perplexity(docs, ref)``: add-alpha smoothed
  word-bigram LM — train = two hash aggregations over the reference
  slice; score = one equi-join of the candidate bigrams against the
  count tables plus a per-document aggregate.

Float determinism (the oracle contract): per-term/per-bigram partial
scores are doubles ROUNDED to 9 decimals and cast to DECIMAL(38,9)
before the sum, so the per-group total is exact and independent of
Spark's partial-aggregation order — the same trick tpch_q1 uses. Final
reported scores round to 6.

Scale notes (100 TB): the postings build is explode → one hash
aggregate with map-side combine; document frequency is a second
aggregate over the (already distinct) postings. Scoring joins postings
to the query terms — the QUERY side is broadcast (a query batch is
small by construction); the per-query candidate lists then shuffle once
on query_id for the top-k window. The LM join is a plain equi-join on
the bigram key: the count table at corpus scale is far beyond broadcast
size, so it stays a shuffle join — linear, with AQE splitting the
stopword-bigram hot keys (measured for the band joins in SCALE.md §skew;
same shape). Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kapacitor_spark.dataprep.dedup import nonempty_tokens, tokenize

__all__ = [
    "bm25_postings",
    "bm25_topk",
    "lm_train",
    "lm_perplexity",
    "lm_prune",
    "lm_score_stream",
    "percolate",
    "percolate_artifact",
    "percolate_stream",
]


def _tokens(text_col: str) -> "F.Column":
    """Alias for the shared :func:`dedup.nonempty_tokens` (kept for the
    module's internal call sites and the registry fixtures)."""
    return nonempty_tokens(text_col)


def bm25_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist_index: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Inverted index for BM25: ``(postings, term_df, globals)``.

    postings — one row per (doc, term): ``(id, dl, term, tf)`` where
    ``dl`` is the document token length and ``tf`` the term's
    in-document frequency. term_df — ``(term, df_t)`` corpus document
    frequencies, kept as its OWN table rather than denormalized onto
    every posting: a stopword's df would otherwise ride millions of
    rows, and attaching it with a window partitioned by term would pin
    a hot term's entire posting list into one task (un-splittable skew).
    The scoring path instead joins df onto the QUERY terms (tiny).
    globals — ONE row: ``(n_docs, avgdl)``.

    Empty/null documents are dropped (they can never match a term).

    ``persist_index=True`` caches ALL THREE tables (registered with the
    dataprep cache registry) — they are jointly THE index, the
    in-session analog of the index tables a real deployment writes out
    at 100 TB (build once, score many query batches). Persisting only
    the postings (the pre-r10 shape) made every scoring pass re-run the
    df and globals aggregates as fresh driver-synchronized jobs: at
    sf0.1 the BM25 wall was ~65% serial job-boundary overhead (11 jobs
    per pass), not compute. Globals derive from the postings (distinct
    (id, dl) → count/avg — identical to counting the non-empty docs
    directly), so the raw text is scanned exactly once per index build.
    """
    from kapacitor_spark.dataprep.cache import track

    base = (
        docs.select(F.col(id_col), _tokens(text_col).alias("__toks"))
        .filter(F.size("__toks") > 0)
    )
    posts = (
        base.select(
            F.col(id_col),
            F.size("__toks").cast("long").alias("dl"),
            F.explode("__toks").alias("term"),
        )
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    if persist_index:
        posts = track(posts.persist())
    # postings are already distinct per (doc, term), so document
    # frequency is a count per term — map-side combinable, skew-immune.
    term_df = posts.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df_t")
    )
    glob = (
        posts.select(id_col, "dl")
        .distinct()
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
    )
    if persist_index:
        term_df = track(term_df.persist())
        glob = track(glob.persist())
    return posts, term_df, glob


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
) -> DataFrame:
    """Okapi BM25 top-k: ``(query_id, doc_id, rank, score)``.

    - IDF is the Lucene variant ``ln(1 + (N - df + 0.5)/(df + 0.5))``
      (always positive — no negative-IDF clamping needed).
    - Query-term frequency is ignored: each DISTINCT query term
      contributes once (the common k3→∞ simplification).
    - Ranking is deterministic: per-term partials round to 9 decimals
      and sum as DECIMAL(38,9) (order-independent), ties break on
      ``doc_id`` ascending. ``score`` is the decimal total as a double
      rounded to 6.
    """
    posts, term_df, glob = bm25_postings(docs, text_col=text_col, id_col=id_col)
    qterms = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(_tokens(query_text_col))).alias("term"),
    )
    # IDF rides the query-term side: join df + globals onto the (tiny)
    # query batch so the big postings table only ever sees one broadcast
    # hash join — no stats column is denormalized across the corpus.
    # term_df/glob read from the persisted index (see bm25_postings):
    # a scoring pass re-aggregating them from postings was 11 serial
    # driver-synchronized jobs at sf0.1 — ~65% of the wall.
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + F.lit(0.5))
        / (F.col("df_t") + F.lit(0.5))
    )
    qweights = (
        F.broadcast(qterms).join(term_df, "term")  # inner: absent term ⇒ no postings anyway
        .crossJoin(F.broadcast(glob))
        .select(query_id_col, "term", idf.alias("__idf"), "avgdl")
    )
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = posts.join(F.broadcast(qweights), "term").select(
        query_id_col,
        id_col,
        F.round(F.col("__idf") * tf_part, 9).cast("decimal(38,9)").alias("__s"),
    )
    from pyspark.sql import Window

    # ONE exchange for agg + window (r10): hash-partitioning on
    # query_id alone satisfies the (query_id, doc_id) clustering the
    # aggregate needs AND the window's partitioning, so the explicit
    # repartition replaces TWO planner-inserted exchanges (groupBy on
    # both keys, then window re-shuffle on query_id) with one — at any
    # scale the per-query candidate set is what moves, and it moves
    # once. Partial aggregation still combines map-side before it.
    # SKEW TRADE-OFF (ADVICE r10): query_id-only partitioning caps
    # parallelism at the number of distinct queries — a SMALL query
    # batch with one hot query serializes that query's candidates into
    # one task (the (query_id, doc_id) aggregate exchange it replaced
    # spread them, at the cost of a second window re-shuffle). The
    # single-exchange shape is the right default for the operator's
    # design point (query batches >> cores, e.g. dedup-by-query or eval
    # sweeps); for a handful of skewed queries, pre-split hot queries or
    # accept the extra exchange by repartitioning on both keys upstream.
    agg = (
        scored.repartition(query_id_col)
        .groupBy(query_id_col, id_col)
        .agg(F.sum("__s").alias("__score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__score").desc(), F.col(id_col).asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            "rank",
            F.round(F.col("__score").cast("double"), 6).alias("score"),
        )
    )


def _bigram_rows(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """``(id, w1, w2)`` — one row per adjacent word pair, still zero
    shuffles (projection + explode riding the scan).

    The tokens MATERIALIZE in their own projection before the pair
    lambda touches them: a lambda that references the inlined
    ``filter(split(lower(trim(text))))`` chain re-evaluates that whole
    chain per array ELEMENT (no common-subexpression elimination inside
    higher-order functions — O(tokens²) per document; measured 16×
    slower at sf0.1: 6.1 s vs 0.37 s for the exploded pair count).
    Catalyst's CollapseProject keeps the boundary because ``__toks`` is
    referenced multiple times and is not a cheap expression."""
    base = df.select(F.col(id_col), _tokens(text_col).alias("__toks"))
    t = F.col("__toks")
    n = F.size(t)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),  # 1-based: pair i = (tok[i], tok[i+1])
            lambda i: F.struct(
                F.element_at(t, i).alias("w1"),
                F.element_at(t, i + 1).alias("w2"),
            ),
        ),
    )
    return base.select(F.col(id_col), F.explode(pairs).alias("p")).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def lm_train(
    ref: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Word-bigram LM counts from a reference corpus:
    ``(bigram_counts, context_counts, globals)``.

    bigram_counts — ``(w1, w2, c2)``; context_counts — ``(w1, c1)`` where
    ``c1 = Σ_w2 c2(w1, w2)`` (the standard MLE denominator: how often w1
    appears as a bigram context); globals — ONE row ``(vocab_size,)`` =
    distinct tokens anywhere in the reference (the smoothing V).
    Two hash aggregates + one distinct-count, all with map-side combine.
    """
    from kapacitor_spark.dataprep.cache import track

    pairs = _bigram_rows(ref, text_col, id_col).select("w1", "w2")
    # c2 is persisted (cache-registry tracked): it feeds both the c1
    # derivation below and the scoring join, so the corpus-wide
    # tokenize+bigram explode runs ONCE per training pass. c1 then
    # derives from the far smaller count table — c1(w1) = Σ_w2 c2(w1,w2)
    # exactly (every bigram occurrence contributes 1 to both), so this
    # is identical to counting pairs directly, minus a corpus scan.
    c2 = track(
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c2"))
        .persist()
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    # vocab keeps its own scan: single-token documents contribute no
    # bigram but DO contribute vocabulary, so V is not derivable from c2
    vocab = (
        ref.select(F.explode(_tokens(text_col)).alias("t"))
        .agg(F.countDistinct("t").cast("long").alias("vocab_size"))
    )
    return c2, c1, vocab


def lm_perplexity(
    docs: DataFrame,
    ref: DataFrame,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document perplexity under an add-alpha smoothed bigram LM
    trained on ``ref`` — the CCNet-style quality signal (score web text
    against a trusted-corpus LM; low perplexity ≈ reference-like text).

    p(w2 | w1) = (c2(w1,w2) + α) / (c1(w1) + α·V); unseen bigrams and
    unseen contexts fall back to the additive prior (counts 0 via the
    left joins). Output: ``(doc_id, n_bigrams, avg_nll, ppl)`` for every
    document with ≥ 2 tokens, where avg_nll is the mean negative log
    probability (rounded to 6; per-bigram partials round to 9 and sum as
    DECIMAL(38,9) so the total is aggregation-order independent) and
    ppl = round(exp(avg_nll), 6) — exp of the already-rounded mean, so
    both sides of the oracle exponentiate the identical double.
    """
    c2, c1, vocab = lm_train(ref, text_col=text_col, id_col=id_col)
    toks = _bigram_rows(docs, text_col, id_col)
    joined = (
        toks.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
    )
    nll = -F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(alpha))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * F.col("vocab_size"))
    )
    agg = (
        joined.select(
            id_col, F.round(nll, 9).cast("decimal(38,9)").alias("__nll")
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("__nll").alias("__total"),
        )
    )
    avg_nll = F.round(F.col("__total").cast("double") / F.col("n_bigrams"), 6)
    return agg.select(
        id_col,
        "n_bigrams",
        avg_nll.alias("avg_nll"),
        F.round(F.exp(avg_nll), 6).alias("ppl"),
    )


def lm_prune(
    ref: DataFrame,
    max_bigrams: int = 1_000_000,
    max_contexts: int = 262_144,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Bounded LM ARTIFACT for continuous scoring: the top ``max_bigrams``
    bigram counts and top ``max_contexts`` context counts by frequency
    (deterministic tie-break on the words), plus the exact vocabulary
    size. This is the deployment shape real pipelines use — CCNet ships
    a FIXED KenLM artifact to its scorers rather than joining against an
    unbounded count table — so the stream side needs no join, no state,
    and no watermark. Pruning is the standard accuracy trade: scores are
    identical to :func:`lm_perplexity` whenever every bigram/context a
    document uses survives the cut (counts follow Zipf, so the head
    covers most mass); truncated tail lookups fall back to the additive
    prior exactly like genuinely-unseen n-grams.

    Collect size is bounded by the two caps regardless of corpus size.
    Returns ``{"c2": {(w1,w2): n}, "c1": {w1: n}, "vocab_size": V,
    "alpha": alpha}``.
    """
    c2, c1, vocab = lm_train(ref, text_col=text_col, id_col=id_col)
    c2_rows = (
        c2.orderBy(F.col("c2").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(max_bigrams)
        .collect()
    )
    c1_rows = (
        c1.orderBy(F.col("c1").desc(), F.col("w1").asc())
        .limit(max_contexts)
        .collect()
    )
    c1_map = {r["w1"]: r["c1"] for r in c1_rows}
    # CONSISTENCY over coverage: a bigram whose context was pruned from
    # c1 must not survive in c2 — the scorer would compute
    # p = (c2 + α)/(0 + αV), which can exceed 1 (negative NLL), making
    # junk containing that bigram score BETTER than reference text and
    # inverting the filter. Dropping the orphan bigram makes it fall
    # back to the additive prior exactly like a genuinely-unseen one,
    # and keeps every retained probability a true probability.
    c2_map = {
        (r["w1"], r["w2"]): r["c2"] for r in c2_rows if r["w1"] in c1_map
    }
    return {
        "c2": c2_map,
        "c1": c1_map,
        "vocab_size": vocab.collect()[0]["vocab_size"],
        "alpha": float(alpha),
    }


def lm_score_stream(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document perplexity under a pruned LM artifact — STATELESS,
    so it runs unchanged on a batch DataFrame or an unbounded stream
    (append mode, no watermark, no state store): tokenization stays a
    JVM projection (the shared ``tokenize``, so normalization is
    bit-identical to the batch path), and the score is one Arrow hop
    with the model shipped by closure. Documents with < 2 tokens emit
    no row (same contract as :func:`lm_perplexity`).

    Numerically this mirrors the batch scorer's per-bigram round(·, 9)
    and round-6 mean; totals accumulate as Python floats rather than
    DECIMAL, so agreement with the batch scorer is to float tolerance
    (~1e-9 relative), not bit-exact — the batch path is the
    oracle-gated one.
    """
    import pandas as pd

    from pyspark.sql import types as T

    c2 = model["c2"]
    c1 = model["c1"]
    av = float(model["alpha"]) * float(model["vocab_size"])
    alpha = float(model["alpha"])

    base = df.select(
        F.col(id_col), _tokens(text_col).alias("__toks")
    )
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("n_bigrams", T.LongType()),
            T.StructField("avg_nll", T.DoubleType()),
            T.StructField("ppl", T.DoubleType()),
        ]
    )

    def run(batches):
        from math import exp, log

        for pdf in batches:
            ids, ns, avgs, ppls = [], [], [], []
            for i, toks in zip(pdf.iloc[:, 0], pdf["__toks"]):
                if toks is None or len(toks) < 2:
                    continue
                total = 0.0
                n = 0
                prev = toks[0]
                for w in toks[1:]:
                    total += round(
                        -log((c2.get((prev, w), 0) + alpha) / (c1.get(prev, 0) + av)),
                        9,
                    )
                    n += 1
                    prev = w
                avg = round(total / n, 6)
                ids.append(i)
                ns.append(n)
                avgs.append(avg)
                ppls.append(round(exp(avg), 6))
            yield pd.DataFrame(
                {pdf.columns[0]: ids, "n_bigrams": ns, "avg_nll": avgs, "ppl": ppls}
            )

    return base.mapInPandas(run, schema=out_schema)


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    min_should_match: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
) -> DataFrame:
    """Reverse search (the percolator shape): STORED queries matched
    against documents — "which subscriptions/alert rules fire for this
    document" — the document-stream analog of the alert node's
    level-lambda matching. Output: one row per (doc, query) whose
    distinct-term overlap meets the threshold —
    ``(doc_id, query_id, matched_terms, n_terms)`` with
    ``matched >= ceil(min_should_match * n_terms)`` (1.0 = every query
    term must appear — AND semantics; 0.5 = half, Lucene's
    minimum_should_match).

    Scale shape: stored queries are control-plane small (thousands), so
    their exploded distinct terms BROADCAST; documents explode to
    distinct (doc, term) pairs — (id, term) is all that moves — and the
    per-(doc, query) overlap count is one partial-agg'd hash aggregate.
    No score arithmetic, so no float concerns: the oracle re-derives
    exactly in SQL.
    """
    dterms = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(_tokens(text_col))).alias("term"),
    )
    qterms = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(_tokens(query_text_col))).alias("term"),
    )
    qsizes = qterms.groupBy(query_id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms")
    )
    matched = (
        dterms.join(F.broadcast(qterms), "term")
        .groupBy(id_col, query_id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("matched_terms"))
    )
    need = F.ceil(F.lit(float(min_should_match)) * F.col("n_terms"))
    return (
        matched.join(F.broadcast(qsizes), query_id_col)
        .filter(F.col("matched_terms") >= need)
        .select(id_col, query_id_col, "matched_terms", "n_terms")
    )


def percolate_artifact(
    queries: DataFrame,
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
) -> dict:
    """Collected form of the stored-query table for the STREAM side:
    ``{query_id: frozenset(terms)}``. Bounded by the stored-query count
    (control-plane data), like :func:`lm_prune`'s model artifact."""
    qterms = queries.select(
        F.col(query_id_col),
        F.array_distinct(_tokens(query_text_col)).alias("__qt"),
    ).collect()
    return {
        r[query_id_col]: frozenset(r["__qt"] or [])
        for r in qterms
        if r["__qt"]
    }


def percolate_stream(
    df: DataFrame,
    artifact: dict,
    min_should_match: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Stateless percolation for an unbounded document stream: the
    stored-query artifact ships by closure, tokenization stays the
    shared JVM projection, and matching is one Arrow hop — append mode,
    no join, no watermark, no state store (the lm_score_stream pattern).
    Emits the same rows as :func:`percolate` (tested equal)."""
    import math as _math

    import pandas as pd

    from pyspark.sql import types as T

    qsets = {k: set(v) for k, v in artifact.items()}
    # floor at 1: batch percolate's inner join already requires >= 1
    # shared term even at min_should_match=0, and a 0 threshold here
    # would emit every (doc, query) pair — an O(docs x queries) row
    # explosion on an unbounded stream
    thresholds = {
        k: max(1, _math.ceil(float(min_should_match) * len(v)))
        for k, v in qsets.items()
    }
    base = df.select(
        F.col(id_col), F.array_distinct(_tokens(text_col)).alias("__dt")
    )
    # query-id type follows the artifact keys (string rule names are as
    # natural as numeric ids — the batch percolate is type-agnostic, so
    # the streaming twin must be too)
    qid_type = (
        T.StringType()
        if any(isinstance(k, str) for k in qsets)
        else T.LongType()
    )
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("query_id", qid_type),
            T.StructField("matched_terms", T.LongType()),
            T.StructField("n_terms", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            ids, qids, ms, ns = [], [], [], []
            for i, toks in zip(pdf.iloc[:, 0], pdf["__dt"]):
                if toks is None or not len(toks):
                    continue
                ts = set(toks)
                for q, qs in qsets.items():
                    m = len(ts & qs)
                    if m >= thresholds[q]:
                        ids.append(i)
                        qids.append(q)
                        ms.append(m)
                        ns.append(len(qs))
            yield pd.DataFrame(
                {
                    pdf.columns[0]: ids,
                    "query_id": qids,
                    "matched_terms": ms,
                    "n_terms": ns,
                }
            )

    return base.mapInPandas(run, schema=out_schema)
