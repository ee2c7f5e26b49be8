"""Text analysis operators: token stats, quality scoring, language-ID
heuristic, document fingerprinting. All pure column expressions — these run
inside whole-stage codegen, no Python in the hot path."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kapacitor_spark.dataprep.dedup import tokenize

__all__ = [
    "token_stats", "quality_score", "lang_id", "doc_fingerprint",
    "analysis_suite", "remove_boilerplate_paragraphs", "scrub_pii",
    "repetition_stats", "pack_sequences", "deterministic_sample",
    "strip_html", "source_mix_stats", "readability", "gopher_rules",
    "c4_clean",
]

# tiny built-in stopword list for the quality heuristic (public knowledge)
_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be",
]


def token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace + BPE-ish token counts and length stats per document."""
    toks = tokenize(text_col)
    # BPE-ish proxy: alnum runs + individual punctuation marks
    bpe = F.expr(
        rf"size(filter(split(lower({text_col}), '(?<=\\W)|(?=\\W)'), x -> trim(x) != ''))"
    )
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars_computed"),
        F.size(toks).cast("long").alias("n_tokens"),
        bpe.cast("long").alias("n_subtokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        F.round(
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("double")),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / F.size(toks),
            6,
        ).alias("mean_token_len"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    keep: bool = False,
) -> DataFrame:
    """Heuristic quality signals per document (C4/Gopher-style filters):
    length, stopword ratio, type-token ratio, punctuation density,
    all-caps ratio; combined into [0,1] score. ``keep=True`` appends the
    signals to every input column (still one projection of one scan — no
    self-join needed to keep the text).
    """
    toks = tokenize(text_col)
    n = F.size(toks).cast("double")
    uniq = F.size(F.array_distinct(toks)).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr)).cast("double")
    punct = (
        F.length(F.regexp_replace(F.col(text_col), r"[^\p{Punct}]", "")).cast("double")
        / F.greatest(F.length(text_col).cast("double"), F.lit(1.0))
    )
    ttr = uniq / F.greatest(n, F.lit(1.0))
    len_ok = F.when((n >= 10) & (n <= 100000), 1.0).otherwise(0.0)
    score = F.round(
        (
            len_ok
            + F.least(ttr * 2, F.lit(1.0))
            + F.least(n_stop / 5.0, F.lit(1.0))
            + (1.0 - F.least(punct * 10, F.lit(1.0)))
        )
        / 4.0,
        6,
    )
    signals = [
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(punct, 6).alias("punct_ratio"),
        score.alias("quality"),
    ]
    if keep:
        return df.select("*", *signals)
    return df.select(F.col(id_col), *signals)


# marker words per language for the n-gram/lexicon heuristic; with real
# corpora you'd use character n-gram profiles — same join/expr shape.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "y", "es"],
}


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Language ID by lexicon hit-rate: argmax over per-language marker
    matches; 'und' when nothing matches. Pure expressions (array_intersect
    per language), so it vectorizes."""
    toks = F.array_distinct(tokenize(text_col))
    scores = [
        F.struct(
            F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in _LANG_MARKERS.items()
    ]
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise("und").alias("lang_pred"),
        best["hits"].cast("long").alias("marker_hits"),
    )


def analysis_suite(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """All text-analysis signals in ONE narrow projection — token/length
    stats, content + bag fingerprints, quality ratios. Zero joins, zero
    shuffles: the tokenize expression is shared across outputs (Catalyst
    subexpression elimination evaluates it once per row), so this is the
    100 TB shape — one scan, one codegen'd project. The per-signal
    functions (token_stats/quality_score/doc_fingerprint) remain for
    selective use."""
    toks = tokenize(text_col)
    uniq = F.array_distinct(toks)
    punct = (
        F.length(F.regexp_replace(F.col(text_col), r"[^\p{Punct}]", "")).cast("double")
        / F.greatest(F.length(text_col).cast("double"), F.lit(1.0))
    )
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars_computed"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(uniq).cast("long").alias("n_unique_tokens"),
        F.round(
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("double")),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / F.size(toks),
            6,
        ).alias("mean_token_len"),
        F.md5(F.concat_ws(" ", toks)).alias("content_fp"),
        F.md5(F.concat_ws(" ", F.array_sort(uniq))).alias("bag_fp"),
        F.round(
            F.size(uniq).cast("double")
            / F.greatest(F.size(toks).cast("double"), F.lit(1.0)),
            6,
        ).alias("type_token_ratio"),
        F.round(punct, 6).alias("punct_ratio"),
    )


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stable document fingerprints: full-content digest plus a
    word-order-insensitive digest (both md5 — portable across engines)."""
    norm = F.concat_ws(" ", tokenize(text_col))
    bag = F.concat_ws(" ", F.array_sort(F.array_distinct(tokenize(text_col))))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("content_fp"),
        F.md5(bag).alias("bag_fp"),
    )


def remove_boilerplate_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 5,
    sep: str = "\n",
) -> DataFrame:
    """Boilerplate removal (the CCNet-style paragraph-dedup pass of a
    training-data pipeline): drop every paragraph that appears in MORE
    THAN ``max_df`` distinct documents (headers, footers, cookie banners),
    then reassemble each document from its surviving paragraphs in
    original order.

    Plan shape for 100 TB: explode to (doc, pos, paragraph) → paragraph
    document-frequency by md5 digest (hash-aggregate over 16-byte keys,
    never the text) → equi-join back on the digest → order-preserving
    re-aggregation per document. Cost scales with paragraph count; no
    driver-side state and no Python.
    """
    parts = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
    ).filter(F.trim("para") != "")
    parts = parts.withColumn("__pd", F.md5(F.col("para")))
    dfreq = parts.groupBy("__pd").agg(
        F.count_distinct(id_col).alias("__docs")
    )
    kept = (
        parts.join(dfreq, "__pd")
        .filter(F.col("__docs") <= max_df)
        .drop("__pd", "__docs")
    )
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias(text_col),
        F.count(F.lit(1)).alias("kept_paragraphs"),
    )


# (pattern, replacement) pairs — deliberately RE2/Java-compatible subset
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"(\d{1,3}\.){3}\d{1,3}", "<IP>"),
    (r"\+?\d[\d\-]{7,}\d", "<PHONE>"),
]


# the named entities worth decoding without an HTML library; numeric
# entities decode generically via the regex below
_HTML_ENTITIES = [
    ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
]


def strip_html(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """HTML → text extraction, the first stage of a web-corpus pipeline:
    drop <script>/<style>/comment blocks wholesale, break block-level
    closings into newlines, strip remaining tags, decode the common
    entities, and collapse runs of whitespace. A pure chain of JVM
    regexp_replace expressions — zero Python, cost rides the scan, and
    the same regexes run verbatim in any SQL engine (oracle-checkable).
    For full-fidelity extraction (tables, boilerplate headers) plug a
    real extractor in via mapInPandas; this is the scalable default."""
    c = F.col(text_col)
    c = F.regexp_replace(c, r"(?is)<(script|style)\b.*?</\1\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(
        c, r"(?i)</(p|div|br|li|tr|h[1-6])\s*>|<br\s*/?>", "\n"
    )
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    # btrim with an explicit set: Spark's trim() strips spaces only, and
    # the block-closing newlines land at the edges
    return df.withColumn(out_col or text_col, F.btrim(c, F.lit(" \n\t")))


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: list[tuple[str, str]] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """PII redaction (emails, IPv4, phone-shaped digit runs) — the
    scrubbing pass every training-data pipeline runs before tokenization.
    A chain of codegen'd regexp_replace column expressions: zero Python,
    zero shuffles, scales with the scan."""
    c = F.col(text_col)
    for pat, rep in patterns or PII_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    return df.withColumn(out_col or text_col, c)


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple = (2, 3),
) -> DataFrame:
    """Gopher-style repetition signals: for each n in ``ns``, the fraction
    of the document's word n-grams that are duplicates
    (1 − distinct/total). High values flag machine-generated or boiler-
    plate text. Pure array expressions over the tokenized column — no
    explode, no shuffle; one scan yields every n."""
    from kapacitor_spark.dataprep.dedup import tokenize

    # three-stage projection (r9): the gram lambda captures the TOKEN
    # COLUMN (capturing inline tokenize re-evaluates it per gram —
    # O(tokens²), SCALE.md §higher-order lambdas), and each gram array
    # materializes once per n even though three expressions consume it.
    toks = F.col("__toks")
    staged = df.select(F.col(id_col), tokenize(text_col).alias("__toks"))

    def _grams(n: int):
        # NB: the transform lambda must be single-arg — a second parameter
        # (even defaulted) makes Spark pass the element INDEX into it
        cnt = F.size(toks)
        idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
        return F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
        ).alias(f"__g{n}")

    gram_stage = staged.select(F.col(id_col), *[_grams(n) for n in ns])

    def _frac(n: int):
        g = F.col(f"__g{n}")
        total = F.size(g).cast("double")
        dup = (F.size(g) - F.size(F.array_distinct(g))).cast("double")
        return F.round(
            F.when(total > 0, dup / total).otherwise(F.lit(0.0)), 6
        ).alias(f"dup_{n}gram_frac")

    return gram_stage.select(F.col(id_col), *[_frac(n) for n in ns])


def pack_sequences(
    df: DataFrame,
    window_tokens: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "lang",
) -> DataFrame:
    """Sequence-packing assignment for pretraining batches: documents are
    concatenated in ``id_col`` order and cut every ``window_tokens``
    tokens (the GPT-style concat-and-chunk rule) — each doc gets its
    running token offset and the sequence id its first token lands in.

    Scale: the running sum is a window function PARTITIONED BY
    ``shard_col`` (language/source/hash bucket) — packing is per-shard by
    design, so no global single-partition sort exists; each shard's
    ordering shuffles independently."""
    from pyspark.sql import Window as W

    from kapacitor_spark.dataprep.dedup import tokenize

    # long, not int32: the driver's oracle compares typed (Arrow) bytes and
    # DuckDB len() is BIGINT — F.size alone would hash-diverge on equal values
    toks = F.size(tokenize(text_col)).cast("long")
    w = W.partitionBy(shard_col).orderBy(id_col)
    cum_before = F.coalesce(
        F.sum(toks).over(w.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
    )
    return df.select(
        F.col(id_col),
        F.col(shard_col),
        toks.alias("n_tokens"),
        cum_before.alias("token_offset"),
        F.floor(cum_before / window_tokens).cast("long").alias("seq_id"),
    )


def chunk_documents(
    df: DataFrame,
    window_tokens: int = 64,
    overlap_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window chunking for retrieval/RAG indexing: each document
    becomes overlapping token windows — (id, chunk_idx, n_tokens,
    chunk_text) with chunk k covering tokens [k·step, k·step+window),
    step = window − overlap. Trailing partial windows are emitted (the
    last tokens must land in some chunk); empty/null documents emit no
    chunks. Everything is array expressions on the shared ``tokenize``
    normalization — sequence → explode → slice → array_join, no Python,
    no shuffle at all (chunking is per-row): the plan is a projection
    riding the scan, so it composes with pushdown and stays linear in
    OUTPUT tokens (≈ input · window/step) at any corpus size."""
    if not 0 <= overlap_tokens < window_tokens:
        raise ValueError(
            f"need 0 <= overlap ({overlap_tokens}) < window ({window_tokens})"
        )
    step = window_tokens - overlap_tokens
    from kapacitor_spark.dataprep.dedup import tokenize

    toks = F.filter(tokenize(text_col), lambda x: x != F.lit(""))
    base = df.select(F.col(id_col), toks.alias("__toks")).filter(
        F.size("__toks") > 0
    )
    starts = F.sequence(F.lit(0), F.size("__toks") - 1, F.lit(step))
    ex = base.select(id_col, "__toks", F.explode(starts).alias("__start"))
    chunk = F.expr(f"slice(__toks, __start + 1, {window_tokens})")
    return ex.select(
        F.col(id_col),
        (F.col("__start") / step).cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def deterministic_sample(
    df: DataFrame,
    fractions: dict,
    id_col: str = "doc_id",
    shard_col: str = "lang",
    salt: str = "mix-v1",
) -> DataFrame:
    """Stratified corpus sampling for training-mix construction: keep a
    per-shard fraction of documents, DETERMINISTICALLY — membership is
    decided by the document's salted md5 prefix against a per-shard hex
    threshold (floor(frac·65536) as 4 hex digits), so the same (salt, id)
    always lands on the same side on any engine, any run, any cluster
    size. No RNG, no shuffle: a scan-level filter that composes with
    pushdown. Change ``salt`` to draw an independent sample."""
    h = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 4
    )
    cond = None
    for shard, frac in fractions.items():
        thr = format(min(int(frac * 65536), 65536), "04x") if frac < 1.0 else "g"
        c = (F.col(shard_col) == shard) & (h < F.lit(thr))
        cond = c if cond is None else cond | c
    if cond is None:
        raise ValueError("fractions must not be empty")
    return df.filter(cond)


def source_mix_stats(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-mix accounting per source/domain: document and token
    volumes, exact-duplicate rate, and mean quality — the table a data
    curator reads before weighting sources in a pretraining mix.

    One hash-aggregate (single shuffle on the source key); the duplicate
    rate counts distinct content digests so the shuffle never carries
    text. Quality reuses the C4/Gopher heuristic inline (same single
    projection, no joins)."""
    scored = quality_score(df, text_col, id_col, keep=True)
    toks = F.size(tokenize(text_col)).cast("long")
    return (
        scored.select(
            F.col(source_col),
            F.col(id_col),
            toks.alias("__nt"),
            F.md5(F.col(text_col)).alias("__digest"),
            F.col("quality"),
        )
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__nt").alias("total_tokens"),
            F.round(
                1 - F.count_distinct("__digest") / F.count(F.lit(1)), 6
            ).alias("dup_rate"),
            F.round(F.avg("quality"), 6).alias("mean_quality"),
        )
    )


def mix_to_token_budget(
    df: DataFrame,
    budgets: dict | None = None,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
    multipliers: dict | None = None,
) -> DataFrame:
    """Training-mix construction: down/UP-sample each source to a target
    TOKEN budget, deterministically. The per-source rate is
    budget/total_tokens; rate < 1 keeps a salted-md5-thresholded subset
    (same rule as deterministic_sample — no RNG, engine-portable);
    rate > 1 emits floor(rate) full copies plus a thresholded fractional
    copy, each tagged with an ``epoch`` column (0-based) so repeats stay
    distinguishable downstream (sequence packing, shuffling). Sources
    absent from ``budgets`` are dropped. ``multipliers`` expresses each
    budget as a multiple of the source's OWN token total
    (budget = floor(m * total) — "2.5 epochs of src1") instead of
    absolute tokens; exactly one of the two must be given.

    100 TB shape: one map-side-combining aggregate computes per-source
    token totals (collected to the driver — #sources is mixture-config
    small), then the selection is a single scan-level projection: a CASE
    over the source key builds each row's epoch array and explodes it.
    No joins, no second shuffle; the text is scanned once. The expected
    output token count per source is the budget ± sampling noise of one
    Bernoulli draw per doc (exact at rate >= 1 for the full copies).
    """
    if (budgets is None) == (multipliers is None):
        raise ValueError("pass exactly one of budgets= or multipliers=")
    toks_n = F.size(tokenize(text_col)).cast("long")
    totals = {
        r[0]: r[1]
        for r in df.groupBy(source_col)
        .agg(F.sum(toks_n).alias("t"))
        .collect()
    }
    if multipliers is not None:
        import math

        budgets = {
            src: math.floor(m * totals[src])
            for src, m in multipliers.items()
            if totals.get(src)
        }
    h = F.substring(
        F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 4
    )
    epochs = F.array().cast("array<int>")
    chosen = None
    for src, budget in budgets.items():
        total = totals.get(src)
        if not total:
            continue
        rate = float(budget) / float(total)
        k = int(rate)  # full copies
        frac = rate - k
        arr = F.sequence(F.lit(0), F.lit(k - 1)) if k > 0 else F.array().cast("array<int>")
        if frac > 0:
            thr = format(min(int(frac * 65536), 65535), "04x")
            arr = F.concat(
                arr,
                F.when(h < F.lit(thr), F.array(F.lit(k))).otherwise(
                    F.array().cast("array<int>")
                ),
            )
        is_src = F.col(source_col) == src
        epochs = F.when(is_src, arr).otherwise(epochs)
        chosen = is_src if chosen is None else (chosen | is_src)
    if chosen is None:
        raise ValueError("budgets must name at least one present source")
    return (
        df.filter(chosen)
        .withColumn("epoch", F.explode(epochs))
        .withColumn("epoch", F.col("epoch").cast("long"))
    )


def readability(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch-Kincaid-style readability signals per document — the
    classic pedagogical-difficulty heuristic used as a corpus quality
    filter alongside :func:`quality_score`. Pure column expressions
    (engine-portable regexes, no lookahead), so the oracle re-derives
    them exactly:

    - ``n_words``: whitespace tokens (shared normalization)
    - ``n_sentences``: runs of ``.!?`` (floored at 1 — fragments count
      as one sentence)
    - ``n_syllables``: vowel-group count over the lowercased text (the
      standard cheap syllable proxy; word boundaries already break
      groups, so the text-level count equals the per-word sum)
    - ``fk_grade`` = 0.39·(words/sentences) + 11.8·(syllables/words)
      − 15.59, rounded to 6 (NULL for empty documents)

    Zero Python, zero shuffles — a projection riding the scan."""
    from kapacitor_spark.dataprep.dedup import nonempty_tokens

    toks = nonempty_tokens(text_col)
    words = F.size(toks).cast("long")
    sentences = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")), F.lit(1)
    ).cast("long")
    syllables = F.regexp_count(
        F.lower(F.col(text_col)), F.lit(r"[aeiouy]+")
    ).cast("long")
    grade = F.round(
        F.lit(0.39) * (words.cast("double") / sentences.cast("double"))
        + F.lit(11.8) * (syllables.cast("double") / words.cast("double"))
        - F.lit(15.59),
        6,
    )
    return df.select(
        F.col(id_col),
        words.alias("n_words"),
        sentences.alias("n_sentences"),
        syllables.alias("n_syllables"),
        F.when(words > 0, grade).alias("fk_grade"),
    )


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wlen: float = 3.0,
    max_mean_wlen: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The Gopher quality-filter rule set (Rae et al. 2021, "Scaling
    Language Models", Appendix A — the published heuristics MassiveWeb
    was cleaned with; also the baseline filter in RefinedWeb/FineWeb
    reproductions). One row per document with each rule's measured
    signal, its boolean, and the conjunction ``gopher_pass``:

    1. word count in [min_words, max_words]
    2. mean word length in [min_mean_wlen, max_mean_wlen] characters
    3. symbol-to-word ratio (# and ellipsis occurrences / words)
       <= max_symbol_ratio
    4. fraction of lines starting with a bullet <= max_bullet_frac and
       fraction ending with an ellipsis <= max_ellipsis_frac
    5. fraction of words containing >=1 alphabetic char >= min_alpha_frac
    6. >= min_stop_hits distinct hits from the paper's stop-word list
       (the/be/to/of/and/that/have/with)

    Pure column expressions over the shared ``tokenize`` normalization —
    a projection riding the scan, trivially SQL-mirrorable, zero
    shuffles; composes with the rest of the cleaning stack by filtering
    on ``gopher_pass``. Defaults are the paper's published thresholds."""
    from kapacitor_spark.dataprep.dedup import nonempty_tokens

    toks = F.col("__toks")
    staged = df.select(
        F.col(id_col),
        F.col(text_col),
        nonempty_tokens(text_col).alias("__toks"),
    )
    n = F.size(toks)
    nd = n.cast("double")
    total_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    mean_wlen = F.when(n > 0, total_chars.cast("double") / nd)
    hash_count = (
        F.length(text_col) - F.length(F.regexp_replace(F.col(text_col), r"#", ""))
    ).cast("double")
    # each "..." or Unicode ellipsis counts once (regexp strip measures
    # removed length; 3 chars per ASCII ellipsis)
    ell_count = (
        (F.length(text_col)
         - F.length(F.regexp_replace(F.col(text_col), r"\.\.\.", ""))).cast("double")
        / 3.0
        + (F.length(text_col)
           - F.length(F.regexp_replace(F.col(text_col), "…", ""))).cast("double")
    )
    symbol_ratio = F.when(n > 0, (hash_count + ell_count) / nd)
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda x: x.startswith("•") | x.rlike(r"^[-*] "),
            )
        ).cast("double")
        / n_lines.cast("double"),
    )
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)$"))
        ).cast("double")
        / n_lines.cast("double"),
    )
    alpha_frac = F.when(
        n > 0,
        F.size(F.filter(toks, lambda x: x.rlike("[a-zA-Z]"))).cast("double") / nd,
    )
    stop_arr = F.array(
        *[F.lit(s) for s in ("the", "be", "to", "of", "and", "that", "have", "with")]
    )
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))

    r_words = (n >= min_words) & (n <= max_words)
    r_wlen = (mean_wlen >= min_mean_wlen) & (mean_wlen <= max_mean_wlen)
    r_symbol = symbol_ratio <= max_symbol_ratio
    r_lines = (
        F.coalesce(bullet_frac <= max_bullet_frac, F.lit(True))
        & F.coalesce(ellipsis_frac <= max_ellipsis_frac, F.lit(True))
    )
    r_alpha = alpha_frac >= min_alpha_frac
    r_stop = stop_hits >= min_stop_hits
    rules = [
        F.coalesce(r_words, F.lit(False)).alias("rule_words"),
        F.coalesce(r_wlen, F.lit(False)).alias("rule_word_length"),
        F.coalesce(r_symbol, F.lit(False)).alias("rule_symbols"),
        F.coalesce(r_lines, F.lit(False)).alias("rule_lines"),
        F.coalesce(r_alpha, F.lit(False)).alias("rule_alpha"),
        F.coalesce(r_stop, F.lit(False)).alias("rule_stopwords"),
    ]
    return staged.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_word_length"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.cast("long").alias("stop_hits"),
        *rules,
        (
            F.coalesce(r_words, F.lit(False))
            & F.coalesce(r_wlen, F.lit(False))
            & F.coalesce(r_symbol, F.lit(False))
            & F.coalesce(r_lines, F.lit(False))
            & F.coalesce(r_alpha, F.lit(False))
            & F.coalesce(r_stop, F.lit(False))
        ).alias("gopher_pass"),
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 3,
    min_sentences: int = 5,
    span_sentences: int = 3,
) -> DataFrame:
    """The C4 cleaning pipeline (Raffel et al. 2020 §2.2 — the filters
    behind the Colossal Clean Crawled Corpus; with :func:`gopher_rules`
    the pair of published rule sets every web-corpus reproduction
    starts from):

    1. LINE filters: keep lines that end in terminal punctuation
       (. ! ? "), contain >= ``min_line_words`` words, and do not
       mention "javascript" (case-insensitive).
    2. PAGE filters: drop pages whose ORIGINAL text contains
       "lorem ipsum" (case-insensitive) or a curly brace "{", and pages
       with fewer than ``min_sentences`` sentences after line filtering.
    3. SPAN DEDUP: any ``span_sentences``-sentence run occurring more
       than once in the corpus keeps its FIRST occurrence (min
       (doc_id, position)) and is removed everywhere else — the famous
       three-sentence dedup.

    Sentence convention (shared with :func:`readability`): terminal-run
    split, so reassembled text re-terminates every sentence with ".".
    Returns one row per SURVIVING page: (id, n_lines_kept,
    n_lines_dropped, n_sentences, n_span_dropped, clean_text).

    Plan shape at 100 TB: line/page filtering is a projection riding the
    scan; the span stage shuffles ONLY 16-byte span digests + positions
    (one count aggregate with map-side combine, one join back, one
    per-page rebuild aggregate) — never page text, the exact shape of
    remove_boilerplate_paragraphs."""
    term_line = r'[.!?"]\s*$'
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    line_ok = lambda x: (
        x.rlike(term_line)
        & (F.size(F.filter(F.split(x, r"\s+"), lambda w: w != F.lit(""))) >= min_line_words)
        & ~F.lower(x).contains("javascript")
    )
    kept_lines = F.filter(lines, line_ok)
    sentences = F.filter(
        F.transform(
            F.split(F.array_join(F.col("__kept"), " "), r"[.!?]+"),
            lambda s: F.trim(s),
        ),
        lambda s: s != F.lit(""),
    )
    pages = (
        df.select(
            F.col(id_col),
            F.col(text_col),
            lines.alias("__lines"),
            kept_lines.alias("__kept"),
        )
        .withColumn("__sents", sentences)
        .filter(
            ~F.lower(F.col(text_col)).contains("lorem ipsum")
            & ~F.col(text_col).contains("{")
            & (F.size("__sents") >= min_sentences)
        )
        .select(
            F.col(id_col),
            F.size("__kept").cast("long").alias("n_lines_kept"),
            (F.size("__lines") - F.size("__kept")).cast("long").alias("n_lines_dropped"),
            F.col("__sents"),
        )
    )
    # span digests: (id, pos, md5 of the k-sentence run), pos 0-based
    k = span_sentences
    s = F.col("__sents")
    spans = pages.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                F.size(s) >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size(s) - k),
                    lambda i: F.md5(
                        F.concat_ws(
                            "\x01", *[F.element_at(s, i + j + 1) for j in range(k)]
                        )
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos", "digest"),
    )
    # keeper = min (id, pos) per digest, as a STRUCT key (lexicographic
    # struct ordering) — collision-free for any id type/range: 64-bit
    # snowflake ids, negative ids, string ids, and pages with any number
    # of spans all order correctly (a packed id*K+pos long would not)
    okey = F.struct(
        F.col(id_col).alias("id"), F.col("pos").alias("p")
    ).alias("__okey")
    occ = spans.select(id_col, "pos", "digest", okey)
    keepers = occ.groupBy("digest").agg(
        F.min("__okey").alias("__keep"), F.count(F.lit(1)).alias("__m")
    )
    dup_pos = (
        occ.join(keepers.filter(F.col("__m") > 1), "digest")
        .filter(F.col("__okey") != F.col("__keep"))
        .select(
            F.col(id_col),
            F.explode(
                F.array(*[F.col("pos") + j for j in range(k)])
            ).alias("__dpos"),
        )
        .distinct()
    )
    sent_rows = pages.select(
        id_col, "n_lines_kept", "n_lines_dropped",
        F.posexplode("__sents").alias("__pos", "__s"),
    )
    kept = sent_rows.join(
        dup_pos,
        (sent_rows[id_col] == dup_pos[id_col])
        & (sent_rows["__pos"] == dup_pos["__dpos"]),
        "left_anti",
    )
    rebuilt = kept.groupBy(id_col, "n_lines_kept", "n_lines_dropped").agg(
        F.count(F.lit(1)).cast("long").alias("__n_kept_sents"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__s"))),
                lambda st: F.concat(st["__s"], F.lit(".")),
            ),
            " ",
        ).alias("clean_text"),
    )
    n_sents = pages.select(
        id_col, F.size("__sents").cast("long").alias("n_sentences")
    )
    return (
        rebuilt.join(n_sents, id_col)
        .select(
            id_col,
            "n_lines_kept",
            "n_lines_dropped",
            "n_sentences",
            (F.col("n_sentences") - F.col("__n_kept_sents")).cast("long").alias(
                "n_span_dropped"
            ),
            "clean_text",
        )
    )
