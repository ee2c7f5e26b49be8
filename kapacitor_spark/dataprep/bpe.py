"""Byte-pair-encoding tokenizer: distributed training + distributed
apply (Sennrich et al. 2016, the published word-internal BPE — the
subword step a real training-data pipeline runs between cleaning and
packing; upgrades the token-budget math in ``text.py`` from the
whitespace/"BPE-ish regex" proxies to a trained vocabulary).

Division of labor, sized for 100 TB:

- **Word counting is the corpus-scale step and it is pure Spark**: one
  explode → hash aggregate (map-side combined) over the shared
  ``tokenize`` normalization, truncated to the ``max_words`` most
  frequent words (deterministic tie-break). This is the standard
  practice — BPE trains on the word-frequency table, not the corpus
  (HuggingFace/fastBPE do exactly this), so the driver-side table is
  bounded by construction regardless of corpus size.
- **The merge loop runs on the driver** over that bounded table: at
  most ``max_words`` rows ever leave the cluster, and each of the
  ``n_merges`` rounds is a dict pass over words that still change.
  An iterative Spark job per merge would pay ~n_merges scheduler
  round-trips to process kilobytes — the wrong engine for the inner
  loop.
- **Apply is one Arrow-batched Python hop** (``mapInPandas``) with the
  merge ranks broadcast by closure: merge application is inherently
  sequential per word (each merge depends on the previous), so it
  cannot be a column expression — but it memoizes per DISTINCT word
  within each batch, so the Python cost scales with distinct words per
  batch (Zipf-bounded), not with token count.

Determinism (everything here is a pure function of the corpus):
word truncation orders by (count DESC, word ASC); each round's best
pair maximizes (count, then lexicographically smallest pair); no RNG
anywhere. Training twice on the same corpus yields byte-identical
merge tables; the tests pin this plus an independent reference
implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kapacitor_spark.dataprep.dedup import nonempty_tokens

__all__ = [
    "bpe_word_counts",
    "bpe_learn",
    "bpe_train",
    "bpe_tokenize",
    "bpe_token_stats",
    "encode_word",
    "bpe_alphabet",
    "bpe_words",
    "bpe_vocab",
    "bpe_encode_ids",
]

# End-of-word marker (Sennrich's role, out-of-band representation): a
# single private-use-area code point instead of the literal "</w>" —
# web text full of HTML remnants contains "</w>" as ordinary characters,
# and a sequence of merges over '<','/','w','>' could then BUILD a
# symbol string-equal to the marker, making token identity in
# ranks/vocab ambiguous. A PUA char can't be built by merges because it
# is stripped from the word stream itself (``_strip_eow`` below), so the
# marker is unforgeable by construction.
_EOW = "\ue000"


def _strip_eow(w: str) -> str:
    return w.replace(_EOW, "")


def bpe_words(text_col: str = "text") -> "F.Column":
    """The token stream the whole BPE family trains on and encodes: the
    shared ``tokenize`` normalization with the out-of-band EOW sentinel
    stripped from every word (U+E000 is private-use; corpus occurrences
    are noise, and removing them is what makes the marker unforgeable).
    Word counting, alphabet extraction and the encode hop all consume
    THIS expression — a change here must happen once."""
    cleaned = F.transform(
        nonempty_tokens(text_col), lambda w: F.translate(w, _EOW, "")
    )
    return F.filter(cleaned, lambda w: w != F.lit(""))


def bpe_word_counts(
    df: DataFrame, text_col: str = "text", max_words: int = 65536
) -> DataFrame:
    """The corpus-scale half of training: (word, n) for the
    ``max_words`` most frequent lowercased whitespace words.
    One explode → partial-agg'd count; the rank-limit pushes a partial
    TakeOrdered below the final ordering, so only ~max_words rows per
    partition move."""
    toks = bpe_words(text_col)
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(max_words)
    )


def bpe_learn(word_counts: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Driver-side merge loop over a (word, count) table (Sennrich alg. 1).

    Returns the ordered merge list. Pure Python over the bounded table;
    incremental: pair counts adjust only for words containing the merged
    pair, so later rounds touch a shrinking working set."""
    # symbol sequences per word, weighted by count
    # defensive sentinel strip: callers normally arrive via
    # bpe_word_counts (already stripped), but a raw count table must not
    # smuggle the marker into symbol sequences
    words: list[tuple[list[str], int]] = [
        (list(_strip_eow(w)) + [_EOW], int(n))
        for w, n in word_counts
        if _strip_eow(w)
    ]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def add_word(wi: int, sign: int) -> None:
        syms, n = words[wi]
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            pair_counts[p] = pair_counts.get(p, 0) + sign * n
            if sign > 0:
                pair_words.setdefault(p, set()).add(wi)

    for wi in range(len(words)):
        add_word(wi, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        for p, c in pair_counts.items():
            if c <= 0:
                continue
            if best is None or c > best[1] or (c == best[1] and p < best[0]):
                best = (p, c)
        if best is None:
            break
        pair = best[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        for wi in list(pair_words.get(pair, ())):
            syms, n = words[wi]
            if n == 0:
                continue
            add_word(wi, -1)  # retract old pair counts for this word
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = (out, n)
            add_word(wi, +1)
        pair_counts.pop(pair, None)
        pair_words.pop(pair, None)
    return merges


def bpe_train(
    df: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    max_words: int = 65536,
) -> list[tuple[str, str]]:
    """End-to-end training: distributed word counts → driver merge loop.
    The collect is bounded at ``max_words`` rows by construction."""
    rows = bpe_word_counts(df, text_col=text_col, max_words=max_words).collect()
    return bpe_learn([(r["word"], r["n"]) for r in rows], n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply trained merges to one word: repeatedly merge the
    lowest-rank adjacent pair (exactly reverses training order)."""
    syms = list(_strip_eow(word)) + [_EOW]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def _bpe_hop(df, merges, text_col, id_col, extra_fields, finish):
    """Shared Arrow hop for the BPE apply family: tokenize JVM-side,
    ship merge ranks by closure, memoize per DISTINCT word per batch
    (Python cost follows the Zipf head, not token count), and let
    ``finish(tok_lists) -> dict[col, values]`` shape the outputs.
    Arrow hands list<string> cells as numpy object arrays — hence the
    explicit None test instead of ``words or []``."""
    import pandas as pd

    from pyspark.sql import types as T

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    base = df.select(
        F.col(id_col),
        bpe_words(text_col).alias("__w"),
    )
    out_schema = T.StructType([df.schema[id_col]] + extra_fields)

    def run(batches):
        memo: dict[str, list[str]] = {}

        def enc(words) -> list[str]:
            if words is None:
                return []
            out: list[str] = []
            for w in words:
                t = memo.get(w)
                if t is None:
                    t = encode_word(w, ranks)
                    memo[w] = t
                out.extend(t)
            return out

        for pdf in batches:
            toks = [enc(ws) for ws in pdf["__w"]]
            cols = {pdf.columns[0]: pdf.iloc[:, 0]}
            cols.update(finish(toks))
            yield pd.DataFrame(cols)

    return base.mapInPandas(run, schema=out_schema)


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, bpe_tokens array<string>, n_bpe_tokens) per document — one
    memoized Arrow hop (see :func:`_bpe_hop`)."""
    from pyspark.sql import types as T

    return _bpe_hop(
        df,
        merges,
        text_col,
        id_col,
        [
            T.StructField("bpe_tokens", T.ArrayType(T.StringType())),
            T.StructField("n_bpe_tokens", T.LongType()),
        ],
        lambda toks: {
            "bpe_tokens": toks,
            "n_bpe_tokens": [len(t) for t in toks],
        },
    )


def bpe_token_stats(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level accounting under the trained vocabulary — ONE row:
    (n_docs, total_bpe_tokens, distinct_bpe_tokens, total_chars) — the
    numbers a token-budget planner needs (cf. ``mix_to_token_budget``,
    which can consume n_bpe_tokens instead of its whitespace proxy)."""
    from kapacitor_spark.dataprep.cache import track

    # persisted (cache-registry tracked): the totals aggregate and the
    # distinct-token aggregate both consume this, and the Arrow-hop
    # BPE encode is the dominant cost — without the persist it would
    # run twice over the corpus.
    toked = track(
        bpe_tokenize(df, merges, text_col=text_col, id_col=id_col).persist()
    )
    totals = toked.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("n_bpe_tokens"), F.lit(0)).cast("long").alias(
            "total_bpe_tokens"
        ),
    )
    distinct = (
        toked.select(F.explode("bpe_tokens").alias("t"))
        .agg(F.count_distinct("t").cast("long").alias("distinct_bpe_tokens"))
    )
    chars = df.agg(
        F.coalesce(F.sum(F.length(text_col)), F.lit(0)).cast("long").alias(
            "total_chars"
        )
    )
    # three 1-row aggregates; the joins are trivially broadcast
    return totals.crossJoin(F.broadcast(distinct)).crossJoin(F.broadcast(chars))


def bpe_alphabet(df: DataFrame, text_col: str = "text") -> list[str]:
    """Distinct single characters across all corpus words — the base
    vocabulary (one distributed distinct over exploded token chars;
    collect size bounded by the character set, not the corpus)."""
    toks = bpe_words(text_col)
    rows = (
        df.select(F.explode(toks).alias("__w"))
        .select(F.explode(F.split(F.col("__w"), "")).alias("__ch"))
        .filter(F.col("__ch") != "")
        .distinct()
        .collect()
    )
    return sorted(r["__ch"] for r in rows)


def bpe_vocab(merges: list[tuple[str, str]], alphabet: list[str]) -> dict[str, int]:
    """Token → id table: every reachable BPE token is a base character,
    the end-of-word marker, or the result of a merge — nothing else can
    appear in :func:`encode_word` output over in-alphabet text. Sorted
    for a deterministic id assignment."""
    vocab = set(alphabet) | {_EOW} | {a + b for a, b in merges}
    return {tok: i for i, tok in enumerate(sorted(vocab))}


def bpe_encode_ids(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_id: int = -1,
) -> DataFrame:
    """(id, token_ids array<long>, n_bpe_tokens, n_oov) per document —
    the model-ready integer form (compose with pack_sequences for the
    text → ids → packed-shards path). Same memoized hop as
    :func:`bpe_tokenize`; tokens outside the vocabulary (characters
    unseen at training time surface as single-char fallbacks) map to
    ``oov_id`` and are counted, never silently dropped."""
    from pyspark.sql import types as T

    def finish(tok_lists):
        ids = [[vocab.get(s, oov_id) for s in toks] for toks in tok_lists]
        return {
            "token_ids": ids,
            "n_bpe_tokens": [len(t) for t in ids],
            "n_oov": [sum(1 for i in t if i == oov_id) for t in ids],
        }

    return _bpe_hop(
        df,
        merges,
        text_col,
        id_col,
        [
            T.StructField("token_ids", T.ArrayType(T.LongType())),
            T.StructField("n_bpe_tokens", T.LongType()),
            T.StructField("n_oov", T.LongType()),
        ],
        finish,
    )
