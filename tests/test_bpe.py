"""BPE tokenizer: training pinned against an independent reference
implementation (naive full-recount Sennrich loop — different algorithm
shape from the library's incremental one), apply/encode round-trip
properties, determinism, and the distributed word-count path."""

from __future__ import annotations

import pytest

from kapacitor_spark.dataprep.bpe import (
    bpe_learn,
    bpe_token_stats,
    bpe_tokenize,
    bpe_train,
    bpe_word_counts,
    encode_word,
)

from kapacitor_spark.dataprep.bpe import _EOW as EOW


# ------------------------------------------------------------------ #
# independent reference: recount ALL pairs from scratch every round
# ------------------------------------------------------------------ #
def _ref_learn(word_counts, n_merges):
    words = {}
    for w, n in word_counts:
        if w:
            words[tuple(list(w) + [EOW])] = words.get(tuple(list(w) + [EOW]), 0) + n
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, n in words.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_words = {}
        for syms, n in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_words[t] = new_words.get(t, 0) + n
        words = new_words
    return merges


CORPUS = [
    ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
    ("low", 0), ("newer", 4), ("wider", 2), ("new", 7),
]


def test_learn_matches_independent_reference():
    for n_merges in (1, 5, 12, 40):
        assert bpe_learn(CORPUS, n_merges) == _ref_learn(CORPUS, n_merges)


def test_learn_sennrich_canonical_example():
    # Sennrich et al. fig. 1 flavor: 'es' family dominates
    wc = [("newest", 6), ("widest", 3), ("low", 5), ("lower", 2)]
    merges = bpe_learn(wc, 3)
    assert merges == _ref_learn(wc, 3)
    assert merges[0] == ("e", "s")  # count 9 beats everything


def test_learn_exhausts_gracefully():
    # tiny corpus: asking for more merges than exist just stops
    merges = bpe_learn([("ab", 1)], 100)
    assert merges == _ref_learn([("ab", 1)], 100)
    assert len(merges) < 100


def test_encode_word_reverses_training():
    merges = bpe_learn(CORPUS, 30)
    ranks = {p: i for i, p in enumerate(merges)}
    # every training word encodes deterministically; re-encoding the
    # SAME word is stable, and unseen words fall back toward chars
    for w, _ in CORPUS:
        if not w:
            continue
        t1 = encode_word(w, ranks)
        assert "".join(t1) == w + EOW  # partition, nothing lost
        assert encode_word(w, ranks) == t1
    unseen = encode_word("zzz", ranks)
    assert unseen == ["z", "z", "z", EOW]


def test_encode_matches_reference_tokenization():
    """Applying ranks greedily-by-rank must reproduce the reference
    encoding obtained by replaying merges in order."""
    merges = bpe_learn(CORPUS, 30)
    ranks = {p: i for i, p in enumerate(merges)}

    def replay(w):
        syms = list(w) + [EOW]
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    for w in ("low", "lowest", "newness", "wide", "q"):
        assert encode_word(w, ranks) == replay(w)


def test_spark_train_and_tokenize(spark):
    rows = [
        (1, "new new new newest newest lower low"),
        (2, "the newest gadget is the widest gadget"),
        (3, "low lower lowest"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wc = {r["word"]: r["n"] for r in bpe_word_counts(df).collect()}
    assert wc["new"] == 3 and wc["newest"] == 3 and wc["the"] == 2
    merges = bpe_train(df, n_merges=20)
    # training must equal driver-side training on the same counts
    assert merges == bpe_learn(sorted(wc.items(), key=lambda kv: (-kv[1], kv[0])), 20)
    out = {r["doc_id"]: r for r in bpe_tokenize(df, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    exp1 = []
    for w in rows[0][1].split():
        exp1.extend(encode_word(w, ranks))
    assert list(out[1]["bpe_tokens"]) == exp1
    assert out[1]["n_bpe_tokens"] == len(exp1)
    assert list(out[4]["bpe_tokens"]) == [] and out[4]["n_bpe_tokens"] == 0
    assert list(out[5]["bpe_tokens"]) == [] and out[5]["n_bpe_tokens"] == 0


def test_spark_token_stats(spark):
    rows = [(1, "aa ab aa"), (2, "ab aa"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(df, n_merges=50)
    st = bpe_token_stats(df, merges).collect()[0]
    toked = bpe_tokenize(df, merges)
    flat = [t for r in toked.collect() for t in r["bpe_tokens"]]
    assert st["n_docs"] == 3
    assert st["total_bpe_tokens"] == len(flat)
    assert st["distinct_bpe_tokens"] == len(set(flat))
    assert st["total_chars"] == sum(len(t) for _, t in rows)


def test_training_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta{i % 7} beta alpha") for i in range(200)],
        "doc_id long, text string",
    ).repartition(16)
    m1 = bpe_train(df, n_merges=30)
    m2 = bpe_train(df.repartition(5), n_merges=30)
    assert m1 == m2  # partition-count independent


# ------------------------------------------------------------------ #
# hypothesis fuzz: incremental trainer == full-recount reference
# ------------------------------------------------------------------ #
from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abcde", min_size=1, max_size=8)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.tuples(_word, st.integers(1, 9)), min_size=1, max_size=30),
    st.integers(1, 25),
)
def test_learn_fuzz_matches_reference(word_counts, n_merges):
    """The library's incremental pair-count maintenance (retract/re-add
    per touched word) must be indistinguishable from recounting every
    pair from scratch each round — including duplicate words in the
    input, ties, and merge exhaustion."""
    assert bpe_learn(word_counts, n_merges) == _ref_learn(word_counts, n_merges)


def test_vocab_closure_and_id_encoding(spark):
    from kapacitor_spark.dataprep.bpe import (
        bpe_alphabet,
        bpe_encode_ids,
        bpe_vocab,
    )

    rows = [
        (1, "new newest lower low"),
        (2, "the newest gadget"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(df, n_merges=25)
    alphabet = bpe_alphabet(df)
    assert "e" in alphabet and " " not in alphabet
    vocab = bpe_vocab(merges, alphabet)
    # closure: every token bpe_tokenize emits over this corpus has an id
    toks = bpe_tokenize(df, merges)
    all_tokens = {t for r in toks.collect() for t in r["bpe_tokens"]}
    assert all_tokens <= set(vocab)
    # ids decode back to exactly the same token stream
    inv = {i: t for t, i in vocab.items()}
    ids = {r["doc_id"]: r for r in bpe_encode_ids(df, merges, vocab).collect()}
    strs = {r["doc_id"]: list(r["bpe_tokens"]) for r in toks.collect()}
    for d in (1, 2, 3):
        assert [inv[i] for i in ids[d]["token_ids"]] == strs[d]
        assert ids[d]["n_oov"] == 0
        assert ids[d]["n_bpe_tokens"] == len(strs[d])


def test_oov_characters_counted_not_dropped(spark):
    from kapacitor_spark.dataprep.bpe import bpe_encode_ids, bpe_vocab

    train = spark.createDataFrame([(1, "abc abd")], "doc_id long, text string")
    merges = bpe_train(train, n_merges=10)
    vocab = bpe_vocab(merges, ["a", "b", "c", "d"])
    # 'z' was never in the alphabet: its single-char fallback is OOV
    score = spark.createDataFrame([(9, "abz")], "doc_id long, text string")
    r = bpe_encode_ids(score, merges, vocab).collect()[0]
    assert r["n_oov"] == 1
    assert -1 in list(r["token_ids"])
    assert r["n_bpe_tokens"] == len(list(r["token_ids"]))


def test_eow_marker_unforgeable(spark):
    """ADVICE r9: corpus text containing the literal '</w>' (HTML
    remnants) must not collide with the end-of-word marker, and corpus
    occurrences of the out-of-band U+E000 sentinel are stripped so no
    merge can ever BUILD the marker. Every emitted symbol ends with
    exactly one sentinel occurrence (the appended marker), never more."""
    rows = [
        (1, "body</w> body</w> body</w> text text"),
        (2, "prefix prefix normal normal"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(df, n_merges=50)
    # no learned merge result equals or contains the sentinel except as
    # the standalone marker itself
    for a, b in merges:
        for sym in (a, b, a + b):
            assert sym == EOW or EOW not in sym or sym.endswith(EOW) and sym.count(EOW) == 1
    out = {r["doc_id"]: list(r["bpe_tokens"]) for r in bpe_tokenize(df, merges).collect()}
    for doc_id, text in rows:
        stripped_words = [w.replace(EOW, "") for w in text.lower().split()]
        # partition property: concatenation restores the stripped words,
        # one marker per word and nowhere else
        assert "".join(out[doc_id]) == EOW.join(stripped_words) + EOW
    # encode_word on a word containing the sentinel strips it first
    enc = encode_word("ab", {})
    assert enc == ["a", "b", EOW]
    # literal HTML '</w>' stays ordinary characters
    enc2 = encode_word("</w>", {})
    assert enc2 == ["<", "/", "w", ">", EOW]


def test_astral_plane_chars_consistent(spark):
    """Supplementary-plane code points must agree between the JVM-side
    char split (bpe_alphabet) and Python's list() (encode_word): the
    emoji lands in the alphabet as ONE code point, flows through
    bpe_vocab, and encodes with zero OOV ids."""
    from kapacitor_spark.dataprep.bpe import (
        bpe_alphabet,
        bpe_encode_ids,
        bpe_vocab,
    )

    df = spark.createDataFrame(
        [(1, "a\U0001F600b a\U0001F600b cc")], "doc_id long, text string"
    )
    alpha = bpe_alphabet(df)
    assert "\U0001F600" in alpha and all(len(c) == 1 for c in alpha)
    merges = bpe_train(df, n_merges=10)
    vocab = bpe_vocab(merges, alpha)
    out = bpe_encode_ids(df, merges, vocab).collect()[0]
    assert out["n_oov"] == 0
    assert out["n_bpe_tokens"] > 0


def test_bpe_encode_streams(spark, tmp_path):
    """The memoized encode hop is stateless, so it composes with
    Structured Streaming unchanged: trained merges broadcast by closure,
    every micro-batch encodes with zero state — the continuous-ingestion
    twin of bpe_encode_ids (tokenize arriving documents with a FROZEN
    trained vocabulary, the deployment shape of a data pipeline's
    tokenizer stage)."""
    from pyspark.sql import functions as F

    from kapacitor_spark.dataprep.bpe import (
        bpe_alphabet,
        bpe_encode_ids,
        bpe_train,
        bpe_vocab,
    )
    from kapacitor_spark.streaming import run_available_now

    rows = [(i, "low lower newest widest new") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(df, n_merges=20)
    vocab = bpe_vocab(merges, bpe_alphabet(df))

    src = tmp_path / "docs"
    df.coalesce(1).write.parquet(str(src))
    sdf = spark.readStream.schema(df.schema).parquet(str(src))
    out = run_available_now(
        bpe_encode_ids(sdf, merges, vocab),
        "bpe_stream_ids", str(tmp_path / "ckpt"), output_mode="append",
    )
    got = {r["doc_id"]: (list(r["token_ids"]), r["n_oov"]) for r in out.collect()}
    want = {
        r["doc_id"]: (list(r["token_ids"]), r["n_oov"])
        for r in bpe_encode_ids(df, merges, vocab).collect()
    }
    assert got == want and all(v[1] == 0 for v in got.values())
