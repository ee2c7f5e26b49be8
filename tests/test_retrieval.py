"""BM25 retrieval + bigram-LM perplexity: hand-computed verification on a
tiny corpus (independent pure-Python re-derivation, not a restatement of
the Spark expressions), plus edge-case and determinism checks."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kapacitor_spark.dataprep.retrieval import (
    bm25_postings,
    bm25_topk,
    lm_perplexity,
    lm_train,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown cat sleeps on the warm mat"),
    (3, "a fox and a dog play in the park"),
    (4, "stock prices fell sharply as markets closed lower today"),
    (5, ""),  # dropped everywhere
    (6, None),  # dropped everywhere
]


def _tok(s):
    return [t for t in s.lower().strip().split() if t]


def _py_bm25(docs, queries, k1=1.2, b=0.75):
    """Independent BM25: dict-based, no Spark, no shared helpers."""
    corpus = {i: _tok(t) for i, t in docs if t and _tok(t)}
    n = len(corpus)
    avgdl = sum(len(v) for v in corpus.values()) / n
    df = {}
    for toks in corpus.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qid, qtext in queries:
        scores = {}
        for term in set(_tok(qtext)):
            if term not in df:
                continue
            idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
            for did, toks in corpus.items():
                tf = toks.count(term)
                if not tf:
                    continue
                part = idf * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * len(toks) / avgdl)
                )
                scores[did] = scores.get(did, 0.0) + round(part, 9)
        out[qid] = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return out


def test_bm25_matches_hand_derivation(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = [(100, "quick brown fox"), (200, "dog park"), (300, "zzz unseen")]
    qdf = spark.createDataFrame(queries, "query_id long, qtext string")
    got = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["score"])
        for r in bm25_topk(docs, qdf, k=10).collect()
    }
    expected = _py_bm25(DOCS, queries)
    exp_flat = {
        (qid, did): (rank + 1, round(s, 6))
        for qid, ranked in expected.items()
        for rank, (did, s) in enumerate(ranked)
    }
    assert got == exp_flat
    # the unseen-terms query returns nothing rather than zero-score rows
    assert not any(q == 300 for q, _ in got)


def test_bm25_topk_truncates_and_orders(spark):
    docs = spark.createDataFrame(
        [(i, f"common word{'x' * (i % 3)}") for i in range(20)],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame([(1, "common")], "query_id long, qtext string")
    rows = bm25_topk(docs, qdf, k=5).orderBy("rank").collect()
    assert len(rows) == 5
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    # equal text ⇒ equal score ⇒ doc_id ascending tie-break
    scores = {}
    for r in rows:
        scores.setdefault(r["score"], []).append(r["doc_id"])
    for ids in scores.values():
        assert ids == sorted(ids)


def test_bm25_postings_stats(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    posts, term_df, glob = bm25_postings(docs)
    g = glob.collect()[0]
    assert g["n_docs"] == 4  # empty + null dropped
    assert g["avgdl"] == pytest.approx((9 + 9 + 9 + 9) / 4)
    tf = {(r["doc_id"], r["term"]): r["tf"] for r in posts.collect()}
    assert tf[(1, "the")] == 2 and tf[(3, "a")] == 2
    dfm = {r["term"]: r["df_t"] for r in term_df.collect()}
    assert dfm["the"] == 3 and dfm["fox"] == 2 and dfm["stock"] == 1


def _py_ppl(docs, ref_ids, alpha=0.5):
    """Independent bigram-LM scorer."""
    ref = [_tok(t) for i, t in docs if i in ref_ids and t]
    c2, c1, vocab = {}, {}, set()
    for toks in ref:
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    v = len(vocab)
    out = {}
    for i, t in docs:
        if i in ref_ids or not t:
            continue
        toks = _tok(t)
        if len(toks) < 2:
            continue
        nlls = [
            round(
                -math.log(
                    (c2.get((a, b), 0) + alpha) / (c1.get(a, 0) + alpha * v)
                ),
                9,
            )
            for a, b in zip(toks, toks[1:])
        ]
        avg = round(sum(nlls) / len(nlls), 6)
        out[i] = (len(nlls), avg, round(math.exp(avg), 6))
    return out


def test_lm_perplexity_matches_hand_derivation(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    ref = docs.filter("doc_id <= 2")
    score = docs.filter("doc_id > 2")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"], r["ppl"])
        for r in lm_perplexity(score, ref).collect()
    }
    expected = _py_ppl(DOCS, ref_ids={1, 2})
    assert set(got) == set(expected) == {3, 4}
    for k in got:
        n_g, avg_g, ppl_g = got[k]
        n_e, avg_e, ppl_e = expected[k]
        assert n_g == n_e
        assert avg_g == pytest.approx(avg_e, abs=2e-6)
        assert ppl_g == pytest.approx(ppl_e, rel=1e-5)


def test_lm_reference_like_text_scores_lower(spark):
    """The CCNet signal: text drawn from the reference distribution gets
    lower perplexity than shuffled noise over the same vocabulary."""
    ref_rows = [(i, "the quick brown fox jumps over the lazy dog again") for i in range(20)]
    docs = spark.createDataFrame(
        ref_rows
        + [(100, "the quick brown fox jumps over the lazy dog")]
        + [(200, "dog the over fox quick lazy brown jumps the")],
        "doc_id long, text string",
    )
    ref = docs.filter("doc_id < 100")
    out = {
        r["doc_id"]: r["ppl"]
        for r in lm_perplexity(docs.filter("doc_id >= 100"), ref).collect()
    }
    assert out[100] < out[200]


def test_lm_train_counts(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    c2, c1, vocab = lm_train(docs.filter("doc_id = 1"))
    assert vocab.collect()[0]["vocab_size"] == 8  # 'the' twice
    c2m = {(r["w1"], r["w2"]): r["c2"] for r in c2.collect()}
    assert c2m[("the", "quick")] == 1 and c2m[("the", "lazy")] == 1
    c1m = {r["w1"]: r["c1"] for r in c1.collect()}
    assert c1m["the"] == 2  # two bigram contexts
    # short / empty docs produce no bigrams at all
    single = spark.createDataFrame([(1, "word"), (2, "")], "doc_id long, text string")
    assert lm_perplexity(single, docs).count() == 0


def test_lm_prune_and_stream_scorer_match_batch(spark, tmp_path):
    """The pruned-artifact scorer must agree with the oracle-gated batch
    scorer (to float tolerance) when nothing was truncated, running as a
    REAL stream across micro-batches; with an aggressive prune, truncated
    bigrams fall back to the additive prior exactly like unseen ones."""
    from kapacitor_spark.dataprep.retrieval import lm_prune, lm_score_stream

    ref_rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    score_rows = [
        (100, "the quick brown fox sleeps"),
        (101, "dog over jumps quick the"),
        (102, "single"),  # < 2 tokens: no row
        (103, None),
    ]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    docs = spark.createDataFrame(score_rows, "doc_id long, text string")
    model = lm_prune(ref)
    assert model["vocab_size"] == 8

    batch = {
        r["doc_id"]: r for r in lm_perplexity(docs, ref).collect()
    }
    # batch semantics: stateless scorer on a plain DataFrame
    direct = {r["doc_id"]: r for r in lm_score_stream(docs, model).collect()}
    assert set(direct) == set(batch) == {100, 101}
    for k in direct:
        assert direct[k]["n_bigrams"] == batch[k]["n_bigrams"]
        assert direct[k]["avg_nll"] == pytest.approx(batch[k]["avg_nll"], abs=2e-6)
        assert direct[k]["ppl"] == pytest.approx(batch[k]["ppl"], rel=1e-5)

    # real stream, 2 micro-batches
    in_dir = str(tmp_path / "lm_docs_in")
    spark.createDataFrame(score_rows[:2], "doc_id long, text string").write.parquet(in_dir)
    spark.createDataFrame(score_rows[2:], "doc_id long, text string").write.mode(
        "append"
    ).parquet(in_dir)
    src = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        lm_score_stream(src, model)
        .writeStream.format("memory")
        .queryName("lmscore")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_lm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["doc_id"]: r for r in spark.sql("SELECT * FROM lmscore").collect()
    }
    assert set(streamed) == {100, 101}
    for k in streamed:
        assert streamed[k]["avg_nll"] == direct[k]["avg_nll"]

    # aggressive prune: kept head only; the tail scores as unseen.
    # CONSISTENCY invariant: a kept bigram whose context was pruned from
    # c1 must be dropped too — p=(c2+a)/(0+aV) would exceed 1 (negative
    # NLL) and invert the quality filter — so every retained probability
    # is a true probability.
    tiny = lm_prune(ref, max_bigrams=2, max_contexts=2)
    assert len(tiny["c1"]) == 2
    assert all(w1 in tiny["c1"] for (w1, _w2) in tiny["c2"])
    a, v = tiny["alpha"], tiny["vocab_size"]
    for (w1, w2), c2 in tiny["c2"].items():
        assert (c2 + a) / (tiny["c1"][w1] + a * v) <= 1.0
    pruned = {r["doc_id"]: r for r in lm_score_stream(docs, tiny).collect()}
    assert pruned[100]["avg_nll"] >= direct[100]["avg_nll"]  # lost mass, never gained


def test_percolate_matches_hand_check(spark):
    from kapacitor_spark.dataprep.retrieval import percolate

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(
        [
            (1, "quick brown"),        # AND: docs 1, 2
            (2, "fox dog"),            # AND: docs 1, 3
            (3, "markets zzz"),        # AND: nothing (zzz unseen)
            (4, "the the the"),        # distinct -> {the}: docs 1, 2, 3
        ],
        "query_id long, qtext string",
    )
    got = {
        (r["doc_id"], r["query_id"]): (r["matched_terms"], r["n_terms"])
        for r in percolate(docs, queries).collect()
    }
    assert got == {
        (1, 1): (2, 2), (2, 1): (2, 2),
        (1, 2): (2, 2), (3, 2): (2, 2),
        (1, 4): (1, 1), (2, 4): (1, 1), (3, 4): (1, 1),
    }
    # min_should_match 0.5: "markets zzz" now fires on doc 4 (1 of 2)
    half = {
        (r["doc_id"], r["query_id"])
        for r in percolate(docs, queries, min_should_match=0.5).collect()
    }
    assert (4, 3) in half


def test_percolate_stream_equals_batch(spark, tmp_path):
    from kapacitor_spark.dataprep.retrieval import (
        percolate,
        percolate_artifact,
        percolate_stream,
    )

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(
        [(1, "quick brown"), (2, "fox dog"), (3, "")],
        "query_id long, qtext string",
    )
    art = percolate_artifact(queries)
    assert set(art) == {1, 2}  # empty query dropped
    batch = {
        (r["doc_id"], r["query_id"]): (r["matched_terms"], r["n_terms"])
        for r in percolate(docs, queries).collect()
    }
    direct = {
        (r["doc_id"], r["query_id"]): (r["matched_terms"], r["n_terms"])
        for r in percolate_stream(docs, art).collect()
    }
    assert direct == batch

    in_dir = str(tmp_path / "perc_in")
    spark.createDataFrame(DOCS[:3], "doc_id long, text string").write.parquet(in_dir)
    spark.createDataFrame(DOCS[3:], "doc_id long, text string").write.mode(
        "append"
    ).parquet(in_dir)
    src = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        percolate_stream(src, art)
        .writeStream.format("memory")
        .queryName("perc")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_perc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["doc_id"], r["query_id"]): (r["matched_terms"], r["n_terms"])
        for r in spark.sql("SELECT * FROM perc").collect()
    }
    assert streamed == batch


def test_percolate_stream_rule_updates_across_batches(spark, tmp_path):
    """Operational shape: the stored-query set CHANGES while the document
    stream runs. foreachBatch re-collects the artifact each micro-batch
    (control-plane small), so later batches match against updated rules —
    the percolator analog of the dedup corpus-update composition."""
    from kapacitor_spark.dataprep.retrieval import (
        percolate_artifact,
        percolate_stream,
    )

    rules_path = tmp_path / "rules"
    spark.createDataFrame(
        [(1, "quick brown")], "query_id long, qtext string"
    ).write.parquet(str(rules_path))

    in_dir = str(tmp_path / "docs_in")
    spark.createDataFrame(
        [(10, "the quick brown fox")], "doc_id long, text string"
    ).write.parquet(in_dir)
    spark.createDataFrame(
        [(11, "stock markets fell")], "doc_id long, text string"
    ).write.mode("append").parquet(in_dir)

    seen = []

    def on_batch(batch_df, batch_id):
        art = percolate_artifact(spark.read.parquet(str(rules_path)))
        rows = percolate_stream(batch_df, art).collect()
        seen.extend((r["doc_id"], r["query_id"]) for r in rows)
        # after the first batch, a NEW rule deploys
        if batch_id == 0:
            spark.createDataFrame(
                [(2, "markets fell")], "query_id long, qtext string"
            ).write.mode("append").parquet(str(rules_path))

    src = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        src.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ck_rules"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert (10, 1) in seen            # batch 0 matches the original rule
    assert (11, 2) in seen            # batch 1 matches the rule deployed mid-stream
    assert (11, 1) not in seen
