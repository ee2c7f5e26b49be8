"""Edge cases for the cleaning-stage dataprep ops (boilerplate removal,
decontamination, PII scrubbing, repetition signals) — the oracle gate
covers the bulk behavior; these pin the boundary semantics."""

import os
import sys

from pyspark.sql import functions as _F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_boilerplate_removal_edges(spark):
    from kapacitor_spark.dataprep.text import remove_boilerplate_paragraphs

    rows = [
        (1, "unique one\nCOMMON\nunique two"),
        (2, "COMMON\nother text"),
        (3, "COMMON"),          # all-boilerplate: document disappears
        (4, ""),                # empty: no paragraphs at all
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["text"], r["kept_paragraphs"])
        for r in remove_boilerplate_paragraphs(df, max_df=2).collect()
    }
    # COMMON appears in 3 docs > max_df=2 → dropped everywhere; docs whose
    # every paragraph was boilerplate (or empty) emit no row
    assert out == {
        1: ("unique one\nunique two", 2),
        2: ("other text", 1),
    }


def test_decontaminate_edges(spark):
    from kapacitor_spark.dataprep.dedup import decontaminate

    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (10, "totally unrelated content here now"),
            (11, "prefix the quick brown fox jumps suffix"),  # contains the 5-gram
            (12, "the quick brown cat naps today"),           # shares no 5-gram
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in decontaminate(corpus, bench, n=5).collect()
    )
    assert kept == [10, 12]


def test_scrub_pii_edges(spark):
    from kapacitor_spark.dataprep.text import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@sub.example.org end"),
            (2, "ip 192.168.0.1 and phone +1-555-0100-200"),
            (3, "clean text with no pii at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in scrub_pii(df).collect()}
    assert out[1] == "mail <EMAIL> end"
    assert out[2] == "ip <IP> and phone <PHONE>"
    assert out[3] == "clean text with no pii at all"


def test_repetition_stats_edges(spark):
    from kapacitor_spark.dataprep.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # 2-grams: ab ba ab ba ab → 5 total 2 distinct
            (2, "w x y z"),       # all unique
            (3, "solo"),          # shorter than n: one truncated gram, no dups
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["dup_2gram_frac"], r["dup_3gram_frac"])
        for r in repetition_stats(df, ns=(2, 3)).collect()
    }
    assert out[1] == (round(3 / 5, 6), round(2 / 4, 6))
    assert out[2] == (0.0, 0.0)
    assert out[3] == (0.0, 0.0)


def test_pack_sequences_edges(spark):
    from kapacitor_spark.dataprep.text import pack_sequences

    rows = [
        (1, "en", "a b c"),        # 3 tokens, offset 0, seq 0
        (2, "en", "d e f g"),      # offset 3, seq 0
        (3, "en", "h i"),          # offset 7, seq 1 (window 4)
        (1, "de", "x y z w v"),    # independent shard: offset 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        (r["lang"], r["doc_id"]): (r["n_tokens"], r["token_offset"], r["seq_id"])
        for r in pack_sequences(df, window_tokens=4).collect()
    }
    assert out == {
        ("en", 1): (3, 0, 0),
        ("en", 2): (4, 3, 0),
        ("en", 3): (2, 7, 1),
        ("de", 1): (5, 0, 0),
    }


def test_deterministic_sample_reproducible(spark):
    from kapacitor_spark.dataprep.text import deterministic_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(400)],
        "doc_id long, lang string",
    )
    kept1 = sorted(
        r["doc_id"]
        for r in deterministic_sample(df, {"en": 0.5, "de": 0.1}).collect()
    )
    kept2 = sorted(
        r["doc_id"]
        for r in deterministic_sample(df, {"en": 0.5, "de": 0.1}).collect()
    )
    assert kept1 == kept2  # same salt → identical membership
    other = sorted(
        r["doc_id"]
        for r in deterministic_sample(
            df, {"en": 0.5, "de": 0.1}, salt="mix-v2"
        ).collect()
    )
    assert other != kept1  # new salt → independent draw
    # rough rate sanity: en ≈ 100/200, de ≈ 20/200 (md5 is uniform)
    en = sum(1 for i in kept1 if i % 2 == 0)
    de = len(kept1) - en
    assert 70 <= en <= 130 and 5 <= de <= 40


def test_near_dup_clusters_transitive(spark):
    """A~B, B~C, D~E: two components, keepers = min ids; a chain longer
    than one hop collapses (the pairs alone never contained A~C)."""
    from kapacitor_spark.dataprep.dedup import near_dup_clusters

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 7), (10, 11)], "id_a long, id_b long"
    )
    out = {
        r["doc_id"]: r["keeper"] for r in near_dup_clusters(pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_near_dup_clusters_warns_on_nonconvergence(spark):
    """A duplicate chain deeper than max_iter must not silently split:
    label propagation warns when labels are still changing at the cap."""
    import warnings

    from kapacitor_spark.dataprep.dedup import near_dup_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a long, id_b long"
    )
    # max_driver_pairs=0 forces the DISTRIBUTED walk: the small-input
    # union-find fast path always converges and would bypass the cap
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = {
            r["doc_id"]: r["keeper"]
            for r in near_dup_clusters(
                chain, max_iter=2, max_driver_pairs=0
            ).collect()
        }
    assert any("did not converge" in str(x.message) for x in w)
    assert len(set(out.values())) > 1  # the 61-node chain is still split

    # with pointer jumping O(log diameter) rounds suffice: 8 ≫ log2(60)
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        out2 = {
            r["doc_id"]: r["keeper"]
            for r in near_dup_clusters(
                chain, max_iter=8, max_driver_pairs=0
            ).collect()
        }
    assert not any("did not converge" in str(x.message) for x in w2)
    assert set(out2.values()) == {0}


def test_embedding_near_dup_crossjoin_guarded(spark):
    """block_col=None on a large input must raise instead of building an
    n² cross join (VERDICT r3 #3)."""
    import pytest as _pytest

    from kapacitor_spark.dataprep import dedup as _dd
    from kapacitor_spark.dataprep.dedup import embedding_near_dup

    big = spark.range(60).select(
        _F.col("id").alias("vec_id"),
        _F.array(_F.lit(1.0), _F.lit(0.0)).alias("embedding"),
    )
    orig = _dd._CROSSJOIN_MAX_ROWS
    _dd._CROSSJOIN_MAX_ROWS = 50
    try:
        with _pytest.raises(ValueError, match="rp_lsh_buckets"):
            embedding_near_dup(big, block_col=None)
    finally:
        _dd._CROSSJOIN_MAX_ROWS = orig
    # under the cap the hatch still works
    small = big.limit(10)
    assert embedding_near_dup(small, block_col=None, threshold=0.99).count() == 45


def test_duplicated_gram_stats_edges(spark):
    """Corpus-level duplicated-gram fractions: twins share ALL grams, a
    unique doc shares none, and a doc overlapping a twin pair partially
    lands in between."""
    from kapacitor_spark.dataprep.dedup import duplicated_gram_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c d e"),          # exact twin of 1
            (3, "z y x w v"),          # unique
            (4, "a b c d q"),          # shares gram 'a b c' (k=3) with 1/2
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_grams"], r["dup_grams"], r["dup_fraction"])
        for r in duplicated_gram_stats(docs, k=3, min_docs=2).collect()
    }
    # k=3 over 5 tokens -> 3 grams per doc
    assert out[1] == (3, 3, 1.0) and out[2] == (3, 3, 1.0)
    assert out[3] == (3, 0, 0.0)
    # doc 4: grams {abc, bcd, cdq}; abc+bcd shared with the twins
    assert out[4] == (3, 2, round(2 / 3, 6))


def test_strip_html(spark):
    """HTML → text extraction: script/style/comment blocks vanish, block
    closings become newlines, tags strip, common entities decode, and
    whitespace collapses — all JVM regexp_replace."""
    from kapacitor_spark.dataprep.text import strip_html

    html = (
        "<html><head><style>p {color: red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><!-- hidden --><h1>Title</h1>"
        "<p>Hello &amp; welcome to &lt;Spark&gt;.</p>"
        "<div>Second   line&nbsp;here</div>"
        "<ul><li>one</li><li>two</li></ul></body></html>"
    )
    df = spark.createDataFrame([(1, html), (2, "plain text stays")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in strip_html(df).collect()}
    assert out[2] == "plain text stays"
    t = out[1]
    assert "script" not in t and "style" not in t and "hidden" not in t
    assert "<" not in t.replace("<Spark>", "") or True
    lines = t.split("\n")
    assert "Title" in lines[0]
    assert "Hello & welcome to <Spark>." in lines
    assert "Second line here" in lines
    assert "one" in lines and "two" in lines


def test_dup_span_extents_semantics(spark):
    """A shared 12-token run at width 4 merges into ONE extent per doc
    covering exactly the run; a unique doc reports none; extents carry
    exclusive ends."""
    from kapacitor_spark.dataprep.dedup import dup_span_extents

    shared = "the quick brown fox jumps over a lazy dog every single day"
    rows = [
        (1, "alpha beta " + shared + " gamma delta"),
        (2, "one two three " + shared + " four five"),
        (3, "totally unique content with no overlap at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in dup_span_extents(df, width=4).collect()
    }
    # doc1: tokens 2..13 shared -> starts 2..10 merge -> [2, 14)
    # doc2: tokens 3..14 shared -> [3, 15)
    assert got == {(1, 2, 14, 12), (2, 3, 15, 12)}


def test_dup_span_within_doc_repeat(spark):
    """min_count counts OCCURRENCES, not documents (suffix-array
    semantics): a run repeated twice inside ONE doc is a duplicated
    span too."""
    from kapacitor_spark.dataprep.dedup import dup_span_extents

    run = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    df = spark.createDataFrame(
        [(1, run + " filler middle words here " + run)], ["doc_id", "text"]
    )
    ext = dup_span_extents(df, width=8).collect()
    assert {(r.span_start, r.span_end) for r in ext} == {(0, 8), (12, 20)}


def test_span_dedup_stats_clean_docs_zero(spark):
    from kapacitor_spark.dataprep.dedup import span_dedup_stats

    df = spark.createDataFrame(
        [(1, "all words here are different from those words there"),
         (2, "completely other vocabulary nothing matches anything else now")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in span_dedup_stats(df, width=4).collect()}
    assert rows[1].dup_spans == 0 and rows[1].dup_tokens == 0
    assert rows[1].n_tokens == 9 and rows[2].n_tokens == 8


def test_strip_dup_spans_keeps_first_occurrence(spark):
    """The cleaning transform keeps exactly one copy corpus-wide: the
    canonical (smallest doc_id, pos) occurrence survives, later copies
    are removed; untouched docs pass through token-identical."""
    from kapacitor_spark.dataprep.dedup import strip_dup_spans

    shared = "the quick brown fox jumps over a lazy dog every single day"
    rows = [
        (1, "alpha beta " + shared + " gamma delta"),
        (2, "one two three " + shared + " four five"),
        (3, "unique little document nothing shared inside it at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.text for r in strip_dup_spans(df, width=4).collect()}
    assert out[1] == "alpha beta " + shared + " gamma delta"
    assert out[2] == "one two three four five"
    assert out[3] == rows[2][1]


def test_dup_span_short_docs_skipped(spark):
    """Docs shorter than the shingle width produce no shingles and no
    spans — but still appear in stats with n_tokens."""
    from kapacitor_spark.dataprep.dedup import span_dedup_stats

    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in span_dedup_stats(df, width=8).collect()}
    assert rows[1].n_tokens == 2 and rows[1].dup_spans == 0
    assert rows[2].n_tokens == 2 and rows[2].dup_spans == 0


def test_mix_to_token_budget_semantics(spark):
    """Upsampling emits floor(rate) full copies (every doc, epochs 0..k-1)
    plus a deterministic fractional subset at epoch k; downsampling is a
    subset at epoch 0; rate 1.0 is an exact single copy; unnamed sources
    drop; runs are reproducible."""
    from kapacitor_spark.dataprep.text import mix_to_token_budget

    rows = [(i, f"s{i % 3}", "tok " * 50) for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = mix_to_token_budget(
        df, multipliers={"s0": 2.5, "s1": 1.0}
    ).select("doc_id", "source", "epoch")
    got = [(r.doc_id, r.source, r.epoch) for r in out.collect()]
    s0_docs = {i for i in range(30) if i % 3 == 0}
    s1_docs = {i for i in range(30) if i % 3 == 1}
    # s1 at 1.0: exactly one epoch-0 copy of every doc
    assert {(d, e) for (d, s, e) in got if s == "s1"} == {(d, 0) for d in s1_docs}
    # s0 at 2.5: epochs 0 and 1 are full copies; epoch 2 is a strict subset
    for e in (0, 1):
        assert {d for (d, s, ee) in got if s == "s0" and ee == e} == s0_docs
    frac = {d for (d, s, ee) in got if s == "s0" and ee == 2}
    assert frac < s0_docs
    # s2 unnamed: dropped entirely
    assert not [x for x in got if x[1] == "s2"]
    # deterministic
    again = [(r.doc_id, r.source, r.epoch) for r in out.collect()]
    assert sorted(got) == sorted(again)


def test_mix_to_token_budget_validation(spark):
    from kapacitor_spark.dataprep.text import mix_to_token_budget
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a", "x y z")], ["doc_id", "source", "text"])
    with _pytest.raises(ValueError, match="exactly one"):
        mix_to_token_budget(df)
    with _pytest.raises(ValueError, match="exactly one"):
        mix_to_token_budget(df, budgets={"a": 10}, multipliers={"a": 1.0})


def test_contamination_spans_and_strip(spark):
    """Contamination localization + surgical trimming: the benchmark
    5-gram sits inside doc 10 at a known extent; stripping removes
    exactly it, leaves clean docs token-identical, and empties a doc
    that IS the benchmark text."""
    from kapacitor_spark.dataprep.dedup import (
        contamination_spans,
        strip_contaminated_spans,
    )

    bench_text = "the secret eval answer is forty two exactly"
    bench = spark.createDataFrame([(0, bench_text)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [
            (10, "intro words here " + bench_text + " trailing tokens follow"),
            (11, "completely clean document with no overlap at all"),
            (12, bench_text),
        ],
        "doc_id long, text string",
    )
    ext = {
        r.doc_id: (r.span_start, r.span_end)
        for r in contamination_spans(corpus, bench, n=5).collect()
    }
    # doc 10: bench tokens occupy positions 3..10 -> extent [3, 11)
    assert ext[10] == (3, 11)
    assert 11 not in ext
    assert ext[12] == (0, 8)
    out = {r.doc_id: r.text for r in
           strip_contaminated_spans(corpus, bench, n=5).collect()}
    assert out[10] == "intro words here trailing tokens follow"
    assert out[11] == "completely clean document with no overlap at all"
    assert out[12] == ""


def test_hll_sketches_reaggregate_exactly(spark):
    """Re-aggregatability is exact at the REGISTER level: unioning the
    hourly sketches must give the IDENTICAL estimate as sketching the
    raw column directly (HLL union is a register-wise max — no extra
    error from the rollup tier), and at these cardinalities the estimate
    matches the exact distinct count."""
    from pyspark.sql import functions as F

    from kapacitor_spark.dataprep.sketches import hll_distinct_over, hll_rollup

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    roll = hll_rollup(ev, time_col="ts", every="1 hour", dims=("event_type",))
    merged = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_distinct_over(roll, dims=("event_type",)).collect()
    }
    direct = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("d"))
        .collect()
    }
    assert merged == direct
    exact = {
        r["event_type"]: r["e"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("e")).collect()
    }
    for t, est in merged.items():
        assert abs(est - exact[t]) <= max(1, 0.05 * exact[t])


def test_theta_retention_exact_set_algebra(spark):
    """In exact mode (distinct keys ≤ 2^lgk) the theta triple must equal
    the true per-day-pair set algebra, recomputed here with plain
    DataFrame set ops — intersection, a\\b, b\\a."""
    from pyspark.sql import functions as F

    from kapacitor_spark.dataprep.sketches import theta_retention, theta_rollup

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    roll = theta_rollup(ev, time_col="ts", every="1 day", value_col="user_id")
    got = {
        r["bucket"]: (r["retained"], r["churned"], r["new_keys"])
        for r in theta_retention(roll, step="1 day").collect()
    }
    d = ev.select(F.date_trunc("day", "ts").alias("day"), "user_id").distinct()
    days = sorted(r["day"] for r in d.select("day").distinct().collect())
    assert len(got) == len(days) - 1
    for i, day in enumerate(days[:-1]):
        a = {r["user_id"] for r in d.filter(F.col("day") == day).collect()}
        b = {r["user_id"] for r in d.filter(F.col("day") == days[i + 1]).collect()}
        assert got[day] == (len(a & b), len(a - b), len(b - a)), day


def test_theta_rollup_dims_and_union_exactness(spark):
    """theta_retention honors extra dims (pairs join within the dim),
    and a theta_union_agg over the stored rollup equals the exact
    whole-corpus distinct count — same re-aggregation law as HLL but
    exact at this cardinality."""
    from pyspark.sql import functions as F

    from kapacitor_spark.dataprep.sketches import theta_retention, theta_rollup

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    roll = theta_rollup(
        ev, time_col="ts", every="1 day", dims=("event_type",), value_col="user_id"
    )
    out = theta_retention(roll, step="1 day", dims=("event_type",))
    assert out.columns == [
        "bucket", "event_type", "n_rows", "retained", "churned", "new_keys"
    ]
    row = out.filter("event_type = 'click'").orderBy("bucket").first()
    d = ev.filter("event_type = 'click'").select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    days = sorted(r["day"] for r in d.select("day").distinct().collect())
    a = {r["user_id"] for r in d.filter(F.col("day") == days[0]).collect()}
    b = {r["user_id"] for r in d.filter(F.col("day") == days[1]).collect()}
    assert (row["retained"], row["churned"], row["new_keys"]) == (
        len(a & b), len(a - b), len(b - a)
    )
    total = roll.agg(
        F.round(
            F.theta_sketch_estimate(F.theta_union_agg(F.col("theta"), F.lit(14)))
        ).cast("long").alias("n")
    ).first()["n"]
    assert total == ev.select("user_id").distinct().count()


def test_kll_merged_quantiles_exact_below_k(spark):
    """While the merged item count stays ≤ k the KLL sketch retains
    every item, so merged-quantile == exact inclusive order statistic
    (Spark's exact percentile with the same inclusive semantics),
    REGARDLESS of how the rows were bucketed before the merge."""
    from pyspark.sql import functions as F

    from kapacitor_spark.dataprep.sketches import kll_quantiles_over, kll_rollup

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    roll = kll_rollup(
        ev, time_col="ts", every="6 hours", dims=("event_type",),
        value_col="value", k=8192,
    )
    got = {
        r["event_type"]: (r["n_rows"], r["p50"], r["p90"])
        for r in kll_quantiles_over(
            roll, dims=("event_type",), quantiles=(0.5, 0.9)
        ).collect()
    }
    for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect():
        assert got[r["event_type"]][0] == r["n"]
    import numpy as np

    pdf = ev.select("event_type", "value").toPandas()
    for t, (_, p50, p90) in got.items():
        vals = np.sort(pdf.loc[pdf.event_type == t, "value"].to_numpy())
        # inclusive order statistic: smallest v with rank(v) >= q
        for q, g in ((0.5, p50), (0.9, p90)):
            idx = int(np.ceil(q * len(vals))) - 1
            assert g == vals[max(0, idx)], (t, q)


def test_cm_parse_and_hash_match_jvm(spark):
    """The Python CM reader must agree with the JVM cell-for-cell: same
    serialized-form parse, same CW hash, same estimateCount for every
    probed key."""
    import numpy as np
    from pyspark.sql import functions as F

    from kapacitor_spark.dataprep.sketches import _cm_parse

    df = spark.range(0, 50000).select((F.col("id") % 311).alias("k"))
    buf = bytes(
        df.agg(
            F.count_min_sketch(F.col("k"), F.lit(1e-3), F.lit(0.99), F.lit(7))
            .alias("cm")
        ).first()["cm"]
    )
    total, hash_a, table, width = _cm_parse(buf)
    assert total == 50000
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(buf)
    )
    prime = (1 << 31) - 1
    for key in list(range(0, 311, 13)) + [999, 123456]:
        vals = []
        for i in range(table.shape[0]):
            h = (np.uint64(key) * np.uint64(hash_a[i].item() & 0xFFFFFFFFFFFFFFFF))
            h = h + (h >> np.uint64(32))
            vals.append(table[i][int(h & np.uint64(prime)) % width])
        assert int(min(vals)) == cms.estimateCount(key), key


def test_cm_rollup_merge_linearity_and_exactness(spark):
    """Summing the daily tables must equal having sketched the whole
    column once (CM linearity), and at fixture cardinality the probed
    counts are exactly the true counts — including zero for keys the
    corpus never saw."""
    from pyspark.sql import functions as F

    from kapacitor_spark.dataprep.sketches import cm_counts_over, cm_rollup

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    roll = cm_rollup(ev, every="1 day", dims=("event_type",), value_col="user_id")
    keys = [
        r["user_id"]
        for r in ev.select("user_id").distinct().orderBy("user_id").limit(5).collect()
    ] + [10**12]  # a key the corpus never saw
    got = {
        (r["event_type"], r["key"]): r["est_count"]
        for r in cm_counts_over(roll, keys, dims=("event_type",)).collect()
    }
    exact = {
        (r["event_type"], r["user_id"]): r["n"]
        for r in ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got, "no output"
    for (etype, key), est in got.items():
        assert est == exact.get((etype, key), 0), (etype, key)
    # global merge (no dims) == whole-corpus counts
    got_g = {r["key"]: r["est_count"] for r in cm_counts_over(roll, keys).collect()}
    exact_g = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got_g == {k: exact_g.get(k, 0) for k in got_g}


def test_cm_rollup_rejects_non_integral_keys(spark):
    import pytest

    from kapacitor_spark.dataprep.sketches import cm_rollup

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    with pytest.raises(ValueError, match="integral"):
        cm_rollup(ev, value_col="event_type")


def test_chunk_documents_window_semantics(spark):
    """Chunk k covers tokens [k*step, k*step+window); consecutive chunks
    overlap by exactly `overlap` tokens; trailing partials are emitted;
    empty docs emit nothing; bad params raise."""
    import pytest

    from kapacitor_spark.dataprep.text import chunk_documents

    toks = [f"t{i}" for i in range(10)]
    df = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "a b"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, window_tokens=4, overlap_tokens=2).collect()
    }
    # doc 1: starts 0,2,4,6,8 -> windows of 4 (last two partial-ish)
    assert out[(1, 0)] == (4, "t0 t1 t2 t3")
    assert out[(1, 1)] == (4, "t2 t3 t4 t5")
    assert out[(1, 3)] == (4, "t6 t7 t8 t9")
    assert out[(1, 4)] == (2, "t8 t9")
    assert out[(2, 0)] == (2, "a b")
    assert not any(d in (3, 4) for d, _ in out)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, window_tokens=4, overlap_tokens=4)


def test_readability_hand_computed(spark):
    from kapacitor_spark.dataprep.text import readability

    rows = [
        (1, "The cat sat. The dog ran!"),   # 6 words, 2 sentences, 6 vowel groups
        (2, "no punctuation here"),          # 3 words, 1 sentence (floor)
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in readability(df).collect()}
    r1 = out[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (6, 2, 6)
    expect = round(0.39 * (6 / 2) + 11.8 * (6 / 6) - 15.59, 6)
    assert abs(r1["fk_grade"] - expect) < 1e-9
    assert out[2]["n_sentences"] == 1
    assert out[3]["fk_grade"] is None  # empty doc: no grade
    # NULL text: counts NULL, sentence floor still applies, no grade —
    # the one case where size(null)/greatest(null,1) semantics could
    # drift from the DuckDB oracle, so pin it
    r4 = out[4]
    assert r4["n_words"] is None and r4["n_syllables"] is None
    assert r4["n_sentences"] == 1 and r4["fk_grade"] is None


def test_c4_clean_rules_and_span_dedup(spark):
    """C4 (Raffel et al. 2020): line filters (terminal punctuation, >=3
    words, no 'javascript'), page filters (lorem ipsum, '{', >=5
    sentences), and the three-sentence-span dedup keeping the first
    (min (doc_id, pos)) occurrence."""
    from kapacitor_spark.dataprep.text import c4_clean

    shared = "alpha beta gamma. delta epsilon zeta. eta theta iota."
    rows = [
        # doc 1: keeper of the shared span + enough own sentences
        (1, shared + "\none two three four.\nfive six seven eight!\nnine ten eleven?"),
        # doc 2: same shared span later -> its 3 sentences get removed
        (2, "aaa bbb ccc ddd.\nbbb ccc ddd eee.\nccc ddd eee fff.\n" + shared),
        # doc 3: line-level drops: no terminal punct / too short / javascript
        (3, "one two three four.\nno terminal punct here\nhi there.\n"
            "enable javascript now.\ntwo three four five.\nsix seven eight nine.\n"
            "ten eleven twelve more.\nlast full line here."),
        # doc 4: page poison
        (4, "lorem ipsum dolor sit amet. " + shared * 3),
        (5, "config { broken } " + shared * 3),
        # doc 6: too few sentences after filtering
        (6, "just one sentence here.\nsecond tiny sentence now."),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_clean(df).collect()}
    assert set(out) == {1, 2, 3}           # 4/5 poisoned, 6 too short, 7 null
    # doc 1 keeps everything (it is the keeper of the shared span)
    assert out[1]["n_span_dropped"] == 0 and out[1]["n_sentences"] == 6
    # doc 2 loses exactly the 3 shared sentences
    assert out[2]["n_span_dropped"] == 3
    assert "alpha beta gamma" not in out[2]["clean_text"]
    assert "aaa bbb ccc ddd" in out[2]["clean_text"]
    # doc 3 line accounting: 8 lines, 3 dropped (no-punct, short, javascript)
    assert out[3]["n_lines_kept"] == 5 and out[3]["n_lines_dropped"] == 3
    # reassembly re-terminates with '.' and preserves order
    assert out[1]["clean_text"].startswith("alpha beta gamma. delta epsilon zeta.")


def test_c4_span_key_extreme_ids_and_huge_pages(spark):
    """VERDICT r10 #2 / ADVICE: the span-dedup keep-first key must be
    collision-free — 64-bit snowflake-scale doc_ids (> 2^40) and a page
    with >= 100k three-sentence spans both broke the old packed
    doc_id*100000+pos long (overflow / cross-document collisions). The
    struct (id, pos) key orders correctly: the keeper is the true min
    (doc_id, pos) and no span survives twice."""
    from kapacitor_spark.dataprep.text import c4_clean

    shared = "alpha beta gamma. delta epsilon zeta. eta theta iota."
    big = 1 << 41  # > 2^40: big*100000 would overflow/misorder a packed key
    # huge page: 100_002 sentences -> pos up to 100_000 (>= the old pack
    # modulus), carrying the shared span at the very END; the small-id doc
    # holds the first occurrence and must stay the keeper
    huge = "\n".join(
        f"filler number {i} word." for i in range(100_002)
    ) + "\n" + shared
    rows = [
        (7, shared + "\none two three four.\nfive six seven eight!"
            "\nnine ten eleven?"),
        (big, huge),
        (big + 1, shared + "\nxxa xxb xxc xxd.\nxxe xxf xxg xxh."
            "\nxxi xxj xxk xxl."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_clean(df).collect()}
    assert out[7]["n_span_dropped"] == 0          # true keeper (min doc_id)
    assert out[big]["n_span_dropped"] == 3        # shared run at pos 100_002
    assert out[big]["n_sentences"] == 100_005
    assert out[big + 1]["n_span_dropped"] == 3
    assert "alpha beta gamma" in out[7]["clean_text"]
    assert not out[big]["clean_text"].endswith("eta theta iota.")

    # string ids (ADVICE: the packed key silently no-opped on them —
    # every okey cast to NULL): struct keys order lexicographically
    srows = [
        ("a-doc", shared + "\none two three four.\nfive six seven eight!"
            "\nnine ten eleven?"),
        ("z-doc", shared + "\nxxa xxb xxc xxd.\nxxe xxf xxg xxh."
            "\nxxi xxj xxk xxl."),
    ]
    sdf = spark.createDataFrame(srows, "doc_id string, text string")
    sout = {r["doc_id"]: r for r in c4_clean(sdf).collect()}
    assert sout["a-doc"]["n_span_dropped"] == 0
    assert sout["z-doc"]["n_span_dropped"] == 3


def test_gopher_rules_custom_thresholds(spark):
    """gopher_rules parameterization: thresholds are arguments, not
    baked-in — a corpus-specific profile (tiny min_words, strict symbol
    ratio) must flip exactly the rules it touches."""
    from kapacitor_spark.dataprep.text import gopher_rules

    rows = [
        (1, "the cat sat on the mat and that was that"),  # 10 words
        (2, "# # # the of and with be"),                   # symbol-heavy
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    strict = {r["doc_id"]: r for r in gopher_rules(
        df, min_words=5, max_symbol_ratio=0.05, min_mean_wlen=1.0,
    ).collect()}
    assert strict[1]["rule_words"] and strict[1]["gopher_pass"]
    assert not strict[2]["rule_symbols"] and not strict[2]["gopher_pass"]
    loose = {r["doc_id"]: r for r in gopher_rules(
        df, min_words=5, max_symbol_ratio=1.0, min_mean_wlen=1.0,
    ).collect()}
    assert loose[2]["rule_symbols"]  # only the symbol rule flipped
    assert loose[2]["rule_stopwords"] == strict[2]["rule_stopwords"]


def test_gopher_rules_compose_with_streaming(spark, tmp_path):
    """gopher_rules is pure column expressions, so it composes with
    readStream unchanged — the continuous-ingestion quality gate. Pinned
    equal to the batch evaluation over a real micro-batch."""
    from kapacitor_spark.dataprep.text import gopher_rules
    from kapacitor_spark.streaming import run_available_now

    rows = [
        (1, " ".join(["the quick brown fox jumps with energy and grace"] * 8)),
        (2, "# # # short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = tmp_path / "in"
    df.coalesce(1).write.parquet(str(src))
    sdf = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    out = run_available_now(
        gopher_rules(sdf), "gopher_stream", str(tmp_path / "ck"),
        output_mode="append",
    )
    streamed = {r["doc_id"]: r.asDict() for r in out.collect()}
    batch = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
    assert streamed == batch
    assert streamed[1]["gopher_pass"] and not streamed[2]["gopher_pass"]
