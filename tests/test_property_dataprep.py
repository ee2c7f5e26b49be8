"""Property-based tests for the dataprep algorithms: hypothesis generates
random small corpora / pair sets and the Spark implementations must agree
with independent pure-Python references (a dict-based gram counter, a
union-find). This is the fuzz layer over the operators whose scored
oracles only see the fixed testdata distributions.

Cases are batched per Spark job (one createDataFrame per example would
dominate runtime), so each @given example runs the REAL distributed code.
"""

import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_token = st.sampled_from(["a", "b", "c", "dog", "cat", "x1"])
_doc = st.lists(_token, min_size=0, max_size=12).map(" ".join)


def _py_dup_gram_stats(texts, k, min_docs):
    """Independent reference: dict-of-sets gram counting."""
    import collections

    def grams(t):
        toks = t.strip().lower().split()
        if not toks or toks == [""]:
            toks = [""]
        n = len(toks)
        out = set()
        for i in range(max(n - k, 0) + 1):
            out.add(tuple(toks[i : i + k]))
        return out

    per_doc = {i: grams(t) for i, t in enumerate(texts)}
    df_count = collections.Counter()
    for gs in per_doc.values():
        for g in gs:
            df_count[g] += 1
    res = {}
    for i, gs in per_doc.items():
        dup = sum(1 for g in gs if df_count[g] >= min_docs)
        res[i] = (len(gs), dup)
    return res


@settings(**_SETTINGS)
@given(st.lists(_doc, min_size=1, max_size=10), st.integers(1, 4))
def test_duplicated_gram_stats_matches_python_reference(spark, texts, k):
    from kapacitor_spark.dataprep.dedup import duplicated_gram_stats

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["dup_grams"])
        for r in duplicated_gram_stats(df, k=k, min_docs=2).collect()
    }
    # whitespace-split of "" yields [""] both sides (one empty token)
    exp = _py_dup_gram_stats(texts, k, 2)
    assert got == exp


def _py_components(pairs):
    """Independent reference: union-find with path compression."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    return {x: find(x) for x in parent}


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=25,
    )
)
def test_near_dup_clusters_matches_union_find(spark, pairs):
    """BOTH paths — the guarded driver union-find fast path (default for
    small inputs) and the distributed pointer-jumping walk (forced via
    max_driver_pairs=0) — must equal the independent reference."""
    from kapacitor_spark.dataprep.dedup import near_dup_clusters

    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    expected = _py_components(pairs)
    got_fast = {
        r["doc_id"]: r["keeper"] for r in near_dup_clusters(df).collect()
    }
    assert got_fast == expected
    got_dist = {
        r["doc_id"]: r["keeper"]
        for r in near_dup_clusters(df, max_driver_pairs=0).collect()
    }
    assert got_dist == expected


@settings(**_SETTINGS)
@given(st.lists(_doc, min_size=1, max_size=8), st.lists(_doc, min_size=1, max_size=3))
def test_decontaminate_matches_python_reference(spark, corpus, bench):
    from kapacitor_spark.dataprep.dedup import decontaminate

    k = 3

    def grams(t):
        toks = t.strip().lower().split() or [""]
        n = len(toks)
        return {tuple(toks[i : i + k]) for i in range(max(n - k, 0) + 1)}

    bench_grams = set().union(*[grams(t) for t in bench])
    exp_kept = sorted(
        i for i, t in enumerate(corpus) if not (grams(t) & bench_grams)
    )
    cdf = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
    bdf = spark.createDataFrame(list(enumerate(bench)), "doc_id long, text string")
    got = sorted(r["doc_id"] for r in decontaminate(cdf, bdf, n=k).collect())
    assert got == exp_kept


# ------------------------------------------------------------------ #
# codec round-trip fuzz (pure python — no Spark session needed)
# ------------------------------------------------------------------ #


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 12), st.integers(1, 12),
    st.sampled_from([1, 2, 3, 4]), st.integers(0, 2**32 - 1),
)
def test_png_roundtrip_fuzz(w, h, ch, seed):
    import numpy as np

    from kapacitor_spark.dataprep import imagecodec as ic

    rng = np.random.RandomState(seed % (2**31))
    pixels = rng.randint(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
    data = ic.encode_png(w, h, pixels, channels=ch)
    assert ic.parse_header(data) == ("png", w, h)
    assert ic.decode(data) == (w, h, ch, pixels)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**32 - 1))
def test_bmp_roundtrip_fuzz(w, h, seed):
    import numpy as np

    from kapacitor_spark.dataprep import imagecodec as ic

    rng = np.random.RandomState(seed % (2**31))
    pixels = rng.randint(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    data = ic.encode_bmp(w, h, pixels)
    assert ic.decode(data) == (w, h, 3, pixels)


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 64), st.sampled_from([1, 2]), st.integers(0, 2**32 - 1))
def test_wav_roundtrip_fuzz(n_frames, channels, seed):
    import numpy as np

    from kapacitor_spark.dataprep import audiocodec as ac

    rng = np.random.RandomState(seed % (2**31))
    s = rng.uniform(-1, 1, size=(n_frames, channels))
    data = ac.encode_wav(s, 8000)
    ch, rate, bits, nf, fmt = ac.parse_wav_header(data)
    assert (ch, rate, nf) == (channels, 8000, n_frames)
    _, _, out = ac.decode_wav(data)
    assert out.shape == s.shape
    assert np.abs(out - s).max() < 1.0 / 10000


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 10), st.integers(1, 10), st.sampled_from([1, 3]),
    st.integers(1, 10), st.integers(1, 10), st.integers(0, 2**32 - 1),
)
def test_resize_nearest_fuzz(w, h, ch, nw, nh, seed):
    """Nearest resize picks only EXISTING pixel values, preserves the
    corner pixel, and always produces exactly nw*nh*ch bytes."""
    import numpy as np

    from kapacitor_spark.dataprep import imagecodec as ic

    rng = np.random.RandomState(seed % (2**31))
    pixels = rng.randint(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
    out = ic.resize_nearest(pixels, w, h, ch, nw, nh)
    assert len(out) == nw * nh * ch
    src = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, ch)
    dst = np.frombuffer(out, dtype=np.uint8).reshape(nh, nw, ch)
    assert (dst[0, 0] == src[0, 0]).all()
    # every output pixel vector exists somewhere in the source
    src_set = {bytes(px) for row in src for px in row}
    assert all(bytes(px) in src_set for row in dst for px in row)


def _py_span_machine(texts, width, keep_first=False):
    """Independent reference for span dedup: dict of shingle-tuple →
    occurrence list, then interval union per doc."""
    import collections

    toks = {i: t.strip().lower().split() for i, t in enumerate(texts)}
    occ = collections.defaultdict(list)
    for i, ts in toks.items():
        for p in range(len(ts) - width + 1):
            occ[tuple(ts[p: p + width])].append((i, p))
    dup_pos = collections.defaultdict(set)
    for sh, positions in occ.items():
        if len(positions) < 2:
            continue
        keep = sorted(positions)[0] if keep_first else None
        for (i, p) in positions:
            if keep_first and (i, p) == keep:
                continue
            dup_pos[i].add(p)
    res = {}
    for i, ts in toks.items():
        covered = set()
        for p in dup_pos.get(i, ()):  # union of [p, p+width)
            covered.update(range(p, p + width))
        # merged extents = runs of consecutive covered positions
        spans = 0
        prev = None
        for c in sorted(covered):
            if prev is None or c > prev + 1:
                spans += 1
            prev = c
        res[i] = (len(ts), spans, len(covered), covered)
    return res


@settings(**_SETTINGS)
@given(st.lists(_doc, min_size=1, max_size=8), st.integers(2, 4))
def test_span_dedup_stats_matches_python_reference(spark, texts, width):
    from kapacitor_spark.dataprep.dedup import span_dedup_stats

    texts = [t for t in texts if t.strip()]
    if not texts:
        return
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_spans"], r["dup_tokens"])
        for r in span_dedup_stats(df, width=width).collect()
    }
    ref = _py_span_machine(texts, width)
    exp = {i: (n, s, c) for i, (n, s, c, _) in ref.items()}
    assert got == exp


@settings(**_SETTINGS)
@given(st.lists(_doc, min_size=1, max_size=8), st.integers(2, 4))
def test_strip_dup_spans_matches_python_reference(spark, texts, width):
    from kapacitor_spark.dataprep.dedup import strip_dup_spans

    texts = [t for t in texts if t.strip()]
    if not texts:
        return
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r["text"] for r in strip_dup_spans(df, width=width).collect()}
    ref = _py_span_machine(texts, width, keep_first=True)
    for i, t in enumerate(texts):
        toks = t.strip().lower().split()
        covered = ref[i][3]
        exp = " ".join(tok for p, tok in enumerate(toks) if p not in covered)
        assert got[i] == exp, (i, t)


@settings(**_SETTINGS)
@given(st.lists(_doc, min_size=1, max_size=8))
def test_simhash_packing_matches_python_reference(spark, texts):
    """The r6 fold+branch-free packing must equal a straight-Python
    simhash computed from the SAME per-token hashes (fetched via a plain
    Spark projection — the packing, lane arithmetic, and sign logic are
    re-derived independently, only xxhash64 itself is shared)."""
    from kapacitor_spark.dataprep.dedup import simhash

    texts = [t for t in texts if t.strip()]
    if not texts:
        return
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    hashes = {
        r["doc_id"]: list(r["hs"])
        for r in df.selectExpr(
            "doc_id",
            "transform(array_distinct(split(lower(trim(text)), '\\\\s+')),"
            " t -> xxhash64(t)) AS hs",
        ).collect()
    }
    got = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    for i, hs in hashes.items():
        n = len(hs)
        sig = 0
        for j in range(64):
            pop = sum((h >> j) & 1 for h in hs)
            if 2 * pop > n:
                sig |= 1 << j
        if sig >= 1 << 63:
            sig -= 1 << 64  # Spark longs are signed
        assert got[i] == sig, (i, n)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    seed=st.integers(0, 10_000),
    gain_num=st.integers(1, 40),
    offset=st.integers(-50, 50),
)
def test_dhash_perceptual_invariances(spark, seed, gain_num, offset):
    """The property that makes the hashes 'perceptual': image dHash is
    invariant under brightness scaling AND offset (both preserve every
    gradient comparison); audio envelope dHash is invariant under any
    positive gain. Re-derived against an independent pure-Python hash of
    the same arrays."""
    import random

    from kapacitor_spark.dataprep.multimodal import audio_dhash_expr, dhash_expr

    rng = random.Random(seed)
    gain = gain_num / 8.0
    pix = [rng.random() for _ in range(72)]
    pix_t = [p * gain + offset / 100.0 for p in pix]
    smp = [rng.uniform(-1, 1) for _ in range(130)]
    smp_g = [s * gain for s in smp]
    df = spark.createDataFrame(
        [(1, pix, smp), (2, pix_t, smp_g)],
        "doc_id long, pixels array<double>, samples array<double>",
    )
    rows = {
        r["doc_id"]: (r["ih"], r["ah"])
        for r in df.select(
            "doc_id",
            dhash_expr("pixels", 9, 8).alias("ih"),
            audio_dhash_expr("samples", 2).alias("ah"),
        ).collect()
    }
    assert rows[1] == rows[2]
    # and the Spark expression equals an independent Python re-derivation
    isig = 0
    for j in range(64):
        r, c = j // 8, j % 8
        if pix[r * 9 + c + 1] > pix[r * 9 + c]:
            isig |= 1 << j
    asig = 0
    bk = [abs(smp[2 * i]) + abs(smp[2 * i + 1]) for i in range(65)]
    for j in range(64):
        if bk[j + 1] > bk[j]:
            asig |= 1 << j
    for sig, got in ((isig, rows[1][0]), (asig, rows[1][1])):
        if sig >= 1 << 63:
            sig -= 1 << 64
        assert got == sig


def _brute_simhash_pairs(sig_rows, max_hamming):
    """Independent all-pairs Hamming reference over collected signatures."""
    out = set()
    for i in range(len(sig_rows)):
        for j in range(i + 1, len(sig_rows)):
            (ia, ha), (ib, hb) = sig_rows[i], sig_rows[j]
            d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
            if d <= max_hamming:
                a, b = (ia, ib) if ia < ib else (ib, ia)
                out.add((a, b, d))
    return out


def test_simhash_identical_class_candidates_linear(spark):
    """The r9 identical-signature collapse: planting 10k IDENTICAL docs
    must keep the pair machinery linear. Pre-collapse, the band self-join
    pushed C(10k,2) ≈ 50M candidate rows through the join + distinct; the
    collapsed path bands ONE representative per distinct signature, so the
    non-expanded output is exactly the (m-1)-edge member→representative
    star — O(m) — and clustering over it recovers the single class."""
    from kapacitor_spark.dataprep.dedup import near_dup_clusters, simhash_near_dup

    m = 10_000
    rows = [(i, "the same boilerplate text every time") for i in range(m)]
    rows += [(m + i, f"unique filler document number {i} {'z' * (i + 1)}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = simhash_near_dup(df, max_hamming=3, expand_identical=False)
    got = pairs.collect()
    star = [r for r in got if r["hamming"] == 0 and r["id_a"] == 0]
    # linear, not quadratic: the identical class contributes exactly m-1
    # star edges rooted at the min-id representative
    assert len(star) == m - 1
    assert len(got) < m + 30  # + any cross-class representative pairs
    assert sorted(r["id_b"] for r in star) == list(range(1, m))
    clusters = near_dup_clusters(
        pairs.sparkSession.createDataFrame(got, pairs.schema)
    ).collect()
    keepers = {r["doc_id"]: r["keeper"] for r in clusters}
    assert all(keepers[i] == 0 for i in range(m))


@settings(**_SETTINGS)
@given(
    st.lists(_doc.filter(lambda t: t.strip()), min_size=1, max_size=8),
    st.integers(2, 6),
    st.integers(0, 4),
)
def test_simhash_collapse_exactness(spark, texts, dup_class, k):
    """Property: with duplicate classes planted, (a) expand_identical=True
    equals an independent brute-force all-pairs Hamming scan EXACTLY —
    the collapse+expansion is semantics-preserving — and (b) clusters over
    the expand_identical=False star/representative edges equal clusters
    over the exact pairs."""
    from kapacitor_spark.dataprep.dedup import (
        near_dup_clusters,
        simhash,
        simhash_near_dup,
    )

    # duplicate the first doc dup_class times so an identical class exists
    rows = list(enumerate(texts)) + [
        (100 + i, texts[0]) for i in range(dup_class)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = simhash(df).persist()
    sig_rows = [(r["doc_id"], r["simhash"]) for r in sig.collect()]
    want = _brute_simhash_pairs(sig_rows, k)
    exact = simhash_near_dup(df, max_hamming=k, sig_df=sig)
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in exact.collect()}
    assert got == want
    collapsed = simhash_near_dup(df, max_hamming=k, sig_df=sig, expand_identical=False)
    if want:
        ce = near_dup_clusters(collapsed)
        ee = near_dup_clusters(exact)
        cm = {r["doc_id"]: r["keeper"] for r in ce.collect()}
        em = {r["doc_id"]: r["keeper"] for r in ee.collect()}
        # star-only nodes (identical-class members) appear in cm even when
        # their class has no cross-class edge; restrict to shared nodes
        assert all(cm[n] == em[n] for n in em)
    sig.unpersist()


def test_simhash_filters_null_and_empty_text(spark):
    """simhash() must drop null/empty/whitespace-only docs (the minhash
    convention, dedup.py:190): 'no content' would otherwise hash to one
    shared constant signature — a meaningless giant identical class."""
    from kapacitor_spark.dataprep.dedup import simhash

    df = spark.createDataFrame(
        [(1, "real content here"), (2, None), (3, ""), (4, "   \t ")],
        "doc_id long, text string",
    )
    got = [r["doc_id"] for r in simhash(df).collect()]
    assert got == [1]


@settings(**_SETTINGS)
@given(
    st.lists(_doc.filter(lambda t: t.strip()), min_size=2, max_size=6),
    st.integers(2, 5),
)
def test_minhash_identical_text_collapse_equivalence(spark, texts, dup_class):
    """minhash collapse_identical=True must produce the IDENTICAL pair
    set as the default per-doc pipeline — identical text gives identical
    shingle sets, so banding outcomes and Jaccard values are
    text-class-invariant — and the star form's clusters must equal the
    exact form's."""
    from kapacitor_spark.dataprep.dedup import minhash_near_dup, near_dup_clusters

    rows = list(enumerate(texts)) + [(100 + i, texts[0]) for i in range(dup_class)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plain = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_near_dup(df, threshold=0.3).collect()
    }
    collapsed = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_near_dup(df, threshold=0.3, collapse_identical=True).collect()
    }
    assert collapsed == plain
    if plain:
        star = minhash_near_dup(
            df, threshold=0.3, collapse_identical=True, expand_identical=False
        )
        cm = {r["doc_id"]: r["keeper"]
              for r in near_dup_clusters(star).collect()}
        em_src = spark.createDataFrame(
            [(a, b) for a, b, _ in plain], "id_a long, id_b long"
        )
        em = {r["doc_id"]: r["keeper"] for r in near_dup_clusters(em_src).collect()}
        assert all(cm[n] == em[n] for n in em)


def test_mg_rollup_exact_regime_and_bounds(spark):
    """Misra-Gries heavy hitters: with k >= distinct keys the merged
    summary IS the exact count table (err 0); with a tiny k every
    reported count is an undercount by at most the recorded err, and
    every key whose true count exceeds the summed err survives."""
    import datetime

    from kapacitor_spark.dataprep.sketches import mg_rollup, mg_topn_over

    rows = []
    t0 = datetime.datetime(2026, 1, 1)
    # skewed: keys 1,2 dominate everywhere; keys 3 and 4 swap places at
    # day 2 so each is RETAINED in some buckets and DROPPED (below the
    # k=3 cut) in others — exercising the per-key undercount bound
    for day in range(4):
        plan = (
            ((1, 50), (2, 30), (3, 10), (4, 5), (100 + day, 1))
            if day < 2
            else ((1, 50), (2, 30), (4, 20), (3, 2), (100 + day, 1))
        )
        for key, reps in plan:
            for r in range(reps):
                rows.append((t0 + datetime.timedelta(days=day, seconds=r), int(key)))
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    truth = {}
    for _, k_ in rows:
        truth[k_] = truth.get(k_, 0) + 1

    # exact regime
    roll = mg_rollup(df, every="1 day", k=64)
    top = mg_topn_over(roll, n=100).collect()
    got = {r["key"]: r["est_count"] for r in top}
    assert all(r["max_undercount"] == 0 for r in top)
    assert got == truth
    # deterministic ordering: count desc, key asc
    ranked = [(r["rank"], r["key"]) for r in sorted(top, key=lambda r: r["rank"])]
    expect = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [k for _, k in ranked] == [k for k, _ in expect]

    # estimation regime: k=3 per bucket — the bound is PER KEY (sum of
    # errs of only the summaries the key is absent from; present-bucket
    # counts are restored exactly because rollup summaries are one-shot
    # compressions of exact count tables)
    roll3 = mg_rollup(df, every="1 day", k=3)
    top3 = mg_topn_over(roll3, n=100).collect()
    est = {r["key"]: r["est_count"] for r in top3}
    und = {r["key"]: r["max_undercount"] for r in top3}
    assert any(u > 0 for u in und.values())
    for k_, c in est.items():
        assert c <= truth[k_]  # never overcounts
        assert truth[k_] - c <= und[k_]  # within the per-key bound
    # the dominant keys survive compression in every bucket, so their
    # counts are EXACT and their undercount bound is zero
    assert 1 in est and 2 in est
    assert est[1] == truth[1] and und[1] == 0
    assert est[2] == truth[2] and und[2] == 0
    # keys retained in only SOME buckets carry exactly the errs of the
    # buckets they were dropped from — nonzero, and tight here because
    # their dropped-bucket counts sit at/below the subtracted threshold
    assert und[3] > 0 and und[4] > 0
    assert est[3] < truth[3] and truth[3] - est[3] <= und[3]
    assert est[4] < truth[4] and truth[4] - est[4] <= und[4]


def test_mg_topn_over_foreign_summaries_get_no_restoration(spark):
    """ADVICE r10: the +err count restoration is gated on mg_rollup's
    one_shot marker — a structurally identical summary WITHOUT it
    (externally produced / re-merged) keeps its stored counts and
    carries the full err as per-key uncertainty, so est_count can never
    silently overcount."""
    import datetime

    from kapacitor_spark.dataprep.sketches import mg_topn_over

    t0 = datetime.datetime(2026, 1, 1)
    mk = "bucket timestamp, n_rows long, " \
         "mg struct<keys: array<long>, counts: array<long>, err: long, " \
         "one_shot: boolean>"
    summary = {"keys": [1, 2], "counts": [10, 5], "err": 3}
    marked = spark.createDataFrame(
        [(t0, 18, {**summary, "one_shot": True})], mk
    )
    foreign = spark.createDataFrame(
        [(t0, 18, {**summary, "one_shot": None})], mk
    )
    got_m = {r["key"]: r for r in mg_topn_over(marked, n=10).collect()}
    got_f = {r["key"]: r for r in mg_topn_over(foreign, n=10).collect()}
    # marked: stored+err restored, present key's bound is 0
    assert got_m[1]["est_count"] == 13 and got_m[1]["max_undercount"] == 0
    # foreign: stored counts untouched, full err as uncertainty
    assert got_f[1]["est_count"] == 10 and got_f[1]["max_undercount"] == 3
    assert got_f[2]["est_count"] == 5


def test_mg_rollup_rejects_non_integral_keys(spark):
    from kapacitor_spark.dataprep.sketches import mg_rollup

    df = spark.createDataFrame([("2026-01-01 00:00:00", "s")],
                               "ts string, user_id string").selectExpr(
        "CAST(ts AS TIMESTAMP) ts", "user_id")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="integral"):
        mg_rollup(df)
