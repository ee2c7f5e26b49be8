"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"): score
every document of a raw corpus by how much more likely its n-gram bag is
under a TARGET (trusted) corpus' bag-of-features model than under the
raw corpus' own — the published recipe for selecting pretraining data
that matches a high-quality distribution (Wikipedia/books target) from
a web-scale crawl.

Method, exactly as published: features are word unigrams+bigrams; both
corpora fit multinomial bag models over the feature space; the
importance weight of a document is

    log w(d) = sum_f c_d(f) * [ log p_target(f) - log p_raw(f) ]

and selection keeps the top-k by weight (the paper adds Gumbel noise to
the log weights for a proper resample; ``gumbel_beta`` exposes that —
deterministic seeded noise — while the default is the noiseless top-k,
which is the paper's "top-k heuristic" baseline).

Spark shape, sized for 100 TB:

- feature extraction is a projection + one explode riding the scan
  (shared ``tokenize`` normalization; grams built with the two-step
  materialization that avoids the higher-order-lambda O(tokens²) trap);
- each model is ONE map-side-combined count aggregate;
- ``n_buckets`` (the paper's hashed n-gram mode, default 65536 buckets
  ≈ its 10k) folds features through xxhash64 pmod B so the model tables
  are FIXED-SIZE regardless of corpus vocabulary — at 100 TB the two
  models are kilobyte-scale and BROADCAST into the scoring join, so the
  corpus-size gram stream never shuffles: the whole scorer is scan →
  broadcast join → per-doc partial aggregate. ``n_buckets=None`` keeps
  exact gram-string features (model tables scale with vocabulary; the
  scoring join becomes a shuffle join) — the SQL-oracle-able mode the
  registry fixture uses, and the semantics the hashed mode approximates.
- determinism: add-alpha smoothing over the UNION feature space; the
  per-occurrence log-ratio rounds to 9 decimals and sums as
  DECIMAL(38,9) (aggregation-order independent — the bm25/lm trick).

Smoothing: p(f) = (c(f) + alpha) / (total + alpha * V) with V = number
of distinct features across BOTH corpora (or exactly B in hashed mode).
Every scored document's features exist in the raw model by construction
(the raw corpus contains the document), so the scoring join is complete.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kapacitor_spark.dataprep.dedup import nonempty_tokens

__all__ = ["dsir_features", "dsir_weights", "dsir_select", "dsir_artifact", "dsir_score_stream"]


def _gram_array(toks_col: "F.Column") -> "F.Column":
    """Unigram + bigram array per row (the paper's feature set) from an
    already-materialized token-array column — shared by the exploded
    batch form and the per-row streaming scorer."""
    t = toks_col
    n = F.size(t)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i), F.element_at(t, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(t, bigrams)


def dsir_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str | None = "doc_id",
    n_buckets: int | None = 65536,
) -> DataFrame:
    """One row per feature OCCURRENCE: ``(id, feature)`` — word unigrams
    + bigrams (the paper's feature set), optionally hashed to
    ``n_buckets`` (feature becomes a LONG bucket id; None keeps the gram
    string). ``id_col=None`` emits the bare feature stream — for model
    building (dsir_artifact), which needs no document identity at all."""
    ids = [] if id_col is None else [F.col(id_col)]
    base = df.select(*ids, nonempty_tokens(text_col).alias("__toks"))
    feats = base.select(
        *ids, F.explode(_gram_array(F.col("__toks"))).alias("feature")
    )
    if n_buckets is not None:
        feats = feats.select(
            *ids,
            F.pmod(F.xxhash64("feature"), F.lit(n_buckets)).alias("feature"),
        )
    return feats


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    n_buckets: int | None = 65536,
) -> DataFrame:
    """Per-document DSIR importance weights of the RAW corpus against
    the TARGET corpus: ``(id, n_features, log_weight)`` (log_weight
    rounded to 6; empty documents carry no features and are omitted,
    matching the paper — nothing to score)."""
    rf = dsir_features(raw, text_col, id_col, n_buckets)
    tf = dsir_features(target, text_col, id_col, n_buckets)
    cr = rf.groupBy("feature").agg(F.count(F.lit(1)).cast("long").alias("__cr"))
    ct = tf.groupBy("feature").agg(F.count(F.lit(1)).cast("long").alias("__ct"))
    model = cr.join(ct, "feature", "left").select(
        "feature", "__cr", F.coalesce("__ct", F.lit(0)).alias("__ct")
    )
    if n_buckets is not None:
        # fixed feature space: V is exactly the bucket count, and the
        # model is a bounded table -> broadcast, the 100 TB path.
        # Totals come from the feature STREAMS, not the joined model:
        # target mass in buckets the raw corpus never populated would
        # drop out of the left join and undercount __tt.
        v_expr = F.lit(float(n_buckets))
        totals = rf.agg(F.count(F.lit(1)).cast("double").alias("__tr")).crossJoin(
            tf.agg(F.count(F.lit(1)).cast("double").alias("__tt"))
        )
        model = F.broadcast(model.crossJoin(F.broadcast(totals)))
    else:
        v = cr.select("feature").unionByName(ct.select("feature")).distinct()
        totals = (
            rf.agg(F.count(F.lit(1)).cast("double").alias("__tr"))
            .crossJoin(tf.agg(F.count(F.lit(1)).cast("double").alias("__tt")))
            .crossJoin(v.agg(F.count(F.lit(1)).cast("double").alias("__v")))
        )
        model = model.crossJoin(F.broadcast(totals))
        v_expr = F.col("__v")
    lr = F.log((F.col("__ct") + F.lit(alpha)) / (F.col("__tt") + F.lit(alpha) * v_expr)) - F.log(
        (F.col("__cr") + F.lit(alpha)) / (F.col("__tr") + F.lit(alpha) * v_expr)
    )
    scored = rf.join(model, "feature").select(
        F.col(id_col),
        F.round(lr, 9).cast("decimal(38,9)").alias("__lr"),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_features"),
            F.sum("__lr").alias("__w"),
        )
        .select(
            id_col,
            "n_features",
            F.round(F.col("__w").cast("double"), 6).alias("log_weight"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    keep_frac: float = 0.25,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    n_buckets: int | None = 65536,
    gumbel_beta: float = 0.0,
    seed: int = 7,
) -> DataFrame:
    """Top-``keep_frac`` selection by importance weight — the resample
    step. ``gumbel_beta > 0`` adds the paper's Gumbel perturbation
    (deterministic: seeded from xxhash64(id), so re-running selects the
    same documents): key = log_weight + beta * G(id). Returns
    (id, n_features, log_weight, selected).

    Scale shape: the cut point is the (1-keep_frac) PERCENTILE of the
    key, computed by one map-side-combinable aggregate and broadcast
    back as a scalar — no global sort/rank, so selection stays a scan +
    one tiny crossJoin at any corpus size. Keys tied exactly at the
    threshold are all kept (with the Gumbel perturbation on, ties are
    measure-zero; without it, ties are documents the weight model
    genuinely cannot order)."""
    w = dsir_weights(raw, target, text_col, id_col, alpha, n_buckets)
    key = F.col("log_weight")
    if gumbel_beta > 0.0:
        # uniform in (0,1) from the hash, then the Gumbel transform
        u = (F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1 << 31)) + 1.0) / float((1 << 31) + 1)
        key = key + F.lit(gumbel_beta) * (-F.log(-F.log(u)))
    w = w.withColumn("__key", key)
    cut = w.agg(
        F.percentile(F.col("__key"), F.lit(1.0 - keep_frac)).alias("__cut")
    )
    return (
        w.crossJoin(F.broadcast(cut))
        .withColumn("selected", F.col("__key") >= F.col("__cut"))
        .drop("__key", "__cut")
    )


def dsir_artifact(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
    n_buckets: int = 65536,
) -> dict:
    """Bounded driver-side DSIR model for CONTINUOUS ingestion scoring
    (the lm_prune deployment pattern): the two hashed bag models
    collapse to a per-bucket log-ratio table of at most ``n_buckets``
    entries — kilobytes, shipped to executors by closure. ``default``
    covers buckets neither corpus populated (both smoothed counts are
    bare alpha), so arriving documents with unseen vocabulary still
    score. Ratios pre-round to 9 decimals — the same partial the batch
    scorer feeds its DECIMAL sum, so stream and batch agree exactly."""
    import math

    # id_col=None: the model is pure feature counts, so it builds from
    # any corpus regardless of how (or whether) its id column is named
    # (ADVICE r10: the default 'doc_id' made artifact-building fail on
    # differently-named corpora even though no id is needed)
    rf = dsir_features(raw, text_col, id_col=None, n_buckets=n_buckets)
    tf = dsir_features(target, text_col, id_col=None, n_buckets=n_buckets)
    cr = {r["feature"]: r["c"] for r in rf.groupBy("feature").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    ct = {r["feature"]: r["c"] for r in tf.groupBy("feature").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    tr, tt, v = float(sum(cr.values())), float(sum(ct.values())), float(n_buckets)

    def lr(b):
        return round(
            math.log((ct.get(b, 0) + alpha) / (tt + alpha * v))
            - math.log((cr.get(b, 0) + alpha) / (tr + alpha * v)),
            9,
        )

    ratios = {b: lr(b) for b in set(cr) | set(ct)}
    return {
        "ratios": ratios,
        "default": round(
            math.log(alpha / (tt + alpha * v)) - math.log(alpha / (tr + alpha * v)), 9
        ),
        "n_buckets": n_buckets,
        "alpha": alpha,
    }


def dsir_score_stream(
    df: DataFrame,
    artifact: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents (batch OR streaming — stateless, so it composes
    with readStream unchanged) against a frozen :func:`dsir_artifact`:
    ``(id, n_features, log_weight)``. Bucket hashing stays JVM-side
    (xxhash64 inside a transform — identical values to the batch
    featurizer); the Arrow hop only sums table lookups, accumulating the
    pre-rounded ratios as scaled INTEGERS so the total equals the batch
    scorer's DECIMAL(38,9) sum bit-for-bit regardless of order."""
    import pandas as pd

    from pyspark.sql import types as T

    ratios = {int(k): int(round(v * 1_000_000_000)) for k, v in artifact["ratios"].items()}
    default = int(round(artifact["default"] * 1_000_000_000))
    nb = artifact["n_buckets"]
    base = df.select(
        F.col(id_col),
        F.transform(
            _gram_array(nonempty_tokens(text_col)),
            lambda g: F.pmod(F.xxhash64(g), F.lit(nb)),
        ).alias("__b"),
    ).filter(F.size("__b") > 0)
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("n_features", T.LongType()),
            T.StructField("log_weight", T.DoubleType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            nf, w = [], []
            for bs in pdf["__b"]:
                total = 0
                for b in bs:
                    total += ratios.get(int(b), default)
                nf.append(len(bs))
                w.append(round(total / 1_000_000_000, 6))
            yield pd.DataFrame(
                {pdf.columns[0]: pdf.iloc[:, 0], "n_features": nf, "log_weight": w}
            )

    return base.mapInPandas(run, schema=out_schema)
