"""Large-scale training-data pipeline operators (beyond the reference's
surface): deduplication, similarity search, text analysis, multimodal
plumbing. All built on DataFrame expressions / Pandas UDFs — no driver-side
loops, no row-at-a-time Python."""

from kapacitor_spark.dataprep import dedup, similarity, text, multimodal  # noqa: F401


def prepare_corpus(
    docs,
    benchmark=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    decontam_n: int = 8,
):
    """The composed training-data cleaning pipeline — the one-call shape a
    100 TB corpus actually runs, chaining the individual operators so
    their plan properties compose:

    1. EXACT dedup: keep the smallest id per content digest (the shuffle
       carries 16-byte digests, never text).
    2. DECONTAMINATION (when ``benchmark`` is given): drop documents
       sharing any ``decontam_n``-gram with the benchmark (broadcast of
       the benchmark's hashed grams + left-anti join).
    3. QUALITY FILTER: C4/Gopher-style heuristic score ≥ ``min_quality``
       (pure column expressions riding the scan).

    Returns the surviving (id, text) plus the quality columns. Each stage
    is the operator already oracle-verified on its own; the composition
    is itself under the DuckDB oracle gate (corpus_prep_pipeline)."""
    from pyspark.sql import functions as F

    from kapacitor_spark.dataprep.dedup import decontaminate, exact_dedup
    from kapacitor_spark.dataprep.text import quality_score

    keepers = exact_dedup(docs, text_col, id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    kept = docs.join(keepers, id_col)
    if benchmark is not None:
        kept = decontaminate(kept, benchmark, n=decontam_n,
                             text_col=text_col, id_col=id_col)
    scored = quality_score(kept, text_col, id_col, keep=True)
    return scored.filter(F.col("quality") >= min_quality)
