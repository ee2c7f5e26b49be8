"""Giant-single-group ordered transforms — the salted two-phase plan.

A no-dims pipeline compiles derivative/difference/cumulativeSum/
movingAverage/elapsed/changeDetect to a window over ``partitionBy()`` —
ONE task sorts the whole input. The reference never hits this wall (one
goroutine per group and per-group-bounded window state,
/root/reference/window.go:245-358); the Spark-first answer at 100 TB is
a salted two-phase plan:

1. **Chunk** rows by time bucket between the group's min/max time
   (bounds ride the plan as a 1-row broadcast — no driver job). Equal
   timestamps always share a bucket, so a tiebreak order is never split
   across chunks and any bucket width is correctness-neutral.
2. **Dense-rank** the nonempty buckets (broadcast join of a tiny chunk
   dimension), giving contiguous chunk ids 0..K-1 in time order.
3. **Per-chunk local window** — every core sorts only its chunk — then
   recombine:
   - cumulativeSum: add broadcast per-chunk prefix offsets,
   - lag-style ops (difference/derivative/elapsed/changeDetect,
     movingAverage): union in *ghost* copies of each chunk's last
     ``tail_rows`` rows tagged onto the next chunk, compute the same
     window expressions, keep only real rows.

Everything is lazy (broadcast joins, no collect) except the optional
movingAverage thin-chunk validation, which reads a K-row count table.
The cost trade: 2-3 extra scans of the input vs. an unbounded
single-task sort — at the sizes where this path activates (see
``should_chunk``) the scans win by orders of magnitude.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "should_chunk",
    "chunked_frame",
    "chunked_cumulative_sum",
    "chunks_support_tail",
    "CONF_KEY",
    "DEFAULT_MIN_BYTES",
]

# A no-dims ordered transform whose Catalyst plan-size estimate is at or
# above this routes through the chunked plan; below it the single window
# is cheaper (the chunked plan pays extra scans for bounds/offsets).
# Override per-session: spark.conf.set(CONF_KEY, "<bytes>").
DEFAULT_MIN_BYTES = 64 * 1024 * 1024
CONF_KEY = "spark.kapacitor.chunkedOrdered.minBytes"


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan size estimate (free — no job)."""
    try:
        size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j maps scala BigInt to a Python int on recent Sparks; older
        # bridges hand back the JVM object
        return size if isinstance(size, int) else int(size.toString())
    except Exception:
        return None


def should_chunk(df: DataFrame, dims=()) -> bool:
    """True when a single-group ordered transform over ``df`` would funnel
    into one task big enough to matter. Grouped pipelines never chunk —
    their dims already partition the sort."""
    if dims:
        return False
    try:
        thresh = int(str(df.sparkSession.conf.get(CONF_KEY, str(DEFAULT_MIN_BYTES))))
    except Exception:
        thresh = DEFAULT_MIN_BYTES
    size = _plan_size_bytes(df)
    return size is not None and size >= thresh


def _with_chunks(df: DataFrame, time_col: str, n_chunks: int) -> DataFrame:
    """Add a dense, time-ordered ``__chunk`` column (0..K-1, K ≤ n_chunks).

    Bucket boundaries come from min/max time via a 1-row broadcast cross
    join; dense ids come from a broadcast join against the tiny distinct-
    bucket dimension. Equal times always land in the same chunk."""
    bounds = df.agg(
        F.unix_micros(F.min(time_col)).alias("__tmin"),
        F.unix_micros(F.max(time_col)).alias("__tmax"),
    )
    out = df.crossJoin(F.broadcast(bounds))
    width = F.greatest(
        F.ceil((F.col("__tmax") - F.col("__tmin") + 1) / F.lit(n_chunks)),
        F.lit(1),
    )
    raw = F.floor(
        (F.unix_micros(F.col(time_col)) - F.col("__tmin")) / width
    ).cast("long")
    out = out.withColumn("__rawc", raw).drop("__tmin", "__tmax")
    dim = (
        out.select("__rawc")
        .distinct()
        .withColumn("__chunk", F.row_number().over(Window.orderBy("__rawc")) - 1)
    )
    return out.join(F.broadcast(dim), "__rawc").drop("__rawc")


def chunked_frame(
    df: DataFrame,
    time_col: str,
    tiebreak: list[str],
    tail_rows: int = 1,
    n_chunks: int | None = None,
):
    """(augmented_df, window) for lag-style ops over one giant group.

    The augmented frame holds every real row (``__real`` true) plus ghost
    copies of each chunk's last ``tail_rows`` rows re-tagged onto the NEXT
    chunk (``__real`` false), so a window ``partitionBy(__chunk)`` shows
    each real row its true predecessors. Callers compute their lag /
    trailing-rows expressions over the returned window, then
    ``filter(F.col("__real")).drop("__chunk", "__real")``.

    Correct for any data layout when ``tail_rows == 1`` (every nonempty
    chunk has a last row). For ``tail_rows > 1`` validate with
    ``chunks_support_tail`` first."""
    n_chunks = n_chunks or df.sparkSession.sparkContext.defaultParallelism
    c = _with_chunks(df, time_col, n_chunks)
    order_desc = [F.col(time_col).desc()] + [F.col(t).desc() for t in tiebreak]
    wtail = Window.partitionBy("__chunk").orderBy(*order_desc)
    tails = (
        c.withColumn("__trn", F.row_number().over(wtail))
        .filter(F.col("__trn") <= tail_rows)
        .drop("__trn")
        .withColumn("__chunk", F.col("__chunk") + 1)
        .withColumn("__real", F.lit(False))
    )
    aug = c.withColumn("__real", F.lit(True)).unionByName(tails)
    w = Window.partitionBy("__chunk").orderBy(time_col, *tiebreak)
    return aug, w


def chunks_support_tail(
    df: DataFrame,
    time_col: str,
    tail_rows: int,
    n_chunks: int | None = None,
) -> bool:
    """True when every chunk that FEEDS ghosts (all but the last) holds at
    least ``tail_rows`` rows, so ``chunked_frame(tail_rows=...)`` shows
    every real row its full trailing window. One tiny job: a K-row count
    table (chunking is deterministic, so the frame built afterwards sees
    identical chunks)."""
    n_chunks = n_chunks or df.sparkSession.sparkContext.defaultParallelism
    counts = (
        _with_chunks(df, time_col, n_chunks)
        .groupBy("__chunk")
        .count()
        .collect()
    )
    if not counts:
        return True
    last = max(r["__chunk"] for r in counts)
    return all(r["count"] >= tail_rows for r in counts if r["__chunk"] != last)


def chunked_row_number(
    df: DataFrame,
    out: str,
    time_col: str,
    tiebreak: list[str],
    n_chunks: int | None = None,
) -> DataFrame:
    """Global event-time row number over one giant group without a
    single-task sort: chunk-local row_number plus broadcast per-chunk
    row-count prefix offsets (the counting twin of the cumsum plan)."""
    n_chunks = n_chunks or df.sparkSession.sparkContext.defaultParallelism
    c = _with_chunks(df, time_col, n_chunks)
    wloc = Window.partitionBy("__chunk").orderBy(time_col, *tiebreak)
    local = c.withColumn("__lrn", F.row_number().over(wloc))
    counts = c.groupBy("__chunk").count()
    woff = Window.orderBy("__chunk").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        "__chunk",
        F.coalesce(F.sum("count").over(woff), F.lit(0)).alias("__off"),
    )
    cols = df.columns + [out]
    return (
        local.join(F.broadcast(offs), "__chunk")
        .withColumn(out, F.col("__lrn") + F.col("__off"))
        .select(*cols)
    )


def chunked_cumulative_sum(
    df: DataFrame,
    fld: str,
    out: str,
    time_col: str,
    tiebreak: list[str],
    n_chunks: int | None = None,
) -> DataFrame:
    """Running sum over one giant group without a single-task sort:
    chunk-local prefix sums plus broadcast per-chunk offsets (the classic
    scan-sum recombination). Exactly equal to the single-window result
    for integral and decimal fields (their addition reassociates); DOUBLE
    fields agree to float tolerance only — the recombination reorders the
    additions, so the last ulps can differ from the sequential sum (pin
    exactness with a decimal cast when it matters, as the scored
    point_transforms query does)."""
    n_chunks = n_chunks or df.sparkSession.sparkContext.defaultParallelism
    c = _with_chunks(df, time_col, n_chunks)
    wloc = (
        Window.partitionBy("__chunk")
        .orderBy(time_col, *tiebreak)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = c.withColumn("__loc", F.sum(fld).over(wloc))
    totals = c.groupBy("__chunk").agg(F.sum(fld).alias("__tot"))
    woff = Window.orderBy("__chunk").rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(
        "__chunk",
        F.coalesce(F.sum("__tot").over(woff), F.lit(0)).alias("__off"),
    )
    cols = df.columns if out in df.columns else df.columns + [out]
    res = local.join(F.broadcast(offs), "__chunk").withColumn(
        out, F.col("__loc") + F.col("__off")
    )
    return res.select(*cols)
