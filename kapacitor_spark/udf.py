"""User-defined operator surface (SURVEY §2.9).

The reference runs UDFs as child processes speaking protobuf over
stdin/socket (/root/reference/udf/agent/udf.proto: Info/Init handshake,
BeginBatch/Point/EndBatch data plane, Snapshot/Restore) and exposes them as
first-class chain methods (/root/reference/task_master.go:497-525).

Spark replaces the whole RPC machinery with in-process Arrow transfer:

* ``@udf_node(schema)``          — batch per-group transform
  (applyInPandas): the function receives the group's rows as one pandas
  DataFrame in event-time order, like the reference UDF receives a batch
  between BeginBatch/EndBatch.
* ``@stateful_udf_node(schema, state_schema)`` — streaming per-group
  transform (applyInPandasWithState): explicit keyed state replaces the
  Snapshot/Restore protocol (checkpointing persists it).

The Info/Init option handshake becomes plain Python kwargs captured in the
closure. Registration as a chain method = ``Pipeline.udf(fn, **options)``.

Example (mirrors /root/reference/udf/agent/examples/moving_avg/):

    @udf_node("t timestamp, host string, avg double")
    def moving_avg(pdf, size=10):
        out = pdf[["t", "host"]].copy()
        out["avg"] = pdf["value"].rolling(size, min_periods=1).mean()
        return out

    p.udf(moving_avg, size=5)
"""

from __future__ import annotations

import functools
from typing import Callable

import pandas as pd

__all__ = ["udf_node", "stateful_udf_node"]


def udf_node(output_schema: str, sort_by_time: bool = True) -> Callable:
    """Declare a batch UDF operator: fn(pandas.DataFrame, **options) ->
    pandas.DataFrame with ``output_schema``. Applied per group via
    applyInPandas (Arrow-batched)."""

    def deco(fn):
        @functools.wraps(fn)
        def bind(pipeline, **options):
            time_col = pipeline.time_col
            tiebreak = list(pipeline.tiebreak)

            def run(pdf: pd.DataFrame) -> pd.DataFrame:
                if sort_by_time:
                    pdf = pdf.sort_values([time_col, *tiebreak], kind="stable")
                return fn(pdf, **options)

            from pyspark.sql import functions as F

            gb = (
                pipeline.df.groupBy(*[F.col(d) for d in pipeline.dims])
                if pipeline.dims
                else pipeline.df.groupBy()
            )
            out = gb.applyInPandas(run, schema=output_schema)
            from kapacitor_spark.pipeline import Pipeline

            return Pipeline(
                df=out,
                time_col=time_col,
                dims=pipeline.dims,
                results=pipeline.results,
            )

        bind.__udf_node__ = True
        bind.output_schema = output_schema
        return bind

    return deco


def stateful_udf_node(
    output_schema: str, state_schema: str, output_mode: str = "append"
) -> Callable:
    """Declare a streaming stateful UDF: fn(key, iterator-of-pdf, state,
    **options) yielding pandas DataFrames. Applied per group via
    applyInPandasWithState; ``state`` is a GroupState whose .get/.update
    tuple matches ``state_schema`` — the Snapshot/Restore analog."""

    def deco(fn):
        @functools.wraps(fn)
        def bind(df, dims, **options):
            from pyspark.sql import functions as F
            from pyspark.sql.streaming.state import GroupStateTimeout

            def run(key, pdfs, state):
                return fn(key, pdfs, state, **options)

            return df.groupBy(*[F.col(d) for d in dims]).applyInPandasWithState(
                run,
                outputStructType=output_schema,
                stateStructType=state_schema,
                outputMode=output_mode,
                timeoutConf=GroupStateTimeout.NoTimeout,
            )

        bind.__udf_node__ = True
        return bind

    return deco
