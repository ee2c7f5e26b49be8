"""Custom operators that need more than a Column expression.

Each is a function DataFrame -> DataFrame (or Pipeline helper) using
``applyInPandas`` — Arrow-batched, one Python invocation per group, the
Spark-idiomatic replacement for the reference's per-group reduce contexts
(/root/reference/influxql.go:62-117).
"""

from kapacitor_spark.operators.holt_winters import holt_winters

__all__ = ["holt_winters"]
