"""kapacitor_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of influxdata/kapacitor.

This is NOT a port of the reference engine. The reference (Go, at
/root/reference) is a single-process dataflow engine wiring per-node
goroutines with channel edges; here every operator is re-expressed as a
declarative composition of Spark DataFrame transformations so that Catalyst
and Tungsten pick the physical strategy (predicate pushdown, whole-stage
codegen, broadcast vs shuffle joins, AQE skew handling). Custom Python code
is confined to (a) the fluent-DSL layer that builds DataFrame plans, and
(b) a handful of Pandas-UDF stateful operators that Spark's built-in
operators genuinely cannot express (Holt-Winters, count-based windows,
streaming alert state machines).

Public API:
    Pipeline        fluent stream/batch operator chain (SURVEY.md §2)
    get_spark       opinionated local SparkSession factory
    functions       TICK-lambda scalar function registry → Column exprs
    dataprep        dedup / similarity / text-analysis operators
"""

from kapacitor_spark.session import get_spark
from kapacitor_spark.pipeline import Pipeline
from kapacitor_spark.tasks import BatchQuery
from kapacitor_spark.udf import stateful_udf_node, udf_node

__all__ = ["Pipeline", "get_spark", "BatchQuery", "udf_node", "stateful_udf_node"]
__version__ = "0.1.0"
