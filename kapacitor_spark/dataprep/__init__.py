"""Large-scale training-data pipeline operators (beyond the reference's
surface): deduplication, similarity search, text analysis, multimodal
plumbing. All built on DataFrame expressions / Pandas UDFs — no driver-side
loops, no row-at-a-time Python."""

from kapacitor_spark.dataprep import dedup, similarity, text, multimodal  # noqa: F401
