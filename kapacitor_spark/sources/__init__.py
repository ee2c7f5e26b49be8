"""Ingest/egress adapters (SURVEY §2.1)."""

from kapacitor_spark.sources.line_protocol import (
    parse_lines,
    read_srpl,
    to_line_protocol,
)

__all__ = ["parse_lines", "read_srpl", "to_line_protocol"]
