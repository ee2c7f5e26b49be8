"""URL canonicalization + host extraction — pure column expressions.

URL-level dedup is the FIRST dedup pass of a crawl pipeline (a Common
Crawl dump holds the same page under trivially-different URLs long
before any content-level near-dup runs), and host/domain aggregation
drives source-mix accounting and blocklist filtering. Everything here
is a chain of regexp_extract / array expressions — zero Python, rides
the scan, and the regexes avoid lookahead/backreferences on purpose so
the SAME patterns run verbatim under Java regex (Spark) and RE2-family
engines (DuckDB oracle, Trino, ...).

Canonical form (the common-practice normalization set):
- scheme and host lowercase; leading ``www.`` stripped from the host
- default ports dropped (``:80`` for http, ``:443`` for https); other
  ports kept
- fragment dropped
- query string: parameters split on ``&``, empty params and tracking
  params (``utm_*``, ``fbclid``, ``gclid``) removed, the rest SORTED
  (param order never changes content) and rejoined
- empty path becomes ``/``

``canonical_url`` returns NULL for strings that don't parse as
``scheme://host...`` — callers filter or quarantine those rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["canonical_url", "url_host", "url_dedup_stats"]

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)"
_PORT_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#:]+:([0-9]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)"
_QUERY_RE = r"\?([^#]*)"
_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid)(=|$)"


def url_host(url_col: str = "url") -> "F.Column":
    """Lowercased host with any leading ``www.`` stripped."""
    host = F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))
    return F.regexp_replace(host, r"^www\.", "")


def canonical_url(url_col: str = "url") -> "F.Column":
    """The canonical form (module docstring); NULL when unparseable."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = url_host(url_col)
    port = F.regexp_extract(u, _PORT_RE, 1)
    path = F.regexp_extract(u, _PATH_RE, 1)
    query = F.regexp_extract(u, _QUERY_RE, 1)
    keep = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    qnorm = F.array_join(F.array_sort(keep), "&")
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    portpart = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    pathpart = F.when(path == "", F.lit("/")).otherwise(path)
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        portpart,
        pathpart,
        F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qnorm)),
    )
    return F.when((scheme != "") & (host != ""), canon)


def url_dedup_stats(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Host-level URL-dedup accounting: per host — pages seen, distinct
    canonical URLs, and the duplicate count the canonicalization alone
    removes. One partial-agg'd hash aggregate over the canonicalized
    projection; unparseable URLs group under host ''."""
    c = df.select(
        F.coalesce(url_host(url_col), F.lit("")).alias("host"),
        canonical_url(url_col).alias("canon"),
    )
    return c.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.count_distinct("canon").cast("long").alias("n_canonical"),
        (F.count("canon") - F.count_distinct("canon"))
        .cast("long")
        .alias("n_url_dups"),
    )
