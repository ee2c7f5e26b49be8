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
_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)"
_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid)(=|$)"
# host[:port] after userinfo removal — anchored end-to-end so a
# malformed port ('8080abc') fails the WHOLE authority instead of
# silently truncating; bracketed IPv6 literals also fail here and
# quarantine as NULL (documented)
_HOSTPORT_OK_RE = r"^[^:@]+(:[0-9]+)?$"


def _parts(url_col: str):
    u = F.col(url_col)
    base = F.regexp_replace(u, r"#.*", "")  # fragment dropped FIRST —
    # a '?' inside the fragment must not leak into the query
    scheme = F.lower(F.regexp_extract(base, _SCHEME_RE, 1))
    auth = F.regexp_extract(base, _AUTH_RE, 1)
    # userinfo stripped: credentials never belong in a canonical/dedup
    # key, and 'user@blocked.com' must attribute to blocked.com
    hostport = F.regexp_replace(auth, r"^[^@]*@", "")
    host = F.regexp_replace(
        F.lower(F.regexp_extract(hostport, r"^([^:]+)", 1)), r"^www\.", ""
    )
    port = F.regexp_extract(hostport, r"^[^:]+:([0-9]+)$", 1)
    # CR/LF-bearing strings quarantine outright: Java's '$'/'.' treat a
    # trailing newline differently from RE2's, so a newline URL would
    # canonicalize DIFFERENTLY on Spark vs an RE2-engine oracle — and a
    # raw newline is never legal in a URL anyway (crawl garbage /
    # header-injection artifacts)
    valid = (
        (scheme != "")
        & (host != "")
        & hostport.rlike(_HOSTPORT_OK_RE)
        & ~u.rlike("[\r\n]")
    )
    return base, scheme, host, port, valid


def url_host(url_col: str = "url") -> "F.Column":
    """Lowercased host (userinfo and port stripped, leading ``www.``
    dropped); '' when the URL has no parseable authority."""
    _, _, host, _, valid = _parts(url_col)
    return F.when(valid, host).otherwise(F.lit(""))


def canonical_url(url_col: str = "url") -> "F.Column":
    """The canonical form (module docstring); NULL when unparseable —
    including malformed ports and bracketed IPv6 authorities, which
    quarantine rather than acquire an invented identity."""
    base, scheme, host, port, valid = _parts(url_col)
    path = F.regexp_extract(base, _PATH_RE, 1)
    query = F.regexp_extract(base, r"\?(.*)$", 1)
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
    return F.when(valid, canon)


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
