"""Prometheus scrape source — the reference's scraper service data plane
(/root/reference/services/scraper/service.go).

The reference embeds the Prometheus scrape manager: discovered targets
are scraped on an interval and every sample becomes a point — measurement
= the ``__name__`` label, tags = the remaining labels, one ``value``
field, NaN samples dropped, millisecond timestamps
(service.go:190-241 Append). Target DISCOVERY (k8s/consul/ec2/...) is
external service plumbing; given a target list this module does the same
scrape→points mapping.

Spark mapping: the target list is config-scale, but scraping is I/O the
DRIVER should not serialize — targets parallelize across executors and
each partition GETs + parses its targets inside one Arrow batch
(`mapInPandas`), so scrape fan-out scales with the cluster exactly like
the reference's scrape pools. The exposition-format parser is pure
Python on the (small) text bodies.
"""

from __future__ import annotations

import math
import re
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["parse_prometheus", "scrape_targets", "scrape_stream"]

_METRIC = re.compile(
    r"^([a-zA-Z_:][a-zA-Z0-9_:]*)"        # metric name
    r"(?:\{(.*)\})?"                      # label block
    r"\s+(\S+)"                           # value
    r"(?:\s+(-?\d+))?\s*$"                # optional ms timestamp
)
_LABEL = re.compile(r'([a-zA-Z_][a-zA-Z0-9_]*)="((?:[^"\\]|\\.)*)"')
_UNESCAPE = {"\\\\": "\\", '\\"': '"', "\\n": "\n"}


def _unescape(v: str) -> str:
    return re.sub(r'\\(?:\\|"|n)', lambda m: _UNESCAPE[m.group(0)], v)


def parse_prometheus(text: str, default_ts_ms: int = 0) -> list[dict]:
    """Parse Prometheus exposition text into sample dicts
    (name, labels, value, ts_ms). Comment/TYPE/HELP lines skip; NaN
    samples drop (service.go:193 'Remove all NaN values'); a sample
    without a timestamp takes ``default_ts_ms`` (the scrape time, like
    the reference's scrape loop)."""
    out = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = _METRIC.match(line)
        if not m:
            continue
        name, labelblock, value, ts = m.groups()
        try:
            v = float(value)
        except ValueError:
            continue
        if math.isnan(v):
            continue
        labels = {
            k: _unescape(raw) for k, raw in _LABEL.findall(labelblock or "")
        }
        out.append(
            {
                "name": name,
                "labels": labels,
                "value": v,
                "ts_ms": int(ts) if ts is not None else default_ts_ms,
            }
        )
    return out


def scrape_targets(
    spark: SparkSession,
    targets: Sequence[str],
    job: str = "scrape",
    timeout: float = 10.0,
    blacklist: Sequence[str] = (),
    scrape_time_ms: int | None = None,
    tolerant: bool = True,
) -> DataFrame:
    """Scrape ``targets`` (URLs of /metrics endpoints) into a points
    DataFrame (time, name, tags map incl. instance+job, value) — the
    reference's sample→point mapping (service.go:190-241: measurement =
    __name__, tags = labels, field 'value'). ``blacklist`` drops samples
    whose FINAL instance tag is listed (an exposition-supplied instance
    label wins over the URL host, exactly like the reference's
    Append-time check, service.go:214-224).

    Samples without explicit timestamps take ``scrape_time_ms``; the
    default (None) stamps the wall-clock scrape time like the reference's
    scrape loop — pass a fixed value for deterministic replays.

    ``tolerant=True`` (the reference's behavior: one dead target loses
    only its own samples) logs per-target failures to stderr and keeps
    scraping; ``tolerant=False`` fails the job on the first bad target.

    Scrapes run ON EXECUTORS: one task per partition of the target list,
    each GET+parse inside an Arrow batch — fan-out scales with the
    cluster, the driver never fetches.
    """
    import time as _time

    default_ts = (
        int(_time.time() * 1000) if scrape_time_ms is None else scrape_time_ms
    )
    fetch = _make_fetch(job, timeout, set(blacklist), tolerant, default_ts)

    tdf = spark.createDataFrame([(t,) for t in targets], "url string")
    # spread the (tiny) target list so each executor scrapes a slice
    tdf = tdf.repartition(max(1, len(targets)))
    raw = tdf.mapInPandas(
        fetch, schema="ts_ms long, name string, tags map<string,string>, value double"
    )
    return raw.selectExpr(
        "timestamp_millis(ts_ms) AS time", "name", "tags", "value"
    )


def _make_fetch(job, timeout, bl, tolerant, default_ts_ms):
    """Shared scrape closure for the batch and streaming paths — the
    sample→point mapping, blacklist-on-final-tag and per-target fault
    isolation are identical by construction. ``default_ts_ms=None`` stamps
    the wall clock AT FETCH TIME (per micro-batch — the reference's scrape
    loop stamps each scrape as it runs); an int pins it for replay."""

    def fetch(batches):
        import sys as _sys
        import time as _time
        import urllib.request

        import pandas as pd

        for pdf in batches:
            default_ts = (
                int(_time.time() * 1000) if default_ts_ms is None else default_ts_ms
            )
            rows = []
            for url in pdf["url"]:
                instance = re.sub(r"^https?://", "", url).split("/")[0]
                try:
                    req = urllib.request.Request(url, method="GET")
                    with urllib.request.urlopen(req, timeout=timeout) as resp:
                        if resp.status != 200:
                            raise OSError(f"scrape status {resp.status}")
                        body = resp.read().decode(errors="replace")
                except Exception as e:  # noqa: BLE001 — per-target isolation
                    if not tolerant:
                        raise
                    print(f"scrape failed for {url}: {e}", file=_sys.stderr)
                    continue
                for s in parse_prometheus(body, default_ts_ms=default_ts):
                    tags = dict(s["labels"])
                    tags.setdefault("instance", instance)
                    tags["job"] = job
                    if tags["instance"] in bl:
                        continue  # blacklist checks the FINAL tag
                    rows.append((s["ts_ms"], s["name"], tags, s["value"]))
            yield pd.DataFrame(
                rows, columns=["ts_ms", "name", "tags", "value"]
            )

    return fetch


def scrape_stream(
    spark: SparkSession,
    targets: Sequence[str],
    job: str = "scrape",
    timeout: float = 10.0,
    blacklist: Sequence[str] = (),
    tolerant: bool = True,
) -> DataFrame:
    """CONTINUOUS interval scraping — the reference's scraper run loop
    (/root/reference/services/scraper/service.go: the embedded scrape
    manager re-scrapes every target on its interval) as a Structured
    Streaming source: one scrape WAVE per micro-batch trigger, so the
    cadence is the stream trigger (``.trigger(processingTime='10s')`` ≙
    the reference's scrape interval). Returns a STREAMING DataFrame with
    the same (time, name, tags, value) schema as scrape_targets;
    blacklist/job/tolerance semantics are the identical shared closure.

    Shape: a ``rate-micro-batch`` tick (1 driver-side row per trigger)
    fans out to the target list (explode + repartition), and each
    executor GETs + parses its slice inside one Arrow batch — per-wave
    work is distributed exactly like the batch path, and samples without
    explicit timestamps stamp the wall clock at fetch time (per wave,
    like the reference's loop). Downstream: window/alert/deadman over
    event time, or ``influxdb_out`` via foreachBatch.
    """
    from pyspark.sql import functions as F

    fetch = _make_fetch(job, timeout, set(blacklist), tolerant, None)
    ticks = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 1)
        .load()
    )
    urls = ticks.select(
        F.explode(F.array(*[F.lit(t) for t in targets])).alias("url")
    )
    raw = urls.repartition(max(1, len(targets))).mapInPandas(
        fetch, schema="ts_ms long, name string, tags map<string,string>, value double"
    )
    return raw.selectExpr(
        "timestamp_millis(ts_ms) AS time", "name", "tags", "value"
    )
