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

__all__ = [
    "parse_prometheus",
    "scrape_targets",
    "scrape_stream",
    "static_targets",
    "file_sd_targets",
    "scrape_stream_file_sd",
    "dns_targets",
    "consul_targets",
    "k8s_targets",
    "ec2_targets",
    "http_sd_targets",
]

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
    import json as _json
    import time as _time

    default_ts = (
        int(_time.time() * 1000) if scrape_time_ms is None else scrape_time_ms
    )
    fetch = _make_fetch(job, timeout, set(blacklist), tolerant, default_ts)

    norm = _norm_targets(targets)
    from kapacitor_spark.session import local_df

    tdf = local_df(  # tiny target list: one slice before the spread (r12)
        spark,
        [(u, _json.dumps(l) if l else None) for u, l in norm],
        "url string, labels_json string",
    )
    # spread the (tiny) target list so each executor scrapes a slice
    tdf = tdf.repartition(max(1, len(norm)))
    raw = tdf.mapInPandas(
        fetch, schema="ts_ms long, name string, tags map<string,string>, value double"
    )
    return raw.selectExpr(
        "timestamp_millis(ts_ms) AS time", "name", "tags", "value"
    )


def _norm_targets(targets) -> list[tuple[str, dict]]:
    """Normalize a mixed target list — bare URL strings or discovery
    (address-or-url, labels) pairs — to (url, labels) with the Prometheus
    address defaults (scheme http, metrics path /metrics) applied to
    scheme-less addresses."""
    out = []
    for t in targets:
        if isinstance(t, str):
            url, labels = t, {}
        else:
            url, labels = t
        if "://" not in url:
            url = f"http://{url}/metrics"
        out.append((url, dict(labels or {})))
    return out


def _make_fetch(job, timeout, bl, tolerant, default_ts_ms):
    """Shared scrape closure for the batch and streaming paths — the
    sample→point mapping, blacklist-on-final-tag and per-target fault
    isolation are identical by construction. ``default_ts_ms=None`` stamps
    the wall clock AT FETCH TIME (per micro-batch — the reference's scrape
    loop stamps each scrape as it runs); an int pins it for replay.

    Target rows carry a ``labels_json`` column (discovery labels); those
    labels OVERRIDE exposition-supplied tags and the configured job — the
    Prometheus honor_labels=false default the reference's embedded scrape
    manager runs with (target labels win over exposed labels)."""

    def fetch(batches):
        import json as _json
        import sys as _sys
        import time as _time
        import urllib.request

        import pandas as pd

        for pdf in batches:
            default_ts = (
                int(_time.time() * 1000) if default_ts_ms is None else default_ts_ms
            )
            rows = []
            for url, labels_json in zip(pdf["url"], pdf["labels_json"]):
                target_labels = _json.loads(labels_json) if labels_json else {}
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
                    tags.update(target_labels)
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
    import json as _json

    from pyspark.sql import functions as F

    fetch = _make_fetch(job, timeout, set(blacklist), tolerant, None)
    norm = _norm_targets(targets)
    if not norm:
        raise ValueError("scrape_stream needs at least one target")
    ticks = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 1)
        .load()
    )
    urls = ticks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(u).alias("url"),
                        F.lit(_json.dumps(l) if l else None).alias("labels_json"),
                    )
                    for u, l in norm
                ]
            )
        ).alias("t")
    ).select("t.url", "t.labels_json")
    raw = urls.repartition(max(1, len(norm))).mapInPandas(
        fetch, schema="ts_ms long, name string, tags map<string,string>, value double"
    )
    return raw.selectExpr(
        "timestamp_millis(ts_ms) AS time", "name", "tags", "value"
    )


# path rule from the reference's file discovery
# (/root/reference/services/file_discovery/config.go:29 fileRegex)
_FILE_SD_RE = re.compile(r"^[^*]*(\*[^/]*)?\.(json|yml|yaml|JSON|YML|YAML)$")


def static_targets(
    id: str, targets: Sequence[str], labels: dict | None = None
) -> list[tuple[str, dict]]:
    """Static discovery (/root/reference/services/static_discovery/
    config.go): a fixed target list sharing one label set. Returns
    (url, labels) pairs for scrape_targets / scrape_stream; scheme-less
    addresses get the Prometheus defaults (http://<addr>/metrics).
    Validation matches the reference: an ID is required."""
    if not id:
        raise ValueError("static discovery must be given a ID")
    return [(u, dict(labels or {})) for u, _ in _norm_targets(list(targets))]


def _parse_file_sd(body: str, path: str) -> list[tuple[str, dict]]:
    """Parse one file_sd document (the public Prometheus file-discovery
    format: a list of {targets: [...], labels: {...}} groups). JSON
    always; YAML only when a yaml module is importable (gated — the
    reference accepts .json/.yml/.yaml too)."""
    import json as _json

    if path.lower().endswith(".json"):
        groups = _json.loads(body)
    else:
        try:
            import yaml  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "YAML file discovery needs a yaml module; use JSON file_sd"
            ) from e
        groups = yaml.safe_load(body)
    out = []
    for g in groups or []:
        labels = dict(g.get("labels") or {})
        for addr in g.get("targets") or []:
            out.append((addr, labels))
    return out


def file_sd_targets(
    files: Sequence[str], tolerant: bool = False
) -> list[tuple[str, dict]]:
    """File discovery (/root/reference/services/file_discovery/config.go,
    which delegates to Prometheus file_sd): read target groups from
    JSON/YAML files (globs allowed in the basename, per the reference's
    path rule) and return (url, labels) pairs. The reference re-reads on
    a refresh interval — the streaming twin is scrape_stream_file_sd,
    which re-discovers EVERY wave.

    ``tolerant=True`` (the Prometheus file_sd behavior the reference
    embeds: a bad file is logged and contributes nothing, the rest keep
    working) skips unreadable/malformed files instead of raising — the
    streaming path uses it so one half-written file can't kill the
    scrape stream mid-wave. Path validation always raises: a bad
    PATTERN is a config error, not a runtime hiccup."""
    import glob as _glob
    import sys as _sys

    out: list[tuple[str, dict]] = []
    for pattern in files:
        if not _FILE_SD_RE.match(pattern):
            # reference error string (config.go:36-38)
            raise ValueError(
                f'path name "{pattern}" is not valid for file discovery'
            )
        for path in sorted(_glob.glob(pattern)):
            try:
                with open(path, encoding="utf-8") as fh:
                    out.extend(
                        (u, l)
                        for u, l in _parse_file_sd(fh.read(), path)
                    )
            except Exception as e:  # noqa: BLE001 — per-file isolation
                if not tolerant:
                    raise
                print(f"file discovery failed for {path}: {e}", file=_sys.stderr)
    return _norm_targets(out)


def dns_targets(
    id: str,
    record_names: Sequence[str],
    type: str = "SRV",
    port: int = 0,
    resolver=None,
) -> list[tuple[str, dict]]:
    """DNS discovery (/root/reference/services/dns/config.go — validation
    mirrored exactly: an ID is required; type SRV|A|AAAA; A/AAAA require
    a port, which SRV ignores because SRV answers carry their own).

    A/AAAA resolve with the stdlib resolver (socket.getaddrinfo) — no
    external control plane needed; every resolved address becomes a
    target with the Prometheus ``__meta_dns_name`` label. SRV genuinely
    needs a DNS library (stdlib cannot query SRV records), so it raises
    NotImplementedError unless a ``resolver`` is injected — the same
    injected-client seam as the autoscale orchestrators.
    ``resolver(name, rtype)`` must return an iterable of "host:port"
    (SRV) or bare address (A/AAAA) strings."""
    import socket as _socket

    if not id:
        raise ValueError("dns discovery must be given a ID")
    rtype = type.upper()
    if rtype in ("A", "AAAA"):
        if not port:
            # reference error string (services/dns/config.go:38-40)
            raise ValueError(f"Port required for dns discovery type {rtype}")
    elif rtype != "SRV":
        raise ValueError(f"invalid dns discovery records type {type}")
    out: list[tuple[str, dict]] = []
    for name in record_names:
        labels = {"__meta_dns_name": name}
        if resolver is not None:
            for addr in resolver(name, rtype):
                out.append((addr if rtype == "SRV" else f"{addr}:{port}", labels))
            continue
        if rtype == "SRV":
            raise NotImplementedError(
                "SRV discovery needs a DNS library or an injected resolver "
                "(stdlib getaddrinfo cannot query SRV records)"
            )
        fam = _socket.AF_INET if rtype == "A" else _socket.AF_INET6
        seen: set[str] = set()
        for info in _socket.getaddrinfo(name, None, fam, _socket.SOCK_STREAM):
            addr = info[4][0]
            if addr not in seen:
                seen.add(addr)
                host = f"[{addr}]" if rtype == "AAAA" else addr
                out.append((f"{host}:{port}", labels))
    return _norm_targets(out)


def consul_targets(
    id: str,
    client,
    services: Sequence[str] = (),
    tag_separator: str = ",",
) -> list[tuple[str, dict]]:
    """Consul discovery behind an injected-client seam (reference:
    services/consul/config.go — validation mirrored: an ID and a server
    address are required; the reference itself only hands Prometheus a
    consul.SDConfig and lets Prometheus's SD loop poll the control
    plane, so the client stays external here exactly as it does there).

    ``client`` must expose ``address`` (validated non-empty, the
    reference's server-address check) and ``catalog_services() ->
    {service: [instance, ...]}`` where each instance is a dict with
    ``address``, ``port``, and optional ``tags``/``node``/``datacenter``.
    Instances map to targets with the public Prometheus consul meta
    labels (__meta_consul_service/tags/node/dc); ``services`` filters to
    the listed service names (empty = all, the Prometheus default)."""
    if not id:
        raise ValueError("consul discovery must be given a ID")
    if not str(getattr(client, "address", "") or "").strip():
        raise ValueError("consul discovery requires a server address")
    wanted = set(services)
    out: list[tuple[str, dict]] = []
    for svc, instances in sorted(client.catalog_services().items()):
        if wanted and svc not in wanted:
            continue
        for inst in instances:
            labels = {
                "__meta_consul_service": svc,
                # Prometheus wraps the joined tags in separators so a
                # regex can anchor on ",tag," regardless of position
                "__meta_consul_tags": tag_separator
                + tag_separator.join(inst.get("tags") or ())
                + tag_separator,
            }
            if inst.get("node"):
                labels["__meta_consul_node"] = inst["node"]
            if inst.get("datacenter"):
                labels["__meta_consul_dc"] = inst["datacenter"]
            out.append((f"{inst['address']}:{inst['port']}", labels))
    return _norm_targets(out)


def k8s_targets(
    id: str,
    client,
    role: str = "pod",
    namespace: str = "",
) -> list[tuple[str, dict]]:
    """Kubernetes discovery behind an injected-client seam (reference:
    services/k8s/config.go — validation mirrored: an ID is required and
    either in-cluster config or at least one API server, which here
    means the caller hands us a constructed client; the reference again
    only passes Prometheus a kubernetes.SDConfig).

    ``role`` is ``pod`` or ``service`` (the two data-plane roles; the
    reference exposes the same Role knob). ``client.pods(namespace) ->
    [{name, namespace, ip, port, labels}]`` and ``client.services(
    namespace) -> [{name, namespace, cluster_ip, port, labels}]``.
    Targets carry the public __meta_kubernetes_* labels."""
    if not id:
        raise ValueError("k8s discovery must be given a ID")
    if role not in ("pod", "service"):
        raise ValueError(f"invalid k8s discovery role {role}")
    if client is None:
        raise ValueError("no api-servers specified, must provide at least one server URL or an in-cluster client")
    out: list[tuple[str, dict]] = []
    if role == "pod":
        for p_ in client.pods(namespace):
            labels = {
                "__meta_kubernetes_namespace": p_["namespace"],
                "__meta_kubernetes_pod_name": p_["name"],
                "__meta_kubernetes_pod_ip": p_["ip"],
            }
            for k, v in (p_.get("labels") or {}).items():
                labels[f"__meta_kubernetes_pod_label_{k}"] = v
            out.append((f"{p_['ip']}:{p_['port']}", labels))
    else:
        for sv in client.services(namespace):
            labels = {
                "__meta_kubernetes_namespace": sv["namespace"],
                "__meta_kubernetes_service_name": sv["name"],
            }
            for k, v in (sv.get("labels") or {}).items():
                labels[f"__meta_kubernetes_service_label_{k}"] = v
            out.append((f"{sv['cluster_ip']}:{sv['port']}", labels))
    return _norm_targets(out)


def ec2_targets(id: str, client, port: int = 80) -> list[tuple[str, dict]]:
    """EC2 discovery behind an injected-client seam (reference:
    services/ec2/config.go — validation mirrored: an ID and a region are
    required; the region lives on the client, which the reference also
    builds from its config before handing Prometheus an ec2.SDConfig).

    ``client.region`` (validated non-empty) and ``client.instances() ->
    [{instance_id, private_ip, availability_zone, tags}]``; running
    instances map to ``private_ip:port`` with the public __meta_ec2_*
    labels (tag keys prefixed __meta_ec2_tag_<key>)."""
    if not id:
        raise ValueError("ec2 discovery must be given a ID")
    if not str(getattr(client, "region", "") or "").strip():
        raise ValueError(f"ec2 discovery, {id}, requires a region")
    out: list[tuple[str, dict]] = []
    for inst in client.instances():
        if not inst.get("private_ip"):
            continue  # Prometheus skips instances with no private IP
        labels = {
            "__meta_ec2_instance_id": inst["instance_id"],
            "__meta_ec2_availability_zone": inst.get("availability_zone", ""),
        }
        for k, v in (inst.get("tags") or {}).items():
            labels[f"__meta_ec2_tag_{k}"] = v
        out.append((f"{inst['private_ip']}:{port}", labels))
    return _norm_targets(out)


def http_sd_targets(
    url: str, timeout: float = 10.0, tolerant: bool = False
) -> list[tuple[str, dict]]:
    """HTTP service discovery: GET ``url`` and parse the public
    Prometheus http_sd body — the SAME target-group JSON as file_sd
    (a list of {"targets": [...], "labels": {...}}), so anything that
    can serve a file can be a control plane. Returns (url, labels)
    pairs for scrape_targets / scrape_stream.

    ``tolerant=True`` maps fetch/parse failures to an empty list (the
    streaming refresh behavior: one bad poll contributes nothing and
    the previous wave's scrape set simply re-discovers next trigger)."""
    import json as _json
    import sys as _sys
    import urllib.request as _rq

    try:
        with _rq.urlopen(url, timeout=timeout) as resp:
            groups = _json.loads(resp.read().decode("utf-8"))
        out = []
        for g in groups or []:
            labels = dict(g.get("labels") or {})
            for addr in g.get("targets") or []:
                out.append((addr, labels))
        return _norm_targets(out)
    except Exception as e:  # noqa: BLE001 — poll isolation
        if not tolerant:
            raise
        print(f"http discovery failed for {url}: {e}", file=_sys.stderr)
        return []


def scrape_stream_file_sd(
    spark: SparkSession,
    files: Sequence[str],
    job: str = "scrape",
    timeout: float = 10.0,
    blacklist: Sequence[str] = (),
    tolerant: bool = True,
) -> DataFrame:
    """Continuous scraping with HOT-RELOADED file discovery: every
    micro-batch re-reads the file_sd files and scrapes whatever targets
    they currently list — the reference's file-discovery refresh loop
    (its RefreshInterval) collapsed onto the scrape trigger. Two Arrow
    stages per wave: discover (1 tick row → target rows) then scrape
    (repartitioned fan-out, the shared fetch closure). The files must be
    visible to executors (shared storage on a real cluster — exactly the
    deployment shape Prometheus file_sd assumes)."""
    fetch = _make_fetch(job, timeout, set(blacklist), tolerant, None)
    file_list = list(files)
    for pattern in file_list:
        if not _FILE_SD_RE.match(pattern):
            raise ValueError(
                f'path name "{pattern}" is not valid for file discovery'
            )

    def discover(batches):
        import json as _json

        import pandas as pd

        for pdf in batches:
            rows = []
            if len(pdf):  # one tick row per micro-batch → one re-discovery
                rows = [
                    (u, _json.dumps(l) if l else None)
                    for u, l in file_sd_targets(file_list, tolerant=True)
                ]
            yield pd.DataFrame(rows, columns=["url", "labels_json"])

    ticks = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 1)
        .load()
    )
    urls = ticks.mapInPandas(discover, schema="url string, labels_json string")
    raw = urls.repartition(int(spark.sparkContext.defaultParallelism)).mapInPandas(
        fetch, schema="ts_ms long, name string, tags map<string,string>, value double"
    )
    return raw.selectExpr(
        "timestamp_millis(ts_ms) AS time", "name", "tags", "value"
    )
