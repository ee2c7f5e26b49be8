"""InfluxDB line-protocol ingest/egress (SURVEY §2.1).

The reference ingests line protocol over HTTP/UDP
(/root/reference/services/httpd/handler.go, services/udp/service.go:145)
and replays recorded ``.srpl`` fixtures (dbname/rpname header pairs + one
point per line, /root/reference/replay.go:17-110). The wire format is the
public InfluxDB line protocol:

    measurement[,tag=val...] field=value[,field2=value2...] [timestamp_ns]

Field value types: float (``1.0``), integer (``2i``), string (``"s"``),
boolean (``t/true/f/false``); commas/spaces/equals in identifiers are
backslash-escaped; string field values escape ``"``.

Spark mapping: parsing is per-row string work (inherently scalar — the
reference parses each line in Go too), so it runs in ``mapInPandas`` with a
compiled regex tokenizer: Arrow-batched, parallel across partitions, and
ONLY at the ingest edge — everything downstream is typed columns. Egress
(``to_line_protocol``) is pure JVM concat/regexp (codegen'd).

Parsed schema (the reference's schemaless point, /root/reference/models/
point.go, typed by class):

    name string, tags map<string,string>,
    fields_f map<string,double>, fields_i map<string,long>,
    fields_s map<string,string>, fields_b map<string,boolean>,
    time timestamp

``promote()`` turns that into the wide/typed layout (SURVEY §1.3) for one
measurement: tags + chosen fields as top-level typed columns.
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

PARSED_SCHEMA = (
    "name string, tags map<string,string>, "
    "fields_f map<string,double>, fields_i map<string,long>, "
    "fields_s map<string,string>, fields_b map<string,boolean>, "
    "time timestamp"
)

# split on unescaped commas / spaces / equals
_UNESC_COMMA = re.compile(r"(?<!\\),")
_UNESC_SPACE = re.compile(r"(?<!\\) ")
_UNESC_EQ = re.compile(r"(?<!\\)=")
_UNESCAPE = re.compile(r"\\([, =])")

# field values: "str" | 123i | 1.5 | true/false — strings may contain
# escaped quotes and commas, so fields are tokenized with a real scanner.
_FIELD_TOKEN = re.compile(
    r'(?P<key>(?:[^\\,= ]|\\.)+)='
    r'(?P<val>"(?:[^"\\]|\\.)*"|[^,]*)'
)


def _unescape(s: str) -> str:
    return _UNESCAPE.sub(r"\1", s)


_PRECISION_US = {"u": 1, "ms": 1_000, "s": 1_000_000}


def parse_line(line: str, precision_ns: bool = True, precision: str | None = None):
    """Parse one line → dict matching PARSED_SCHEMA or None for blank/
    comment lines. ``precision`` ('ns'|'u'|'ms'|'s') overrides the legacy
    precision_ns flag — the reference's replay/write paths carry an
    explicit precision (replay.go ReplayStreamFromIO; the integration
    harness replays .srpl at 's')."""
    # ASCII-only trim: Python's bare strip() also eats unicode whitespace
    # (e.g. U+00A0), which the reference's Go parser treats as measurement
    # content — found by the hypothesis roundtrip fuzz
    line = line.strip(" \t\r\n")
    if not line or line.startswith("#"):
        return None
    # split into measurement+tags | fields | [timestamp]; drop empty
    # segments from repeated separator spaces — influx's parser is
    # lenient there and reference fixtures contain double-space lines
    # (TestStream_HttpPost_URL_Template.srpl line 5)
    parts = [p for p in _UNESC_SPACE.split(line) if p != ""]
    if len(parts) < 2:
        raise ValueError(f"line protocol: need fields segment: {line!r}")
    ts = None
    if len(parts) >= 3 and re.fullmatch(r"-?\d+", parts[-1]):
        ts = int(parts[-1])
        head, field_part = parts[0], " ".join(parts[1:-1])
    else:
        head, field_part = parts[0], " ".join(parts[1:])

    head_parts = _UNESC_COMMA.split(head)
    name = _unescape(head_parts[0])
    tags = {}
    for t in head_parts[1:]:
        k, _, v = t.partition("=")
        tags[_unescape(k)] = _unescape(v)

    ff, fi, fs, fb = {}, {}, {}, {}
    pos = 0
    while pos < len(field_part):
        m = _FIELD_TOKEN.match(field_part, pos)
        if not m:
            raise ValueError(f"line protocol: bad fields at {field_part[pos:]!r}")
        key = _unescape(m.group("key"))
        raw = m.group("val")
        if raw.startswith('"'):
            fs[key] = raw[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        elif raw.endswith(("i", "u")) and re.fullmatch(r"-?\d+[iu]", raw):
            fi[key] = int(raw[:-1])
        elif raw in ("t", "T", "true", "True", "TRUE"):
            fb[key] = True
        elif raw in ("f", "F", "false", "False", "FALSE"):
            fb[key] = False
        else:
            ff[key] = float(raw)
        pos = m.end()
        if pos < len(field_part) and field_part[pos] == ",":
            pos += 1

    if precision is None:
        precision = "ns" if precision_ns else "u"
    if ts is None:
        ts_us = None
    elif precision == "ns":
        ts_us = ts // 1000
    else:
        ts_us = ts * _PRECISION_US[precision]
    return {
        "name": name,
        "tags": tags,
        "fields_f": ff,
        "fields_i": fi,
        "fields_s": fs,
        "fields_b": fb,
        "time": pd.Timestamp(ts_us, unit="us") if ts_us is not None else None,
    }


def _parse_lines_python(df: DataFrame, col: str, precision_ns: bool) -> DataFrame:
    """Full-fidelity per-line parser (escapes, quoted strings) via
    mapInPandas — Arrow in/out, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for line in pdf[col]:
                try:
                    r = parse_line(line, precision_ns)
                except ValueError:
                    r = None  # reference drops unparseable writes
                if r is not None:
                    rows.append(r)
            yield pd.DataFrame(
                rows,
                columns=["name", "tags", "fields_f", "fields_i", "fields_s", "fields_b", "time"],
            )

    return df.mapInPandas(run, schema=PARSED_SCHEMA)


def _parse_lines_jvm(df: DataFrame, col: str, precision_ns: bool) -> DataFrame:
    """JVM fast path for SIMPLE lines (no quotes, no backslash escapes —
    the overwhelmingly common telemetry shape): split + str_to_map +
    regex-classified typed maps, all inside whole-stage codegen.

    Built as TWO selectExpr strings (r11 optimization round): the
    Column-API chain cost ~0.25 s of driver py4j/analysis time per build;
    the strings are verbatim SQL spellings of the same expressions, so
    the analyzed plan — and the parse — are identical."""
    div = 1000 if precision_ns else 1
    is_int = r"'^-?\\d+[iu]$'"
    is_bool = "'^(t|T|true|True|TRUE|f|F|false|False|FALSE)$'"
    is_true = "'^(t|T|true|True|TRUE)$'"
    is_float = r"'^-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?$'"
    pre = df.selectExpr(
        f"element_at(split(`{col}`, ' '), 1) AS __head",
        f"element_at(split(`{col}`, ' '), 2) AS __fs",
        f"CAST(CASE WHEN size(split(`{col}`, ' ')) >= 3 "
        f"THEN element_at(split(`{col}`, ' '), 3) END AS BIGINT) AS __ts",
    )
    return pre.selectExpr(
        "substring_index(__head, ',', 1) AS name",
        "coalesce(str_to_map(CASE WHEN instr(__head, ',') > 0 "
        "THEN substring(__head, instr(__head, ',') + 1) END, ',', '='), "
        "cast(map() as map<string,string>)) AS tags",
        f"transform_values(map_filter(str_to_map(__fs, ',', '='), "
        f"(k, v) -> v rlike {is_float}), (k, v) -> cast(v as double)) AS fields_f",
        f"transform_values(map_filter(str_to_map(__fs, ',', '='), "
        f"(k, v) -> v rlike {is_int}), "
        f"(k, v) -> cast(substring(v, 1, length(v) - 1) as bigint)) AS fields_i",
        "cast(map() as map<string,string>) AS fields_s",
        f"transform_values(map_filter(str_to_map(__fs, ',', '='), "
        f"(k, v) -> v rlike {is_bool}), (k, v) -> v rlike {is_true}) AS fields_b",
        # integer div — float division of ns epochs loses µs precision
        f"timestamp_micros(__ts div {div}) AS time",
    )


def parse_lines(
    df: DataFrame, col: str = "value", precision_ns: bool = True, fast: bool = True
) -> DataFrame:
    """Parse raw line-protocol rows (from ``spark.read.text``/Kafka) into
    typed points.

    Hybrid plan: lines without quotes/escapes parse fully JVM-side
    (codegen'd split/str_to_map — the hot ingest path); the rest go through
    the exact Python parser. Both branches read the same scan; Spark unions
    them without an extra shuffle.
    """
    if not fast:
        return _parse_lines_python(df, col, precision_ns)
    line = F.col(col)
    # strict structural shape: head + fields (+ numeric ts), no quotes or
    # escapes anywhere — anything else takes the exact Python parser
    simple = (
        ~line.contains('"')
        & ~line.contains("\\")
        & line.rlike(r"^[^ #][^ ]* [^ ]+( -?\d+)?$")
    )
    fast_part = _parse_lines_jvm(df.filter(simple), col, precision_ns)
    slow_src = df.filter(~simple)
    if not slow_src.isStreaming:
        # AQE-rebalance boundary before the Python stage (r11, guide
        # §2.2/§4): without it the exact parser inherits the SOURCE's
        # partitioning, so a clean corpus still launches one (empty)
        # Python task per input partition — measured 0.45 s of pure
        # worker round-trips per run at sf0.1 (hybrid 0.73 s vs 0.28 s
        # JVM-only with zero slow rows). Rebalance lets AQE size the
        # Python stage to the slow branch's ACTUAL bytes: empty → one
        # task; an escape-heavy ingest → advisory-sized partitions. The
        # shuffle moves only the slow rows (normally a sliver). Streaming
        # inputs keep the direct plan — no AQE there, and a per-batch
        # shuffle of the slow sliver would cost more than idle workers.
        slow_src = slow_src.hint("rebalance")
    slow_part = _parse_lines_python(slow_src, col, precision_ns)
    return fast_part.unionByName(slow_part)


def read_srpl(spark: SparkSession, path: str, precision: str = "ns") -> DataFrame:
    """Read a reference-format ``.srpl`` replay fixture: repeating
    [dbname, rpname, point-line] triples (/root/reference/replay.go:49-70;
    fixtures integrations/testdata/*.srpl). Driver-side read — fixtures are
    tiny test inputs, not data-plane files."""
    with open(path) as fh:
        raw = [ln.rstrip("\n") for ln in fh]
    rows = []
    i = 0
    while i + 2 < len(raw) + 1:
        if i + 2 >= len(raw) + 1 or not raw[i].strip():
            break
        db, rp, pt = raw[i], raw[i + 1], raw[i + 2]
        r = parse_line(pt, precision=precision)
        if r is not None:
            r["database"], r["retention_policy"] = db, rp
            rows.append(r)
        i += 3
    pdf = pd.DataFrame(
        rows,
        columns=["name", "tags", "fields_f", "fields_i", "fields_s", "fields_b",
                 "time", "database", "retention_policy"],
    )
    return spark.createDataFrame(
        pdf, PARSED_SCHEMA + ", database string, retention_policy string"
    )


def read_brpl(spark: SparkSession, path: str) -> DataFrame:
    """Read a reference-format ``.brpl`` batch-replay fixture: one JSON
    object per line = one batch {name, tags, points:[{fields, time}]}
    (/root/reference/replay.go batch replay; fixtures
    integrations/testdata/*.brpl). Emits one row per point with its
    0-based ``batch_id`` — the reference's batch-edge grouping key (a
    batch reduces to one point under aggregation, SURVEY §2.5)."""
    import json

    # streaming decode: fixtures are EITHER one JSON object per line OR
    # pretty-printed multi-line objects back to back — raw_decode walks both
    dec = json.JSONDecoder()
    text = open(path).read()
    batches = []
    i = 0
    while True:
        while i < len(text) and text[i] in " \t\r\n":
            i += 1
        if i >= len(text):
            break
        obj, end = dec.raw_decode(text, i)
        batches.append(obj)
        i = end

    rows = []
    for bid, b in enumerate(batches):
        for p in b["points"]:
            ts = pd.Timestamp(p["time"])
            if ts.tzinfo is not None:
                ts = ts.tz_convert("UTC").tz_localize(None)
            flds = p.get("fields", {})
            rows.append(
                {
                    "batch_id": bid,
                    "name": b.get("name"),
                    "tags": b.get("tags") or {},
                    "fields_f": {
                        k: float(v) for k, v in flds.items()
                        if isinstance(v, (int, float)) and not isinstance(v, bool)
                    },
                    "fields_s": {
                        k: v for k, v in flds.items() if isinstance(v, str)
                    },
                    "fields_b": {
                        k: v for k, v in flds.items() if isinstance(v, bool)
                    },
                    "time": ts,
                }
            )
    pdf = pd.DataFrame(
        rows,
        columns=["batch_id", "name", "tags", "fields_f", "fields_s", "fields_b", "time"],
    )
    return spark.createDataFrame(
        pdf,
        "batch_id long, name string, tags map<string,string>, "
        "fields_f map<string,double>, fields_s map<string,string>, "
        "fields_b map<string,boolean>, time timestamp",
    )


def replay_brpl(
    spark: SparkSession, path: str, zero: str = "1971-01-01 00:00:00"
) -> DataFrame:
    """Replay a .brpl fixture with the reference harness's clock shift
    (first point lands on 1971-01-01; see replay_srpl)."""
    df = read_brpl(spark, path)
    first = df.agg(F.min("time")).first()[0]
    shift = int(pd.Timestamp(zero).value // 1000) - int(pd.Timestamp(first).value // 1000)
    return df.withColumn(
        "time", F.timestamp_micros(F.unix_micros(F.col("time")) + F.lit(shift))
    )


def replay_srpl(
    spark: SparkSession,
    path: str,
    precision: str = "s",
    zero: str = "1971-01-01 00:00:00",
) -> DataFrame:
    """Replay an .srpl fixture exactly like the reference's test harness
    (/root/reference/integrations/streamer_test.go: ReplayStreamFromIO
    with precision 's', deterministic clock starting 1971-01-01,
    recTime=false — replay.go:49-70 shifts every timestamp so the FIRST
    point lands on clock zero). Event-time Spark needs no clock: the
    shift is a column expression."""
    df = read_srpl(spark, path, precision=precision)
    first = df.agg(F.min("time")).first()[0]  # tiny driver agg
    first_us = int(pd.Timestamp(first).value // 1000)
    zero_us = int(pd.Timestamp(zero).value // 1000)
    shift = zero_us - first_us
    return df.withColumn(
        "time", F.timestamp_micros(F.unix_micros(F.col("time")) + F.lit(shift))
    )


def promote(
    parsed: DataFrame,
    measurement: str,
    float_fields: Sequence[str] = (),
    int_fields: Sequence[str] = (),
    str_fields: Sequence[str] = (),
    bool_fields: Sequence[str] = (),
    tag_cols: Sequence[str] = (),
    keep_name: bool = False,
) -> DataFrame:
    """Schemaless → wide/typed layout (SURVEY §1.3): filter to one
    measurement, lift chosen tags/fields to typed top-level columns.
    ``keep_name=True`` carries the measurement as a ``name`` column —
    the reference's points always know their measurement (group identity
    is models.ToGroupID(name, tags), and alert templates render
    {{ .Name }}); aggregations ride it along automatically."""
    out = parsed.filter(F.col("name") == measurement)
    cols: list[Column] = [F.col("time")]
    if keep_name:
        cols.append(F.lit(measurement).alias("name"))
    for t in tag_cols:
        cols.append(F.col("tags").getItem(t).alias(t))
    for f_, src in (
        *[(x, "fields_f") for x in float_fields],
        *[(x, "fields_i") for x in int_fields],
        *[(x, "fields_s") for x in str_fields],
        *[(x, "fields_b") for x in bool_fields],
    ):
        cols.append(F.col(src).getItem(f_).alias(f_))
    return out.select(*cols)


def _escape_key(c: Column) -> Column:
    out = F.regexp_replace(c, r"([,= ])", r"\\$1")
    return out


def to_line_protocol(
    df: DataFrame,
    measurement: str | Column,
    tag_cols: Sequence[str] = (),
    field_cols: Sequence[str] | None = None,
    time_col: str = "time",
    precision: str = "ns",
) -> DataFrame:
    """Render rows as line protocol — the influxDBOut/egress direction
    (/root/reference/influxdb_out.go). Pure JVM expression (concat/
    regexp_replace), codegen'd; returns a single-column ``line`` DataFrame
    writable to text/Kafka. ``precision`` renders the trailing timestamp
    in ns/u/ms/s units (the reference's .precision() option,
    /root/reference/pipeline/influxdb_out.go)."""
    # ONE selectExpr string (r11 optimization round): the Column-API
    # chain cost ~0.2 s of driver py4j/analysis time per build. Literal
    # keys (measurement string, tag/field names) escape in PYTHON at
    # build time — regexp_replace of a literal is a constant — while
    # data-dependent values keep the identical regexp_replace expression.
    import re as _re

    def _esc_lit(s: str) -> str:
        return _re.sub(r"([,= ])", r"\\\1", s)

    def _sq(s: str) -> str:
        # single-quoted SQL string literal (escape backslash + quote)
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    esc_val = (
        lambda e: f"regexp_replace({e}, '([,= ])', '\\\\\\\\$1')"
    )  # SQL sees pattern ([,= ]) and replacement \\$1 — same as _escape_key
    if isinstance(measurement, str):
        mexpr = _sq(_esc_lit(measurement))
        pre = df
    else:
        # arbitrary measurement Column: project it once, escape in SQL
        pre = df.withColumn("__kspark_m", measurement)
        mexpr = esc_val("cast(__kspark_m as string)")
    fields = field_cols or [
        c for c in df.columns if c not in tag_cols and c != time_col
    ]
    parts: list[str] = [mexpr]
    for t in tag_cols:
        parts.append(
            f"CASE WHEN `{t}` IS NOT NULL THEN concat(',', {_sq(_esc_lit(t))}, "
            f"'=', {esc_val(f'cast(`{t}` as string)')}) ELSE '' END"
        )
    field_frags = []
    dtypes = dict(df.dtypes)
    for fld in fields:
        dt = dtypes[fld]
        if dt in ("bigint", "int", "smallint", "tinyint", "long"):
            rendered = f"concat(cast(`{fld}` as string), 'i')"
        elif dt == "boolean":
            rendered = f"CASE WHEN `{fld}` THEN 'true' ELSE 'false' END"
        elif dt == "string":
            # pattern \\ (one literal backslash), replacement \\\\ (two);
            # then " -> \" — identical to the old _escape chain
            rendered = (
                "concat('\"', regexp_replace(regexp_replace("
                f"`{fld}`, '\\\\\\\\', '\\\\\\\\\\\\\\\\'), "
                "'\"', '\\\\\\\\\"'), '\"')"
            )
        else:
            # %.17g-style shortest-roundtrip float rendering: Spark's
            # string cast of DoubleType is already round-trippable
            rendered = f"cast(`{fld}` as string)"
        field_frags.append(
            f"CASE WHEN `{fld}` IS NOT NULL THEN "
            f"concat({_sq(_esc_lit(fld))}, '=', {rendered}) END"
        )
    field_str = "concat_ws(',', " + ", ".join(field_frags) + ")"
    um = f"unix_micros(`{time_col}`)"
    scaled = {
        "ns": f"{um} * 1000",
        "u": um,
        "ms": f"cast({um} / 1000 as bigint)",
        "s": f"cast({um} / 1000000 as bigint)",
    }
    try:
        ts = f"cast({scaled[precision]} as string)"
    except KeyError:
        raise ValueError(f"precision must be one of {sorted(scaled)}, got {precision!r}")
    line = (
        "concat(" + ", ".join(parts) + ", ' ', " + field_str + ", ' ', " + ts + ")"
    )
    return pre.selectExpr(f"{line} AS line")


def _esc_key_py(s: str, what: str) -> str:
    # Only the escapes the PARSER actually reverses survive a round trip
    # (the shared line-protocol wart: no backslash escape exists in the
    # wire format, and '=' in keys does not unsplit) — refuse the rest
    # loudly rather than corrupt identifiers silently.
    if "\\" in s or "=" in s or "\n" in s:
        raise ValueError(
            f"record_srpl: {what} {s!r} contains a character the line "
            "protocol cannot round-trip (backslash / '=' / newline)"
        )
    return s.replace(",", "\\,").replace(" ", "\\ ")


def record_srpl(
    df: DataFrame,
    path: str,
    precision: str = "ns",
    database: str = "dbname",
    retention_policy: str = "rpname",
) -> int:
    """Write a ``.srpl`` recording — the inverse of :func:`read_srpl`
    (same default precision) and the engine-side analog of the
    reference's ``kapacitor record`` (/root/reference/replay.go
    WriteStreamFor* : repeating [db, rp, line-protocol point] triples).
    Accepts a PARSED_SCHEMA DataFrame (what read_srpl/parse_lines
    produce; ``database``/``retention_policy`` columns override the
    defaults when present). Identifiers or values the wire format cannot
    represent round-trip-safely (backslash, '=' in keys, raw newlines)
    raise instead of corrupting the recording; a point needs at least
    one field and a non-null time. Driver-side write, like read_srpl —
    recordings are test fixtures, not data-plane files. Returns the
    number of points written."""
    div = {"ns": 1, "u": 1_000, "ms": 1_000_000, "s": 1_000_000_000}[precision]
    cols = set(df.columns)
    rows = df.orderBy("time").collect()
    n = 0
    with open(path, "w") as fh:
        for r in rows:
            parts = [_esc_key_py(r["name"] or "", "measurement")]
            for k in sorted((r["tags"] or {})):
                parts.append(
                    f",{_esc_key_py(k, 'tag key')}="
                    f"{_esc_key_py(r['tags'][k], 'tag value')}"
                )
            frags = []
            for k in sorted((r["fields_f"] or {})):
                frags.append(f"{_esc_key_py(k, 'field key')}={r['fields_f'][k]!r}")
            for k in sorted((r["fields_i"] or {})):
                frags.append(f"{_esc_key_py(k, 'field key')}={r['fields_i'][k]}i")
            for k in sorted((r["fields_s"] or {})):
                sv = r["fields_s"][k]
                if "\n" in sv or "\\" in sv:
                    raise ValueError(
                        "record_srpl: string field value contains a newline "
                        "or backslash the line format cannot round-trip"
                    )
                frags.append(
                    f'{_esc_key_py(k, "field key")}="{sv.replace(chr(34), chr(92) + chr(34))}"'
                )
            for k in sorted((r["fields_b"] or {})):
                frags.append(
                    f"{_esc_key_py(k, 'field key')}="
                    f"{'true' if r['fields_b'][k] else 'false'}"
                )
            if not frags:
                raise ValueError("record_srpl: point has no fields")
            if r["time"] is None:
                raise ValueError("record_srpl: point has a null time")
            ts_ns = int(pd.Timestamp(r["time"]).value)
            ts = ts_ns // div
            db = r["database"] if "database" in cols else database
            rp = r["retention_policy"] if "retention_policy" in cols else retention_policy
            fh.write(f"{db}\n{rp}\n{parts[0]}{''.join(parts[1:])} "
                     f"{','.join(frags)} {ts:010d}\n")
            n += 1
    return n


def subscribe_stream(
    spark: SparkSession,
    path: str,
    precision_ns: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The engine side of an InfluxDB SUBSCRIPTION: a continuous
    line-protocol feed parsed into typed points as a STREAMING DataFrame.

    The reference registers itself with InfluxDB, which then pushes
    writes over UDP/HTTP (services/influxdb subscriptions,
    services/udp/service.go:145); the transport registration is external
    service plumbing, but the data plane — "line protocol keeps
    arriving, points keep flowing" — is exactly a Structured Streaming
    text source + the hybrid JVM/Arrow parser. Point the subscriber
    (or any collector) at a spool directory and read it here; swap the
    text source for Kafka with the same parse_lines call.

    Returns the parsed stream (name/tags/fields/time columns); feed it
    to any streaming operator or barrier().
    """
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(path)
    return parse_lines(raw, col="value", precision_ns=precision_ns)
