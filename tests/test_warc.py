"""WARC reader/writer: roundtrip (plain + per-record gzip), framing
strictness, foreign-archive tolerance, and the distributed extraction
hop composing with strip_html."""

from __future__ import annotations

import zlib

import pytest

from kapacitor_spark.sources.warc import build_warc, parse_warc, warc_records

RECS = [
    ("http://example.com/a", "2026-01-01T00:00:00Z", b"<html><body>Hello</body></html>"),
    ("http://example.com/b", "2026-01-02T00:00:00Z", b""),
    ("http://example.com/c", "2026-01-03T00:00:00Z", b"\x00\x01binary\xff"),
]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(gz):
    data = build_warc(RECS, gzip_per_record=gz)
    if gz:
        assert data[:2] == b"\x1f\x8b"
    out = parse_warc(data)
    assert [(r["url"], r["date"], r["content"]) for r in out] == RECS
    assert all(r["type"] == "response" for r in out)


def test_gzip_members_are_independent():
    """Common Crawl contract: each record its own gzip member, members
    concatenate — parsing a slice of members must work."""
    data = build_warc(RECS, gzip_per_record=True)
    # find the second member boundary by magic scan
    idx = data.find(b"\x1f\x8b", 2)
    assert idx > 0
    first = parse_warc(data[:idx])
    assert len(first) == 1 and first[0]["url"] == RECS[0][0]
    rest = parse_warc(data[idx:])
    assert [r["url"] for r in rest] == [RECS[1][0], RECS[2][0]]


def test_truncated_raises():
    data = build_warc(RECS)
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(data[: len(data) - 40])
    with pytest.raises(ValueError, match="expected version"):
        parse_warc(b"NOT A WARC" + data)
    # truncated gzip member
    gz = build_warc(RECS, gzip_per_record=True)
    with pytest.raises(ValueError, match="truncated gzip"):
        parse_warc(gz[: len(gz) - 8])


def test_foreign_headers_and_order_tolerated():
    raw = (
        b"WARC/1.1\r\n"
        b"Content-Length: 5\r\n"
        b"X-Custom: whatever: nested colons\r\n"
        b"WARC-Target-URI: http://x/\r\n"
        b"WARC-Type: request\r\n"
        b"WARC-Date: 2026-02-02T00:00:00Z\r\n"
        b"\r\n"
        b"hello\r\n\r\n"
    )
    out = parse_warc(raw)
    assert out == [
        {
            "url": "http://x/",
            "date": "2026-02-02T00:00:00Z",
            "type": "request",
            "content": b"hello",
        }
    ]


def test_missing_content_length_raises():
    raw = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(raw)


def test_distributed_extraction_composes_with_strip_html(spark):
    from kapacitor_spark.dataprep.text import strip_html
    import pyspark.sql.functions as F

    archives = [
        (0, build_warc([
            ("http://e/0", "2026-01-01T00:00:00Z", b"<p>doc zero</p>"),
            ("http://e/1", "2026-01-01T00:00:00Z", b"<div>doc&amp;one</div>"),
        ])),
        (1, build_warc([
            ("http://e/2", "2026-01-01T00:00:00Z", b"plain two"),
        ], gzip_per_record=True)),
        (2, None),  # null archive: skipped
    ]
    df = spark.createDataFrame(archives, "archive_id long, payload binary")
    recs = warc_records(df)
    got = {r["url"]: r for r in recs.collect()}
    assert set(got) == {"http://e/0", "http://e/1", "http://e/2"}
    assert got["http://e/1"]["content_length"] == len(b"<div>doc&amp;one</div>")
    texts = strip_html(
        recs.select("url", F.col("content").cast("string").alias("text")),
        text_col="text",
    )
    tx = {r["url"]: r["text"] for r in texts.collect()}
    assert tx["http://e/0"] == "doc zero"
    assert tx["http://e/1"] == "doc&one"
    assert tx["http://e/2"] == "plain two"


def test_streaming_warc_ingest(spark, tmp_path):
    """The real crawl-ingest shape: .warc/.warc.gz files LAND over time
    (binaryFile streaming source, one archive per file) and records
    extract + HTML-strip per micro-batch — warc_records is stateless, so
    it runs unchanged on the unbounded stream."""
    import pyspark.sql.functions as F

    from kapacitor_spark.dataprep.text import strip_html

    land = tmp_path / "landing"
    land.mkdir()
    (land / "a0.warc").write_bytes(
        build_warc([("http://e/0", "2026-01-01T00:00:00Z", b"<p>zero</p>")])
    )
    (land / "a1.warc.gz").write_bytes(
        build_warc(
            [
                ("http://e/1", "2026-01-01T00:00:00Z", b"<p>one</p>"),
                ("http://e/2", "2026-01-01T00:00:00Z", b"two"),
            ],
            gzip_per_record=True,
        )
    )
    src = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("maxFilesPerTrigger", 1)
        .load(str(land))
        .select(F.col("path").alias("archive_id"), F.col("content").alias("payload"))
    )
    recs = warc_records(src, id_col="archive_id")
    texts = strip_html(
        recs.select("url", F.col("content").cast("string").alias("text"))
    )
    q = (
        texts.writeStream.format("memory")
        .queryName("warcstream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_warc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["url"]: r["text"]
        for r in spark.sql("SELECT * FROM warcstream").collect()
    }
    assert got == {"http://e/0": "zero", "http://e/1": "one", "http://e/2": "two"}


# ------------------------------------------------------------------ #
# hypothesis fuzz: arbitrary records round-trip through both framings
# ------------------------------------------------------------------ #
from hypothesis import given, settings
from hypothesis import strategies as st

_payload = st.binary(max_size=200)
_url = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789:/.-_", min_size=1, max_size=40
).map(lambda s: "http://" + s)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.tuples(_url, st.just("2026-01-01T00:00:00Z"), _payload),
             min_size=0, max_size=8),
    st.booleans(),
)
def test_warc_roundtrip_fuzz(records, gz):
    """Any record list — including empty payloads, binary bytes that
    contain CRLF/WARC-like sequences, and zero records — must round-trip
    exactly through both the plain and per-record-gzip framings."""
    data = build_warc(records, gzip_per_record=gz)
    out = parse_warc(data)
    assert [(r["url"], r["date"], r["content"]) for r in out] == records


def test_crlf_url_rejected():
    """A crawl URL with embedded CR/LF would inject forged header lines
    into the CRLF-framed header block — the writer must refuse it
    (ADVICE r9: the URL module quarantines CRLF URLs; the writer was the
    remaining unguarded path)."""
    bad = [("http://e.com/a\r\nWARC-Type: forged", "2026-01-01T00:00:00Z", b"x")]
    with pytest.raises(ValueError, match="CR/LF"):
        build_warc(bad)
    bad_date = [("http://e.com/a", "2026-01-01\r\nX: y", b"x")]
    with pytest.raises(ValueError, match="CR/LF"):
        build_warc(bad_date)


def test_iter_warc_streams_per_member():
    """iter_warc releases records member-by-member: after consuming the
    first record the generator must not yet have decompressed/parsed a
    corrupt LATER member (proving incremental parsing, not
    whole-archive materialization)."""
    from kapacitor_spark.sources.warc import iter_warc

    good = build_warc(RECS[:1], gzip_per_record=True)
    bad = b"\x1f\x8b" + b"\x00" * 10  # corrupt second member
    it = iter_warc(good + bad)
    first = next(it)  # must succeed before the corrupt member is touched
    assert first["url"] == RECS[0][0]
    with pytest.raises(ValueError):
        next(it)


def test_iter_warc_record_spanning_members():
    """A record whose framing is split across gzip members (half the
    header in one member, body+terminator in the next) must parse: the
    incremental scanner holds the unconsumed tail across members."""
    from kapacitor_spark.sources.warc import iter_warc

    plain = build_warc(RECS)
    cut = len(plain) // 2

    def member(chunk: bytes) -> bytes:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(chunk) + co.flush()

    data = member(plain[:cut]) + member(plain[cut:])
    out = list(iter_warc(data))
    assert [(r["url"], r["date"], r["content"]) for r in out] == RECS


def test_warc_records_chunked_flush(spark):
    """max_chunk_bytes bounds executor memory: with a 1-byte cap every
    record flushes in its own output chunk, and the row set is identical
    to the unchunked extraction."""
    from pyspark.sql import Row

    data = build_warc(RECS, gzip_per_record=True)
    df = spark.createDataFrame([Row(archive_id=1, payload=bytearray(data))])
    out = warc_records(df, max_chunk_bytes=1).orderBy("url").collect()
    assert [(r["url"], bytes(r["content"])) for r in out] == [
        (u, p) for (u, d, p) in RECS
    ]
