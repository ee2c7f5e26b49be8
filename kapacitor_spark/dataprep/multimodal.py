"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched Pandas UDFs over
mapInPandas.

Decode comes in two flavors:

* ``fake=False`` (REAL): decode via the stdlib-only codecs —
  PNG (zlib inflate + filter reconstruction, palette/interlace),
  uncompressed BMP, PPM/PGM, huffman JPEG (baseline + progressive),
  GIF (LZW), and lossless WebP (VP8L) all produce real pixels; only
  lossy VP8 and arithmetic-coded JPEG raise ``NotImplementedError``,
  since their entropy coding genuinely needs an imaging library this
  container lacks.
* ``fake=True``: a deterministic digest-derived decoder — useful for
  exercising the schema/partitioning/UDF plumbing against payloads that
  aren't actual images (and as the oracle-replicable arithmetic in
  fixture queries).

Scale notes: binary payloads dominate partition size — repartition so that
``rows_per_partition × avg_payload ≲ 128 MB`` before mapInPandas (Arrow
batches materialize per-partition slices in memory). Metadata-only
operations (filtering by width, sampling frames by index) should happen on
the typed metadata columns FIRST so pruned rows never decode.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kapacitor_spark.dataprep.cache import track

__all__ = [
    "IMAGE_SCHEMA",
    "AUDIO_SCHEMA",
    "attach_binary_metadata",
    "decode_image_batch",
    "decode_full",
    "decode_audio_batch",
    "extract_image_features",
    "extract_audio_features",
    "sample_frames",
    "dhash_expr",
    "image_dhash_near_dup",
    "audio_dhash_expr",
    "audio_dhash_near_dup",
    "phash_batch",
    "image_phash_near_dup",
]

# typed metadata companion for an opaque binary image column
IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic fake decoder: metadata derived from a digest of the
    bytes. Stands in for PIL.Image.open(...) — same output contract."""
    d = hashlib.md5(payload or b"").digest()
    return {
        "width": 64 + d[0] % 192,
        "height": 64 + d[1] % 192,
        "format": ["jpeg", "png", "webp"][d[2] % 3],
        "size_bytes": len(payload or b""),
    }


def _real_header(payload: bytes) -> dict:
    from kapacitor_spark.dataprep import imagecodec

    fmt, w, h = imagecodec.parse_header(payload)
    return {
        "width": w,
        "height": h,
        "format": fmt,
        "size_bytes": len(payload),
    }


def attach_binary_metadata(
    df: DataFrame, binary_col: str = "payload", fake: bool = True
) -> DataFrame:
    """Decode header metadata for a binary media column via mapInPandas.

    ``fake=False`` parses real magic bytes / headers (cheap, no pixel
    decode — PNG IHDR, BMP info header, PNM header, JPEG SOFn, GIF
    descriptor; unknown formats get format=None and null dims). Output
    schema = input schema + IMAGE_SCHEMA fields.
    """
    out_schema = T.StructType(df.schema.fields + list(IMAGE_SCHEMA.fields))
    decode_one = _fake_decode if fake else _real_header

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf[binary_col].map(
                lambda b: decode_one(bytes(b) if b is not None else b"")
            )
            for fld in IMAGE_SCHEMA.fieldNames():
                pdf[fld] = meta.map(lambda m, f=fld: m[f])
            yield pdf

    return df.mapInPandas(gen, out_schema)


def decode_image_batch(df: DataFrame, binary_col: str = "payload", fake: bool = True):
    """Full image decode → pixel tensor.

    Adds ``pixels array<float>`` (HWC flattened, values in [0, 1]) — the
    shape a downstream embedding/feature UDF expects. ``fake=False``
    decodes real PNG/BMP/PPM/PGM payloads via ``imagecodec``,
    baseline+progressive JPEG via ``jpegcodec``, GIF via ``gifcodec``,
    and lossless WebP via ``webpcodec``; only lossy VP8 (and
    arithmetic-coded JPEG) raise NotImplementedError (their entropy
    coding needs an external lib).
    """
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("pixels", T.ArrayType(T.FloatType()))]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if fake:
            # deterministic fake: 8 'pixels' from the digest
            def to_pixels(b):
                d = hashlib.md5(b).digest()
                return [x / 255.0 for x in d[:8]]

        else:
            from kapacitor_spark.dataprep import imagecodec

            def to_pixels(b):
                _, _, _, pix = imagecodec.decode(b)
                return [x / 255.0 for x in pix]

        for pdf in batches:
            pdf["pixels"] = pdf[binary_col].map(
                lambda b: to_pixels(bytes(b) if b is not None else b"")
            )
            yield pdf

    return df.mapInPandas(gen, out_schema)


def decode_full(
    df: DataFrame, binary_col: str = "payload", fake: bool = True,
    decode_fn=None,
) -> DataFrame:
    """Metadata + pixel decode in ONE mapInPandas pass (each payload's
    digest computed once) — the shape a real pipeline wants: one Python
    hop per binary row, not one per derived signal. Output = input +
    IMAGE_SCHEMA fields + ``pixels array<float>``.

    ``decode_fn`` (r11 — the IMAGE leg of the lossy-codec seam, see
    CODECS.md): a caller-injected ``(payload: bytes) -> bytes``
    transcoding formats the stdlib codecs reject (lossy WebP,
    arithmetic JPEG, HEIC...) to one they read, run INSIDE this Arrow
    hop before the parse — e.g. ffmpeg to PPM via
    ``decoders.ffmpeg_decode_fn`` taking the first frame."""
    out_schema = T.StructType(
        df.schema.fields
        + list(IMAGE_SCHEMA.fields)
        + [T.StructField("pixels", T.ArrayType(T.FloatType()))]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            from kapacitor_spark.dataprep import imagecodec

        for pdf in batches:
            metas, pixels = [], []
            for b in pdf[binary_col]:
                raw = bytes(b) if b is not None else b""
                if decode_fn is not None:
                    raw = decode_fn(raw)
                if fake:
                    d = hashlib.md5(raw).digest()
                    metas.append(
                        {
                            "width": 64 + d[0] % 192,
                            "height": 64 + d[1] % 192,
                            "format": ["jpeg", "png", "webp"][d[2] % 3],
                            "size_bytes": len(raw),
                        }
                    )
                    pixels.append([x / 255.0 for x in d[:8]])
                else:
                    fmt, _, _ = imagecodec.parse_header(raw)
                    w, h, _, pix = imagecodec.decode(raw)
                    metas.append(
                        {"width": w, "height": h, "format": fmt, "size_bytes": len(raw)}
                    )
                    pixels.append([x / 255.0 for x in pix])
            for fld in IMAGE_SCHEMA.fieldNames():
                pdf[fld] = [m[fld] for m in metas]
            pdf["pixels"] = pixels
            yield pdf

    return df.mapInPandas(gen, out_schema)


def resize_image_batch(
    df: DataFrame,
    binary_col: str = "payload",
    width: int = 224,
    height: int = 224,
    fake: bool = True,
    encoder: str = "png",
) -> DataFrame:
    """Image resize → new binary payload + updated metadata.

    ``fake=False``: real nearest-neighbor resize — decode via
    ``imagecodec``, numpy index-gather to the target size, re-encode as
    ``encoder`` ('png', or 'ppm' when a content-independent output size
    matters — Netpbm payloads are header + w*h*channels bytes exactly).
    ``fake=True``: the payload is a deterministic digest-derived
    blob whose length scales with the target area, so partition-size
    accounting downstream behaves like real resized images even when the
    input bytes aren't actual images.
    """
    out_fields = [f for f in df.schema.fields if f.name not in ("width", "height")]
    out_schema = T.StructType(
        out_fields
        + [T.StructField("width", T.IntegerType()), T.StructField("height", T.IntegerType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if fake:

            def do_resize(b):
                d = hashlib.md5(b).digest()
                return bytes(d * max(1, (width * height) // (16 * 64)))

        else:
            from kapacitor_spark.dataprep import imagecodec

            enc = {
                "png": imagecodec.encode_png,
                "ppm": imagecodec.encode_ppm,
            }[encoder]

            def do_resize(b):
                w0, h0, ch, pix = imagecodec.decode(b)
                out = imagecodec.resize_nearest(pix, w0, h0, ch, width, height)
                return enc(width, height, out, channels=ch)

        for pdf in batches:
            pdf = pdf.drop(columns=[c for c in ("width", "height") if c in pdf.columns])
            pdf[binary_col] = pdf[binary_col].map(
                lambda b: do_resize(bytes(b) if b is not None else b"")
            )
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return df.mapInPandas(gen, out_schema)


# typed metadata companion for an opaque binary audio column
AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("audio_format", T.StringType()),
    ]
)


def decode_audio_batch(
    df: DataFrame,
    binary_col: str = "payload",
    target_frames: int | None = None,
    mono: bool = True,
    decode_fn=None,
) -> DataFrame:
    """REAL audio decode via the stdlib WAV codec (audiocodec.py):
    adds the AUDIO_SCHEMA metadata plus ``samples array<float>``
    (normalized [-1, 1]; channel-averaged when ``mono``; nearest-frame
    resampled to ``target_frames`` when set — resampling INSIDE the
    decode hop keeps the Arrow batch small, the audio analog of picking
    frame indices before video decode). WAV (incl. G.711/ADPCM) and
    lossless FLAC decode for real; only perceptual codecs (MP3/OGG)
    sniff for metadata routing but raise at decode — their entropy
    coding needs an audio library this container lacks.

    ``decode_fn`` (r11 — the AUDIO leg of the lossy-codec seam, see
    CODECS.md): a caller-injected ``(payload: bytes) -> bytes``
    transcoding to a format audiocodec reads (WAV/FLAC), run INSIDE
    this Arrow hop before the parse — e.g.
    ``decoders.ffmpeg_transcode_audio_fn()`` for MP3/AAC/OGG corpora."""
    out_schema = T.StructType(
        df.schema.fields
        + list(AUDIO_SCHEMA.fields)
        + [T.StructField("samples", T.ArrayType(T.FloatType()))]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from kapacitor_spark.dataprep import audiocodec as ac

        for pdf in batches:
            metas, sample_lists = [], []
            for b in pdf[binary_col]:
                raw = bytes(b) if b is not None else b""
                if decode_fn is not None:
                    raw = decode_fn(raw)
                fmt = ac.sniff_format(raw)
                channels, rate, samples = ac.decode_audio(raw)
                n_frames = samples.shape[0]
                if mono:
                    samples = ac.to_mono(samples)
                if target_frames is not None:
                    samples = ac.resample_nearest(samples, target_frames)
                metas.append(
                    {
                        "channels": channels,
                        "sample_rate": rate,
                        "n_frames": n_frames,
                        "audio_format": fmt,
                    }
                )
                sample_lists.append(samples.reshape(-1).tolist())
            for fld in AUDIO_SCHEMA.fieldNames():
                pdf[fld] = [m[fld] for m in metas]
            pdf["samples"] = sample_lists
            yield pdf

    return df.mapInPandas(gen, out_schema)


def extract_audio_features(df: DataFrame, samples_col: str = "samples") -> DataFrame:
    """RMS level + zero-crossing count over decoded samples — JVM
    aggregate expressions on the array column, no second Python hop
    (the audio twin of extract_image_features)."""
    v = F.col(samples_col)
    n = F.size(v).cast("double")
    sq = F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
    rms = F.sqrt(sq / F.greatest(n, F.lit(1.0)))
    zc = F.size(
        F.filter(
            F.zip_with(
                F.slice(v, 1, F.greatest(F.size(v) - 1, F.lit(0)).cast("int")),
                F.slice(v, 2, F.greatest(F.size(v) - 1, F.lit(0)).cast("int")),
                lambda a, b: (a.cast("double") * b.cast("double")) < 0,
            ),
            lambda x: x,
        )
    )
    return df.withColumn("rms", F.round(rms, 6)).withColumn("zero_crossings", zc)


def extract_image_features(df: DataFrame, pixels_col: str = "pixels") -> DataFrame:
    """Feature extraction over decoded pixels — mean/std as columns.
    Runs on the array column with JVM expressions (no second UDF hop)."""
    v = F.col(pixels_col)
    n = F.size(v).cast("double")
    mean = F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double")) / n
    return df.withColumn("pix_mean", F.round(mean, 6))


def dhash_expr(
    pixels_col: str, width: int, height: int, channels: int = 1
) -> "F.Column":
    """64-bit perceptual difference hash (dHash) over a decoded pixel
    array, as ONE pure column expression — no second Python hop after the
    decode UDF.

    Classic dHash: sample the grayscale image on a 9x8 grid and set bit
    j = (row r, col c) iff grid[r][c+1] > grid[r][c] — gradient signs
    survive re-encoding, scaling and small edits, so near-identical
    images land within a few bits of each other. Grid sampling is
    nearest-index (floor(gr*height/8), floor(gc*width/9)); for multi-
    channel input the channel SUM stands in for the grayscale mean
    (comparing sums ≡ comparing means). ``width``/``height``/``channels``
    are per-call constants, so all 64 comparisons compile to element_at
    lookups — resize mixed-size corpora to a common size first
    (resize_image_batch).
    """
    def gray(r: int, c: int) -> str:
        base = (r * width + c) * channels
        if channels == 1:
            return f"element_at({pixels_col}, {base + 1})"
        return (
            "("
            + " + ".join(
                f"element_at({pixels_col}, {base + ch + 1})"
                for ch in range(channels)
            )
            + ")"
        )

    terms = []
    for j in range(64):
        gr, gc = j // 8, j % 8
        sr = gr * height // 8
        sc0 = gc * width // 9
        sc1 = (gc + 1) * width // 9
        terms.append(
            f"shiftleft(cast(({gray(sr, sc1)} > {gray(sr, sc0)}) as long), {j})"
        )
    return F.expr("(" + " | ".join(terms) + ")")


def image_dhash_near_dup(
    df: DataFrame,
    width: int,
    height: int,
    channels: int = 1,
    max_hamming: int = 6,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    fake: bool = False,
    decode_fn=None,
) -> DataFrame:
    """Image near-duplicate pairs by perceptual hash: decode → dHash →
    banded Hamming self-join. Returns (id_a, id_b, hamming ≤ max_hamming).

    The missing granularity next to the text dedup suite: the corpus can
    contain the same image re-encoded/slightly edited under different
    bytes, which exact payload hashing never catches. Pipeline: ONE
    Arrow-batched decode hop (decode_full) per image, the 64-bit dHash as
    a JVM projection (dhash_expr), then the pair search reuses the
    simhash banding machinery (dedup.simhash_near_dup) — pigeonhole over
    max_hamming+1 bands makes the blocking EXACT for the Hamming bound,
    so unlike MinHash-LSH the result is deterministic: every qualifying
    pair is found. Only (id, 8-byte hash) enters the self-join; pixels
    never shuffle. The 16-bytes-per-image signature table is persisted —
    the band join reads it twice and re-decoding images would dominate.
    """
    from kapacitor_spark.dataprep.dedup import simhash_near_dup

    decoded = decode_full(
        df.select(id_col, binary_col), binary_col, fake=fake,
        decode_fn=decode_fn,
    )
    sig = track(decoded.select(
        F.col(id_col),
        dhash_expr("pixels", width, height, channels).alias("simhash"),
    ).persist())
    return simhash_near_dup(df, max_hamming=max_hamming, id_col=id_col, sig_df=sig)


def phash_batch(
    df: DataFrame,
    width: int,
    height: int,
    channels: int = 1,
    pixels_col: str = "pixels",
    out_col: str = "phash",
    grid: int = 32,
    keep: int = 8,
) -> DataFrame:
    """64-bit DCT perceptual hash (pHash) over decoded pixel arrays —
    the crop/re-compression-robust complement to the gradient dHash.

    Classic pHash: grayscale → resample to ``grid``x``grid`` (nearest
    index) → 2D DCT-II → keep the ``keep``x``keep`` low-frequency block
    → bit j = coefficient > median of the block (DC excluded from the
    median so flat images don't bias it). The DCT is a dense
    grid²-to-grid² transform — 64 output coefficients each weigh every
    input pixel — so unlike dHash it cannot be a JVM expression; it runs
    as TWO numpy matmuls (basis @ img @ basisᵀ) per image inside one
    Arrow-batched mapInPandas hop, the same shape as the decode itself.
    Gain/brightness invariant: positive scaling multiplies all AC
    coefficients AND their median; offsets land only in the DC
    coefficient, which is excluded.

    ``width``/``height``/``channels`` are per-call constants (resize
    mixed corpora first). Output = input + ``out_col`` (long).
    """
    import numpy as np

    if keep * keep - 1 > 64:
        # the signature is keep^2-1 AC bits packed into ONE LongType —
        # bit indices >= 64 would overflow the 8-byte hash at Arrow
        # conversion (corrupt signatures, not an error), so refuse early
        raise ValueError(
            f"phash keep={keep} needs {keep * keep - 1} bits; the packed "
            "LongType signature holds at most 64 (keep <= 8)"
        )
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.LongType())]
    )
    n = grid
    # orthogonal DCT-II basis: B[k, x] = c(k) cos(pi (2x+1) k / 2n)
    x = np.arange(n)
    basis = np.cos(np.pi * (2 * x[None, :] + 1) * x[:, None] / (2 * n))
    basis[0] *= np.sqrt(1.0 / n)
    basis[1:] *= np.sqrt(2.0 / n)
    ry = (np.arange(n) * height) // n
    rx = (np.arange(n) * width) // n

    def one(pix) -> int:
        a = np.asarray(pix, dtype=np.float64).reshape(height, width, channels)
        gray = a.sum(axis=2)
        small = gray[np.ix_(ry, rx)]
        coef = basis @ small @ basis.T
        block = coef[:keep, :keep].reshape(-1)
        ac = block[1:]  # DC excluded
        med = np.median(ac)
        sig = 0
        for j, v in enumerate(ac > med):
            if v:
                sig |= 1 << j
        if sig >= 1 << 63:
            sig -= 1 << 64
        return sig

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[pixels_col].map(one)
            yield pdf

    return df.mapInPandas(gen, out_schema)


def image_phash_near_dup(
    df: DataFrame,
    width: int,
    height: int,
    channels: int = 1,
    max_hamming: int = 10,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    fake: bool = False,
    decode_fn=None,
) -> DataFrame:
    """Image near-duplicate pairs by DCT pHash: decode → pHash → banded
    Hamming self-join (exact for the bound, like the dHash variant).
    Returns (id_a, id_b, hamming ≤ max_hamming). pHash tolerates
    re-encode/brightness/mild blur better than dHash at the cost of the
    per-image DCT (two 32x32 matmuls — still decode-dominated); the
    default Hamming budget is correspondingly wider."""
    from kapacitor_spark.dataprep.dedup import simhash_near_dup

    decoded = decode_full(
        df.select(id_col, binary_col), binary_col, fake=fake,
        decode_fn=decode_fn,
    )
    sig = track(phash_batch(
        decoded, width, height, channels, out_col="simhash"
    ).select(id_col, "simhash").persist())
    return simhash_near_dup(df, max_hamming=max_hamming, id_col=id_col, sig_df=sig)


def audio_dhash_expr(samples_col: str, bucket_size: int = 2) -> "F.Column":
    """64-bit perceptual hash over decoded audio samples, as ONE pure
    column expression: the envelope's gradient signs. 65 consecutive
    buckets of ``bucket_size`` samples each reduce to their mean-abs
    energy (sum of |x| — comparing sums ≡ comparing means), and bit j is
    set iff bucket j+1 is louder than bucket j — the audio analog of the
    image dHash (re-encoding and small edits preserve most envelope
    gradients; global gain changes preserve ALL of them). Clips must
    carry ≥ 65*bucket_size samples; resample to a fixed frame count
    first (decode_audio_batch's target_frames) so bucket boundaries are
    content-aligned across clips."""
    def bucket(i: int) -> str:
        terms = [
            f"abs(element_at({samples_col}, {bucket_size * i + k + 1}))"
            for k in range(bucket_size)
        ]
        return "(" + " + ".join(terms) + ")"

    bits = [
        f"shiftleft(cast(({bucket(j + 1)} > {bucket(j)}) as long), {j})"
        for j in range(64)
    ]
    return F.expr("(" + " | ".join(bits) + ")")


def audio_dhash_near_dup(
    df: DataFrame,
    bucket_size: int = 2,
    max_hamming: int = 6,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    target_frames: int | None = None,
    decode_fn=None,
) -> DataFrame:
    """Audio near-duplicate pairs by perceptual hash: decode → envelope
    dHash → banded Hamming self-join. Returns (id_a, id_b, hamming).

    Completes the near-dup granularity trio (text shingles, image
    pixels, audio samples) on the same machinery: ONE Arrow-batched
    decode hop (decode_audio_batch — real WAV/G.711/ADPCM/FLAC),
    the 64-bit envelope hash as a JVM projection (audio_dhash_expr),
    and the pair search reuses the simhash pigeonhole banding — EXACT
    for the Hamming bound, so results are deterministic. Only (id, 8B
    hash) enters the self-join; samples never shuffle. Pass
    ``target_frames`` to nearest-resample variable-length clips to a
    common length inside the decode hop first. ``decode_fn`` threads to
    :func:`decode_audio_batch` — the audio leg of the lossy-codec seam
    (CODECS.md): MP3/AAC/OGG corpora dedup with one extra argument
    (e.g. ``decoders.ffmpeg_transcode_audio_fn()``)."""
    from kapacitor_spark.dataprep.dedup import simhash_near_dup

    decoded = decode_audio_batch(
        df.select(id_col, binary_col), binary_col,
        target_frames=target_frames, decode_fn=decode_fn,
    )
    sig = track(decoded.select(
        F.col(id_col),
        audio_dhash_expr("samples", bucket_size).alias("simhash"),
    ).persist())
    return simhash_near_dup(df, max_hamming=max_hamming, id_col=id_col, sig_df=sig)


def sample_frames(
    df: DataFrame, n_frames_col: str = "n_frames", every: int = 10
) -> DataFrame:
    """Frame sampling plan for video rows: emits one row per sampled frame
    index WITHOUT decoding — explode over a sequence of indices; the decode
    UDF then receives (payload, frame_idx) pairs."""
    idx = F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every))
    return df.withColumn("frame_idx", F.explode(idx))


def extract_video_frames(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    every: int = 1,
    frame_col: str = "frame",
    decode_fn=None,
) -> DataFrame:
    """Demux video payloads — MJPEG in AVI (RIFF movi walk) or MP4
    (stbl sample tables), or animated GIF (canvas composition), per-row
    container dispatch — into one row per sampled frame: (id,
    frame_idx, frame). For the MJPEG walks, frame SELECTION happens in
    the demux (chunk offsets), so skipped frames are never even sliced
    out of the container, let alone decoded; GIF frames are
    delta-composed, so composition runs for all blocks and selection
    drops rows after (see videocodec.extract_frames). One Arrow-batched
    hop; the (small) per-frame image payloads are what moves
    downstream, not the clip.

    ``decode_fn`` (r10 — the PERMANENT lossy-codec scope boundary, see
    CODECS.md): a caller-injected ``(payload: bytes) ->
    iterable[(frame_idx, image_bytes)]`` that replaces the built-in
    container walk for codecs this repo does not implement (H.264, VP8/
    VP9, HEVC...). The injected callable runs INSIDE the same Arrow hop
    with identical batching, sampling and downstream schema, so wiring
    a real decoder (e.g. a PyAV/ffmpeg binding in a runtime image that
    ships one) changes one argument, not the pipeline — the same
    externalization the discovery clients use
    (sources/prometheus.py: caller-injected consul/k8s/ec2 clients,
    mirroring the reference's vendored-client config shims). Emitted
    ``image_bytes`` must be a format ``decode_full`` reads (JPEG/PNG/
    WebP-lossless/GIF/Netpbm). Frame-index sampling (``every``) still
    applies to the injected stream."""
    from kapacitor_spark.dataprep import videocodec

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField(frame_col, T.BinaryType()),
        ]
    )
    demux = decode_fn if decode_fn is not None else videocodec.extract_frames

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for doc_id, b in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(b) if b is not None else b""
                for i, jpeg in demux(raw):
                    if i % every == 0:
                        ids.append(doc_id)
                        idxs.append(i)
                        payloads.append(jpeg)
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, frame_col: payloads}
            )

    return df.select(id_col, binary_col).mapInPandas(gen, out_schema)


def video_dhash_near_dup(
    df: DataFrame,
    width: int,
    height: int,
    channels: int = 1,
    max_hamming: int = 6,
    majority: float = 0.5,
    every: int = 1,
    id_col: str = "doc_id",
    binary_col: str = "payload",
    decode_fn=None,
) -> DataFrame:
    """Video near-duplicate pairs: MJPEG frames → per-frame dHash →
    per-frame exact Hamming banding → MAJORITY-of-frames agreement.
    ``decode_fn`` threads through to :func:`extract_video_frames` — the
    injected-decoder seam for codecs outside the built-in set (CODECS.md).
    Returns (id_a, id_b, agree_frames, total_frames) where agree_frames
    counts sampled frame indices present in both clips whose dHashes sit
    within ``max_hamming``, total_frames counts indices present in both,
    and pairs qualify when agree_frames > majority * total_frames.

    The fourth perceptual-dedup modality on the shared machinery: demux
    (extract_video_frames) and JPEG decode (decode_full) are the only
    Python hops; the 64-bit per-frame dHash is a JVM projection
    (dhash_expr); blocking is the simhash pigeonhole banding with
    frame_idx ADDED to the equi-join key, so frames only ever compare at
    the SAME index — re-encoded/edited copies of a clip align, unrelated
    clips never join. EXACT for the bound: any frame pair within
    max_hamming shares ≥1 of the max_hamming+1 bands, majority needs ≥1
    agreeing frame, hence every qualifying video pair has ≥1 banded
    frame candidate. Only (id, frame_idx, 8B hash) shuffles — pixels and
    frame payloads never do. At 100 TB: band join on (frame_idx, band,
    band_val) spreads candidates across frames as extra key entropy; the
    per-pair aggregate is a map-side-combining count over candidate
    pairs, proportional to candidates, not clips²."""
    from kapacitor_spark.dataprep.dedup import _spread

    # spread BEFORE the demux: a small/derived clip table often arrives
    # as one partition, which would serialize every JPEG decode into one
    # task (measured 52s -> ~8s at sf0.1). Spreading the CLIP rows keeps
    # demux -> decode in the same stage, so frame payloads never shuffle.
    frames = extract_video_frames(
        _spread(df), binary_col, id_col, every=every, decode_fn=decode_fn
    )
    decoded = decode_full(frames, "frame", fake=False)
    sig = track(
        decoded.select(
            F.col(id_col),
            F.col("frame_idx"),
            dhash_expr("pixels", width, height, channels).alias("fhash"),
        ).persist()
    )
    nbands = max_hamming + 1
    bwidth = 64 // nbands
    band_cols = F.array(
        *[
            F.shiftright(F.col("fhash"), b * bwidth)
            .bitwiseAND(F.lit((1 << bwidth) - 1))
            for b in range(nbands)
        ]
    )
    # identical-(frame_idx, fhash) collapse (r9, same scheme as
    # dedup.simhash_near_dup): band ONE representative per distinct
    # per-index frame hash. m clips sharing an identical frame at the
    # same index (boilerplate intros, black frames) previously pushed
    # C(m,2) rows through the band join and its distinct; the join +
    # Hamming filter + distinct now run over DISTINCT hash candidates,
    # and members re-attach through output-sized equi-joins (the
    # majority count needs every clip pair, so the expansion itself is
    # the contract's inherent cost — but failing candidates no longer
    # pay it, and the distinct no longer sees expanded rows: one fhash
    # per (clip, frame) → each clip frame pair expands exactly once).
    classes = track(
        sig.groupBy("frame_idx", "fhash")
        .agg(F.min(id_col).alias("__rep"), F.count(F.lit(1)).alias("__m"))
        .persist()
    )
    banded = classes.select(
        "frame_idx", "fhash", "__rep", F.posexplode(band_cols).alias("band", "band_val")
    )
    a, b = banded.alias("a"), banded.alias("b")
    hash_pairs = (
        a.join(b, ["frame_idx", "band", "band_val"])
        .filter(F.col("a.__rep") < F.col("b.__rep"))
        .select(
            "frame_idx",
            F.col("a.fhash").alias("__fa"),
            F.col("b.fhash").alias("__fb"),
            F.bit_count(F.col("a.fhash").bitwiseXOR(F.col("b.fhash"))).alias("__hd"),
        )
        .filter(F.col("__hd") <= max_hamming)
        .distinct()  # a hash pair can share several bands
    )
    # one expansion pipeline for cross- and within-class frame pairs (an
    # m≥2 identical class is a hash SELF-pair; the __ia < __ib guard
    # keeps one copy of each self-pair expansion) — same scheme as
    # dedup.simhash_near_dup, keyed by frame_idx
    pair_src = hash_pairs.select("frame_idx", "__fa", "__fb").unionByName(
        classes.filter(F.col("__m") > 1).select(
            "frame_idx",
            F.col("fhash").alias("__fa"),
            F.col("fhash").alias("__fb"),
        )
    )
    ma = sig.select(
        "frame_idx", F.col("fhash").alias("__fa"), F.col(id_col).alias("__ia")
    )
    mb = sig.select(
        "frame_idx", F.col("fhash").alias("__fb"), F.col(id_col).alias("__ib")
    )
    frame_pairs = (
        pair_src.join(ma, ["frame_idx", "__fa"])
        .join(mb, ["frame_idx", "__fb"])
        .filter((F.col("__fa") != F.col("__fb")) | (F.col("__ia") < F.col("__ib")))
        .select(
            F.least("__ia", "__ib").alias("id_a"),
            F.greatest("__ia", "__ib").alias("id_b"),
            "frame_idx",
        )
    )
    agree = frame_pairs.groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("agree_frames")
    )
    # total co-sampled frames per candidate pair: join the tiny per-video
    # frame-count table twice (broadcast-eligible)
    counts = sig.groupBy(id_col).agg(F.count(F.lit(1)).alias("__nf"))
    out = (
        agree.join(
            F.broadcast(counts.select(F.col(id_col).alias("id_a"), F.col("__nf").alias("__na"))),
            "id_a",
        )
        .join(
            F.broadcast(counts.select(F.col(id_col).alias("id_b"), F.col("__nf").alias("__nb"))),
            "id_b",
        )
        .withColumn("total_frames", F.least("__na", "__nb"))
        .filter(F.col("agree_frames") > majority * F.col("total_frames"))
        .select("id_a", "id_b", "agree_frames", "total_frames")
    )
    return out


__all__ += ["extract_video_frames", "video_dhash_near_dup"]
