"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched Pandas UDFs over
mapInPandas.

The decode step is STUBBED (the container has no image/audio libraries):
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic fake decoder produces metadata derived from the bytes.
Everything around the stub — schema, batch iteration, partition sizing,
UDF signatures — is real and tested; swapping in PIL/torchaudio is a
one-function change.

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

__all__ = [
    "IMAGE_SCHEMA",
    "attach_binary_metadata",
    "decode_image_batch",
    "decode_full",
    "extract_image_features",
    "sample_frames",
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


def attach_binary_metadata(
    df: DataFrame, binary_col: str = "payload", fake: bool = True
) -> DataFrame:
    """Decode header metadata for a binary media column via mapInPandas.

    Real implementation would parse magic bytes / headers (cheap, no full
    decode). Output schema = input schema + IMAGE_SCHEMA fields.
    """
    out_schema = T.StructType(df.schema.fields + list(IMAGE_SCHEMA.fields))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image header parsing requires an imaging library "
                    "not present in this container; pass fake=True"
                )
            meta = pdf[binary_col].map(lambda b: _fake_decode(bytes(b) if b is not None else b""))
            for fld in IMAGE_SCHEMA.fieldNames():
                pdf[fld] = meta.map(lambda m, f=fld: m[f])
            yield pdf

    return df.mapInPandas(gen, out_schema)


def decode_image_batch(df: DataFrame, binary_col: str = "payload", fake: bool = True):
    """Full image decode → pixel tensor. STUB: raises unless fake.

    Contract (for the real impl): adds `pixels array<float>` (CHW
    flattened) — the shape a downstream embedding/feature UDF expects.
    """
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("pixels", T.ArrayType(T.FloatType()))]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("image decoding library not available")
            # deterministic fake: 8 'pixels' from the digest
            def fake_pixels(b):
                d = hashlib.md5(bytes(b) if b is not None else b"").digest()
                return [x / 255.0 for x in d[:8]]

            pdf["pixels"] = pdf[binary_col].map(fake_pixels)
            yield pdf

    return df.mapInPandas(gen, out_schema)


def decode_full(
    df: DataFrame, binary_col: str = "payload", fake: bool = True
) -> DataFrame:
    """Metadata + pixel decode in ONE mapInPandas pass (each payload's
    digest computed once) — the shape a real pipeline wants: one Python
    hop per binary row, not one per derived signal. Output = input +
    IMAGE_SCHEMA fields + ``pixels array<float>``."""
    out_schema = T.StructType(
        df.schema.fields
        + list(IMAGE_SCHEMA.fields)
        + [T.StructField("pixels", T.ArrayType(T.FloatType()))]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real decode requires an imaging library; pass fake=True"
                )
            metas, pixels = [], []
            for b in pdf[binary_col]:
                raw = bytes(b) if b is not None else b""
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
) -> DataFrame:
    """Image resize → new binary payload + updated metadata. STUB: raises
    unless fake (no imaging library in this container).

    Contract (real impl = PIL thumbnail/resize): replaces ``payload`` with
    the re-encoded bytes and sets width/height columns. The fake keeps the
    plumbing honest: output payload is a deterministic digest-derived blob
    whose length scales with the target area, so partition-size accounting
    downstream behaves like real resized images.
    """
    out_fields = [f for f in df.schema.fields if f.name not in ("width", "height")]
    out_schema = T.StructType(
        out_fields
        + [T.StructField("width", T.IntegerType()), T.StructField("height", T.IntegerType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("image resize requires an imaging library")

            def fake_resize(b):
                d = hashlib.md5(bytes(b) if b is not None else b"").digest()
                return bytes(d * max(1, (width * height) // (16 * 64)))

            pdf = pdf.drop(columns=[c for c in ("width", "height") if c in pdf.columns])
            pdf[binary_col] = pdf[binary_col].map(fake_resize)
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return df.mapInPandas(gen, out_schema)


def extract_image_features(df: DataFrame, pixels_col: str = "pixels") -> DataFrame:
    """Feature extraction over decoded pixels — mean/std as columns.
    Runs on the array column with JVM expressions (no second UDF hop)."""
    v = F.col(pixels_col)
    n = F.size(v).cast("double")
    mean = F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double")) / n
    return df.withColumn("pix_mean", F.round(mean, 6))


def sample_frames(
    df: DataFrame, n_frames_col: str = "n_frames", every: int = 10
) -> DataFrame:
    """Frame sampling plan for video rows: emits one row per sampled frame
    index WITHOUT decoding — explode over a sequence of indices; the decode
    UDF then receives (payload, frame_idx) pairs."""
    idx = F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every))
    return df.withColumn("frame_idx", F.explode(idx))
