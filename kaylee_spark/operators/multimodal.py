"""Multimodal column conventions + processing plumbing.

Design (per the build brief): image/audio/video payloads are opaque
``binary`` columns with a typed metadata struct alongside. The Spark
side — schema, partition sizing, Arrow batch shape, mapInPandas UDF
signatures — is real and tested; the actual codec work is stubbed
behind ``DECODERS`` because no image/audio libraries exist in this
container (each stub is deterministic so tests are stable).

At 100 TB: binary payloads dominate row size, so all transforms here
are mapInPandas (streaming Arrow batches, constant memory) and
``maxRecordsPerBatch`` should be tuned down for multi-MB payloads;
metadata-only operations project the struct and never touch bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical multimodal record schema
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType(), True),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", LongType(), True),
                    StructField("n_bytes", LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("payload_sha", StringType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def real_decode(payload: bytes, modality: str):
    """The true codec path — requires PIL/ffmpeg/soundfile, absent in
    this container. Plumbing callers use the deterministic fake below."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg) are not installed in this environment; "
        "use fake_features (deterministic stub) — swap here when libs exist"
    )


def fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for decode->feature-extract: simple
    byte-histogram moments. Pure-Python, stable across runs."""
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    buckets = [0] * dim
    for i, byte in enumerate(payload):
        buckets[byte % dim] += 1
    n = len(payload)
    return [round(b / n, 6) for b in buckets]


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a multimodal table from the documents fixture: the text
    bytes stand in for an opaque payload. Exercises the real schema,
    binary column handling, and metadata struct without codec libs."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int")).alias("modality"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


#: filename-extension -> (modality, mime) for the file-ingest path
_EXT_MODALITY = {
    "jpg": ("image", "image/jpeg"), "jpeg": ("image", "image/jpeg"),
    "png": ("image", "image/png"), "gif": ("image", "image/gif"),
    "wav": ("audio", "audio/wav"), "mp3": ("audio", "audio/mpeg"),
    "flac": ("audio", "audio/flac"),
    "mp4": ("video", "video/mp4"), "mkv": ("video", "video/x-matroska"),
    "webm": ("video", "video/webm"),
}


def media_from_files(spark, path: str, glob: str | None = None, recursive: bool = False) -> DataFrame:
    """REAL ingest path for a multimodal corpus: a directory of media
    files becomes the engine's media schema (media_id, modality,
    payload, meta) via the binaryFile source — one row per file, glob
    filtered at listing time, payload never decoded until an operator
    asks. Modality/mime derive from the extension; width/height/
    duration stay null until a (codec-dependent) probe fills them.
    media_id is xxhash64(path) — stable across re-listing, and joins
    as an 8-byte key instead of the path string.
    """
    from kaylee_spark.sources import read_binary_files

    files = read_binary_files(spark, path, glob=glob, recursive=recursive)
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    modality = ext
    mime = ext
    for e, (mod, mm) in _EXT_MODALITY.items():
        modality = F.when(ext == e, mod).otherwise(modality)
        mime = F.when(ext == e, mm).otherwise(mime)
    return files.select(
        F.xxhash64("path").alias("media_id"),
        modality.alias("modality"),
        F.col("content").alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.col("length").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas).

    The iterator-of-batches shape is the scale contract: constant
    memory regardless of partition size, payloads never concatenated.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "payload_sha": [
                        hashlib.sha256(p).hexdigest() if p is not None else None for p in pdf["payload"]
                    ],
                    "features": [fake_features(p, dim) for p in pdf["payload"]],
                }
            )
            yield out

    return media.mapInPandas(process, schema=FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: passes payload through the mapInPandas
    path and rewrites metadata; actual pixel work is the stubbed codec."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pd.DataFrame(
                {
                    "mime": pdf["meta"].map(lambda m: m["mime"] if m else None),
                    "width": width,
                    "height": height,
                    "duration_ms": pdf["meta"].map(lambda m: m["duration_ms"] if m else None),
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"] if m else None),
                }
            )
            pdf = pdf.copy()
            pdf["meta"] = meta.to_dict("records")
            yield pdf

    return media.mapInPandas(process, schema=MEDIA_SCHEMA)


def frame_sample_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled frame
    index (payload decode stubbed; frame count derived from metadata)."""
    n_frames = F.greatest((F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms).cast("int"), F.lit(1))
    return (
        media.filter(F.col("modality") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .select("media_id", "frame_idx", F.col("payload").alias("frame_payload_stub"))
    )


def sniff_media_meta(payload: bytes | None):
    """REAL container-header parsing — pure stdlib ``struct``, no
    codec libraries: returns (mime, width, height, duration_ms), all
    None when the payload matches no known magic. Full pixel decode
    stays env-blocked (real_decode above), but dimensions/duration
    live in the container HEADER, and at 100 TB header-probing is the
    cheap first pass that routes/filters media before any expensive
    decode (drop sub-thumbnail images, cap durations) — reading ~64
    bytes per multi-MB payload.

    Formats: PNG (IHDR), GIF (logical screen descriptor), JPEG (SOF
    marker scan), WAV (RIFF fmt/data chunks -> exact duration).
    """
    import struct

    if not payload or len(payload) < 12:
        return (None, None, None, None)
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return ("image/png", w, h, None)
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return ("image/gif", w, h, None)
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(payload) and payload[i] == 0xFF:
            marker = payload[i + 1]
            seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            # SOF0..SOF15 minus DHT(C4)/JPG(C8)/DAC(CC) carry dimensions
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return ("image/jpeg", w, h, None)
            i += 2 + seglen
        return ("image/jpeg", None, None, None)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        byte_rate = None
        i = 12
        while i + 8 <= len(payload):
            chunk, size = payload[i : i + 4], struct.unpack("<I", payload[i + 4 : i + 8])[0]
            if chunk == b"fmt " and i + 20 <= len(payload):
                byte_rate = struct.unpack("<I", payload[i + 16 : i + 20])[0]
            elif chunk == b"data" and byte_rate:
                return ("audio/wav", None, None, int(size * 1000 // byte_rate))
            i += 8 + size + (size % 2)
        return ("audio/wav", None, None, None)
    return (None, None, None, None)


def probe_media(media: DataFrame) -> DataFrame:
    """Fill each row's meta struct from its payload's container header
    (sniff_media_meta) over Arrow batches: mime from magic bytes (more
    trustworthy than the ingest extension), dimensions/duration where
    the format carries them, n_bytes always. Same constant-memory
    mapInPandas shape as extract_features; unknown payloads keep their
    ingest meta untouched except n_bytes."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # payloads are untrusted bytes: a single malformed header
            # must degrade to "unknown", not fail the whole stage
            sniffed = []
            for p in pdf["payload"]:
                try:
                    sniffed.append(sniff_media_meta(p))
                except Exception:
                    sniffed.append((None, None, None, None))
            metas = []
            for old, (mime, w, h, dur), p in zip(pdf["meta"], sniffed, pdf["payload"]):
                old = dict(old) if old is not None else {}
                metas.append(
                    {
                        "mime": mime or old.get("mime"),
                        "width": w if w is not None else old.get("width"),
                        "height": h if h is not None else old.get("height"),
                        "duration_ms": dur if dur is not None else old.get("duration_ms"),
                        "n_bytes": len(p) if p is not None else 0,
                    }
                )
            out = pdf.copy()
            out["meta"] = metas
            yield out

    return media.mapInPandas(process, MEDIA_SCHEMA)


def _be32(col):
    """4-byte big-endian binary of a non-negative int column (codegen:
    hex -> pad -> unhex)."""
    return F.unhex(F.lpad(F.hex(col), 8, "0"))


def _le32(col):
    """4-byte little-endian binary of a non-negative int column: the
    padded big-endian hex string with its byte pairs reversed."""
    h = F.lpad(F.hex(col), 8, "0")
    return F.unhex(
        F.concat(
            F.substring(h, 7, 2), F.substring(h, 5, 2), F.substring(h, 3, 2), F.substring(h, 1, 2)
        )
    )


def _le16(col):
    h = F.lpad(F.hex(col), 4, "0")
    return F.unhex(F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2)))


def synth_media_with_headers(docs: DataFrame) -> DataFrame:
    """Multimodal table whose payloads carry REAL container headers,
    built with deterministic Spark expressions from doc_id arithmetic:
    image rows get a minimal PNG (signature + IHDR with
    width = 16 + id%1024, height = 16 + id%768), audio rows a minimal
    WAV (RIFF/fmt/data with byte_rate = 8000 + id%32*1000 and
    data_size = 1000 + id%50000 -> exact duration), video rows keep
    opaque text bytes (no known magic — the unknown-payload fallback).

    The point: probe_media's Python struct parsing round-trips
    byte-for-byte against this generator, so a SQL oracle that knows
    only the ARITHMETIC (never the bytes) can hash-gate the whole
    Arrow-batched mapInPandas path — generator (codegen binary
    concat) -> header bytes -> stdlib parse -> fields == arithmetic.

    Requires non-negative doc_id: the int->binary packing goes
    through hex(), whose two's-complement form for negatives would
    widen the fields past their header slots.
    """
    d = F.col("doc_id")
    w = (F.lit(16) + d % 1024).cast("int")
    h = (F.lit(16) + d % 768).cast("int")
    byte_rate = (F.lit(8000) + (d % 32) * 1000).cast("int")
    data_size = (F.lit(1000) + d % 50000).cast("int")
    png = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A")),  # PNG signature
        F.unhex(F.lit("0000000D")),          # IHDR length 13
        F.unhex(F.lit("49484452")),          # "IHDR"
        _be32(w),
        _be32(h),
    )
    wav = F.concat(
        F.unhex(F.lit("52494646")),          # "RIFF"
        _le32(F.lit(36) + data_size),        # riff size
        F.unhex(F.lit("57415645")),          # "WAVE"
        F.unhex(F.lit("666D7420")),          # "fmt "
        _le32(F.lit(16)),                    # fmt chunk size
        _le16(F.lit(1)),                     # PCM
        _le16(F.lit(1)),                     # mono
        _le32(byte_rate),                    # sample rate (== byte rate here)
        _le32(byte_rate),                    # byte rate (what the probe reads)
        _le16(F.lit(1)),                     # block align
        _le16(F.lit(8)),                     # bits per sample
        F.unhex(F.lit("64617461")),          # "data"
        _le32(data_size),                    # data size -> duration
    )
    opaque = F.encode(F.col("text"), "utf-8")
    payload = (
        F.when(d % 3 == 0, png).when(d % 3 == 1, wav).otherwise(opaque)
    )
    return docs.select(
        d.alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (d % 3 + 1).cast("int")
        ).alias("modality"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
