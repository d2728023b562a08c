"""Multimodal (image/audio/video) columns for training-data pipelines.

Media travels as an opaque ``binary`` payload + typed metadata struct;
decode / resize / frame-sample / feature-extract run as Arrow-batched
``mapInPandas`` stages. The Spark-side plumbing — schema, batch shape,
partition sizing — is real and tested; the actual codecs (PIL, ffmpeg,
torchaudio) are NOT in this container, so each decoder resolves at
runtime: real library if importable, else a clearly-marked
deterministic stub (see ``_decoder``). Swapping in the real codec
changes no Spark code.

Scale notes:
- Binary payloads are large: repartition by size target before heavy
  stages (``repartition_for_payload``) so one Arrow batch ≈ one
  executor-friendly chunk; never groupBy/shuffle raw payloads after
  feature extraction (project features first, drop bytes).
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` controls rows per
  Arrow batch — set low (e.g. 64) for multi-MB media rows.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

IMAGE_FEATURES_SCHEMA = "media_id long, width int, height int, mode string, feature array<float>"
FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame binary"


def _decoder():
    """Real decoder if the imaging lib exists, else deterministic stub."""
    try:  # pragma: no cover - lib absent in this container
        import io

        from PIL import Image

        def decode(payload: bytes):
            im = Image.open(io.BytesIO(payload))
            return im.width, im.height, im.mode, np.asarray(im, dtype=np.float32).ravel()

        return decode, True
    except ImportError:
        def decode_stub(payload: bytes):
            # STUB: deterministic pseudo-decode from payload bytes.
            # Real pipelines replace this with PIL/libvips via the
            # import branch above; everything downstream is unchanged.
            digest = hashlib.sha256(payload).digest()
            w = 1 + digest[0]
            h = 1 + digest[1]
            vec = np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 255.0
            return w, h, "STUB", vec

        return decode_stub, False


def decode_image_features(df: DataFrame, batch_size: int = 64) -> DataFrame:
    """payload → (dims, mode, feature vector) via one mapInPandas pass.
    Output drops the payload column immediately — bytes never shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode, _ = _decoder()
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, mode, vec = decode(bytes(payload))
                rows.append((mid, w, h, mode, vec.tolist()))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "mode", "feature"]
            )

    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    return df.select("media_id", "payload").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10, max_frames: int = 4) -> DataFrame:
    """Video → sampled frame payloads. The STUB slices the payload into
    pseudo-frames; a real build decodes with ffmpeg — identical
    dataframe contract either way."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                # STUB frame extraction: fixed-width slices as "frames".
                chunk = max(1, len(data) // max(every_n, 1))
                for i in range(min(max_frames, max(1, len(data) // chunk))):
                    rows.append((mid, i, data[i * chunk : (i + 1) * chunk]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return df.select("media_id", "payload").mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def payload_stats(df: DataFrame) -> DataFrame:
    """Cheap JVM-side byte stats — no Python, for triage/filtering
    before expensive decode stages."""
    return df.select(
        "media_id",
        "media_type",
        F.length("payload").alias("n_bytes"),
        F.xxhash64("payload").alias("payload_hash"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


def dedup_exact_media(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Exact media dedup on payload hash — same single-shuffle shape as
    text dedup_exact: bytes never cross the wire, only the 64-bit key."""
    keep = (
        df.select(F.col(id_col), F.xxhash64("payload").alias("__h"))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .select(id_col, "n_copies")
    )
    return df.join(keep, id_col, "inner")


def repartition_for_payload(
    df: DataFrame, target_mb: int = 64, bytes_col: str = "n_bytes"
) -> DataFrame:
    """Size partitions so each holds ~``target_mb`` of payload before a
    heavy decode stage. The partition count comes from the ACTUAL byte
    sizes the ``binaryFile`` listing already carries (``n_bytes`` from
    ``read_media_dir``) — a column-pruned metadata sum, so payload bytes
    are never read and no row count with an assumed average row size is
    involved. Falls back to ``length(payload)`` when the listing column
    is absent (one scan of the payload lengths, still no Python)."""
    size = (
        F.col(bytes_col) if bytes_col in df.columns else F.length("payload")
    ).cast("long")
    total = df.agg(F.sum(size).alias("b")).first()["b"] or 0
    chunk = target_mb * 1024 * 1024
    return df.repartition(max(1, -(-int(total) // chunk)))


def read_media_dir(
    spark,
    path: str,
    glob: str | None = None,
    media_type: str = "image",
) -> DataFrame:
    """Ingest a directory of media files with Spark's ``binaryFile``
    source — the distributed on-ramp from object storage into the
    MEDIA_SCHEMA contract. The source parallelizes over files, prunes
    on ``pathGlobFilter``, and exposes path/length/modificationTime
    without reading payloads (footer-only listing); payload bytes load
    lazily per task. ``media_id`` is the path hash (stable across
    re-ingestion); original path is kept for lineage."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    df = r.load(path)
    return df.select(
        F.xxhash64("path").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1).alias("codec"),
        ).alias("meta"),
        F.col("path").alias("source_path"),
        F.col("length").alias("n_bytes"),
    )


def make_synthetic_media(spark, n: int = 32, media_type: str = "image") -> DataFrame:
    """Deterministic synthetic media table for tests (payload = seeded
    bytes; metadata filled in)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha512(struct.pack("<q", i)).digest() * 8  # 512 bytes
        rows.append((i, media_type, bytearray(payload), (64, 48, 1000, "stub")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


RESIZED_SCHEMA = "media_id long, payload binary, meta struct<width:int, height:int, duration_ms:int, codec:string>"
AUDIO_FEATURES_SCHEMA = "media_id long, duration_ms int, n_windows int, feature array<float>"


def resize_images(df: DataFrame, width: int, height: int, batch_size: int = 64) -> DataFrame:
    """payload → resized payload with updated meta dims, one mapInPandas
    pass. STUB resample (deterministic byte decimation to the target
    pixel budget); the PIL branch in ``_decoder`` swaps in real
    resampling with no contract change. Payload size is bounded by the
    target dims, so downstream shuffles shrink accordingly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        budget = max(1, width * height)
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                data = bytes(payload)
                # STUB: decimate/repeat bytes to the pixel budget. Real
                # builds decode + Image.resize((width, height)) here.
                step = max(1, len(data) // budget)
                out = data[::step][:budget]
                codec = meta["codec"] if meta is not None else None
                rows.append((mid, out, (width, height, meta["duration_ms"] if meta is not None else None, codec)))
            yield pd.DataFrame(rows, columns=["media_id", "payload", "meta"])

    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    return df.select("media_id", "payload", "meta").mapInPandas(run, RESIZED_SCHEMA)


def decode_audio_features(df: DataFrame, window_ms: int = 1000, batch_size: int = 64) -> DataFrame:
    """Audio payload → (duration, windowed feature vector). STUB
    decoder: duration estimated from byte length at a nominal bitrate
    and an energy-profile-like vector from windowed byte sums — a real
    build decodes PCM (torchaudio/ffmpeg) and emits MFCC/log-mel per
    window through the identical contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bytes_per_ms = 16  # STUB nominal 128 kbit/s
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                duration_ms = max(1, len(data) // bytes_per_ms)
                n_windows = max(1, duration_ms // window_ms)
                chunk = max(1, len(data) // n_windows)
                feat = [
                    float(np.frombuffer(data[i * chunk : (i + 1) * chunk], dtype=np.uint8).sum())
                    for i in range(n_windows)
                ]
                rows.append((mid, duration_ms, n_windows, feat))
            yield pd.DataFrame(
                rows, columns=["media_id", "duration_ms", "n_windows", "feature"]
            )

    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    return df.select("media_id", "payload").mapInPandas(run, AUDIO_FEATURES_SCHEMA)
