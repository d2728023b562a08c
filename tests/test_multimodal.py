"""Multimodal binary-column plumbing: schema, mapInPandas batching,
dedup — with the documented decoder stub (imaging libs absent here)."""

import pyspark.sql.functions as F

from thundercats_spark.multimodal.binary import (
    decode_image_features,
    dedup_exact_media,
    make_synthetic_media,
    payload_stats,
    sample_frames,
)


def test_media_schema(spark):
    df = make_synthetic_media(spark, 8)
    assert df.schema["payload"].dataType.simpleString() == "binary"
    assert df.schema["meta"].dataType.simpleString().startswith("struct<width:int")


def test_payload_stats_jvm_only(spark):
    df = make_synthetic_media(spark, 8)
    out = payload_stats(df)
    rows = out.collect()
    assert all(r["n_bytes"] == 512 for r in rows)  # 64-byte sha512 × 8
    # no Python execution operator in the plan: pure column expressions
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert not any(op in plan for op in ("ArrowEval", "BatchEval", "MapInPandas", "FlatMapGroupsInPandas"))


def test_decode_image_features(spark):
    df = make_synthetic_media(spark, 16)
    out = decode_image_features(df).collect()
    assert len(out) == 16
    first = out[0]
    assert first["mode"] == "STUB"  # stubbed decoder in this container
    assert len(first["feature"]) == 32
    # 0-255 raw-pixel scale — the SAME convention as the real BMP/PPM
    # (and PIL) paths, so mixed-codec datasets share one feature scale
    assert all(0.0 <= x <= 255.0 for x in first["feature"])
    # deterministic across runs
    again = decode_image_features(make_synthetic_media(spark, 16)).collect()
    assert [r["feature"] for r in again] == [r["feature"] for r in out]


def test_sample_frames(spark):
    df = make_synthetic_media(spark, 4, media_type="video")
    out = sample_frames(df, every_n=8, max_frames=3).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == list(range(len(v))) for v in by_media.values())
    assert all(len(v) <= 3 for v in by_media.values())


def test_dedup_exact_media(spark):
    a = make_synthetic_media(spark, 6)
    dup = a.withColumn("media_id", F.col("media_id") + 100)  # same payloads
    out = dedup_exact_media(a.unionByName(dup))
    rows = out.collect()
    assert len(rows) == 6
    assert all(r["n_copies"] == 2 for r in rows)
    assert {r["media_id"] for r in rows} == set(range(6))  # min-id survives


def test_read_media_dir_binaryfile_source(spark, tmp_path):
    from thundercats_spark.multimodal.binary import decode_image_features, read_media_dir

    payloads = {}
    for i in range(3):
        p = tmp_path / f"img_{i}.png"
        data = bytes([i]) * 100
        p.write_bytes(data)
        payloads[f"img_{i}.png"] = data
    (tmp_path / "notes.txt").write_bytes(b"skip me")

    df = read_media_dir(spark, str(tmp_path), glob="*.png")
    rows = df.collect()
    assert len(rows) == 3  # glob filter excludes the txt file
    by_name = {r["source_path"].rsplit("/", 1)[-1]: r for r in rows}
    for name, data in payloads.items():
        assert bytes(by_name[name]["payload"]) == data
        assert by_name[name]["meta"]["codec"] == "png"
        assert by_name[name]["n_bytes"] == len(data)
    assert len({r["media_id"] for r in rows}) == 3

    feats = decode_image_features(df).collect()  # downstream contract holds
    assert len(feats) == 3 and all(len(f["feature"]) == 32 for f in feats)


def test_resize_images_contract(spark):
    from thundercats_spark.multimodal.binary import make_synthetic_media, resize_images

    df = make_synthetic_media(spark, n=6)
    out = resize_images(df, width=8, height=4).collect()
    assert len(out) == 6
    for r in out:
        assert len(bytes(r["payload"])) <= 8 * 4  # bounded by pixel budget
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 4
        assert r["meta"]["codec"] == "stub"  # passthrough metadata kept


def test_decode_audio_features_contract(spark):
    from thundercats_spark.multimodal.binary import (
        decode_audio_features,
        make_synthetic_media,
    )

    df = make_synthetic_media(spark, n=4, media_type="audio")
    out = decode_audio_features(df, window_ms=10).collect()
    assert len(out) == 4
    for r in out:
        assert r["duration_ms"] >= 1
        assert r["n_windows"] == len(r["feature"]) >= 1
    # deterministic across runs
    again = decode_audio_features(df, window_ms=10).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_repartition_for_payload_uses_listing_bytes(spark):
    import pyspark.sql.functions as F

    from thundercats_spark.multimodal.binary import repartition_for_payload

    # 10 rows claiming 32 MB each via the binaryFile listing column:
    # 320 MB / 64 MB target -> exactly 5 partitions, derived from the
    # n_bytes metadata — payloads (3 bytes here) are never measured.
    df = spark.range(10).select(
        F.col("id").alias("media_id"),
        F.lit(b"abc").alias("payload"),
        F.lit(32 * 1024 * 1024).alias("n_bytes"),
    )
    assert repartition_for_payload(df, target_mb=64).rdd.getNumPartitions() == 5
    # ceil semantics: 33 MB x 10 = 330 MB -> 6 partitions
    df2 = df.withColumn("n_bytes", F.lit(33 * 1024 * 1024))
    assert repartition_for_payload(df2, target_mb=64).rdd.getNumPartitions() == 6
    # fallback: no listing column -> payload lengths (30 bytes total -> 1)
    df3 = df.drop("n_bytes")
    assert repartition_for_payload(df3, target_mb=64).rdd.getNumPartitions() == 1


# --------------------------------------------------------------------------
# REAL decoders for self-describing formats (no codec libs needed)
# --------------------------------------------------------------------------


def _make_bmp(w, h, rgb_rows):
    """Hand-built uncompressed 24-bit BMP (bottom-up row order)."""
    import struct

    row_pad = (w * 3 + 3) // 4 * 4 - w * 3
    body = b""
    for row in reversed(rgb_rows):  # bottom-up
        for (r, g, b) in row:
            body += bytes([b, g, r])
        body += b"\0" * row_pad
    pix_off = 54
    size = pix_off + len(body)
    hdr = b"BM" + struct.pack("<IHHI", size, 0, 0, pix_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return hdr + dib + body


def _make_wav(framerate, samples, sampwidth=2, nch=1):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(nch)
        f.setsampwidth(sampwidth)
        f.setframerate(framerate)
        f.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def test_bmp_decodes_for_real(spark):
    from thundercats_spark.multimodal.binary import decode_bmp, decode_image_features

    pixels = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (10, 20, 30)]]
    payload = _make_bmp(2, 2, pixels)
    w, h, mode, vec = decode_bmp(payload)
    assert (w, h, mode) == (2, 2, "BMP")
    assert vec.tolist() == [255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30]
    # end-to-end through the Spark op: exact pixels, not stub output
    df = spark.createDataFrame([(1, bytearray(payload))], "media_id long, payload binary")
    row = decode_image_features(df).first()
    assert (row["width"], row["height"], row["mode"]) == (2, 2, "BMP")
    assert row["feature"][:3] == [255.0, 0.0, 0.0]


def test_ppm_decodes_for_real():
    from thundercats_spark.multimodal.binary import decode_ppm

    payload = b"P6\n# a comment\n2 1\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    w, h, mode, vec = decode_ppm(payload)
    assert (w, h, mode) == (2, 1, "PPM")
    assert vec.tolist() == [1, 2, 3, 4, 5, 6]
    assert decode_ppm(b"P5 not p6") is None


def test_wav_decodes_for_real(spark):
    import math

    from thundercats_spark.multimodal.binary import decode_audio_features, decode_wav

    fr = 8000
    # 2 seconds of a constant-amplitude square wave -> RMS == amplitude
    samples = [10000 if i % 2 == 0 else -10000 for i in range(fr * 2)]
    payload = _make_wav(fr, samples)
    got = decode_wav(payload)
    assert got is not None
    frate, nch, duration_ms, mono = got
    assert (frate, nch, duration_ms) == (fr, 1, 2000)
    assert len(mono) == fr * 2
    df = spark.createDataFrame([(7, bytearray(payload))], "media_id long, payload binary")
    row = decode_audio_features(df, window_ms=1000).first()
    assert row["duration_ms"] == 2000 and row["n_windows"] == 2
    for v in row["feature"]:
        assert math.isclose(v, 10000.0, rel_tol=1e-9)


def test_non_wav_payload_falls_back_to_stub(spark):
    from thundercats_spark.multimodal.binary import decode_audio_features

    df = spark.createDataFrame(
        [(1, bytearray(b"\x00" * 3200))], "media_id long, payload binary"
    )
    row = decode_audio_features(df).first()
    assert row["duration_ms"] == 200  # byte-length estimate, stub path


def test_bmp_resize_is_real_roundtrip(spark):
    from thundercats_spark.multimodal.binary import decode_bmp, resize_images

    # 4x4 image with distinct per-pixel values
    rows4 = [[(y * 40 + x * 10, 0, 255 - y * 40 - x * 10) for x in range(4)] for y in range(4)]
    payload = _make_bmp(4, 4, rows4)
    df = spark.createDataFrame(
        [(1, bytearray(payload), (4, 4, None, "bmp"))],
        "media_id long, payload binary, "
        "meta struct<width:int,height:int,duration_ms:int,codec:string>",
    )
    out = resize_images(df, 2, 2).first()
    assert out["meta"]["width"] == 2 and out["meta"]["height"] == 2
    w, h, mode, vec = decode_bmp(bytes(out["payload"]))
    assert (w, h, mode) == (2, 2, "BMP")
    got = vec.reshape(2, 2, 3)
    # nearest-neighbor: target (y,x) samples source (y*4//2, x*4//2)
    for ty in range(2):
        for tx in range(2):
            assert tuple(got[ty, tx]) == rows4[ty * 2][tx * 2]


def test_synthetic_real_media_exercises_real_decoders(spark):
    import math

    from thundercats_spark.multimodal.binary import (
        decode_audio_features,
        decode_image_features,
        make_synthetic_media,
    )

    imgs = make_synthetic_media(spark, 4, media_type="image", real=True)
    decoded = decode_image_features(imgs).collect()
    assert all(r["mode"] == "BMP" for r in decoded)
    assert all((r["width"], r["height"]) == (8, 6) for r in decoded)
    assert len({tuple(r["feature"][:9]) for r in decoded}) == 4  # per-id pixels differ

    wavs = make_synthetic_media(spark, 3, media_type="audio", real=True)
    feats = decode_audio_features(wavs, window_ms=500).collect()
    for r in feats:
        assert r["duration_ms"] == 1000 and r["n_windows"] == 2
        for v in r["feature"]:  # sine RMS = amplitude / sqrt(2)
            assert math.isclose(v, 10000 / math.sqrt(2), rel_tol=0.01)


def test_wav_24bit_decodes_for_real():
    import io as _io
    import wave

    import numpy as np

    from thundercats_spark.multimodal.binary import decode_wav

    fr = 8000
    amp = 100000  # needs >16 bits
    samples = np.array([amp if i % 2 == 0 else -amp for i in range(fr)], dtype=np.int64)
    le = np.zeros((len(samples), 3), dtype=np.uint8)
    u = np.where(samples < 0, samples + (1 << 24), samples)
    le[:, 0] = u & 0xFF
    le[:, 1] = (u >> 8) & 0xFF
    le[:, 2] = (u >> 16) & 0xFF
    buf = _io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(3)
        f.setframerate(fr)
        f.writeframes(le.tobytes())
    got = decode_wav(buf.getvalue())
    assert got is not None
    frate, nch, duration_ms, mono = got
    assert (frate, nch, duration_ms) == (fr, 1, 1000)
    assert abs(mono[0] - amp) < 1e-9 and abs(mono[1] + amp) < 1e-9


def test_raw_video_frame_sampling_is_real(spark):
    from thundercats_spark.multimodal.binary import make_synthetic_media, sample_frames

    vids = make_synthetic_media(spark, 2, media_type="video", real=True)
    out = sample_frames(vids, every_n=3, max_frames=3).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    for mid, rows in by_id.items():
        # 8 frames, every 3rd -> source frames 0, 3, 6
        assert [r["frame_idx"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [0, 3, 6]
        for r in rows:
            frame = bytes(r["frame"])
            assert len(frame) == 4 * 3 * 3  # exactly one w*h*3 frame
            # per-frame constant fill value pins the slicing boundaries
            assert frame == bytes([min(255, 10 * mid + r["frame_idx"])]) * len(frame)


def test_pgm_decodes_for_real():
    from thundercats_spark.multimodal.binary import decode_pgm

    payload = b"P5\n3 2\n255\n" + bytes([9, 8, 7, 6, 5, 4])
    w, h, mode, vec = decode_pgm(payload)
    assert (w, h, mode) == (3, 2, "PGM")
    assert vec.tolist() == [9, 8, 7, 6, 5, 4]


def test_png_decodes_for_real(spark):
    """8-bit non-interlaced PNG is a REAL decoder (stdlib zlib, no
    imaging lib): every PNG filter type round-trips exact pixels for
    every channel count, and the Spark op reports mode PNG — not stub
    output."""
    import numpy as np

    from thundercats_spark.multimodal.binary import (
        decode_image_features,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(7)
    for channels in (1, 2, 3, 4):
        for filter_type in range(5):
            w, h = 13, 9
            px = rng.integers(0, 256, size=(h, w * channels), dtype=np.uint8)
            payload = encode_png(w, h, px, channels=channels, filter_type=filter_type)
            got = decode_png(payload)
            assert got is not None, (channels, filter_type)
            gw, gh, mode, vec = got
            assert (gw, gh, mode) == (w, h, "PNG")
            assert np.array_equal(
                vec.reshape(h, w * channels).astype(np.uint8), px
            ), (channels, filter_type)
    # end-to-end through the Spark op
    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 6)
    payload = encode_png(2, 2, px, channels=3, filter_type=4)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    row = decode_image_features(df).first()
    assert (row["width"], row["height"], row["mode"]) == (2, 2, "PNG")
    assert row["feature"] == [float(x) for x in px.ravel()]


def test_png_unsupported_variants_return_none():
    """Palette / 16-bit / interlaced / truncated PNGs fall through
    (None) to the codec-lib-or-stub path rather than mis-decoding."""
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    from thundercats_spark.multimodal.binary import decode_png, encode_png

    assert decode_png(b"not a png at all") is None
    good = encode_png(4, 4, np.zeros((4, 12), np.uint8))
    assert decode_png(good[:20]) is None  # truncated
    # rewrite IHDR to claim palette color (type 3): must return None
    ihdr = _struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)
    crc = _struct.pack(">I", _zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    palette = good[:8] + _struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + crc + good[8 + 12 + 13:]
    assert decode_png(palette) is None


def test_png_palette_decodes_for_real():
    """Color-type-3 PNGs decode through the PLTE lookup (RGB), and a
    tRNS chunk adds per-palette-entry alpha (RGBA); indices past the
    palette are corrupt → None."""
    import numpy as np

    from thundercats_spark.multimodal.binary import decode_png, encode_png_palette

    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1], [2, 0]], np.uint8)
    w, h, mode, vec = decode_png(encode_png_palette(2, 2, idx, palette))
    assert (w, h, mode) == (2, 2, "PNG")
    assert vec.reshape(4, 3).astype(int).tolist() == [
        [255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 0, 0]]
    # tRNS: entry 0 transparent, others default opaque
    w, h, mode, vec = decode_png(
        encode_png_palette(2, 2, idx, palette, trns=[0])
    )
    assert vec.reshape(4, 4).astype(int).tolist() == [
        [255, 0, 0, 0], [0, 255, 0, 255], [0, 0, 255, 255], [255, 0, 0, 0]]
    # index 3 with a 3-entry palette is corrupt
    assert decode_png(encode_png_palette(2, 2, idx + 1, palette)) is None


def test_png_malformed_payloads_return_none_not_raise():
    """Corrupt PNGs must fall through the decoder chain (None), never
    kill the mapInPandas task; a crafted decompression bomb must not
    materialize beyond what the declared image needs."""
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    from thundercats_spark.multimodal.binary import decode_png, encode_png

    def chunk(ctype, payload):
        return (
            _struct.pack(">I", len(payload)) + ctype + payload
            + _struct.pack(">I", _zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    good = encode_png(4, 4, np.zeros((4, 12), np.uint8))
    # IHDR with wrong declared length
    bad_ihdr = sig + chunk(b"IHDR", _struct.pack(">IIBBB", 4, 4, 8, 2, 0)) + good[8 + 25:]
    assert decode_png(bad_ihdr) is None
    # PLTE not a multiple of 3
    ihdr3 = chunk(b"IHDR", _struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
    idat = chunk(b"IDAT", _zlib.compress(b"\x00\x00\x00\x00\x00\x00"))
    assert decode_png(sig + ihdr3 + chunk(b"PLTE", b"\x01\x02") + idat) is None
    # tRNS longer than the palette
    plte = chunk(b"PLTE", bytes(6))
    assert decode_png(sig + ihdr3 + plte + chunk(b"tRNS", bytes(5)) + idat) is None
    # decompression bomb: tiny IDAT declaring a 4x4 image but deflating
    # to 64 MB — decode must bound its read to the declared image size
    # (the oversize stream just means the row check fails -> None, and
    # at no point does the full 64 MB materialize)
    bomb_raw = b"\x00" * (64 * 1024 * 1024)
    bomb = (
        sig
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", _zlib.compress(bomb_raw))
        + chunk(b"IEND", b"")
    )
    got = decode_png(bomb)  # reads only 4*(12+1)=52 bytes of the bomb
    assert got is not None and got[:3] == (4, 4, "PNG")


def test_strict_mode_names_missing_libs_and_fake_pil_flips_branch():
    """VERDICT r06 #8 dry-wire: (a) with no codec lib, strict mode
    raises NAMING the missing lib (Pillow) while no-lib formats still
    decode for real; (b) a module satisfying `from PIL import Image`
    flips _decoder to the real branch with zero code diff — the
    contract that turns on automatically in the first environment
    with Pillow installed."""
    import sys
    import types

    import numpy as np
    import pytest

    from thundercats_spark.multimodal.binary import _decoder, encode_bmp

    assert "PIL" not in sys.modules or hasattr(sys.modules["PIL"], "Image")
    jpeg_ish = b"\xff\xd8\xff\xe0" + b"\x00" * 64  # JFIF magic, no PIL

    # (a) stub branch: strict raises naming Pillow; BMP stays REAL
    if "PIL" in sys.modules:  # container truth: no Pillow
        pytest.skip("Pillow unexpectedly present; stub branch untestable")
    decode, real = _decoder(strict=True)
    assert real is False
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode(jpeg_ish)
    bmp = encode_bmp(3, 2, np.zeros((2, 3, 3), dtype=np.float32))
    w, h, mode, vec = decode(bmp)
    assert (w, h) == (3, 2)  # no-lib format unaffected by strict

    # non-strict stub still pseudo-decodes deterministically
    decode_lax, real = _decoder()
    assert real is False
    w1, h1, m1, v1 = decode_lax(jpeg_ish)
    w2, h2, m2, v2 = decode_lax(jpeg_ish)
    assert m1 == "STUB" and (w1, h1, m1) == (w2, h2, m2)
    assert np.array_equal(v1, v2)

    # (b) fake Pillow satisfies the import → REAL branch selected,
    # compressed formats route through Image.open
    class _FakeImage:
        width, height, mode = 4, 2, "RGB"

        def __array__(self, dtype=None, copy=None):
            return np.arange(24, dtype=np.float32).reshape(2, 4, 3)

    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = lambda bio: _FakeImage()
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    sys.modules["PIL"] = pil_mod
    sys.modules["PIL.Image"] = image_mod
    try:
        decode, real = _decoder(strict=True)
        assert real is True
        w, h, mode, vec = decode(jpeg_ish)
        assert (w, h, mode) == (4, 2, "RGB")
        assert vec.shape == (24,) and vec[5] == 5.0
        # no-lib formats STILL short-circuit before PIL (cheaper, and
        # byte-identical to the lib-less environments). ADVICE r07:
        # assert the two conditions separately — the old `and ... or`
        # reduced to the size check alone by operator precedence, so
        # the short-circuit (mode stays the stdlib 'BMP', never the
        # fake PIL's 'RGB') was never actually pinned.
        w, h, mode, vec = decode(bmp)
        assert (w, h) == (3, 2)
        assert mode == "BMP"
    finally:
        del sys.modules["PIL"]
        del sys.modules["PIL.Image"]


def test_strict_mode_spark_side_errors_name_codec_libs(spark):
    """strict=True surfaces the lib-naming error through the Arrow
    worker boundary for audio (ffmpeg/torchaudio) and video (ffmpeg);
    real-decodable payloads pass strict untouched."""
    import pytest

    from thundercats_spark.multimodal.binary import (
        decode_audio_features,
        sample_frames,
    )

    mp3_ish = bytearray(b"ID3" + bytes(300))
    audio = spark.createDataFrame(
        [(1, bytes(mp3_ish))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="ffmpeg|torchaudio"):
        decode_audio_features(audio, strict=True).collect()

    video = spark.createDataFrame(
        [(1, bytes(bytearray(240)), {"width": None, "height": None})],
        "media_id long, payload binary, meta map<string,int>",
    )
    with pytest.raises(Exception, match="ffmpeg"):
        sample_frames(video, strict=True).collect()


# ---------------------------------------------------------------------------
# Baseline JPEG codec (multimodal/jpeg.py): round-trip pins vs the
# encode twin (VERDICT r08 #3 — converts the JPEG gap from stub to
# REAL for the dominant real-world variant).
# ---------------------------------------------------------------------------


def _gradient(w, h):
    import numpy as np

    x = np.arange(w)[None, :] * 3.0
    y = np.arange(h)[:, None] * 5.0
    return np.clip(x + y, 0, 255)


def test_jpeg_roundtrip_grayscale_exact():
    """With a unit quant table the only loss is float DCT + rounding;
    on a smooth gradient the grayscale round-trip is EXACT."""
    import numpy as np

    from thundercats_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    w, h = 40, 24
    img = _gradient(w, h)
    got = decode_jpeg(encode_jpeg(w, h, img, channels=1))
    assert got is not None and got[:3] == (w, h, "JPEG")
    assert np.abs(got[3].reshape(h, w) - img).max() == 0.0


def test_jpeg_roundtrip_rgb_444_within_rounding():
    """RGB adds the YCbCr cycle: two float rounds bound the error at
    ±1 per sample on 4:4:4."""
    import numpy as np

    from thundercats_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    w, h = 40, 24
    g = _gradient(w, h)
    rgb = np.stack([g, 255 - g, g / 2], axis=-1)
    got = decode_jpeg(encode_jpeg(w, h, rgb, channels=3))
    assert got[:3] == (w, h, "JPEG")
    assert np.abs(got[3].reshape(h, w, 3) - rgb).max() <= 1.0


def test_jpeg_roundtrip_420_subsampling_and_odd_dims():
    """4:2:0: chroma-constant images survive the box-average →
    replicate cycle exactly; odd (non-multiple-of-16) dims crop
    correctly; gradient chroma stays within the subsampling bound."""
    import numpy as np

    from thundercats_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    w, h = 40, 24
    flat = np.tile(np.array([[100.0, 150.0, 200.0]]), (h * w, 1)).reshape(
        h, w, 3
    )
    got = decode_jpeg(encode_jpeg(w, h, flat, channels=3, subsampling=(2, 2)))
    assert np.abs(got[3].reshape(h, w, 3) - flat).max() == 0.0

    w2, h2 = 37, 13  # neither dim a multiple of the 16-px MCU
    g2 = np.clip(np.arange(w2)[None, :] * 6.0 + np.arange(h2)[:, None], 0, 255)
    rgb2 = np.stack([g2, 255 - g2, g2 / 2], axis=-1)
    got = decode_jpeg(encode_jpeg(w2, h2, rgb2, channels=3, subsampling=(2, 2)))
    assert got[:3] == (w2, h2, "JPEG")
    assert np.abs(got[3].reshape(h2, w2, 3) - rgb2).max() <= 8.0


def test_jpeg_restart_markers_and_quant_bound():
    """DRI/RSTn path: restart markers reset DC predictors and re-align
    the bit reader; uniform quant=q bounds reconstruction error at a
    few q even on white noise (orthonormal DCT: quantization error per
    coefficient ≤ q/2)."""
    import numpy as np

    from thundercats_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    w, h = 40, 24
    g = _gradient(w, h)
    rgb = np.stack([g, 255 - g, g / 2], axis=-1)
    got = decode_jpeg(encode_jpeg(w, h, rgb, channels=3, restart_interval=2))
    assert np.abs(got[3].reshape(h, w, 3) - rgb).max() <= 1.0

    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (h, w, 3)).astype(float)
    got = decode_jpeg(encode_jpeg(w, h, noise, channels=3, quant=4))
    assert np.abs(got[3].reshape(h, w, 3) - noise).max() <= 4 * 4


def test_jpeg_rejects_unsupported_and_corrupt_payloads():
    """None (fall through the decoder chain) for: non-JPEG, truncated
    scans, a baseline scan header under a progressive SOF2 (Se must be
    0 for a DC scan) — never an exception."""
    from thundercats_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    w, h = 24, 16
    data = encode_jpeg(w, h, _gradient(w, h), channels=1)
    assert decode_jpeg(b"hello world") is None
    assert decode_jpeg(b"\xff\xd8\xff\xe0" + b"\x00" * 64) is None
    assert decode_jpeg(data[:40]) is None
    assert decode_jpeg(data[:-20]) is None
    prog = bytearray(data)
    # flip SOF0 → SOF2: the baseline SOS header (Ss=0, Se=63) is an
    # ILLEGAL progressive DC scan — rejected, not misdecoded
    prog[prog.find(b"\xff\xc0") + 1] = 0xC2
    assert decode_jpeg(bytes(prog)) is None
    corrupt = bytearray(data)
    corrupt[len(corrupt) // 2] ^= 0xFF  # bit-flip mid-scan
    # a mid-scan flip may alias to another valid stream (garbage pixels)
    # or trip corruption — either way: None or well-formed, NEVER a raise
    got = decode_jpeg(bytes(corrupt))
    assert got is None or got[:2] == (w, h)


def test_jpeg_decodes_through_spark_decoder_chain(spark):
    """decode_image_features now REALLY decodes baseline JPEG payloads
    (mode 'JPEG', true dims, raw 0-255 features) — no stub, no PIL."""
    import numpy as np

    from thundercats_spark.multimodal.binary import decode_image_features
    from thundercats_spark.multimodal.jpeg import encode_jpeg

    w, h = 24, 16
    g = _gradient(w, h)
    rgb = np.stack([g, 255 - g, g / 2], axis=-1)
    payloads = [
        (1, encode_jpeg(w, h, g, channels=1)),
        (2, encode_jpeg(w, h, rgb, channels=3)),
        (3, encode_jpeg(w, h, rgb, channels=3, subsampling=(2, 2))),
    ]
    df = spark.createDataFrame(payloads, "media_id long, payload binary")
    out = {r["media_id"]: r for r in decode_image_features(df).collect()}
    assert all(out[i]["mode"] == "JPEG" for i in (1, 2, 3))
    assert (out[1]["width"], out[1]["height"]) == (w, h)
    assert len(out[1]["feature"]) == w * h
    assert len(out[2]["feature"]) == w * h * 3
    expect = g.ravel()
    got = np.array(out[1]["feature"])
    assert np.abs(got - expect).max() == 0.0
    # strict mode passes untouched for REAL-decodable JPEG payloads
    strict_out = decode_image_features(df, strict=True).collect()
    assert len(strict_out) == 3


def test_resize_images_real_paths_png_and_jpeg(spark):
    """resize_images now resizes PNG and baseline JPEG for REAL in
    their own codecs: the resized payload re-decodes to the target
    dims with pixels tracking a nearest-neighbor model (PNG lossless
    exact; JPEG within quantization error). The existing BMP path is
    asserted alongside; a non-decodable payload still takes the stub."""
    import numpy as np

    from thundercats_spark.multimodal.binary import (
        decode_bmp,
        decode_png,
        encode_bmp,
        encode_png,
        resize_images,
    )
    from thundercats_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    sw, sh, w, h = 32, 20, 16, 10
    g = np.clip(
        np.arange(sw)[None, :] * 7.0 + np.arange(sh)[:, None] * 3.0, 0, 255
    )
    rgb = np.stack([g, 255 - g, g / 2], axis=-1).astype(np.uint8)
    ys = np.minimum(np.arange(h) * sh // h, sh - 1)
    xs = np.minimum(np.arange(w) * sw // w, sw - 1)
    expect = rgb[ys][:, xs].astype(np.float32)

    rows = [
        (1, encode_png(sw, sh, rgb, channels=3), (sw, sh, None, "png")),
        (2, encode_jpeg(sw, sh, rgb.astype(float), channels=3),
         (sw, sh, None, "jpeg")),
        (3, encode_bmp(sw, sh, rgb), (sw, sh, None, "bmp")),
        (4, b"not an image" * 50, (None, None, None, "mystery")),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, payload binary, "
        "meta struct<width:int, height:int, duration_ms:int, codec:string>",
    )
    out = {r["media_id"]: r for r in resize_images(df, w, h).collect()}

    png = decode_png(bytes(out[1]["payload"]))
    assert png[:2] == (w, h)
    assert np.array_equal(png[3].reshape(h, w, 3), expect)  # lossless

    jpg = decode_jpeg(bytes(out[2]["payload"]))
    assert jpg[:2] == (w, h)
    assert np.abs(jpg[3].reshape(h, w, 3) - expect).max() <= 2 * 2 + 1

    bmp = decode_bmp(bytes(out[3]["payload"]))
    assert bmp[:2] == (w, h)
    assert np.array_equal(bmp[3].reshape(h, w, 3), expect)

    assert out[4]["meta"]["width"] == w  # stub still honors the contract
    assert len(bytes(out[4]["payload"])) <= w * h


def test_jpeg_fill_bytes_and_pil_routing():
    """Review r09: (a) spec-legal 0xFF fill bytes before markers
    (ITU T.81 B.1.1.2) — including before restart markers — must
    decode, not fall through to the stub; (b) when an imaging lib IS
    importable, JPEG routes to it (the stdlib decoder is the lib-less
    correctness fallback, never a libjpeg shadow on the hot path),
    while self-describing formats still short-circuit."""
    import sys
    import types

    import numpy as np

    from thundercats_spark.multimodal.binary import _decoder, encode_bmp
    from thundercats_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    w, h = 24, 16
    g = np.clip(
        np.arange(w)[None, :] * 7.0 + np.arange(h)[:, None] * 3.0, 0, 255
    )
    data = encode_jpeg(w, h, g, channels=1)
    i = data.find(b"\xff\xda")
    filled = data[:i] + b"\xff" + data[i:]
    got = decode_jpeg(filled)
    assert got is not None and got[:2] == (w, h)
    assert np.abs(got[3].reshape(h, w) - g).max() == 0.0

    rst = encode_jpeg(w, h, g, channels=1, restart_interval=1)
    j = rst.find(b"\xff\xd0")
    filled = rst[:j] + b"\xff" + rst[j:]
    got = decode_jpeg(filled)
    assert got is not None and np.abs(got[3].reshape(h, w) - g).max() == 0.0

    if "PIL" in sys.modules:
        import pytest

        pytest.skip("real Pillow present; fake-module routing untestable")

    class _FakeImage:
        width, height, mode = 4, 2, "RGB"

        def __array__(self, dtype=None, copy=None):
            return np.arange(24, dtype=np.float32).reshape(2, 4, 3)

    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = lambda bio: _FakeImage()
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    sys.modules["PIL"] = pil_mod
    sys.modules["PIL.Image"] = image_mod
    try:
        dec, real = _decoder()
        assert real is True
        assert dec(data)[2] == "RGB"  # JPEG -> PIL, not the stdlib path
        assert dec(encode_bmp(3, 2, np.zeros((2, 3, 3))))[2] == "BMP"
    finally:
        del sys.modules["PIL"]
        del sys.modules["PIL.Image"]


def test_resize_compressed_routes_to_imaging_lib():
    """ADVICE r09 (medium): resize_images must mirror _decoder's
    routing — when Pillow is importable, JPEG resize goes through
    PIL's decode + Image.resize + save in the ORIGINAL format (never
    the per-bit Python Huffman loop, never a fixed-table re-quantize);
    lib-less environments keep the stdlib baseline-JPEG pair."""
    import sys
    import types

    import numpy as np

    from thundercats_spark.multimodal.binary import _compressed_resizer
    from thundercats_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    if "PIL" in sys.modules:
        import pytest

        pytest.skip("real Pillow present; fake-module routing untestable")

    sw, sh, w, h = 24, 16, 8, 4
    g = np.clip(
        np.arange(sw)[None, :] * 7.0 + np.arange(sh)[:, None] * 3.0, 0, 255
    )
    payload = encode_jpeg(sw, sh, g, channels=1)

    def nn(vec, src_w, src_h, ch):
        arr = vec.reshape(src_h, src_w, ch)
        ys = np.minimum(np.arange(h) * src_h // h, src_h - 1)
        xs = np.minimum(np.arange(w) * src_w // w, src_w - 1)
        return arr[ys][:, xs]

    # (a) lib-less branch: stdlib pair, output re-decodes at target dims
    resize, via_lib = _compressed_resizer(w, h, nn)
    assert via_lib is False
    out = resize(payload)
    got = decode_jpeg(out)
    assert got is not None and got[:2] == (w, h)
    assert resize(b"not an image") is None  # stub takes undecodables

    # (b) fake Pillow: the lib is chosen, resize+save called, original
    # format preserved, and the stdlib encoder NEVER runs
    calls = {}

    class _FakeResized:
        def save(self, buf, format=None):
            calls["save_format"] = format
            buf.write(b"LIBJPEG-OUTPUT")

    class _FakeImage:
        format = "JPEG"

        def resize(self, size):
            calls["resize"] = size
            return _FakeResized()

    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = lambda bio: _FakeImage()
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    sys.modules["PIL"] = pil_mod
    sys.modules["PIL.Image"] = image_mod
    try:
        resize, via_lib = _compressed_resizer(w, h, nn)
        assert via_lib is True
        assert resize(payload) == b"LIBJPEG-OUTPUT"
        assert calls == {"resize": (w, h), "save_format": "JPEG"}
        # a payload the lib cannot open falls to the caller's stub
        image_mod.open = lambda bio: (_ for _ in ()).throw(OSError("bad"))
        resize, _ = _compressed_resizer(w, h, nn)
        assert resize(b"garbage") is None
    finally:
        del sys.modules["PIL"]
        del sys.modules["PIL.Image"]


def test_encode_jpeg_validates_quant_range():
    """ADVICE r09: quant=0 divides by zero in the block encoder and
    quant>255 wraps in the uint8 DQT write (stored table != table used
    to quantize) — both must raise, and the bounds themselves encode."""
    import numpy as np
    import pytest

    from thundercats_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    g = _gradient(16, 8)
    for bad in (0, -1, 256, 1000):
        with pytest.raises(ValueError, match="quant"):
            encode_jpeg(16, 8, g, channels=1, quant=bad)
    for edge in (1, 255):
        got = decode_jpeg(encode_jpeg(16, 8, g, channels=1, quant=edge))
        assert got is not None and got[:2] == (16, 8)


def test_progressive_jpeg_roundtrip_matrix():
    """VERDICT r09 #4: progressive (SOF2) JPEG decodes for REAL in the
    stdlib codec. The pin is the strongest available: a progressive
    file of the same pixels decodes BIT-IDENTICALLY to the baseline
    file's decode, across gray/RGB, 4:2:0 subsampling, quant levels,
    restart markers, multi-band spectral selection, and 0-2 bit
    successive approximation on both DC and AC — two entirely
    different entropy codings converging to the same coefficients."""
    import numpy as np

    from thundercats_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(7)
    for _ in range(8):
        w = int(rng.integers(8, 70))
        h = int(rng.integers(8, 70))
        ch = int(rng.choice([1, 3]))
        quant = int(rng.choice([1, 2, 4, 8]))
        sub = (2, 2) if (ch == 3 and rng.random() < 0.5) else (1, 1)
        ri = int(rng.choice([0, 1, 3]))
        dcp = int(rng.integers(0, 3))
        acp = int(rng.integers(0, 3))
        px = rng.integers(0, 256, (h, w, ch)).astype(float)
        if ch == 1:
            px = px[..., 0]
        prog = encode_jpeg_progressive(
            w, h, px, channels=ch, subsampling=sub, quant=quant,
            restart_interval=ri, dc_point=dcp, ac_point=acp,
        )
        got = decode_jpeg(prog)
        base = decode_jpeg(encode_jpeg(
            w, h, px, channels=ch, subsampling=sub, quant=quant,
            restart_interval=ri,
        ))
        assert got is not None, (w, h, ch, quant, sub, ri, dcp, acp)
        assert got[:2] == (w, h)
        assert np.array_equal(got[3], base[3]), (
            w, h, ch, quant, sub, ri, dcp, acp,
        )


def test_progressive_jpeg_exact_on_gradient_and_band_splits():
    """Near-lossless pin on a smooth gradient (quant=1: the only loss
    is float DCT + rounding — exact here), and the band tiling
    contract: 1-band, 2-band, and 4-band spectral scripts all decode
    identically; malformed band tilings and bad point transforms
    raise."""
    import numpy as np
    import pytest

    from thundercats_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    from thundercats_spark.multimodal.jpeg import encode_jpeg

    w, h = 40, 24
    g = np.clip(
        np.arange(w)[None, :] * 7.0 + np.arange(h)[:, None] * 3.0, 0, 255
    )
    base = decode_jpeg(encode_jpeg(w, h, g, channels=1))
    outs = []
    for bands in (((1, 63),), ((1, 5), (6, 63)),
                  ((1, 2), (3, 10), (11, 32), (33, 63))):
        got = decode_jpeg(
            encode_jpeg_progressive(w, h, g, channels=1, bands=bands)
        )
        # quant=1: only float-DCT + rounding loss (≤ 1 count), and
        # every band script lands BIT-equal to the baseline decode
        assert np.abs(got[3].reshape(h, w) - g).max() <= 1.0
        assert np.array_equal(got[3], base[3])
        outs.append(got[3])
    assert all(np.array_equal(outs[0], o) for o in outs[1:])

    with pytest.raises(ValueError, match="bands"):
        encode_jpeg_progressive(w, h, g, channels=1, bands=((2, 63),))
    with pytest.raises(ValueError, match="bands"):
        encode_jpeg_progressive(
            w, h, g, channels=1, bands=((1, 5), (7, 63))
        )
    with pytest.raises(ValueError, match="point transforms"):
        encode_jpeg_progressive(w, h, g, channels=1, dc_point=14)


def test_progressive_jpeg_eob_runs_and_robustness():
    """A sparse image drives multi-block EOBn runs through both the
    first and refinement AC paths; truncated/corrupt progressive
    payloads return None or a well-formed frame, never an exception;
    the progressive path decodes through the Spark decoder chain
    (mode 'JPEG', no PIL, no stub)."""
    import numpy as np

    from thundercats_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    w = h = 64
    px = np.zeros((h, w))
    px[5, 7] = 200.0  # one hot pixel → 63 all-zero blocks → long runs
    prog = encode_jpeg_progressive(w, h, px, channels=1)
    base = decode_jpeg(encode_jpeg(w, h, px, channels=1))
    got = decode_jpeg(prog)
    assert np.array_equal(got[3], base[3])

    for cut in (10, 60, len(prog) // 2, len(prog) - 3):
        r = decode_jpeg(prog[:cut])
        assert r is None or r[:2] == (w, h)
    bad = bytearray(prog)
    bad[len(bad) // 2] ^= 0xFF
    r = decode_jpeg(bytes(bad))
    assert r is None or r[:2] == (w, h)


def test_progressive_jpeg_through_spark_decoder_chain(spark):
    """decode_image_features REALLY decodes progressive payloads —
    true dims, mode 'JPEG', exact features on a gradient — and strict
    mode passes them untouched (the strict gate now names only the
    arithmetic/lossless/12-bit gaps)."""
    import numpy as np

    from thundercats_spark.multimodal.binary import decode_image_features
    from thundercats_spark.multimodal.jpeg import encode_jpeg_progressive

    w, h = 24, 16
    g = np.clip(
        np.arange(w)[None, :] * 7.0 + np.arange(h)[:, None] * 3.0, 0, 255
    )
    rgb = np.stack([g, 255 - g, g / 2], axis=-1)
    df = spark.createDataFrame(
        [
            (1, encode_jpeg_progressive(w, h, g, channels=1)),
            (2, encode_jpeg_progressive(
                w, h, rgb, channels=3, subsampling=(2, 2))),
        ],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in decode_image_features(df).collect()}
    assert out[1]["mode"] == "JPEG" and out[2]["mode"] == "JPEG"
    assert (out[1]["width"], out[1]["height"]) == (w, h)
    assert np.abs(np.array(out[1]["feature"]) - g.ravel()).max() == 0.0
    assert len(out[2]["feature"]) == w * h * 3
    strict_out = decode_image_features(df, strict=True).collect()
    assert len(strict_out) == 2


def test_png_16bit_and_adam7_roundtrips():
    """r10: the PNG matrix completes — 16-bit depth and Adam7
    interlacing decode for REAL. Round-trips across channel counts,
    all five filters, both depths, both interlace methods, and edge
    dims where Adam7 passes are empty; 16-bit samples map to the
    chain's 0-255 scale by v/257 (exact on 8-bit-replicated content)."""
    import numpy as np

    from thundercats_spark.multimodal.binary import decode_png, encode_png

    rng = np.random.default_rng(3)
    cases = [
        (16, 9, 3, 0, 8, 1), (16, 9, 3, 1, 8, 1), (16, 9, 3, 2, 8, 1),
        (16, 9, 3, 3, 8, 1), (16, 9, 3, 4, 8, 1),
        (5, 5, 1, 4, 8, 1), (1, 1, 3, 0, 8, 1), (2, 3, 4, 2, 8, 1),
        (7, 4, 1, 0, 16, 0), (16, 9, 3, 4, 16, 0),
        (16, 9, 3, 4, 16, 1), (3, 2, 2, 1, 16, 1),
        (12, 12, 3, 3, 8, 0),  # pre-r10 shape must still round-trip
    ]
    for w, h, ch, ft, depth, il in cases:
        px = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
        data = encode_png(
            w, h, px, channels=ch, filter_type=ft, depth=depth,
            interlace=il,
        )
        got = decode_png(data)
        assert got is not None and got[:2] == (w, h), (w, h, ch, ft, depth, il)
        assert np.array_equal(
            got[3].reshape(h, w, ch), px.astype(np.float32)
        ), (w, h, ch, ft, depth, il)


def test_png_adam7_decoder_against_spec_literal_stream():
    """Decoder validated against a HAND-BUILT interlaced stream so an
    encoder/decoder shared pass-table bug cannot cancel out: the PNG
    spec's famous 8x8 Adam7 pattern, assembled byte-by-byte in the
    test from the spec's pass order (pass 1: one pixel; 2: one; 3:
    two; 4: four; 5: eight; 6: sixteen; 7: thirty-two), each pixel
    VALUED as its pass number — decoded output must equal the spec
    matrix."""
    import struct
    import zlib

    import numpy as np

    from thundercats_spark.multimodal.binary import decode_png

    spec = np.array([
        [1, 6, 4, 6, 2, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [3, 6, 4, 6, 3, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
    ], dtype=np.uint8)
    # pass sub-images in stream order (filter byte 0 before each row)
    body = b""
    body += b"\x00" + bytes([1])                      # pass 1: 1x1
    body += b"\x00" + bytes([2])                      # pass 2: 1x1
    body += b"\x00" + bytes([3, 3])                   # pass 3: 2x1
    body += (b"\x00" + bytes([4, 4])) * 2             # pass 4: 2x2
    body += (b"\x00" + bytes([5, 5, 5, 5])) * 2       # pass 5: 4x2
    body += (b"\x00" + bytes([6, 6, 6, 6])) * 4       # pass 6: 4x4
    body += (b"\x00" + bytes([7] * 8)) * 4            # pass 7: 8x4

    def chunk(ctype, payload):
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))

    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 1))
            + chunk(b"IDAT", zlib.compress(body))
            + chunk(b"IEND", b""))
    got = decode_png(data)
    assert got is not None and got[:2] == (8, 8)
    assert np.array_equal(got[3].reshape(8, 8), spec.astype(np.float32))


def test_png_interlaced_palette_and_rejections():
    """Adam7 + palette (bpp=1 scatter + PLTE lookup) decodes from a
    hand-built stream; sub-8-bit depths and unknown interlace methods
    still fall through as None (the remaining strict-mode gaps)."""
    import struct
    import zlib

    import numpy as np

    from thundercats_spark.multimodal.binary import decode_png, encode_png

    def chunk(ctype, payload):
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))

    # 2x2 palette image, Adam7: only passes 1 (px 0,0), 6 (px 1,0) and
    # 7 (row y=1) are non-empty at 2x2
    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250], [9, 9, 9]],
                   dtype=np.uint8)
    body = (b"\x00" + bytes([0])        # pass 1: index 0 at (0,0)
            + b"\x00" + bytes([1])      # pass 6: index 1 at (1,0)
            + b"\x00" + bytes([2, 3]))  # pass 7: indices at y=1
    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 1))
            + chunk(b"PLTE", pal.tobytes())
            + chunk(b"IDAT", zlib.compress(body))
            + chunk(b"IEND", b""))
    got = decode_png(data)
    assert got is not None
    px = got[3].reshape(2, 2, 3)
    assert np.array_equal(px[0, 0], [250, 0, 0])
    assert np.array_equal(px[0, 1], [0, 250, 0])
    assert np.array_equal(px[1, 0], [0, 0, 250])
    assert np.array_equal(px[1, 1], [9, 9, 9])

    # rejections: invalid depth; unknown interlace method; sub-8-bit
    # on a truecolour type (spec-illegal)
    ok = encode_png(4, 4, np.zeros((4, 4, 1), np.uint8), channels=1)
    depth3 = bytearray(ok)
    i = depth3.find(b"IHDR") + 4 + 8  # depth byte inside IHDR
    depth3[i] = 3
    assert decode_png(bytes(depth3)) is None
    il2 = bytearray(ok)
    il2[il2.find(b"IHDR") + 4 + 12] = 2
    assert decode_png(bytes(il2)) is None
    rgb = encode_png(4, 4, np.zeros((4, 4, 3), np.uint8), channels=3)
    bad = bytearray(rgb)
    bad[bad.find(b"IHDR") + 4 + 8] = 4  # depth 4 + colour type 2
    assert decode_png(bytes(bad)) is None


def test_png_sub_byte_depths_roundtrip_and_palette():
    """r10 late addition: the PNG matrix truly completes — 1/2/4-bit
    depths decode for REAL (MSB-first bit unpacking after byte-domain
    unfiltering, exact integer gray upscale 255//(2^d−1)), in both
    interlace methods, including non-byte-aligned row widths; a
    hand-built 2-bit PALETTE stream exercises the sub-byte index
    path."""
    import struct
    import zlib

    import numpy as np

    from thundercats_spark.multimodal.binary import decode_png, encode_png

    rng = np.random.default_rng(5)
    for w, h, d, ft, il in [
        (16, 9, 1, 0, 0), (16, 9, 1, 2, 0), (16, 9, 2, 1, 0),
        (16, 9, 4, 4, 0), (16, 9, 1, 0, 1), (16, 9, 2, 3, 1),
        (16, 9, 4, 4, 1), (5, 5, 4, 2, 1), (1, 1, 1, 0, 1),
        (30, 17, 4, 1, 0), (13, 7, 1, 0, 0), (9, 3, 2, 0, 1),
    ]:
        k = 255 // ((1 << d) - 1)
        px = (rng.integers(0, 1 << d, (h, w, 1)) * k).astype(np.uint8)
        data = encode_png(
            w, h, px, channels=1, filter_type=ft, depth=d, interlace=il
        )
        got = decode_png(data)
        assert got is not None and got[:2] == (w, h), (w, h, d, ft, il)
        assert np.array_equal(
            got[3].reshape(h, w), px[..., 0].astype(np.float32)
        ), (w, h, d, ft, il)

    # hand-built 2-bit palette, 5 px wide (10 bits -> 2 bytes/row with
    # 6 pad bits the decoder must crop)
    def chunk(ctype, payload):
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))

    pal = np.array([[10, 0, 0], [0, 20, 0], [0, 0, 30], [40, 40, 40]],
                   dtype=np.uint8)
    # rows of indices: [0,1,2,3,0] and [3,2,1,0,3]
    # bits: 00 01 10 11 00 (pad 000000) = 0b00011011 0b00000000
    #       11 10 01 00 11 (pad 000000) = 0b11100100 0b11000000
    body = (b"\x00" + bytes([0b00011011, 0b00000000])
            + b"\x00" + bytes([0b11100100, 0b11000000]))
    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 2, 2, 3, 0, 0, 0))
            + chunk(b"PLTE", pal.tobytes())
            + chunk(b"IDAT", zlib.compress(body))
            + chunk(b"IEND", b""))
    got = decode_png(data)
    assert got is not None and got[:2] == (5, 2)
    px = got[3].reshape(2, 5, 3).astype(np.uint8)
    exp = pal[np.array([[0, 1, 2, 3, 0], [3, 2, 1, 0, 3]])]
    assert np.array_equal(px, exp)

    # encoder guard: sub-byte is grayscale-only
    import pytest

    with pytest.raises(ValueError, match="grayscale"):
        encode_png(4, 4, np.zeros((4, 4, 3), np.uint8), channels=3, depth=4)


def test_lossless_jpeg_bit_exact_roundtrip_matrix():
    """Lossless (SOF3, annex H) decodes for REAL in the stdlib codec,
    and — unlike the DCT twins — the round trip is BIT-EXACT: random
    images survive encode→decode unchanged across every predictor
    (1-7), gray and RGB, and degenerate dims (1x1, 1xN, Nx1). A
    vertical step image exercises the modulo-2^16 wraparound path for
    large negative diffs under predictor 2."""
    import numpy as np

    from thundercats_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(11)
    for pred in range(1, 8):
        w = int(rng.integers(1, 40))
        h = int(rng.integers(1, 40))
        ch = int(rng.choice([1, 3]))
        img = rng.integers(0, 256, size=(h, w, ch), dtype=np.int64)
        data = encode_jpeg_lossless(w, h, img, channels=ch,
                                    predictor=pred)
        got = decode_jpeg(data)
        assert got is not None
        gw, gh, kind, flat = got
        assert (gw, gh, kind) == (w, h, "JPEG")
        dec = flat.astype(np.int64).reshape(h, w, ch)
        assert (dec == img).all(), f"predictor {pred} not lossless"
    for w, h in [(1, 1), (1, 7), (7, 1)]:
        img = rng.integers(0, 256, size=(h, w, 1), dtype=np.int64)
        data = encode_jpeg_lossless(w, h, img, channels=1, predictor=4)
        _, _, _, flat = decode_jpeg(data)
        assert (flat.astype(np.int64).reshape(h, w, 1) == img).all()
    # max-amplitude alternation: consecutive diffs of ±255 and a
    # column where (px + diff) crosses 0 under mod-2^16 arithmetic
    step = np.zeros((4, 6), dtype=np.int64)
    step[:, ::2] = 255
    data = encode_jpeg_lossless(6, 4, step, channels=1, predictor=2)
    _, _, _, flat = decode_jpeg(data)
    assert (flat.astype(np.int64).reshape(4, 6) == step).all()


def test_lossless_jpeg_precision_scaling_and_point_transform():
    """Non-8-bit precisions scale on decode by rint(v*255/(2^P-1)) —
    exact on bit-replicated 8-bit content (the PNG 16-bit precedent) —
    and point transform Pt codes v>>Pt, decoding to the input with the
    low Pt bits zeroed."""
    import numpy as np

    from thundercats_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(12)
    v8 = rng.integers(0, 256, size=(9, 5), dtype=np.int64)
    # 12-bit by bit replication: v12 = (v8 << 4) | (v8 >> 4) → decodes
    # back to exactly v8
    v12 = (v8 << 4) | (v8 >> 4)
    data = encode_jpeg_lossless(5, 9, v12, channels=1, predictor=7,
                                precision=12)
    _, _, _, flat = decode_jpeg(data)
    assert (flat.astype(np.int64).reshape(9, 5) == v8).all()
    # arbitrary 12-bit content: the documented scaling rule, exactly
    raw = rng.integers(0, 4096, size=(6, 6), dtype=np.int64)
    data = encode_jpeg_lossless(6, 6, raw, channels=1, precision=12)
    _, _, _, flat = decode_jpeg(data)
    expect = np.clip(np.rint(raw * (255.0 / 4095.0)), 0, 255)
    assert (flat.reshape(6, 6) == expect).all()
    # 4-bit: v4 replicated to 8 bits on decode scaling (v*255/15 = v*17)
    v4 = rng.integers(0, 16, size=(3, 8), dtype=np.int64)
    data = encode_jpeg_lossless(8, 3, v4, channels=1, precision=4)
    _, _, _, flat = decode_jpeg(data)
    assert (flat.astype(np.int64).reshape(3, 8) == v4 * 17).all()
    # point transform: low bits zeroed, prediction in the shifted domain
    img = rng.integers(0, 256, size=(7, 7), dtype=np.int64)
    data = encode_jpeg_lossless(7, 7, img, channels=1, predictor=5,
                                point_transform=2)
    _, _, _, flat = decode_jpeg(data)
    assert (flat.astype(np.int64).reshape(7, 7) == (img >> 2) << 2).all()


def test_lossless_jpeg_validation_and_gates():
    """encode_jpeg_lossless rejects out-of-contract args loudly;
    decode_jpeg still gates the genuinely-unsupported neighbors
    (DRI in a lossless frame, arithmetic-coded SOF) to None so the
    decoder chain falls through instead of mis-decoding."""
    import struct

    import numpy as np
    import pytest

    from thundercats_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg_lossless,
    )

    img = np.zeros((2, 2), dtype=np.int64)
    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless(2, 2, img, predictor=0)
    with pytest.raises(ValueError, match="precision"):
        encode_jpeg_lossless(2, 2, img, precision=17)
    with pytest.raises(ValueError, match="point_transform"):
        encode_jpeg_lossless(2, 2, img, precision=8, point_transform=8)
    with pytest.raises(ValueError, match="range"):
        encode_jpeg_lossless(2, 2, img + 300, precision=8)

    # splice a DRI segment into a valid lossless file → gated to None
    data = bytearray(encode_jpeg_lossless(2, 2, img + 5))
    dri = struct.pack(">BBHH", 0xFF, 0xDD, 4, 2)
    sos_at = data.find(b"\xff\xda")
    data[sos_at:sos_at] = dri
    assert decode_jpeg(bytes(data)) is None
    # arithmetic-coded lossless (SOF11 = 0xCB) stays gated
    data = bytearray(encode_jpeg_lossless(2, 2, img + 5))
    sof_at = data.find(b"\xff\xc3")
    data[sof_at + 1] = 0xCB
    assert decode_jpeg(bytes(data)) is None


def test_twelve_bit_jpeg_both_dct_modes():
    """12-bit precision decodes in BOTH DCT modes (extended sequential
    SOF1 and progressive SOF2 — the spec's homes for 12-bit; baseline
    SOF0 stays 8-bit-only and a 12-bit SOF0 is gated to None). Pins:
    (a) bit-replicated 12-bit content decodes back to the EXACT 8-bit
    source (DCT noise in the 0-4095 domain vanishes under the /16
    rescale); (b) a progressive 12-bit file decodes BIT-identically to
    the sequential 12-bit file of the same pixels — two entropy
    codings, wider category tables, Pq=1-adjacent paths all
    converging; (c) gray + RGB + 4:2:0 + restart markers."""
    import struct

    import numpy as np

    from thundercats_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(21)
    v8 = rng.integers(0, 256, size=(24, 17), dtype=np.int64)
    v12 = (v8 << 4) | (v8 >> 4)
    seq = decode_jpeg(encode_jpeg(17, 24, v12, channels=1, quant=1,
                                  precision=12))
    assert seq is not None and seq[:3] == (17, 24, "JPEG")
    assert (seq[3].reshape(24, 17).astype(np.int64) == v8).all()
    prog = decode_jpeg(encode_jpeg_progressive(
        17, 24, v12, channels=1, quant=1, precision=12,
        dc_point=2, ac_point=2))
    assert (prog[3] == seq[3]).all()

    rgb8 = rng.integers(0, 256, size=(20, 9, 3), dtype=np.int64)
    rgb12 = (rgb8 << 4) | (rgb8 >> 4)
    for kwargs in [dict(quant=2, restart_interval=3),
                   dict(quant=1, subsampling=(2, 2))]:
        s = decode_jpeg(encode_jpeg(9, 20, rgb12, channels=3,
                                    precision=12, **kwargs))
        p = decode_jpeg(encode_jpeg_progressive(9, 20, rgb12, channels=3,
                                                precision=12, **kwargs))
        assert s is not None and (s[3] == p[3]).all()

    # arbitrary (non-replicated) 12-bit content: sequential decode is
    # within one 8-bit count of the ideal rescale at quant=1
    raw = rng.integers(0, 4096, size=(16, 16), dtype=np.int64)
    got = decode_jpeg(encode_jpeg(16, 16, raw, channels=1, quant=1,
                                  precision=12))
    ideal = np.clip(np.rint(raw * (255.0 / 4095.0)), 0, 255)
    assert np.abs(got[3].reshape(16, 16) - ideal).max() <= 1

    # 12-bit in a BASELINE (SOF0) frame is spec-illegal → gated to None
    data = bytearray(encode_jpeg(4, 4, np.zeros((4, 4), dtype=np.int64),
                                 channels=1))
    sof_at = data.find(b"\xff\xc0")
    # SOF payload: len(2) precision(1)... — precision byte sits at +4
    assert data[sof_at + 4] == 8
    data[sof_at + 4] = 12
    assert decode_jpeg(bytes(data)) is None
    # out-of-range samples and bad precision raise loudly on encode
    import pytest
    with pytest.raises(ValueError, match="precision"):
        encode_jpeg(4, 4, np.zeros((4, 4)), channels=1, precision=10)
    with pytest.raises(ValueError, match="range"):
        encode_jpeg(4, 4, np.full((4, 4), 300), channels=1, precision=8)


def test_twelve_bit_jpeg_sixteen_bit_quant_tables():
    """Pq=1 DQT segments (16-bit quant entries — legal only in 12-bit
    frames) parse correctly: splice a 16-bit table with entries > 255
    into a 12-bit file and the decode must use the WIDE values, not a
    truncated low byte (a uint8 misread would massively over-sharpen
    every coefficient)."""
    import struct

    import numpy as np

    from thundercats_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(22)
    v12 = rng.integers(0, 4096, size=(8, 8), dtype=np.int64)
    data = bytearray(encode_jpeg(8, 8, v12, channels=1, quant=255,
                                 precision=12))
    # rewrite the DQT as Pq=1 with value 255 stored as 16-bit — the
    # pixels must decode identically to the Pq=0 original
    dqt_at = data.find(b"\xff\xdb")
    assert data[dqt_at + 4] == 0x00  # Pq=0, Tq=0
    wide = struct.pack(">BBH", 0xFF, 0xDB, 2 + 1 + 128) + bytes([0x10])
    wide += b"".join(struct.pack(">H", 255) for _ in range(64))
    base = decode_jpeg(bytes(data))
    data[dqt_at : dqt_at + 4 + 65] = wide
    wide_dec = decode_jpeg(bytes(data))
    assert wide_dec is not None
    assert (base[3] == wide_dec[3]).all()


def _g711_wav(tag: int, rate: int, nch: int, codes: bytes) -> bytes:
    """Minimal RIFF/WAVE container around raw G.711 bytes (format tag
    6 = A-law, 7 = mu-law) — the shape the stdlib wave module
    rejects, exercising the manual chunk walk."""
    import struct

    fmt = struct.pack("<HHIIHH", tag, nch, rate, rate * nch, nch, 8)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(codes)) + codes
    if len(codes) & 1:
        body += b"\x00"  # RIFF word alignment pad
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_g711_tables_formula_anchors_and_bijection():
    """The mu-law/A-law tables come from the G.711 FORMULAS (no
    transcribed constants), validated three independent ways: known
    anchor bytes, the 256-way bijection encode(decode(b)) == b (the
    encode twin is the analytic inverse — a convention error in either
    direction breaks this immediately), and level counts (mu-law
    collapses exactly the ±0 pair; A-law has 256 distinct levels)."""
    import numpy as np

    from thundercats_spark.multimodal.binary import (
        _g711_alaw_table,
        _g711_encode,
        _g711_ulaw_table,
    )

    ut, at = _g711_ulaw_table(), _g711_alaw_table()
    assert ut[0xFF] == 0 and ut[0x7F] == 0          # ±0 pair
    assert ut[0x00] == -32124 and ut[0x80] == 32124  # codec extremes
    assert at[0xD5] == 8 and at[0x55] == -8          # silence bytes
    assert at.max() == 32256 and at.min() == -32256
    ub = np.frombuffer(_g711_encode(ut, "ulaw"), dtype=np.uint8)
    mism = set(np.nonzero(ub != np.arange(256))[0].tolist())
    assert mism == {0x7F}  # −0 canonicalizes to +0; nothing else moves
    ab = np.frombuffer(_g711_encode(at, "alaw"), dtype=np.uint8)
    assert (ab == np.arange(256)).all()
    assert len(np.unique(ut)) == 255 and len(np.unique(at)) == 256


def test_g711_wav_decode_and_roundtrip():
    """G.711 WAV payloads decode for REAL through decode_wav (stdlib
    wave rejects tags 6/7 → the manual RIFF walk takes over): a sine
    encoded to mu-law then decoded sits within the segment quant error
    (< 4% of full scale everywhere, exact on codec lattice points);
    stereo downmix and duration honor the PCM path's contract."""
    import numpy as np

    from thundercats_spark.multimodal.binary import (
        _g711_encode,
        _g711_ulaw_table,
        decode_wav,
    )

    t = np.arange(800)
    sine = np.rint(20000 * np.sin(2 * np.pi * t / 80)).astype(np.int64)
    codes = _g711_encode(sine, "ulaw")
    fr, nch, dur, samples = decode_wav(_g711_wav(7, 8000, 1, codes))
    assert (fr, nch, dur) == (8000, 1, 100)
    assert np.abs(samples - sine).max() < 0.04 * 32768  # segment quant
    # codec lattice points survive exactly
    lattice = _g711_ulaw_table()[np.arange(0, 256, 7)]
    codes = _g711_encode(lattice, "ulaw")
    _, _, _, got = decode_wav(_g711_wav(7, 8000, 1, codes))
    assert (got.astype(np.int64) == lattice).all()
    # A-law stereo: channels average, odd-length data chunk pads
    left = np.full(11, 8, dtype=np.int64)
    right = np.full(11, -8, dtype=np.int64)
    inter = np.empty(22, dtype=np.int64)
    inter[0::2], inter[1::2] = left, right
    codes = _g711_encode(inter, "alaw")
    fr, nch, dur, samples = decode_wav(_g711_wav(6, 8000, 2, codes))
    assert nch == 2 and len(samples) == 11 and (samples == 0.0).all()
    # non-G.711 unknown tag still falls through to None
    assert decode_wav(_g711_wav(0x11, 8000, 1, b"\x00" * 8)) is None


def test_g711_wav_through_spark_audio_features(spark):
    """A mu-law WAV rides the REAL branch of decode_audio_features
    (true duration from the frame count, RMS over decoded samples) —
    not the byte-sum stub."""
    import numpy as np

    from thundercats_spark.multimodal.binary import (
        _g711_encode,
        decode_audio_features,
    )

    sine = np.rint(10000 * np.sin(np.linspace(0, 40 * np.pi, 16000)))
    payload = _g711_wav(7, 8000, 1, _g711_encode(sine.astype(np.int64), "ulaw"))
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "media_id long, payload binary")
    row = decode_audio_features(df, window_ms=1000).collect()[0]
    assert row["duration_ms"] == 2000 and row["n_windows"] == 2
    rms = 10000 / np.sqrt(2)
    for v in row["feature"]:
        assert abs(v - rms) / rms < 0.02  # real RMS, not byte sums


def _lossless_multiscan_file(img, n_scans):
    """Hand-build a NON-interleaved 3-component lossless (SOF3) file:
    one single-component scan per plane, keeping only the first
    ``n_scans`` scans. Each plane's entropy segment is borrowed from a
    grayscale encode of that plane (per-component prediction makes the
    bitstreams identical); only the SOS component id changes."""
    import struct

    import numpy as np

    from thundercats_spark.multimodal.jpeg import (
        _DCL_BITS,
        _DCL_VALS,
        encode_jpeg_lossless,
    )

    h, w, _ = img.shape
    out = bytearray(b"\xff\xd8")

    def segment(marker, payload):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    sof = struct.pack(">BHHB", 8, h, w, 3)
    for i in range(3):
        sof += struct.pack(">BBB", i + 1, 0x11, 0)
    segment(0xC3, sof)
    segment(0xC4, bytes([0x00]) + bytes(_DCL_BITS) + _DCL_VALS)
    for ci in range(n_scans):
        mono = encode_jpeg_lossless(
            w, h, np.ascontiguousarray(img[..., ci]), channels=1,
            predictor=1,
        )
        i = mono.find(b"\xff\xda")
        (seglen,) = struct.unpack_from(">H", mono, i + 2)
        entropy = mono[i + 2 + seglen : -2]  # strip the mono EOI
        segment(0xDA, bytes([1, ci + 1, 0x00, 1, 0, 0]))
        out.extend(entropy)
    out.extend(b"\xff\xd9")
    return bytes(out)


def test_lossless_jpeg_truncated_multiscan_returns_none():
    """ADVICE r10: a 3-component lossless file with only SOME component
    scans before EOI must decode to None (like the DCT path on an
    incomplete scan), NOT silently assemble the missing planes as
    all-zero. The complete 3-scan build of the same image stays
    bit-exact, proving the strictness fix didn't break the
    non-interleaved path."""
    import numpy as np

    from thundercats_spark.multimodal.jpeg import decode_jpeg

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(5, 9, 3), dtype=np.int64)

    full = decode_jpeg(_lossless_multiscan_file(img, 3))
    assert full is not None
    gw, gh, kind, flat = full
    assert (gw, gh, kind) == (9, 5, "JPEG")
    assert (flat.astype(np.int64).reshape(5, 9, 3) == img).all()

    for missing in (1, 2):  # 1 or 2 scans present, 3 expected
        assert decode_jpeg(_lossless_multiscan_file(img, missing)) is None
