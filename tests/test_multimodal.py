"""Multimodal plumbing tests: binary payloads through mapInPandas —
schema, batch shape, 1→N fan-out, stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_finance_pipeline_spark.operators.multimodal import (
    decode_image_stats,
    image_byte_histogram,
    resize_images,
    sample_video_frames,
    with_media_metadata,
)


def _media(spark):
    rows = [
        (1, bytes(range(256))),
        (2, bytes([10] * 100)),
        (3, None),
    ]
    return spark.createDataFrame(rows, ["media_id", "content"])


def test_with_media_metadata_schema(spark):
    df = with_media_metadata(_media(spark), media_type="image", fmt="raw", width=16, height=16)
    f = {x.name: x for x in df.schema["media_meta"].dataType.fields}
    assert set(f) == {"media_type", "format", "width", "height", "n_frames", "sample_rate"}
    row = df.filter(F.col("media_id") == 1).collect()[0]["media_meta"]
    assert row["media_type"] == "image" and row["width"] == 16


def test_decode_image_stats_fake(spark):
    out = decode_image_stats(_media(spark))
    assert out.schema["stats"].dataType.fieldNames() == [
        "n_bytes", "mean_intensity", "min_byte", "max_byte",
        "width", "height",  # header-parsed in ppm/bmp modes, null here
    ]
    got = {r["media_id"]: r["stats"] for r in out.collect()}
    assert got[1]["n_bytes"] == 256
    assert got[1]["mean_intensity"] == pytest.approx(127.5)
    assert got[1]["min_byte"] == 0 and got[1]["max_byte"] == 255
    assert got[2]["mean_intensity"] == pytest.approx(10.0)
    assert got[3]["n_bytes"] == 0 and got[3]["mean_intensity"] is None


def test_decode_real_raises(spark):
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image_stats(_media(spark), decode="real")


def test_image_byte_histogram_features(spark):
    out = image_byte_histogram(_media(spark), n_bins=16)
    got = {r["media_id"]: r["features"] for r in out.collect()}
    assert len(got[1]) == 16
    # uniform byte distribution -> each 16-wide bin holds 16/256
    assert got[1] == pytest.approx([1 / 16] * 16)
    assert sum(got[2]) == pytest.approx(1.0)
    assert got[2][0] == pytest.approx(1.0)  # all bytes = 10 -> first bin
    assert got[3] == [0.0] * 16


def test_resize_images_fake(spark):
    df = with_media_metadata(_media(spark).filter(F.col("content").isNotNull()))
    out = resize_images(df, target_width=8, target_height=8)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows[1]["content"]) == 64  # truncated to 8x8
    assert len(rows[2]["content"]) == 64  # padded from 100?? no - truncated
    assert rows[1]["media_meta"]["width"] == 8
    # payload shorter than target gets zero-padded
    small = spark.createDataFrame([(9, bytes([1, 2, 3]))], ["media_id", "content"])
    padded = resize_images(small, target_width=2, target_height=3).collect()[0]
    assert padded["content"] == bytes([1, 2, 3, 0, 0, 0])


def test_sample_video_frames_fan_out(spark):
    # payload = 50 frames of 64 bytes; every 10th -> frames 0,10,20,30,40
    payload = bytes([7] * (64 * 50))
    df = spark.createDataFrame([(1, payload)], ["media_id", "content"])
    out = sample_video_frames(df, every_n=10, frame_bytes=64).orderBy("frame_index")
    rows = out.collect()
    assert [r["frame_index"] for r in rows] == [0, 10, 20, 30, 40]
    assert all(len(r["frame"]) == 64 for r in rows)


def test_mapinpandas_preserves_partitioning(spark):
    df = _media(spark).repartition(3)
    out = decode_image_stats(df)
    # narrow transformation: partition count preserved, no shuffle
    assert out.rdd.getNumPartitions() == 3


def test_decode_audio_stats_fake(spark):
    from etl_finance_pipeline_spark.operators.multimodal import decode_audio_stats

    # 16000 samples of alternating +100/-100 -> rms 100, peak 100, 1s
    payload = bytes([100, 156] * 8000)
    df = spark.createDataFrame([(1, payload), (2, None)], ["media_id", "content"])
    got = {r["media_id"]: r["stats"] for r in decode_audio_stats(df).collect()}
    assert got[1]["n_samples"] == 16000
    assert got[1]["duration_s"] == pytest.approx(1.0)
    assert got[1]["rms"] == pytest.approx(100.0)
    assert got[1]["peak"] == 100
    assert got[2]["n_samples"] == 0 and got[2]["rms"] is None


def test_decode_audio_real_raises(spark):
    from etl_finance_pipeline_spark.operators.multimodal import decode_audio_stats

    df = spark.createDataFrame([(1, bytes([0]))], ["media_id", "content"])
    with pytest.raises(NotImplementedError, match="soundfile"):
        decode_audio_stats(df, decode="real")


def test_wav_roundtrip_real_codec(spark):
    """encode_wav_pcm16 writes a genuine RIFF container (stdlib wave
    can open it standalone); decode='wav' re-derives rate/frames from
    the header and stats from the PCM chunk."""
    import io
    import wave

    from etl_finance_pipeline_spark.operators.multimodal import (
        decode_audio_stats,
        encode_wav_pcm16,
    )

    payload = bytes([128, 129, 127, 200, 0])  # samples 0,256,-256,18432,-32768
    df = spark.createDataFrame([(1, payload)], ["media_id", "content"])
    wav_df = encode_wav_pcm16(df, sample_rate=8_000)
    blob = wav_df.collect()[0]["content"]

    # container is standalone-readable
    with wave.open(io.BytesIO(bytes(blob))) as wf:
        assert wf.getframerate() == 8_000
        assert wf.getnchannels() == 1
        assert wf.getsampwidth() == 2
        assert wf.getnframes() == len(payload)

    row = decode_audio_stats(wav_df, decode="wav").collect()[0]["stats"]
    samples = [(b - 128) * 256 for b in payload]
    assert row["n_samples"] == 5
    assert row["duration_s"] == 5 / 8_000  # rate from the header
    assert row["peak"] == max(abs(s) for s in samples)
    assert row["rms"] == (sum(s * s for s in samples) / 5) ** 0.5


def test_wav_decode_8bit_and_stereo(spark):
    """The wav decoder handles what the wave module can represent:
    unsigned 8-bit samples and multi-channel frames."""
    import io
    import struct
    import wave

    from etl_finance_pipeline_spark.operators.multimodal import decode_audio_stats

    def make_wav(n_ch, sampwidth, rate, frames):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(n_ch)
            wf.setsampwidth(sampwidth)
            wf.setframerate(rate)
            wf.writeframes(frames)
        return buf.getvalue()

    # 8-bit unsigned mono: bytes 128,138 -> samples 0,10
    w8 = make_wav(1, 1, 4_000, bytes([128, 138]))
    # 16-bit stereo, two frames: samples 100,-100,300,-300
    w16 = make_wav(2, 2, 4_000, struct.pack("<4h", 100, -100, 300, -300))
    df = spark.createDataFrame(
        [(1, w8), (2, w16)], ["media_id", "content"]
    )
    rows = {
        r["media_id"]: r["stats"]
        for r in decode_audio_stats(df, decode="wav").collect()
    }
    assert rows[1]["n_samples"] == 2 and rows[1]["peak"] == 10
    assert rows[2]["n_samples"] == 4  # frames * channels
    assert rows[2]["duration_s"] == 2 / 4_000  # per-frame duration
    assert rows[2]["peak"] == 300


def test_ppm_roundtrip_real_codec(spark):
    """encode_ppm emits a spec-correct P6; decode='ppm' parses the
    header (incl. comment lines) and stats exactly the raster."""
    from etl_finance_pipeline_spark.operators.multimodal import (
        _parse_ppm,
        decode_image_stats,
        encode_ppm,
    )

    payload = bytes(range(1, 101))  # 100 bytes -> padded to 2*2*3=12? no: w=4,h=4 -> 48
    df = spark.createDataFrame([(1, payload)], ["media_id", "content"])
    ppm = encode_ppm(df, width=4, height=4)  # raster = 48 bytes
    blob = bytes(ppm.collect()[0]["content"])
    w, h, pix = _parse_ppm(blob)
    assert (w, h) == (4, 4) and pix == payload[:48]

    row = decode_image_stats(ppm, decode="ppm").collect()[0]["stats"]
    assert row["width"] == 4 and row["height"] == 4
    assert row["n_bytes"] == 48
    assert row["min_byte"] == 1 and row["max_byte"] == 48
    assert row["mean_intensity"] == sum(range(1, 49)) / 48

    # header parser handles comments + arbitrary whitespace
    commented = b"P6\n# a comment\n 2\t1 # trailing\n255\n" + bytes(6)
    assert _parse_ppm(commented) == (2, 1, bytes(6))


def test_bmp_roundtrip_real_codec(spark):
    """encode_bmp24 writes a spec-correct uncompressed 24-bit BMP
    (little-endian headers, 4-byte row padding); decode='bmp' strips
    the padding back out."""
    from etl_finance_pipeline_spark.operators.multimodal import (
        _parse_bmp,
        decode_image_stats,
        encode_bmp24,
    )

    # width=3 -> row_bytes=9, stride=12: padding exercised
    payload = bytes(range(10, 28))  # 18 bytes = 3*2*3 exactly
    df = spark.createDataFrame([(1, payload)], ["media_id", "content"])
    bmp = encode_bmp24(df, width=3, height=2)
    blob = bytes(bmp.collect()[0]["content"])
    assert blob[:2] == b"BM"
    w, h, pix = _parse_bmp(blob)
    assert (w, h) == (3, 2) and pix == payload

    row = decode_image_stats(bmp, decode="bmp").collect()[0]["stats"]
    assert row["width"] == 3 and row["height"] == 2
    assert row["n_bytes"] == 18
    assert row["min_byte"] == 10 and row["max_byte"] == 27


def test_png_roundtrip_real_codec_all_filters(spark):
    """encode_png writes a spec-conformant 8-bit RGB PNG (CRC-stamped
    chunks, DEFLATE IDAT); decode='png' inflates and reverses the
    scanline filter. Round-trip must be byte-exact for every filter
    the encoder can write."""
    from etl_finance_pipeline_spark.operators.multimodal import (
        _parse_png,
        decode_image_stats,
        encode_png,
    )

    payload = bytes((i * 37) % 251 for i in range(3 * 2 * 3))  # 18 bytes
    df = spark.createDataFrame([(1, payload)], ["media_id", "content"])
    for ftype in (0, 1, 2):
        png = encode_png(df, width=3, height=2, filter_type=ftype)
        blob = bytes(png.collect()[0]["content"])
        assert blob[:8] == b"\x89PNG\r\n\x1a\n"
        w, h, pix = _parse_png(blob)
        assert (w, h) == (3, 2) and pix == payload, f"filter {ftype}"

        row = decode_image_stats(png, decode="png").collect()[0]["stats"]
        assert row["width"] == 3 and row["height"] == 2
        assert row["n_bytes"] == 18
        assert row["min_byte"] == min(payload)
        assert row["max_byte"] == max(payload)


def test_png_decoder_reverses_average_and_paeth():
    """The decoder handles the two filters the encoder never writes
    (3=Average, 4=Paeth) — hand-built scanlines, pure-Python check."""
    import struct
    import zlib

    from etl_finance_pipeline_spark.operators.multimodal import (
        _parse_png,
        _png_chunk,
    )

    w, h, bpp = 2, 2, 3
    raster = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    rows = [raster[:6], raster[6:]]
    # row 0: Average (prev row = zeros): filtered = raw - (left_raw >> 1)
    f0 = bytearray()
    for i in range(6):
        left = rows[0][i - bpp] if i >= bpp else 0
        f0.append((rows[0][i] - ((left + 0) >> 1)) & 0xFF)
    f1 = bytearray()
    for i in range(6):
        left = rows[1][i - bpp] if i >= bpp else 0
        up = rows[0][i]
        ul = rows[0][i - bpp] if i >= bpp else 0
        p = left + up - ul
        pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
        pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
        f1.append((rows[1][i] - pred) & 0xFF)
    scan = bytes([3]) + bytes(f0) + bytes([4]) + bytes(f1)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scan))
        + _png_chunk(b"IEND", b"")
    )
    pw, ph, pix = _parse_png(blob)
    assert (pw, ph) == (w, h) and pix == raster


def test_resize_ppm_nearest_neighbor_exact(spark):
    from etl_finance_pipeline_spark.operators.multimodal import (
        decode_image_stats,
        resize_images,
    )

    # 4x2 image whose pixel (y,x) has R=G=B = 10*y + x: NN to 2x1
    # must pick sources (0,0) and (0,2) -> values 0 and 2.
    w, h = 4, 2
    raster = bytes(
        b for y in range(h) for x in range(w) for b in [10 * y + x] * 3
    )
    ppm = f"P6\n{w} {h}\n255\n".encode() + raster
    df = spark.createDataFrame([(1, bytearray(ppm))], ["media_id", "content"])
    out = resize_images(df, target_width=2, target_height=1, decode="ppm")
    payload = bytes(out.collect()[0]["content"])
    assert payload.startswith(b"P6\n2 1\n255\n")
    body = payload[len(b"P6\n2 1\n255\n"):]
    assert body == bytes([0, 0, 0, 2, 2, 2])
    # and the resized container round-trips through the decoder
    stats = decode_image_stats(out, decode="ppm").collect()[0]["stats"]
    assert (stats["width"], stats["height"]) == (2, 1)
    assert stats["max_byte"] == 2


def test_resize_ppm_upscale_repeats_pixels(spark):
    from etl_finance_pipeline_spark.operators.multimodal import resize_images

    # 1x1 red pixel upscaled to 3x2: every target pixel is the source
    ppm = b"P6\n1 1\n255\n" + bytes([200, 0, 0])
    df = spark.createDataFrame([(1, bytearray(ppm))], ["media_id", "content"])
    out = resize_images(df, target_width=3, target_height=2, decode="ppm")
    payload = bytes(out.collect()[0]["content"])
    assert payload == b"P6\n3 2\n255\n" + bytes([200, 0, 0]) * 6


def test_audio_zcr_counts_sign_flips(spark):
    from etl_finance_pipeline_spark.operators.multimodal import decode_audio_stats

    # fake mode: signed 8-bit PCM. [10, -10, 10, 10] -> 2 flips / 3
    df = spark.createDataFrame(
        [(1, bytearray([10, 246, 10, 10]))], ["media_id", "content"]
    )
    stats = decode_audio_stats(df, decode="fake").collect()[0]["stats"]
    assert abs(stats["zcr"] - 2 / 3) < 1e-12


def test_audio_zcr_single_sample_is_null(spark):
    from etl_finance_pipeline_spark.operators.multimodal import decode_audio_stats

    df = spark.createDataFrame([(1, bytearray([5]))], ["media_id", "content"])
    stats = decode_audio_stats(df, decode="fake").collect()[0]["stats"]
    assert stats["zcr"] is None


def test_frame_delta_scene_cut_detection(spark):
    """A payload of constant frames with one abrupt change yields
    near-zero deltas everywhere except the cut, which is flagged."""
    from etl_finance_pipeline_spark.operators.multimodal import frame_delta_stats

    payload = bytes([10] * 192 + [200] * 128)  # 3 quiet frames, cut, 2 loud
    df = spark.createDataFrame([(1, payload)], "media_id long, content binary")
    out = {
        r["frame_index"]: r
        for r in frame_delta_stats(df, frame_bytes=64).collect()
    }
    assert sorted(out) == [1, 2, 3, 4]
    assert out[1]["delta"] == 0.0 and not out[1]["is_cut"]
    assert out[3]["delta"] == 190.0 and out[3]["is_cut"]
    assert out[4]["delta"] == 0.0 and not out[4]["is_cut"]


def test_detect_silence_windows(spark):
    """Quiet windows (|sample| small) count as silent; loud ones not;
    the trailing partial window is ignored."""
    from etl_finance_pipeline_spark.operators.multimodal import detect_silence

    quiet = bytes([2] * 100)          # rms 2
    loud = bytes([120] * 100)         # rms 120
    payload = quiet + loud + quiet + bytes([5] * 30)  # partial tail
    df = spark.createDataFrame([(1, payload)], "media_id long, content binary")
    r = detect_silence(df, window_samples=100, rms_threshold=80.0).collect()[0]
    assert r["n_windows"] == 3 and r["n_silent"] == 2
    assert abs(r["silence_frac"] - 2 / 3) < 1e-12
    # too-short payload -> zero windows, NULL fraction
    df2 = spark.createDataFrame([(2, bytes([1] * 50))], "media_id long, content binary")
    r2 = detect_silence(df2).collect()[0]
    assert r2["n_windows"] == 0 and r2["silence_frac"] is None


def test_y4m_parser_roundtrip_mono():
    from etl_finance_pipeline_spark.operators.multimodal import (
        _parse_y4m,
    )

    y = b"YUV4MPEG2 W4 H2 F30:1 Ip A1:1 Cmono\n"
    f0, f1 = bytes(range(8)), bytes(range(8, 16))
    w, h, num, den, cs, frames = _parse_y4m(
        y + b"FRAME\n" + f0 + b"FRAME\n" + f1
    )
    assert (w, h, num, den, cs) == (4, 2, 30, 1, "mono")
    assert frames == [f0, f1]


def test_y4m_parser_skips_chroma_planes():
    from etl_finance_pipeline_spark.operators.multimodal import (
        _parse_y4m,
    )

    # C420: frame = 8 luma + 2 U + 2 V bytes; parser returns luma only
    y = b"YUV4MPEG2 W4 H2 C420\n"
    luma = bytes(range(8))
    frame = luma + b"\xaa\xbb" + b"\xcc\xdd"
    w, h, num, den, cs, frames = _parse_y4m(y + b"FRAME\n" + frame)
    assert (w, h) == (4, 2)
    assert (num, den) == (25, 1)  # spec default when no F tag
    assert frames == [luma]


def test_y4m_parser_fail_loud():
    from etl_finance_pipeline_spark.operators.multimodal import (
        _parse_y4m,
    )

    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        _parse_y4m(b"RIFF....")
    with pytest.raises(ValueError, match="missing W/H"):
        _parse_y4m(b"YUV4MPEG2 F25:1\nFRAME\n")
    with pytest.raises(ValueError, match="unsupported y4m colorspace"):
        _parse_y4m(b"YUV4MPEG2 W2 H2 C999\nFRAME\n" + b"\x00" * 4)
    with pytest.raises(ValueError, match="truncated"):
        _parse_y4m(b"YUV4MPEG2 W4 H2 Cmono\nFRAME\n" + b"\x00" * 7)
    with pytest.raises(ValueError, match="bad FRAME marker"):
        _parse_y4m(b"YUV4MPEG2 W2 H2 Cmono\nJUNK!\n" + b"\x00" * 4)


def test_y4m_encode_decode_spark_roundtrip(spark):
    """Container round-trip through the Spark lanes: encode_y4m wraps
    payload bytes, sample_video_frames(decode='y4m') re-parses them —
    frame boundaries from the container, last frame space-padded."""
    from etl_finance_pipeline_spark.operators.multimodal import (
        encode_y4m,
        sample_video_frames,
    )

    payload = bytes(range(100))  # 1 full 64-byte frame + 36 remainder
    df = spark.createDataFrame([(1, bytearray(payload))], ["media_id", "content"])
    clips = encode_y4m(df, width=8, height=8)
    frames = {
        r["frame_index"]: bytes(r["frame"])
        for r in sample_video_frames(clips, every_n=1, decode="y4m").collect()
    }
    assert set(frames) == {0, 1}
    assert frames[0] == payload[:64]
    assert frames[1] == payload[64:] + b" " * 28


def test_y4m_frame_delta_uses_header_geometry(spark):
    """frame_delta_stats(decode='y4m') must take the frame size from
    the parsed header (16 here), ignoring the frame_bytes default."""
    from etl_finance_pipeline_spark.operators.multimodal import (
        encode_y4m,
        frame_delta_stats,
    )

    payload = bytes([0] * 16 + [10] * 16)  # two 4x4 frames, delta 10
    df = spark.createDataFrame([(1, bytearray(payload))], ["media_id", "content"])
    clips = encode_y4m(df, width=4, height=4)
    rows = frame_delta_stats(clips, cut_threshold=5.0, decode="y4m").collect()
    assert len(rows) == 1
    assert rows[0]["delta"] == 10.0
    assert rows[0]["is_cut"] is True


def test_jpeg_constant_blocks_bit_exact():
    """Constant 8x8 blocks under the flat table quantize losslessly:
    decode(encode(img)) == img byte-for-byte (full huffman + IDCT)."""
    import numpy as np

    from etl_finance_pipeline_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.RandomState(7)
    vals = rng.randint(0, 256, size=(4, 8)).astype(np.uint8)
    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    w, h, pix = decode_jpeg_gray(encode_jpeg_gray(img))
    assert (w, h) == (64, 32)
    assert np.array_equal(
        np.frombuffer(pix, dtype=np.uint8).reshape(h, w), img
    )


def test_jpeg_random_image_bounded_error_and_crop():
    """Arbitrary images exercise the full AC path (all categories,
    ZRL, EOB); flat quantization bounds round-trip error to DCT
    rounding, and non-multiple-of-8 dims crop back via SOF."""
    import numpy as np

    from etl_finance_pipeline_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(10, 13)).astype(np.uint8)
    w, h, pix = decode_jpeg_gray(encode_jpeg_gray(img))
    assert (w, h) == (13, 10) and len(pix) == 130
    dec = np.frombuffer(pix, dtype=np.uint8).reshape(h, w)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_decoder_fail_loud():
    import numpy as np
    import pytest as _pytest

    from etl_finance_pipeline_spark.operators.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    with _pytest.raises(ValueError, match="missing SOI"):
        decode_jpeg_gray(b"\x89PNG....")
    good = bytearray(
        encode_jpeg_gray(np.zeros((8, 8), dtype=np.uint8))
    )
    # flip SOF0 -> SOF2: the stream claims progressive but carries a
    # baseline scan header (Ss=0, Se=63 — illegal for a progressive
    # DC scan) — must fail loudly, not mis-decode
    idx = good.find(b"\xff\xc0")
    good[idx + 1] = 0xC2
    with _pytest.raises(ValueError, match="DC scan must have Se=0"):
        decode_jpeg_gray(bytes(good))
    # genuinely unsupported frame types still raise NotImplementedError
    good[idx + 1] = 0xC9  # SOF9: arithmetic coding
    with _pytest.raises(NotImplementedError, match="SOF9"):
        decode_jpeg_gray(bytes(good))


def test_jpeg_spark_lane_oracle_shape(spark):
    """encode_jpeg_blocks -> decode_image_stats('jpeg'): stats equal
    the padded payload byte stats (each byte is one constant tile)."""
    from etl_finance_pipeline_spark.operators.multimodal import (
        decode_image_stats,
        encode_jpeg_blocks,
    )

    payload = bytes(range(65, 77))  # 12 bytes -> 2 block-rows, 4 pad
    df = spark.createDataFrame([(1, bytearray(payload))], ["media_id", "content"])
    row = (
        decode_image_stats(
            encode_jpeg_blocks(df, blocks_per_row=8), decode="jpeg"
        )
        .select("stats.*")
        .first()
    )
    padded = payload + b" " * 4
    assert row["width"] == 64 and row["height"] == 16
    assert row["n_bytes"] == 64 * 16
    assert row["min_byte"] == min(padded) and row["max_byte"] == max(padded)
    assert abs(row["mean_intensity"] - sum(padded) / len(padded)) < 1e-12


def _jfif_rgb(y, cb, cr):
    import numpy as np

    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.floor(np.stack([r, g, b], -1) + 0.5), 0, 255).astype(
        np.uint8
    )


def test_jpeg_color_444_constant_tiles_exact():
    """4:4:4 color: constant YCbCr tiles round-trip losslessly per
    plane, so decoded RGB equals the deterministic JFIF conversion."""
    import numpy as np

    from etl_finance_pipeline_spark.operators.jpeg import (
        decode_jpeg_rgb,
        encode_jpeg_ycbcr,
    )

    rng = np.random.RandomState(5)
    ones = np.ones((8, 8), np.uint8)
    y = np.kron(rng.randint(0, 256, (2, 3)).astype(np.uint8), ones)
    cb = np.kron(rng.randint(0, 256, (2, 3)).astype(np.uint8), ones)
    cr = np.kron(rng.randint(0, 256, (2, 3)).astype(np.uint8), ones)
    w, h, rgb = decode_jpeg_rgb(encode_jpeg_ycbcr(y, cb, cr))
    dec = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    assert np.array_equal(
        dec, _jfif_rgb(y.astype(float), cb.astype(float), cr.astype(float))
    )


def test_jpeg_color_420_subsampled_exact():
    """4:2:0: chroma at half resolution, decoder replicates up —
    exercises the interleaved 4-luma-blocks-per-MCU walk and
    per-component DC prediction."""
    import numpy as np

    from etl_finance_pipeline_spark.operators.jpeg import (
        decode_jpeg_rgb,
        encode_jpeg_ycbcr,
    )

    rng = np.random.RandomState(6)
    y = np.kron(rng.randint(0, 256, (2, 2)).astype(np.uint8), np.ones((16, 16), np.uint8))
    cb = np.kron(rng.randint(0, 256, (2, 2)).astype(np.uint8), np.ones((8, 8), np.uint8))
    cr = np.kron(rng.randint(0, 256, (2, 2)).astype(np.uint8), np.ones((8, 8), np.uint8))
    w, h, rgb = decode_jpeg_rgb(
        encode_jpeg_ycbcr(y, cb, cr, luma_sampling=(2, 2))
    )
    dec = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
    up = lambda p: p.repeat(2, 0).repeat(2, 1).astype(float)  # noqa: E731
    assert np.array_equal(dec, _jfif_rgb(y.astype(float), up(cb), up(cr)))


def test_jpeg_color_odd_dims_and_dispatch():
    """Odd dimensions crop via SOF through the color path; the
    component-agnostic decode_jpeg dispatches by stream content; gray
    streams via decode_jpeg_rgb fail loudly."""
    import numpy as np
    import pytest as _pytest

    from etl_finance_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        decode_jpeg_rgb,
        encode_jpeg_gray,
        encode_jpeg_ycbcr,
    )

    rng = np.random.RandomState(7)
    y = rng.randint(0, 256, (10, 13)).astype(np.uint8)
    neutral = np.full((10, 13), 128, np.uint8)
    w, h, nc, raster = decode_jpeg(encode_jpeg_ycbcr(y, neutral, neutral))
    assert (w, h, nc) == (13, 10, 3) and len(raster) == 390
    # neutral chroma -> R=G=B=Y within DCT rounding
    dec = np.frombuffer(raster, np.uint8).reshape(10, 13, 3)
    assert np.abs(dec[:, :, 0].astype(int) - y.astype(int)).max() <= 2
    with _pytest.raises(ValueError, match="expected 3-component"):
        decode_jpeg_rgb(encode_jpeg_gray(y))


def test_avi_mjpeg_container_roundtrip(spark):
    """RIFF/AVI + Motion-JPEG end-to-end: encode_avi_mjpeg wraps
    constant-tile JPEG frames in a spec-compliant container;
    sample_video_frames(decode='avi') walks the chunks and decodes
    each frame with the in-module codec — decoded rasters are
    bit-exact expansions of the source bytes."""
    import numpy as np

    from etl_finance_pipeline_spark.operators.multimodal import (
        encode_avi_mjpeg,
        sample_video_frames,
    )

    payload = bytes(range(32, 132))  # 2 frames: 64 + 36 (space-padded)
    df = spark.createDataFrame([(1, bytearray(payload))], ["media_id", "content"])
    frames = {
        r["frame_index"]: bytes(r["frame"])
        for r in sample_video_frames(
            encode_avi_mjpeg(df), every_n=1, decode="avi"
        ).collect()
    }
    pad = payload + b" " * 28
    for i in (0, 1):
        vals = np.frombuffer(pad[i * 64 : (i + 1) * 64], np.uint8).reshape(8, 8)
        assert frames[i] == np.kron(vals, np.ones((8, 8), np.uint8)).tobytes()


def test_avi_parser_fail_loud():
    from etl_finance_pipeline_spark.operators.multimodal import (
        _parse_avi_mjpeg,
    )

    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        _parse_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    # RIFF/AVI magic but no avih header
    bad = b"RIFF" + (12).to_bytes(4, "little") + b"AVI " + b"JUNK" + (0).to_bytes(4, "little")
    with pytest.raises(ValueError, match="missing avih"):
        _parse_avi_mjpeg(bad)
    # truncated chunk: declared size exceeds the container
    trunc = b"RIFF" + (20).to_bytes(4, "little") + b"AVI " + b"avih" + (999).to_bytes(4, "little")
    with pytest.raises(ValueError, match="truncated AVI chunk"):
        _parse_avi_mjpeg(trunc + b"\x00" * 4)


def test_audio_dft_energy_concentrates_at_tone_bin(spark):
    """A pure tone at bin 2 puts (N/2)² energy in bin 2 and ~0
    elsewhere — through the REAL WAV round trip."""
    import numpy as np

    from etl_finance_pipeline_spark.operators.multimodal import (
        audio_dft_energies,
        encode_wav_pcm16,
    )

    n = 64
    # encoder maps byte b -> sample (b-128)*256; build bytes whose
    # samples trace cos(2*pi*2*j/n) scaled to +-127
    tone = np.round(127 * np.cos(2 * np.pi * 2 * np.arange(n) / n))
    payload = bytes((tone + 128).astype(np.uint8).tolist())
    df = spark.createDataFrame([(1, bytearray(payload))], ["media_id", "content"])
    wav = encode_wav_pcm16(df)
    out = {
        r["bin"]: r["energy"]
        for r in audio_dft_energies(wav, decode="wav", bins=(1, 2, 3)).collect()
    }
    # normalized amplitude = 127*256/32768 ~ 0.992; energy at the tone
    # bin ~ (0.992 * n/2)^2 ~ 1008; off bins ~ 0
    assert out[2] > 900
    assert out[1] < 1 and out[3] < 1


def test_image_phash_similarity_structure(spark):
    """pHash places a lightly perturbed image within a few bits of the
    original and an unrelated image far away; identical images hash
    identically — through the real JPEG round trip."""
    import numpy as np

    from etl_finance_pipeline_spark.operators.multimodal import (
        encode_jpeg_blocks,
        image_phash,
    )

    rng = np.random.RandomState(9)
    base = rng.randint(0, 256, 16).astype(np.uint8)
    perturbed = base.copy()
    perturbed[7] = (int(perturbed[7]) + 6) % 256  # small luma nudge
    unrelated = rng.randint(0, 256, 16).astype(np.uint8)
    df = spark.createDataFrame(
        [
            (1, bytearray(base.tobytes())),
            (2, bytearray(base.tobytes())),
            (3, bytearray(perturbed.tobytes())),
            (4, bytearray(unrelated.tobytes())),
        ],
        ["media_id", "content"],
    )
    jpg = encode_jpeg_blocks(df, blocks_per_row=4)
    h = {r["media_id"]: r["phash"] for r in image_phash(jpg).collect()}
    assert h[1] == h[2]
    near = bin(h[1] ^ h[3]).count("1")
    far = bin(h[1] ^ h[4]).count("1")
    assert near <= 10
    assert far > near


def test_audio_fingerprint_invariance_and_distance(spark):
    """Volume scaling preserves the fingerprint (energy-transition
    SIGNS are scale-invariant); different audio lands far away; short
    clips emit NULL — through the real WAV round trip."""
    import numpy as np

    from etl_finance_pipeline_spark.operators.multimodal import (
        audio_fingerprint,
        encode_wav_pcm16,
    )

    rng = np.random.RandomState(12)
    sig = rng.randint(-100, 100, 160)
    loud = bytes((sig + 128).astype(np.uint8).tolist())
    # half volume: same transitions, scaled energies
    quiet = bytes(((sig / 2).astype(int) + 128).astype(np.uint8).tolist())
    other = bytes((rng.randint(-100, 100, 160) + 128).astype(np.uint8).tolist())
    df = spark.createDataFrame(
        [
            (1, bytearray(loud)),
            (2, bytearray(quiet)),
            (3, bytearray(other)),
            (4, bytearray(b"\x80" * 10)),  # too short: 10 // 8 < 2
        ],
        ["media_id", "content"],
    )
    wav = encode_wav_pcm16(df)
    fp = {
        r["media_id"]: r["fingerprint"]
        for r in audio_fingerprint(wav, decode="wav").collect()
    }
    assert fp[4] is None
    near = bin(fp[1] ^ fp[2]).count("1")
    far = bin(fp[1] ^ fp[3]).count("1")
    assert near <= 4  # integer halving perturbs a few boundary bits
    assert far > 10


def test_video_fingerprint_speed_invariance(spark):
    """Slot resampling makes the fingerprint robust to playback-speed
    changes: doubling every frame (half speed) preserves the hash
    exactly; different content lands far away; 1-frame clips NULL."""
    import numpy as np

    from etl_finance_pipeline_spark.operators.multimodal import (
        encode_y4m,
        video_fingerprint,
    )

    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, 64).astype(np.uint8) for _ in range(8)]
    normal = b"".join(f.tobytes() for f in frames)
    # half speed: every frame twice -> slot t picks frame t*16//8's
    # half-index twin, same content per slot
    slow = b"".join(f.tobytes() * 2 for f in frames)
    other = bytes(rng.randint(0, 256, 512).astype(np.uint8).tolist())
    df = spark.createDataFrame(
        [
            (1, bytearray(normal)),
            (2, bytearray(slow)),
            (3, bytearray(other)),
            (4, bytearray(b"\x00" * 64)),  # 1 frame
        ],
        ["media_id", "content"],
    )
    clips = encode_y4m(df, width=8, height=8)
    fp = {
        r["media_id"]: r["fingerprint"]
        for r in video_fingerprint(clips).collect()
    }
    assert fp[1] == fp[2]
    assert bin(fp[1] ^ fp[3]).count("1") > 10
    assert fp[4] is None


def test_jpeg_restart_interval_resync():
    """DRI/RSTn handling: a hand-built stream with restart_interval=1
    (every MCU its own byte-aligned segment, DC predictor reset)
    decodes exactly; a stream MISSING a promised restart segment
    fails loudly."""
    import struct

    import numpy as np

    from etl_finance_pipeline_spark.operators.jpeg import (
        FLAT_QTABLE,
        _AC_BITS,
        _AC_VALUES,
        _BitWriter,
        _DC_BITS,
        _DC_VALUES,
        _ZIGZAG,
        _canonical_codes,
        _category,
        decode_jpeg_gray,
    )

    # two constant 8x8 blocks side by side: values 100 and 200
    vals = [100, 200]
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALUES)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALUES)

    def block_bits(v):
        """one DC-only MCU with pred=0 (restart resets the pred)."""
        bw = _BitWriter()
        dc = v - 128  # DC quant step 8 divides 8*(v-128)
        size = _category(dc)
        c, ln = dc_codes[size]
        bw.write(c, ln)
        if size:
            bw.write(dc if dc >= 0 else dc + (1 << size) - 1, size)
        c, ln = ac_codes[0x00]  # EOB
        bw.write(c, ln)
        return bw.finish()

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    q = FLAT_QTABLE
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + bytes(int(x) for x in q.reshape(64)[_ZIGZAG]))
    out += seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + b"\x01\x11\x00")
    out += seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALUES))
    out += seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALUES))
    out += seg(0xDD, struct.pack(">H", 1))  # DRI: restart every MCU
    out += seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    out += block_bits(vals[0]) + b"\xff\xd0" + block_bits(vals[1])
    out += b"\xff\xd9"

    w, h, pix = decode_jpeg_gray(bytes(out))
    dec = np.frombuffer(pix, np.uint8).reshape(h, w)
    assert (w, h) == (16, 8)
    assert (dec[:, :8] == 100).all() and (dec[:, 8:] == 200).all()

    # drop the second segment: promised 2 restart segments, found 1
    bad = bytearray(b"\xff\xd8")
    bad += bytes(out[2 : out.index(b"\xff\xd0")])  # headers + seg 0
    bad += b"\xff\xd9"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="restart segments"):
        decode_jpeg_gray(bytes(bad))


def test_y4m_parser_422_geometry():
    """C422: frame = 2*W*H bytes (Y + half-width U + half-width V);
    the parser validates the length and returns the luma plane."""
    from etl_finance_pipeline_spark.operators.multimodal import (
        _parse_y4m,
    )

    luma = bytes(range(8))  # W4 H2
    # C422 planes: Y = W*H = 8 bytes, U and V = (W/2)*H = 4 bytes each
    frame = luma + b"\x10" * 4 + b"\x20" * 4
    w, h, _, _, cs, frames = _parse_y4m(
        b"YUV4MPEG2 W4 H2 C422\nFRAME\n" + frame
    )
    assert (w, h, cs) == (4, 2, "422")
    assert frames == [luma]
    # truncated chroma fails loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="truncated"):
        _parse_y4m(b"YUV4MPEG2 W4 H2 C422\nFRAME\n" + luma + b"\x10" * 7)


def test_y4m_parser_odd_dimension_subsampled_geometry():
    """Odd-dimension subsampled streams are legal y4m: chroma planes
    are ceil(W/hdiv)*ceil(H/vdiv) bytes PER PLANE (mjpegtools spec),
    not a float multiple of W*H — a W3 H3 C420 frame is
    9 + 2*2*2 = 17 bytes, where int(9*1.5) = 13 would misparse."""
    from etl_finance_pipeline_spark.operators.multimodal import (
        _parse_y4m,
    )

    luma = bytes(range(9))  # W3 H3
    frame = luma + b"\x10" * 4 + b"\x20" * 4  # U, V = ceil(3/2)^2 = 4 each
    w, h, _, _, cs, frames = _parse_y4m(
        b"YUV4MPEG2 W3 H3 C420\n" + (b"FRAME\n" + frame) * 2
    )
    assert (w, h, cs) == (3, 3, "420")
    assert frames == [luma, luma]
    # odd-width C422: U, V = ceil(3/2)*3 = 6 each
    frame422 = luma + b"\x10" * 6 + b"\x20" * 6
    w, h, _, _, cs, frames = _parse_y4m(
        b"YUV4MPEG2 W3 H3 C422\nFRAME\n" + frame422
    )
    assert (w, h, cs, frames) == (3, 3, "422", [luma])
    # C444 odd dims: 3 full planes
    frame444 = luma * 3
    assert _parse_y4m(b"YUV4MPEG2 W3 H3 C444\nFRAME\n" + frame444)[5] == [
        luma
    ]


def test_jpeg_upsample_non_integer_factor_ratio():
    """_upsample_plane handles legal non-divisor sampling-factor
    pairs (luma 3 / chroma 2 -> 3:2) via index mapping, and matches
    byte replication exactly on integer ratios."""
    import numpy as np

    from etl_finance_pipeline_spark.operators.jpeg import _upsample_plane

    rng = np.random.RandomState(11)
    # integer ratio (2:1 both axes) == replication + crop
    p = rng.randint(0, 256, (8, 8)).astype(np.uint8)
    got = _upsample_plane(p, 1, 1, 2, 2, 13, 11)
    exp = p.repeat(2, 0).repeat(2, 1)[:11, :13]
    assert np.array_equal(got, exp)
    # non-integer ratio 3:2 horizontal: output col c reads plane col
    # (c*2)//3 — correct size, no broadcast error
    p = rng.randint(0, 256, (8, 16)).astype(np.uint8)
    got = _upsample_plane(p, 2, 3, 3, 3, 21, 8)
    assert got.shape == (8, 21)
    cols = (np.arange(21) * 2) // 3
    assert np.array_equal(got, p[:8, cols])
    # full-resolution component: pure crop
    assert np.array_equal(
        _upsample_plane(p, 3, 3, 3, 3, 5, 4), p[:4, :5]
    )


def test_jpeg_progressive_equals_baseline_bit_exact():
    """A progressive (SOF2) stream reconstructs the identical
    quantized coefficients as its baseline counterpart, so both
    encodings of the same pixels decode bit-identically — across
    gray/4:4:4/4:2:0, odd dimensions, EOB-run-heavy constant images,
    and refinement-heavy near-flat images (|coef| ∈ {0,1,2})."""
    import numpy as np

    from etl_finance_pipeline_spark.operators.jpeg import (
        decode_jpeg_gray,
        decode_jpeg_rgb,
        encode_jpeg_gray,
        encode_jpeg_progressive,
        encode_jpeg_ycbcr,
    )

    rng = np.random.RandomState(3)
    cases = [
        rng.randint(0, 256, (24, 37)).astype(np.uint8),  # random odd dims
        (128 + rng.randint(-2, 3, (30, 18))).astype(np.uint8),  # refine-heavy
        np.full((40, 40), 77, np.uint8),  # constant: EOB-run heavy
    ]
    sparse = np.full((64, 64), 100, np.uint8)
    sparse[50:, 50:] = rng.randint(0, 256, (14, 14))
    cases.append(sparse)  # long EOB runs then content
    for y in cases:
        assert decode_jpeg_gray(encode_jpeg_progressive(y)) == decode_jpeg_gray(
            encode_jpeg_gray(y)
        )
    # color, both samplings
    y = rng.randint(0, 256, (21, 19)).astype(np.uint8)
    cb = rng.randint(0, 256, (21, 19)).astype(np.uint8)
    cr = rng.randint(0, 256, (21, 19)).astype(np.uint8)
    assert decode_jpeg_rgb(encode_jpeg_progressive(y, cb, cr)) == decode_jpeg_rgb(
        encode_jpeg_ycbcr(y, cb, cr)
    )
    cbs = rng.randint(0, 256, (11, 10)).astype(np.uint8)
    crs = rng.randint(0, 256, (11, 10)).astype(np.uint8)
    assert decode_jpeg_rgb(
        encode_jpeg_progressive(y, cbs, crs, luma_sampling=(2, 2))
    ) == decode_jpeg_rgb(encode_jpeg_ycbcr(y, cbs, crs, luma_sampling=(2, 2)))


def test_jpeg_progressive_stream_is_sof2_and_multiscan():
    """The progressive encoder ships a genuine SOF2 multi-scan stream
    (not a re-labeled baseline): SOF2 marker, one DHT carrying EOBn
    symbols, and 4+ SOS scans with the successive-approximation
    Ss/Se/Ah/Al progression."""
    import struct

    import numpy as np

    from etl_finance_pipeline_spark.operators.jpeg import (
        _entropy_segments_end,
        encode_jpeg_progressive,
    )

    y = np.random.RandomState(4).randint(0, 256, (17, 25)).astype(np.uint8)
    b = encode_jpeg_progressive(y)
    pos, scans, markers = 2, [], []
    while pos + 2 <= len(b) and b[pos + 1] != 0xD9:
        m = b[pos + 1]
        markers.append(m)
        (ln,) = struct.unpack_from(">H", b, pos + 2)
        if m == 0xDA:
            pl = b[pos + 4 : pos + 2 + ln]
            ns = pl[0]
            scans.append((ns, pl[1 + 2 * ns], pl[2 + 2 * ns], pl[3 + 2 * ns]))
            pos += 2 + ln
            _, pos = _entropy_segments_end(b, pos)
        else:
            pos += 2 + ln
    assert 0xC2 in markers and 0xC0 not in markers
    # DC first (Al=1), AC first (Ss=1 Se=63 Al=1), DC refine, AC refine
    assert scans[0] == (1, 0, 0, 0x01)
    assert scans[1] == (1, 1, 63, 0x01)
    assert scans[2] == (1, 0, 0, 0x10)
    assert scans[3] == (1, 1, 63, 0x10)


def test_jpeg_mixed_corpus_spark_lane(spark):
    """encode_jpeg_blocks(mode='mixed') alternates SOF0/SOF2 by id;
    decode_image_stats dispatches per stream and recovers identical
    pixel stats for both — the crawl-shaped lane the oracle query
    image_stats_jpeg_mixed certifies per round."""
    from pyspark.sql import functions as F

    from etl_finance_pipeline_spark.operators.multimodal import (
        decode_image_stats,
        encode_jpeg_blocks,
    )

    docs = spark.createDataFrame(
        [(i, f"payload number {i} with some text") for i in range(6)],
        "media_id long, text string",
    ).select("media_id", F.encode("text", "UTF-8").alias("content"))
    jpg = encode_jpeg_blocks(docs, blocks_per_row=8, mode="mixed")
    raw = {r["media_id"]: bytes(r["content"]) for r in jpg.collect()}
    # odd ids are SOF2 streams, even are SOF0
    for mid, payload in raw.items():
        marker = b"\xff\xc2" if mid % 2 == 1 else b"\xff\xc0"
        assert marker in payload, mid
    stats = {
        r["media_id"]: r["stats"]
        for r in decode_image_stats(jpg, decode="jpeg").collect()
    }
    base = {
        r["media_id"]: r["stats"]
        for r in decode_image_stats(
            encode_jpeg_blocks(docs, blocks_per_row=8), decode="jpeg"
        ).collect()
    }
    assert stats == base


def test_image_decode_audit_quarantines_per_row(spark):
    """image_decode_audit never throws: corrupt payloads quarantine
    with the parser's deterministic error, healthy baseline AND
    progressive streams report their variant + geometry, empty
    payloads flag 'empty' — the per-variant skip-rate accounting a
    100 TB media run needs."""
    from pyspark.sql import functions as F

    from etl_finance_pipeline_spark.operators.multimodal import (
        encode_jpeg_blocks,
        image_decode_audit,
    )

    docs = spark.createDataFrame(
        [(0, "baseline payload"), (1, "progressive payload")],
        "media_id long, text string",
    ).select("media_id", F.encode("text", "UTF-8").alias("content"))
    good = encode_jpeg_blocks(docs, blocks_per_row=8, mode="mixed")
    bad = spark.createDataFrame(
        [(2, bytearray(b"definitely not a jpeg")), (3, bytearray(b""))],
        "media_id long, content binary",
    )
    out = {
        r["media_id"]: r
        for r in image_decode_audit(good.unionByName(bad)).collect()
    }
    assert out[0]["status"] == "ok" and out[0]["variant"] == "baseline"
    assert out[1]["status"] == "ok" and out[1]["variant"] == "progressive"
    assert out[0]["width"] == 64 and out[0]["height"] == 16
    assert out[2]["status"] == "quarantined"
    assert out[2]["error"] == "ValueError: not a JPEG stream (missing SOI)"
    assert out[2]["width"] is None
    assert out[3]["status"] == "empty"
    # truncated-but-real stream: starts like a JPEG, dies mid-entropy
    trunc = {
        r["media_id"]: r
        for r in image_decode_audit(
            good.select(
                "media_id",
                F.expr(
                    "substring(content, 1, CAST(length(content) / 2 AS INT))"
                ).alias("content"),
            )
        ).collect()
    }
    assert trunc[0]["status"] == "quarantined"
    assert trunc[0]["variant"] == "baseline"  # variant known from markers
