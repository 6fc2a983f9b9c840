"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs
over ``mapInPandas``.

Codec coverage is stdlib-deep, native-dep-stubbed:

 * REAL codecs, no external deps: WAV (RIFF container via the stdlib
   ``wave`` module — ``decode="wav"`` / :func:`encode_wav_pcm16`),
   PPM P6 and uncompressed 24-bit BMP byte parsing
   (``decode="ppm"`` / ``decode="bmp"`` / :func:`encode_bmp24`),
   PNG 8-bit RGB via stdlib ``zlib`` — chunk walk, DEFLATE, full
   5-filter scanline reversal (``decode="png"`` / :func:`encode_png`)
   — and the YUV4MPEG2 (y4m) video container: header parameter line,
   per-frame FRAME markers, planar mono/420/422/444 geometry
   (``decode="y4m"`` in the video lanes / :func:`encode_y4m`).
 * Formats that genuinely need native codecs (jpeg/mp4/...):
   ``decode="real"`` raises ``NotImplementedError`` with the
   dependency named (no PIL/ffmpeg in this container), and the
   default ``decode="fake"`` is a deterministic byte-level kernel so
   the Spark-side plumbing — schema evolution, Arrow batch shapes,
   partition preservation, UDF signatures — stays real and fully
   tested. Swapping in such a codec is a one-function change per
   modality.

Scale notes (100 TB design point):
 * ``mapInPandas`` streams Arrow record batches through the Python
   worker — memory is bounded by
   ``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of
   partition size; binary payloads never land on the driver.
 * Decode is a narrow transformation: no shuffle, parallelism = input
   file splits. Repartition UPSTREAM by a cheap column (e.g. content
   length bucket) if payload sizes are pathologically skewed.
 * Feature extraction emits fixed-width ``array<float>`` columns —
   downstream ANN/dedup operators (operators.similarity) consume them
   directly.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: Canonical multimodal schema fragment: payload + typed metadata.
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

IMAGE_STATS_TYPE = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("min_byte", T.IntegerType()),
        T.StructField("max_byte", T.IntegerType()),
        # real-codec modes (ppm/bmp) fill these from the parsed
        # header; the fake byte-level mode leaves them null
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def _parse_ppm(b: bytes) -> tuple[int, int, bytes]:
    """Parse a P6 (binary) PPM: returns (width, height, pixel bytes).
    Real header parsing — magic, whitespace/#-comment handling, the
    single whitespace byte before the raster — per the netpbm spec."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 ppm")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(b) and b[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    pos += 1  # exactly one whitespace byte before the raster
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit ppm not supported")
    pixels = b[pos : pos + w * h * 3]
    if len(pixels) != w * h * 3:
        raise ValueError("truncated ppm raster")
    return w, h, pixels


def _parse_bmp(b: bytes) -> tuple[int, int, bytes]:
    """Parse an uncompressed 24-bit BMP: returns (width, height,
    pixel bytes with row padding stripped, rows bottom-up as stored).
    Reads BITMAPFILEHEADER (pixel-array offset at byte 10) and
    BITMAPINFOHEADER (width/height/bpp/compression) with struct —
    the container format is little-endian by spec."""
    import struct

    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", b, 10)
    w, h = struct.unpack_from("<ii", b, 18)
    (bpp,) = struct.unpack_from("<H", b, 28)
    (compression,) = struct.unpack_from("<I", b, 30)
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    import numpy as np

    h_abs = abs(h)
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3  # rows padded to 4-byte boundaries
    # last row may omit its padding; only the pixel bytes must exist
    if len(b) < data_off + (h_abs - 1) * stride + row_bytes:
        raise ValueError("truncated bmp raster")
    raster = np.frombuffer(
        b, dtype=np.uint8, count=h_abs * stride - (stride - row_bytes),
        offset=data_off,
    )
    padded = np.empty(h_abs * stride, dtype=np.uint8)
    padded[: raster.size] = raster
    pixels = padded.reshape(h_abs, stride)[:, :row_bytes]
    return w, h_abs, pixels.tobytes()


def _parse_png(b: bytes) -> tuple[int, int, bytes]:
    """Parse a REAL PNG (8-bit RGB, non-interlaced) with stdlib only:
    chunk walk → IHDR fields → zlib-inflate the IDAT stream → reverse
    the per-scanline filter (all five spec filters: None/Sub/Up/
    Average/Paeth). Returns (width, height, raw RGB bytes).

    Palette/alpha/16-bit/interlaced variants raise — they are rarer in
    training corpora than baseline RGB and would triple the kernel for
    no plumbing coverage; a full decoder (PIL) drops into the same
    slot."""
    import struct
    import zlib

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, None, None, bytearray()
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color != 2 or interlace != 0:
                raise ValueError(
                    "only 8-bit non-interlaced RGB PNG supported"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    import numpy as np

    raw = zlib.decompress(bytes(idat))
    bpp, row_bytes = 3, w * 3
    if len(raw) != h * (1 + row_bytes):
        raise ValueError("png scanline size mismatch")
    # numpy per-scanline unfiltering (bit-identical to the spec's
    # byte recurrences): Sub is a per-channel prefix sum mod 256, Up
    # is one vectorized add; Average/Paeth recurse on the previous
    # PIXEL, so they walk w steps with all channels as one lane.
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + row_bytes)
    ftypes = scan[:, 0]
    if (ftypes > 4).any():
        bad = int(ftypes[ftypes > 4][0])
        raise ValueError(f"unknown png filter {bad}")
    out = np.empty((h, row_bytes), dtype=np.uint8)
    prev = np.zeros(row_bytes, dtype=np.uint8)
    for r in range(h):
        ftype = int(ftypes[r])
        line = scan[r, 1:].copy()
        if ftype == 1:  # Sub: x[i] = d[i] + x[i-bpp]
            px = line.reshape(w, bpp).astype(np.int64)
            line = (np.cumsum(px, axis=0) % 256).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up: uint8 add wraps mod 256 natively
            line = line + prev
        elif ftype == 3:  # Average: sequential in x — byte loop
            ln = bytearray(line.tobytes())
            pv = prev.tobytes()
            for i in range(row_bytes):
                a = ln[i - bpp] if i >= bpp else 0
                ln[i] = (ln[i] + ((a + pv[i]) >> 1)) & 0xFF
            line = np.frombuffer(bytes(ln), dtype=np.uint8)
        elif ftype == 4:  # Paeth: sequential in x — byte loop
            ln = bytearray(line.tobytes())
            pv = prev.tobytes()
            for i in range(row_bytes):
                a = ln[i - bpp] if i >= bpp else 0
                c = pv[i - bpp] if i >= bpp else 0
                p = a + pv[i] - c
                pa, pb, pc = abs(p - a), abs(p - pv[i]), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (pv[i] if pb <= pc else c)
                ln[i] = (ln[i] + pred) & 0xFF
            line = np.frombuffer(bytes(ln), dtype=np.uint8)
        out[r] = line
        prev = out[r]
    return w, h, out.tobytes()


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def with_media_metadata(
    df: DataFrame,
    content_col: str = "content",
    media_type: str = "image",
    fmt: str = "raw",
    width: int | None = None,
    height: int | None = None,
) -> DataFrame:
    """Attach the canonical typed-metadata struct next to a binary
    payload column."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )


def _require_real_codec(modality: str, lib: str) -> None:
    raise NotImplementedError(
        f"real {modality} decode requires {lib}, which is not installed "
        f"in this environment — use decode='fake' (deterministic stub) "
        f"or install {lib} and extend the kernel"
    )


def decode_image_stats(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    decode: str = "fake",
) -> DataFrame:
    """Per-image decode → summary stats, as an Arrow-batched
    ``mapInPandas``.

    ``decode="fake"``: deterministic byte-level kernel (treats the
    payload as raw 8-bit intensities) — exercises the full plumbing.
    ``decode="ppm"`` / ``decode="bmp"`` / ``decode="png"`` /
    ``decode="jpeg"``: REAL container parsing (netpbm P6 /
    uncompressed 24-bit BMP / zlib-inflated, filter-reversed 8-bit
    RGB PNG / baseline grayscale JPEG via the pure-numpy
    huffman+IDCT codec in operators/jpeg.py) — header-derived
    width/height, stats over the decoded pixel raster only.
    ``decode="real"``: color/progressive jpeg would need PIL; raises
    ``NotImplementedError`` (codec not installed).

    Output: id columns + ``stats`` struct (IMAGE_STATS_TYPE).
    """
    if decode == "real":  # pragma: no cover - environment-dependent
        _require_real_codec("image (color/progressive jpeg)", "PIL")
    if decode not in ("fake", "ppm", "bmp", "png", "jpeg"):
        raise ValueError(f"unknown decode mode: {decode}")

    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + [T.StructField("stats", IMAGE_STATS_TYPE)]
    )
    id_list = list(id_cols)
    _EMPTY = {
        "n_bytes": 0,
        "mean_intensity": None,
        "min_byte": None,
        "max_byte": None,
        "width": None,
        "height": None,
    }

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            stats = []
            for payload in pdf[content_col]:
                if payload is None or len(payload) == 0:
                    stats.append(dict(_EMPTY))
                    continue
                b = bytes(payload)
                if decode == "ppm":
                    w, h, pix = _parse_ppm(b)
                elif decode == "bmp":
                    w, h, pix = _parse_bmp(b)
                elif decode == "png":
                    w, h, pix = _parse_png(b)
                elif decode == "jpeg":
                    from etl_finance_pipeline_spark.operators.jpeg import (
                        decode_jpeg,
                    )

                    # component-agnostic: luma bytes for grayscale
                    # streams, interleaved RGB for YCbCr streams
                    w, h, _nc, pix = decode_jpeg(b)
                else:
                    w, h, pix = None, None, b
                arr = np.frombuffer(pix, dtype=np.uint8)
                stats.append(
                    {
                        "n_bytes": len(pix),
                        # int64 sum then one float division == Python's
                        # exact-int sum(pix) / len(pix)
                        "mean_intensity": int(arr.sum(dtype=np.int64))
                        / len(pix),
                        "min_byte": int(arr.min()),
                        "max_byte": int(arr.max()),
                        "width": w,
                        "height": h,
                    }
                )
            out = pdf[id_list].copy()
            out["stats"] = stats
            yield out

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)


def encode_ppm(
    df: DataFrame,
    content_col: str = "content",
    width: int = 8,
    height: int = 8,
) -> DataFrame:
    """Wrap a binary payload into a REAL P6 PPM container, entirely
    JVM-side: netpbm header + the payload truncated/zero-padded to the
    ``width*height*3`` raster. Round-trips through
    ``decode_image_stats(decode="ppm")`` (or any netpbm reader)."""
    n = width * height * 3
    header = F.encode(F.lit(f"P6\n{width} {height}\n255\n"), "UTF-8")
    raster = F.rpad(
        F.substring(F.col(content_col), 1, n).cast("binary"), n, bytes([0])
    )
    return df.withColumn(content_col, F.concat(header, raster))


def encode_bmp24(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    width: int = 8,
    height: int = 8,
) -> DataFrame:
    """Encode a binary payload as a REAL uncompressed 24-bit BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER + 4-byte-padded rows, pixels
    from the payload truncated/zero-padded) via mapInPandas — the
    little-endian header fields need ``struct``, not SQL functions.
    Round-trips through ``decode_image_stats(decode="bmp")``."""
    import struct

    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + [T.StructField(content_col, T.BinaryType())]
    )
    id_list = list(id_cols)
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    data_size = stride * height
    data_off = 14 + 40

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for payload in pdf[content_col]:
                raw = bytes(payload or b"")[: width * height * 3]
                raw = raw.ljust(width * height * 3, b"\x00")
                rows = np.frombuffer(raw, dtype=np.uint8).reshape(
                    height, row_bytes
                )
                padded = np.zeros((height, stride), dtype=np.uint8)
                padded[:, :row_bytes] = rows
                body = padded.tobytes()
                hdr = struct.pack(
                    "<2sIHHI", b"BM", data_off + data_size, 0, 0, data_off
                ) + struct.pack(
                    "<IiiHHIIiiII", 40, width, height, 1, 24, 0, data_size,
                    2835, 2835, 0, 0,
                )
                payloads.append(hdr + body)
            out = pdf[id_list].copy()
            out[content_col] = payloads
            yield out

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)


def encode_png(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    width: int = 8,
    height: int = 8,
    filter_type: int = 1,
) -> DataFrame:
    """Encode a binary payload as a REAL PNG (8-bit RGB,
    non-interlaced; pixels from the payload truncated/zero-padded to
    the ``width*height*3`` raster) via mapInPandas — DEFLATE needs
    ``zlib``, not SQL functions. *filter_type* selects the per-scanline
    filter written (0=None, 1=Sub, 2=Up); non-zero defaults exercise
    the decoder's filter-reversal path, not just the trivial copy.
    Round-trips through ``decode_image_stats(decode="png")`` (or any
    PNG reader — output is spec-conformant, CRCs included)."""
    import struct
    import zlib

    if filter_type not in (0, 1, 2):
        raise ValueError("encoder supports filter types 0/1/2")
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + [T.StructField(content_col, T.BinaryType())]
    )
    id_list = list(id_cols)
    bpp, row_bytes = 3, width * 3
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for payload in pdf[content_col]:
                raw = bytes(payload or b"")[: width * height * 3]
                raw = raw.ljust(width * height * 3, b"\x00")
                rows = np.frombuffer(raw, dtype=np.uint8).reshape(
                    height, row_bytes
                )
                # uint8 subtraction wraps mod 256 — the spec's & 0xFF
                if filter_type == 0:
                    filt = rows
                elif filter_type == 1:  # Sub: d[i] = x[i] - x[i-bpp]
                    filt = rows.copy()
                    filt[:, bpp:] = rows[:, bpp:] - rows[:, :-bpp]
                else:  # Up: d[i] = x[i] - prev[i]
                    filt = rows.copy()
                    filt[1:] = rows[1:] - rows[:-1]
                scan = np.empty((height, 1 + row_bytes), dtype=np.uint8)
                scan[:, 0] = filter_type
                scan[:, 1:] = filt
                payloads.append(
                    b"\x89PNG\r\n\x1a\n"
                    + _png_chunk(b"IHDR", ihdr)
                    + _png_chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
                    + _png_chunk(b"IEND", b"")
                )
            out = pdf[id_list].copy()
            out[content_col] = payloads
            yield out

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)


def encode_jpeg_blocks(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    blocks_per_row: int = 8,
    pad_byte: int = 0x20,
    mode: str = "baseline",
) -> DataFrame:
    """Encode a binary payload as a REAL grayscale JPEG
    (operators/jpeg.py): each payload byte becomes one constant 8×8
    luma block, laid out *blocks_per_row* blocks wide (rows padded
    with *pad_byte*). Constant blocks quantize losslessly under the
    flat table (DC step 8 divides 8·(v−128) exactly, all ACs are
    exactly zero), so the decode round-trip is BIT-exact — any JPEG
    reader recovers the payload bytes as 8×8 pixel tiles, and the
    oracle can verify the full huffman/DCT path hash-for-hash.

    *mode*: ``"baseline"`` (SOF0), ``"progressive"`` (SOF2 —
    multi-scan successive approximation, the format most web corpora
    ship), or ``"mixed"`` (rows alternate by a hash of the first id
    column — the realistic crawl shape: the decoder must dispatch per
    stream). Decoded pixels are identical in every mode, so the same
    oracle covers all three."""
    if mode not in ("baseline", "progressive", "mixed"):
        raise ValueError(f"unknown encode_jpeg_blocks mode: {mode}")
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + [T.StructField(content_col, T.BinaryType())]
    )
    id_list = list(id_cols)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        from etl_finance_pipeline_spark.operators.jpeg import (
            encode_jpeg_gray,
            encode_jpeg_progressive,
        )

        for pdf in batches:
            payloads = []
            for rid, payload in zip(pdf[id_list[0]], pdf[content_col]):
                raw = bytes(payload or b"")
                n_rows = max(1, -(-len(raw) // blocks_per_row))
                raw = raw.ljust(n_rows * blocks_per_row, bytes([pad_byte]))
                vals = np.frombuffer(raw, dtype=np.uint8).reshape(
                    n_rows, blocks_per_row
                )
                img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
                # mixed mode dispatches on a stable hash of the id's
                # STRING form (md5 low bit) so any id type works —
                # int(rid) would raise on string/uuid ids
                prog = mode == "progressive" or (
                    mode == "mixed"
                    and hashlib.md5(str(rid).encode("utf-8")).digest()[-1] & 1 == 1
                )
                payloads.append(
                    encode_jpeg_progressive(img) if prog else encode_jpeg_gray(img)
                )
            out = pdf[id_list].copy()
            out[content_col] = payloads
            yield out

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)


def encode_jpeg_color_blocks(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    blocks_per_row: int = 8,
    pad_byte: int = 0x20,
) -> DataFrame:
    """Color counterpart of :func:`encode_jpeg_blocks`: each payload
    byte v becomes one constant 8×8 YCbCr tile (Y=v, Cb=255−v,
    Cr=(7v) mod 256 — a deterministic byte→color mapping that spans
    the gamut) encoded as a REAL baseline 4:4:4 color JFIF JPEG.
    Constant tiles quantize losslessly per plane, so decode recovers
    the exact YCbCr values and the RGB conversion is a deterministic
    per-byte formula an oracle can recompute."""
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + [T.StructField(content_col, T.BinaryType())]
    )
    id_list = list(id_cols)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        from etl_finance_pipeline_spark.operators.jpeg import (
            encode_jpeg_ycbcr,
        )

        ones = np.ones((8, 8), dtype=np.uint8)
        for pdf in batches:
            payloads = []
            for payload in pdf[content_col]:
                raw = bytes(payload or b"")
                n_rows = max(1, -(-len(raw) // blocks_per_row))
                raw = raw.ljust(n_rows * blocks_per_row, bytes([pad_byte]))
                vals = np.frombuffer(raw, dtype=np.uint8).reshape(
                    n_rows, blocks_per_row
                )
                y = np.kron(vals, ones)
                cb = np.kron(255 - vals, ones)
                cr = np.kron((vals.astype(np.int64) * 7 % 256).astype(np.uint8), ones)
                payloads.append(encode_jpeg_ycbcr(y, cb, cr))
            out = pdf[id_list].copy()
            out[content_col] = payloads
            yield out

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)


def image_byte_histogram(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    n_bins: int = 16,
) -> DataFrame:
    """Fixed-width byte-histogram feature vector per payload
    (normalized to sum 1) — a deterministic stand-in for an embedding
    model, shaped exactly like one: ``array<double>`` of *n_bins*.

    Output feeds operators.similarity directly (cosine_topk etc.).
    """
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [T.StructField("features", T.ArrayType(T.DoubleType()))]
    )
    id_list = list(id_cols)
    width = 256 // n_bins

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            feats = []
            for payload in pdf[content_col]:
                if payload is None or len(payload) == 0:
                    feats.append([0.0] * n_bins)
                    continue
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(arr // width, minlength=n_bins)
                feats.append((hist / float(arr.size)).tolist())
            out = pdf[id_list].copy()
            out["features"] = feats
            yield out

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)


def resize_images(
    df: DataFrame,
    content_col: str = "content",
    target_width: int = 224,
    target_height: int = 224,
    decode: str = "fake",
) -> DataFrame:
    """Image resize.

    ``decode="ppm"`` / ``"bmp"`` / ``"png"``: REAL nearest-neighbor
    resample — parse the container with the in-module codec, pick
    source pixel ``(sy, sx) = (ty*h // th, tx*w // tw)`` for every
    target pixel (pure integer index math, bit-reproducible on any
    engine), re-encode as P6 PPM at the target size. Arrow-batched
    ``mapInPandas``; exchange-free.

    ``decode="fake"``: byte-level stub — truncates/pads the payload to
    ``target_width*target_height`` bytes (deterministic, preserves the
    binary-in/binary-out contract).
    ``decode="real"``: jpeg would need PIL; raises
    ``NotImplementedError`` (codec not installed).
    """
    if decode == "real":  # pragma: no cover
        _require_real_codec("image (jpeg)", "PIL")
    if decode in ("ppm", "bmp", "png"):
        parse = {"ppm": _parse_ppm, "bmp": _parse_bmp, "png": _parse_png}[decode]
        tw, th = target_width, target_height
        out_fields = [
            f for f in df.schema.fields if f.name != content_col
        ] + [T.StructField(content_col, T.BinaryType())]
        out_schema = T.StructType(out_fields)
        other_cols = [f.name for f in df.schema.fields if f.name != content_col]

        def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            import numpy as np

            header = f"P6\n{tw} {th}\n255\n".encode()
            ty = np.arange(th, dtype=np.int64)
            tx = np.arange(tw, dtype=np.int64)
            for pdf in batches:
                outs = []
                for payload in pdf[content_col]:
                    if payload is None or len(payload) == 0:
                        outs.append(None)
                        continue
                    w, h, pix = parse(bytes(payload))
                    arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, 3)
                    # same integer index math as the spec'd per-pixel
                    # loop ((ty*h)//th, (tx*w)//tw), one gather
                    resized = arr[(ty * h) // th][:, (tx * w) // tw]
                    outs.append(header + resized.tobytes())
                out = pdf[other_cols].copy()
                out[content_col] = outs
                yield out

        return df.mapInPandas(kernel, out_schema)
    n = target_width * target_height
    # BINARY rpad with a byte pad is supported since Spark 3.3
    resized = F.rpad(
        F.substring(F.col(content_col), 1, n).cast("binary"), n, bytes([0])
    )
    out = df.withColumn(content_col, resized)
    if "media_meta" in df.columns:
        out = out.withColumn(
            "media_meta",
            F.col("media_meta")
            .withField("width", F.lit(target_width))
            .withField("height", F.lit(target_height)),
        )
    return out


AUDIO_STATS_TYPE = T.StructType(
    [
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zcr", T.DoubleType()),
    ]
)


def _zcr(samples) -> float | None:
    """Zero-crossing rate: fraction of sample-to-sample transitions
    whose sign (>=0 vs <0) flips — the cheapest spectral-content
    proxy (voiced/unvoiced, noise detection) and integer-exact, so
    a SQL oracle reproduces it bit-for-bit. Accepts any integer
    sequence or numpy array."""
    import numpy as np

    arr = np.asarray(samples)
    n = arr.size
    if n < 2:
        return None
    nonneg = arr >= 0
    flips = int(np.count_nonzero(nonneg[1:] != nonneg[:-1]))
    return flips / (n - 1)


def decode_audio_stats(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    sample_rate: int = 16_000,
    decode: str = "fake",
) -> DataFrame:
    """Per-clip audio decode → summary stats (RMS, peak, duration) as
    an Arrow-batched ``mapInPandas``.

    ``fake`` mode treats the payload as signed 8-bit PCM mono at
    *sample_rate* — deterministic, exercises the full plumbing.
    ``wav`` mode is a REAL codec path: the payload is a RIFF/WAV
    container parsed with the stdlib ``wave`` module — sample rate and
    frame count come from the container header (*sample_rate* arg is
    ignored), samples from the PCM chunk (8/16-bit, any channel
    count). ``real`` mode covers compressed formats (mp3/ogg/...):
    soundfile/ffmpeg not installed → raises.
    """
    if decode == "real":  # pragma: no cover
        _require_real_codec("audio (mp3/ogg)", "soundfile/ffmpeg")
    if decode not in ("fake", "wav"):
        raise ValueError(f"unknown decode mode: {decode}")

    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + [T.StructField("stats", AUDIO_STATS_TYPE)]
    )
    id_list = list(id_cols)
    _EMPTY = {
        "n_samples": 0, "duration_s": 0.0, "rms": None, "peak": None, "zcr": None
    }

    def _sample_stats(samples, n_frames: int, rate: int) -> dict:
        """Stats over an int numpy array: integer-exact sums (int64 —
        1e18 headroom covers any clip that fits an Arrow batch) with
        one final float division, matching the pure-Python arithmetic
        bit-for-bit."""
        import numpy as np

        n = samples.size
        sq = int(np.sum(samples.astype(np.int64) ** 2))
        return {
            "n_samples": n,
            "duration_s": n_frames / rate,
            "rms": (sq / n) ** 0.5,
            "peak": int(np.max(np.abs(samples.astype(np.int32)))),
            # zero-crossing rate: sign flips (>=0 vs <0) per transition
            "zcr": _zcr(samples),
        }

    def _wav_stats(b: bytes) -> dict:
        import io
        import wave

        import numpy as np

        with wave.open(io.BytesIO(b)) as wf:
            n_frames = wf.getnframes()
            rate = wf.getframerate()
            n_ch = wf.getnchannels()
            sampwidth = wf.getsampwidth()
            pcm = wf.readframes(n_frames)
        n = n_frames * n_ch
        if n == 0:
            return dict(_EMPTY)
        if sampwidth == 2:
            samples = np.frombuffer(pcm, dtype="<i2", count=n)
        elif sampwidth == 1:  # WAV 8-bit is UNsigned by spec
            samples = (
                np.frombuffer(pcm, dtype=np.uint8, count=n).astype(np.int16)
                - 128
            )
        else:
            raise ValueError(f"unsupported WAV sample width: {sampwidth}")
        return _sample_stats(samples, n_frames, rate)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            stats = []
            for payload in pdf[content_col]:
                if payload is None or len(payload) == 0:
                    stats.append(dict(_EMPTY))
                    continue
                b = bytes(payload)
                if decode == "wav":
                    stats.append(_wav_stats(b))
                    continue
                # signed 8-bit PCM: byte -> [-128, 127]
                samples = np.frombuffer(b, dtype=np.int8)
                stats.append(_sample_stats(samples, samples.size, sample_rate))
            out = pdf[id_list].copy()
            out["stats"] = stats
            yield out

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)


def encode_wav_pcm16(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    sample_rate: int = 16_000,
) -> DataFrame:
    """Encode a binary payload as a REAL RIFF/WAV container (16-bit
    PCM mono at *sample_rate*) via the stdlib ``wave`` module inside
    mapInPandas: each payload byte becomes one sample,
    ``(byte - 128) * 256`` — a deterministic byte→PCM mapping that
    any WAV reader round-trips. This is the genuine encoder, not a
    byte-blob stand-in: header fields (rate, width, channels, frame
    count) are written by ``wave`` and re-derived by decoders."""
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + [T.StructField(content_col, T.BinaryType())]
    )
    id_list = list(id_cols)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            payloads = []
            for payload in pdf[content_col]:
                raw = bytes(payload or b"")
                pcm = (
                    (np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128)
                    * 256
                ).astype("<i2").tobytes()
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(sample_rate)
                    wf.writeframes(pcm)
                payloads.append(buf.getvalue())
            out = pdf[id_list].copy()
            out[content_col] = payloads
            yield out

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)


#: Chroma subsampling → (horizontal divisor, vertical divisor) for
#: each of the two chroma planes; None = no chroma planes at all.
#: The Y plane is always the first W*H bytes of a frame; each chroma
#: plane is ceil(W/hdiv) * ceil(H/vdiv) bytes (the mjpegtools spec
#: rounds odd dimensions UP per plane, so a W3 H3 C420 frame is
#: 9 + 2*2*2 = 17 bytes, not int(9*1.5) = 13).
_Y4M_CHROMA_DIVS: dict[str, tuple[int, int] | None] = {
    "mono": None,
    "420": (2, 2),
    "420jpeg": (2, 2),
    "420mpeg2": (2, 2),
    "420paldv": (2, 2),
    "422": (2, 1),
    "444": (1, 1),
}


def _parse_y4m(b: bytes) -> tuple[int, int, int, int, str, list[bytes]]:
    """Parse a YUV4MPEG2 (y4m) stream — the uncompressed video
    container every codec toolchain round-trips (mjpegtools spec):
    one ``YUV4MPEG2`` header line of space-separated tagged
    parameters, then per frame a ``FRAME`` line followed by the raw
    planar picture. Returns (width, height, fps_num, fps_den,
    colorspace, [Y planes]) — the luma plane is what the analysis
    lanes consume; chroma planes are validated for length and
    skipped. Raises ValueError on bad magic, missing W/H, unknown
    colorspace, or a truncated frame — fail-loud like the PNG/WAV
    parsers."""
    nl = b.find(b"\n")
    if not b.startswith(b"YUV4MPEG2") or nl < 0:
        raise ValueError("not a YUV4MPEG2 stream")
    width = height = 0
    fps_num, fps_den = 25, 1
    colorspace = "420jpeg"  # spec default when no C tag is present
    for tok in b[9:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:].decode("ascii", "strict")
        if tag == b"W":
            width = int(val)
        elif tag == b"H":
            height = int(val)
        elif tag == b"F":
            num, den = val.split(":")
            fps_num, fps_den = int(num), int(den)
        elif tag == b"C":
            colorspace = val
    if width <= 0 or height <= 0:
        raise ValueError("y4m header missing W/H")
    if colorspace not in _Y4M_CHROMA_DIVS:
        raise ValueError(f"unsupported y4m colorspace C{colorspace}")
    y_size = width * height
    divs = _Y4M_CHROMA_DIVS[colorspace]
    if divs is None:
        frame_size = y_size
    else:
        hdiv, vdiv = divs
        frame_size = y_size + 2 * (-(-width // hdiv)) * (-(-height // vdiv))
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(b):
        fnl = b.find(b"\n", pos)
        if not b.startswith(b"FRAME", pos) or fnl < 0:
            raise ValueError(f"bad FRAME marker at offset {pos}")
        data_start = fnl + 1
        if data_start + frame_size > len(b):
            raise ValueError("truncated y4m frame")
        frames.append(b[data_start : data_start + y_size])
        pos = data_start + frame_size
    return width, height, fps_num, fps_den, colorspace, frames


def encode_y4m(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    width: int = 8,
    height: int = 8,
    fps_num: int = 25,
    fps_den: int = 1,
    pad_byte: int = 0x20,
) -> DataFrame:
    """Encode a binary payload as a REAL YUV4MPEG2 container (Cmono —
    luma-only, part of the y4m spec): the payload is cut into
    ``width*height``-byte luma frames (the last frame padded with
    *pad_byte*), each wrapped in the spec's ``FRAME\\n`` marker under
    a full parameter header. Any y4m reader (ffmpeg, mjpegtools, the
    parser above) round-trips the result; this is the genuine
    container, not a byte-blob convention — frame boundaries come
    from the header geometry, not a caller-supplied stride."""
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + [T.StructField(content_col, T.BinaryType())]
    )
    id_list = list(id_cols)
    header = (
        f"YUV4MPEG2 W{width} H{height} F{fps_num}:{fps_den} Ip A1:1 Cmono\n"
    ).encode("ascii")
    fs = width * height

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = []
            for payload in pdf[content_col]:
                raw = bytes(payload or b"")
                nf = max(1, -(-len(raw) // fs))
                raw = raw.ljust(nf * fs, bytes([pad_byte]))
                parts = [header]
                for i in range(nf):
                    parts.append(b"FRAME\n")
                    parts.append(raw[i * fs : (i + 1) * fs])
                payloads.append(b"".join(parts))
            out = pdf[id_list].copy()
            out[content_col] = payloads
            yield out

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)


def _parse_avi_mjpeg(b: bytes) -> tuple[int, int, list[bytes]]:
    """Parse a Motion-JPEG AVI (RIFF): validate the RIFF/AVI magic,
    read frame geometry from the ``avih`` main header, and collect
    the compressed video chunks (``00dc``/``00db``) out of the
    ``movi`` list — each one a complete JPEG stream for
    operators.jpeg to decode. Returns (width, height, [jpeg bytes]).
    Raises ValueError on bad magic, missing headers, or truncated
    chunks — fail-loud like every other parser here."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    width = height = 0
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        nonlocal width, height
        pos = start
        while pos + 8 <= end:
            cid = b[pos : pos + 4]
            (size,) = struct.unpack_from("<I", b, pos + 4)
            body_start = pos + 8
            if body_start + size > end:
                raise ValueError(f"truncated AVI chunk {cid!r} at {pos}")
            if cid == b"LIST":
                # list type is the first 4 bytes of the body
                walk(body_start + 4, body_start + size)
            elif cid == b"avih":
                if size < 40:
                    raise ValueError("short avih header")
                width, height = struct.unpack_from("<II", b, body_start + 32)
            elif cid[2:4] in (b"dc", b"db"):
                frames.append(b[body_start : body_start + size])
            # strh/strf/JUNK/idx1/anything else: skipped
            pos = body_start + size + (size & 1)  # chunks are word-aligned

    walk(12, len(b))
    if width <= 0 or height <= 0:
        raise ValueError("AVI stream missing avih dimensions")
    return width, height, frames


def encode_avi_mjpeg(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    frame_bytes: int = 64,
    blocks_per_row: int = 8,
    fps: int = 25,
    pad_byte: int = 0x20,
) -> DataFrame:
    """Encode a binary payload as a REAL Motion-JPEG AVI: the payload
    is cut into *frame_bytes*-sized slices (last padded with
    *pad_byte*); each slice becomes one grayscale JPEG frame of
    constant 8×8 tiles (one per byte, *blocks_per_row* wide) written
    by the in-module baseline encoder; frames wrap in a
    spec-compliant RIFF container (avih/strh/strf headers, ``movi``
    ``00dc`` chunks, word alignment). This is COMPRESSED video in a
    real container — the composition every MJPEG camera/file uses —
    and the constant-tile construction keeps the decode round-trip
    bit-exact for the oracle."""
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + [T.StructField(content_col, T.BinaryType())]
    )
    id_list = list(id_cols)
    n_rows_f = -(-frame_bytes // blocks_per_row)
    w_px, h_px = blocks_per_row * 8, n_rows_f * 8

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        from etl_finance_pipeline_spark.operators.jpeg import (
            encode_jpeg_gray,
        )

        ones = np.ones((8, 8), dtype=np.uint8)

        def chunk(cid: bytes, body: bytes) -> bytes:
            pad = b"\x00" if len(body) & 1 else b""
            return cid + struct.pack("<I", len(body)) + body + pad

        for pdf in batches:
            payloads = []
            for payload in pdf[content_col]:
                raw = bytes(payload or b"")
                nf = max(1, -(-len(raw) // frame_bytes))
                raw = raw.ljust(nf * frame_bytes, bytes([pad_byte]))
                jpegs = []
                for i in range(nf):
                    vals = np.frombuffer(
                        raw[i * frame_bytes : (i + 1) * frame_bytes],
                        dtype=np.uint8,
                    ).reshape(n_rows_f, blocks_per_row)
                    jpegs.append(encode_jpeg_gray(np.kron(vals, ones)))
                avih = struct.pack(
                    "<IIIIIIIIII4I",
                    1_000_000 // fps, 0, 0, 0, nf, 0, 1, 0, w_px, h_px,
                    0, 0, 0, 0,
                )
                strh = (
                    b"vidsMJPG"
                    + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, nf, 0, 0, 0, 0)
                    + struct.pack("<4h", 0, 0, w_px, h_px)
                )
                strf = struct.pack(
                    "<IiiHH4sIiiII",
                    40, w_px, h_px, 1, 24, b"MJPG", w_px * h_px * 3, 0, 0, 0, 0,
                )
                strl = b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
                hdrl = b"hdrl" + chunk(b"avih", avih) + chunk(b"LIST", strl)
                movi = b"movi" + b"".join(chunk(b"00dc", j) for j in jpegs)
                body = b"AVI " + chunk(b"LIST", hdrl) + chunk(b"LIST", movi)
                payloads.append(
                    b"RIFF" + struct.pack("<I", len(body)) + body
                )
            out = pdf[id_list].copy()
            out[content_col] = payloads
            yield out

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)


def sample_video_frames(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    every_n: int = 10,
    frame_bytes: int = 64,
    decode: str = "fake",
) -> DataFrame:
    """Frame sampling, the 1→N mapInPandas lane of video frame
    extraction: emit every *every_n*-th frame as its own row.
    ``decode="y4m"`` is the REAL uncompressed-container path — frames
    are the luma planes parsed out of a YUV4MPEG2 stream (geometry
    from the header; *frame_bytes* is ignored). ``decode="avi"`` is
    the REAL compressed path — Motion-JPEG frames parsed out of a
    RIFF/AVI container and decoded by the in-module baseline JPEG
    codec (emitted frames are the decoded rasters). ``fake`` treats
    the payload as concatenated *frame_bytes*-sized frames (the blob
    convention for formats with no in-container codec). ``real``
    raises (ffmpeg, for codecs beyond baseline JPEG)."""
    if decode == "real":  # pragma: no cover
        _require_real_codec("video", "ffmpeg/pyav")

    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    id_list = list(id_cols)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = r[content_col]
                if payload is None:
                    continue
                b = bytes(payload)
                if decode == "y4m":
                    frames = _parse_y4m(b)[5]
                elif decode == "avi":
                    from etl_finance_pipeline_spark.operators.jpeg import (
                        decode_jpeg,
                    )

                    frames = [
                        decode_jpeg(j)[3] for j in _parse_avi_mjpeg(b)[2]
                    ]
                else:
                    frames = [
                        b[i * frame_bytes : (i + 1) * frame_bytes]
                        for i in range(len(b) // frame_bytes)
                    ]
                for i in range(0, len(frames), every_n):
                    rows.append(
                        {
                            **{c: r[c] for c in id_list},
                            "frame_index": i,
                            "frame": frames[i],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=id_list + ["frame_index", "frame"]
            )

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)


def frame_delta_stats(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    frame_bytes: int = 64,
    cut_threshold: float = 30.0,
    decode: str = "fake",
) -> DataFrame:
    """Scene-cut detection over the frame-sampling lane: every
    adjacent frame pair reports its mean absolute byte difference
    (numpy-vectorized over the whole clip at once) and a cut flag at
    *cut_threshold* — the shot-boundary heuristic video pipelines run
    before keyframe extraction. ``decode="y4m"`` parses frames (luma
    planes) out of a REAL YUV4MPEG2 container; ``decode="avi"``
    decodes Motion-JPEG frames out of a RIFF/AVI container with the
    in-module JPEG codec and diffs the decoded rasters; ``fake``
    reads the payload as consecutive *frame_bytes*-sized frames.
    Exact integer sums, one float division per frame, so a SQL
    oracle reproduces the deltas bit-for-bit.

    Output: id columns + (frame_index, delta, is_cut), one row per
    frame AFTER the first (index is the later frame's).
    """
    if decode == "real":  # pragma: no cover
        _require_real_codec("video", "ffmpeg/pyav")
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("delta", T.DoubleType()),
            T.StructField("is_cut", T.BooleanType()),
        ]
    )
    id_list = list(id_cols)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = r[content_col]
                if payload is None:
                    continue
                b = bytes(payload)
                if decode in ("y4m", "avi"):
                    if decode == "y4m":
                        w, h, _, _, _, frames = _parse_y4m(b)
                        fb = w * h
                    else:
                        from etl_finance_pipeline_spark.operators.jpeg import (
                            decode_jpeg,
                        )

                        w, h, jpegs = _parse_avi_mjpeg(b)
                        frames = [decode_jpeg(j)[3] for j in jpegs]
                        fb = len(frames[0]) if frames else 0
                    n_frames = len(frames)
                    if n_frames < 2:
                        continue
                    arr = np.frombuffer(
                        b"".join(frames), dtype=np.uint8
                    ).reshape(n_frames, fb).astype(np.int16)
                else:
                    fb = frame_bytes
                    n_frames = len(b) // fb
                    if n_frames < 2:
                        continue
                    arr = (
                        np.frombuffer(b, dtype=np.uint8, count=n_frames * fb)
                        .reshape(n_frames, fb)
                        .astype(np.int16)
                    )
                sums = np.abs(arr[1:] - arr[:-1]).sum(
                    axis=1, dtype=np.int64
                )
                deltas = sums / float(fb)
                for i, d in enumerate(deltas, start=1):
                    rows.append(
                        {
                            **{c: r[c] for c in id_list},
                            "frame_index": i,
                            "delta": float(d),
                            "is_cut": bool(d > cut_threshold),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=id_list + ["frame_index", "delta", "is_cut"]
            )

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)


def detect_silence(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    window_samples: int = 100,
    rms_threshold: float = 80.0,
) -> DataFrame:
    """Silence detection over signed-8-bit PCM payloads: the clip is
    cut into *window_samples*-sized windows, each window's RMS is an
    exact integer sum of squares with one sqrt, and windows under
    *rms_threshold* count as silent — the trim/segment primitive for
    audio corpus prep (drop dead air before transcription). One
    numpy pass per clip; trailing partial windows are ignored.

    Output: id columns + (n_windows, n_silent, silence_frac).
    """
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [
            T.StructField("n_windows", T.LongType()),
            T.StructField("n_silent", T.LongType()),
            T.StructField("silence_frac", T.DoubleType()),
        ]
    )
    id_list = list(id_cols)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            out_rows = {c: [] for c in ("n_windows", "n_silent", "silence_frac")}
            for payload in pdf[content_col]:
                if payload is None or len(payload) < window_samples:
                    out_rows["n_windows"].append(0)
                    out_rows["n_silent"].append(0)
                    out_rows["silence_frac"].append(None)
                    continue
                samples = np.frombuffer(bytes(payload), dtype=np.int8)
                nw = samples.size // window_samples
                wins = (
                    samples[: nw * window_samples]
                    .reshape(nw, window_samples)
                    .astype(np.int64)
                )
                sq = (wins * wins).sum(axis=1)
                rms = np.sqrt(sq / float(window_samples))
                n_silent = int(np.count_nonzero(rms < rms_threshold))
                out_rows["n_windows"].append(nw)
                out_rows["n_silent"].append(n_silent)
                out_rows["silence_frac"].append(n_silent / nw)
            out = pdf[id_list].copy()
            for c, v in out_rows.items():
                out[c] = v
            yield out

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)


def _pcm_samples_normalized(b: bytes, decode: str):
    """Normalized float64 samples in [-1, 1) from a payload: ``wav``
    re-parses the RIFF container (stdlib ``wave``; 8/16-bit, any
    channel count); ``fake`` reads signed 8-bit PCM. Shared by the
    spectral kernels (DFT energies, fingerprints)."""
    import io
    import wave

    import numpy as np

    if decode == "wav":
        with wave.open(io.BytesIO(b)) as wf:
            n = wf.getnframes() * wf.getnchannels()
            width = wf.getsampwidth()
            pcm = wf.readframes(wf.getnframes())
        if width == 2:
            s = np.frombuffer(pcm, dtype="<i2", count=n).astype(np.float64)
        elif width == 1:
            s = (
                np.frombuffer(pcm, dtype=np.uint8, count=n).astype(np.float64)
                - 128.0
            ) * 256.0
        else:
            raise ValueError(f"unsupported WAV sample width: {width}")
    else:
        s = np.frombuffer(b, dtype=np.int8).astype(np.float64) * 256.0
    return s / 32768.0


def audio_dft_energies(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    bins: tuple[int, ...] = (1, 2, 3, 4),
    decode: str = "wav",
) -> DataFrame:
    """Spectral feature extraction: per clip, the DFT energy
    |Σ xⱼ·e^(−2πi·k·j/N)|² at each requested frequency bin *k* over
    the NORMALIZED samples (int16 ÷ 32768 — normalization keeps
    energies O(N), so cross-engine libm/summation noise stays ~9
    orders below the 6-decimal output rounding; raw-int16 energies at
    ~1e14 would drown it). The cheap band-energy signal audio corpus
    pipelines use for content gating (speech/music/tone heuristics)
    before any heavyweight model — and the numeric core of a mel
    filterbank.

    ``decode="wav"`` parses the RIFF container with the stdlib
    ``wave`` module (the real codec lane); ``fake`` reads signed
    8-bit PCM. One numpy pass per clip, 1→len(bins) rows out,
    no shuffle.

    Output: id columns + (bin, energy), energy rounded to 6 decimals.
    """
    if decode not in ("fake", "wav"):
        raise ValueError(f"unknown decode mode: {decode}")
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [
            T.StructField("bin", T.IntegerType()),
            T.StructField("energy", T.DoubleType()),
        ]
    )
    id_list = list(id_cols)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = r[content_col]
                if payload is None or len(payload) == 0:
                    continue
                x = _pcm_samples_normalized(bytes(payload), decode)
                n = x.size
                if n == 0:
                    continue
                j = np.arange(n, dtype=np.float64)
                for k in bins:
                    ang = 2.0 * np.pi * float(k) * j / n
                    c = float((x * np.cos(ang)).sum())
                    s_ = float((x * np.sin(ang)).sum())
                    e = c * c + s_ * s_
                    rows.append(
                        {
                            **{cid: r[cid] for cid in id_list},
                            "bin": k,
                            "energy": __import__("math").floor(e * 1e6 + 0.5) / 1e6,
                        }
                    )
            yield pd.DataFrame(rows, columns=id_list + ["bin", "energy"])

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)


def image_phash(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    decode: str = "jpeg",
    round_digits: int = 6,
) -> DataFrame:
    """Perceptual image hash (classic DCT pHash): decode to a 32×32
    grayscale raster, 2-D DCT, keep the top-left 8×8 low-frequency
    block minus DC, and emit one bit per coefficient — set iff the
    coefficient exceeds the (lower) median of the 63. Near-duplicate
    IMAGES — recompressed, brightness-shifted, lightly edited — land
    within a few bits, which :func:`...dedup.hamming_pairs` turns
    into an equality-join dedup, the same candidate algebra as
    SimHash for text.

    Determinism contract (what makes a SQL oracle possible):
    coefficients are portably rounded to *round_digits* BEFORE the
    median/threshold, the median of the odd-length 63 is an exact
    order statistic (no averaging), and comparisons are strict — so
    the bit pattern is reproducible bit-for-bit in any engine, with
    float noise confined ~9 orders below the rounding.

    Inputs must decode to exactly 32×32 (resize upstream with
    :func:`resize_images` — pHash is defined at that size).
    ``decode="jpeg"`` runs the in-module baseline codec (gray or
    color; color converts by exact integer R+G+B sum — scale cannot
    change the sign structure); ``fake`` reads 1024 raw gray bytes.

    Output: id columns + phash (63-bit long). One numpy pass per
    image, no shuffle.
    """
    if decode not in ("jpeg", "fake"):
        raise ValueError(f"unknown decode mode: {decode}")
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + [T.StructField("phash", T.LongType())]
    )
    id_list = list(id_cols)
    scale = 10 ** round_digits

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import numpy as np
        import pandas as pd

        # orthonormal 32-point DCT-II matrix
        k = np.arange(32).reshape(32, 1)
        nn = np.arange(32).reshape(1, 32)
        c32 = np.cos((2 * nn + 1) * k * np.pi / 64) * math.sqrt(2.0 / 32.0)
        c32[0, :] *= 1.0 / math.sqrt(2.0)

        for pdf in batches:
            hashes = []
            for payload in pdf[content_col]:
                if payload is None or len(payload) == 0:
                    hashes.append(None)
                    continue
                b = bytes(payload)
                if decode == "jpeg":
                    from etl_finance_pipeline_spark.operators.jpeg import (
                        decode_jpeg,
                    )

                    w, h, nc, raster = decode_jpeg(b)
                    if (w, h) != (32, 32):
                        raise ValueError(
                            f"pHash needs a 32x32 input, got {w}x{h} — "
                            "resize upstream"
                        )
                    arr = np.frombuffer(raster, dtype=np.uint8)
                    if nc == 3:
                        # exact integer luma proxy: R+G+B (scaling is
                        # sign-invariant through DCT + median)
                        gray = arr.reshape(32, 32, 3).astype(np.int64).sum(axis=2)
                    else:
                        gray = arr.reshape(32, 32).astype(np.int64)
                else:
                    if len(b) < 1024:
                        raise ValueError("fake pHash input needs 1024 bytes")
                    gray = (
                        np.frombuffer(b, dtype=np.uint8, count=1024)
                        .reshape(32, 32)
                        .astype(np.int64)
                    )
                coefs = c32 @ gray.astype(np.float64) @ c32.T
                block = coefs[:8, :8].reshape(64)[1:]  # row-major minus DC
                block = np.floor(block * scale + 0.5) / scale
                med = np.sort(block)[31]  # lower median of 63, exact
                bits = block > med
                hval = 0
                for j in range(63):
                    if bits[j]:
                        hval |= 1 << j
                hashes.append(hval)
            out = pdf[id_list].copy()
            out["phash"] = pd.Series(hashes, dtype="object")
            yield out

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)


def audio_fingerprint(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    n_windows: int = 8,
    n_bins: int = 8,
    decode: str = "wav",
    round_digits: int = 6,
) -> DataFrame:
    """Spectral audio fingerprint (the Chromaprint/Shazam family's
    core construction): the clip splits into *n_windows* equal
    windows; each window's DFT energy at bins 1..*n_bins* is rounded
    to *round_digits*; one bit per (window transition, bin) — set iff
    the energy ROSE across the transition. Energy-transition signs
    survive volume changes, re-encoding, and mild noise, so matching
    clips land within a few bits and
    :func:`...dedup.hamming_pairs` dedups audio with the same
    equality-join algebra as SimHash (text) and pHash (images).

    (n_windows−1)·n_bins bits packed into a long (≤ 63). Clips
    shorter than 2·n_windows samples emit NULL. Same determinism
    contract as the other fingerprints: rounding before the strict
    compare pins the bit pattern cross-engine.

    Output: id columns + fingerprint (long). One numpy pass per
    clip, no shuffle.
    """
    if (n_windows - 1) * n_bins > 63:
        raise ValueError("fingerprint exceeds 63 bits")
    if decode not in ("fake", "wav"):
        raise ValueError(f"unknown decode mode: {decode}")
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [T.StructField("fingerprint", T.LongType())]
    )
    id_list = list(id_cols)
    scale = 10 ** round_digits

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            fps = []
            for payload in pdf[content_col]:
                if payload is None or len(payload) == 0:
                    fps.append(None)
                    continue
                x = _pcm_samples_normalized(bytes(payload), decode)
                n = x.size
                wlen = n // n_windows
                if wlen < 2:
                    fps.append(None)
                    continue
                wins = x[: n_windows * wlen].reshape(n_windows, wlen)
                j = np.arange(wlen, dtype=np.float64)
                energies = np.empty((n_windows, n_bins))
                for ki in range(n_bins):
                    k = ki + 1
                    ang = 2.0 * np.pi * float(k) * j / wlen
                    c = (wins * np.cos(ang)).sum(axis=1)
                    s_ = (wins * np.sin(ang)).sum(axis=1)
                    e = c * c + s_ * s_
                    energies[:, ki] = np.floor(e * scale + 0.5) / scale
                fp = 0
                for w in range(n_windows - 1):
                    for ki in range(n_bins):
                        if energies[w + 1, ki] > energies[w, ki]:
                            fp |= 1 << (w * n_bins + ki)
                fps.append(fp)
            out = pdf[id_list].copy()
            out["fingerprint"] = pd.Series(fps, dtype="object")
            yield out

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)


def video_fingerprint(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    n_slots: int = 8,
    decode: str = "y4m",
) -> DataFrame:
    """Spatio-temporal video fingerprint (the TIRI/temporal-gradient
    family): the frame sequence resamples to *n_slots* fixed time
    slots (slot t → frame ⌊t·nf/n_slots⌋); each slot frame reduces to
    its per-row luma SUMS (integers — no float anywhere); one bit per
    (slot transition, row) — set iff that row's luma rose. Fixed
    (n_slots−1)·rows bits regardless of clip length, robust to
    re-encoding and speed changes, and the fourth input to the shared
    :func:`...dedup.hamming_pairs` candidate algebra.

    All-integer construction: row sums and strict compares — the
    fingerprint is exactly reproducible in ANY engine with no
    rounding contract at all (stronger than the float fingerprints).

    ``decode="y4m"`` parses the real container (8×8 mono frames →
    7×8 = 56 bits); clips with fewer than 2 frames emit NULL.

    Output: id columns + fingerprint (long).
    """
    if decode != "y4m":
        raise ValueError("video_fingerprint currently supports decode='y4m'")
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [T.StructField("fingerprint", T.LongType())]
    )
    id_list = list(id_cols)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            fps = []
            for payload in pdf[content_col]:
                if payload is None or len(payload) == 0:
                    fps.append(None)
                    continue
                w, h, _, _, _, frames = _parse_y4m(bytes(payload))
                nf = len(frames)
                if nf < 2 or (n_slots - 1) * h > 63:
                    fps.append(None)
                    continue
                slot_frames = [
                    np.frombuffer(frames[t * nf // n_slots], dtype=np.uint8)
                    .reshape(h, w)
                    .astype(np.int64)
                    for t in range(n_slots)
                ]
                row_sums = np.stack([f.sum(axis=1) for f in slot_frames])
                fp = 0
                for t in range(n_slots - 1):
                    for r in range(h):
                        if row_sums[t + 1, r] > row_sums[t, r]:
                            fp |= 1 << (t * h + r)
                fps.append(fp)
            out = pdf[id_list].copy()
            out["fingerprint"] = pd.Series(fps, dtype="object")
            yield out

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)


def image_decode_audit(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("media_id",),
    decode: str = "jpeg",
) -> DataFrame:
    """Row-level decode AUDIT — the quarantine accounting a 100 TB
    media run needs (the reference's quarantine idea,
    src/etl/extract/extractor.py:56-59, applied to the codec lane):
    every payload is decoded under a per-row try, so one corrupt
    image can never kill the job; the output records per row whether
    the decode succeeded, WHICH codec variant the stream is (for
    JPEG: baseline SOF0 vs progressive SOF2 — the skip-rate split
    that matters on web corpora), and the loud-failure error for
    quarantined rows. Aggregate it for the per-variant skip-rate
    report; anti-join it to route quarantined payloads to a side
    table.

    Same Arrow-batched mapInPandas shape as decode_image_stats:
    narrow, no shuffle, memory bounded per batch. Error strings come
    from the in-module parsers and are deterministic, so the whole
    audit sits under a value-hash oracle.

    Output: id columns + (status 'ok'|'quarantined'|'empty',
    variant, error, width, height).
    """
    if decode not in ("ppm", "bmp", "png", "jpeg"):
        raise ValueError(f"unknown decode mode: {decode}")
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [
            T.StructField("status", T.StringType()),
            T.StructField("variant", T.StringType()),
            T.StructField("error", T.StringType()),
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
        ]
    )
    id_list = list(id_cols)

    def _jpeg_variant(b: bytes) -> str | None:
        # marker scan only (no entropy decode): SOF kind if present
        import struct as _struct

        pos = 2
        while pos + 4 <= len(b) and b[pos] == 0xFF:
            marker = b[pos + 1]
            if marker == 0xC0:
                return "baseline"
            if marker == 0xC2:
                return "progressive"
            if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if pos + 4 > len(b):
                break
            (ln,) = _struct.unpack_from(">H", b, pos + 2)
            pos += 2 + ln
        return None

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from etl_finance_pipeline_spark.operators.jpeg import decode_jpeg

        parsers = {
            "ppm": _parse_ppm,
            "bmp": _parse_bmp,
            "png": _parse_png,
        }
        for pdf in batches:
            rows = []
            for payload in pdf[content_col]:
                if payload is None or len(payload) == 0:
                    rows.append(("empty", None, None, None, None))
                    continue
                b = bytes(payload)
                variant = _jpeg_variant(b) if decode == "jpeg" else decode
                try:
                    if decode == "jpeg":
                        w, h, _nc, _pix = decode_jpeg(b)
                    else:
                        w, h, _pix = parsers[decode](b)
                    rows.append(("ok", variant, None, w, h))
                # broad catch is the POINT of a quarantine lane: any
                # decode failure (parse error, unsupported mode, or a
                # malformed stream tripping an unexpected corner)
                # becomes a quarantined row, never a dead job
                except Exception as ex:  # noqa: BLE001
                    rows.append(
                        (
                            "quarantined",
                            variant,
                            f"{type(ex).__name__}: {ex}",
                            None,
                            None,
                        )
                    )
            out = pdf[id_list].copy()
            for i, name in enumerate(
                ("status", "variant", "error", "width", "height")
            ):
                out[name] = [r[i] for r in rows]
            yield out

    return df.select(*id_cols, content_col).mapInPandas(kernel, out_schema)
