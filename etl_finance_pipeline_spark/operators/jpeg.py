"""Pure-numpy JPEG (ITU-T T.81) codec — baseline AND progressive,
grayscale AND color — closes the last fake multimodal lane without
native dependencies (no PIL/libjpeg in this environment).

Decoder scope — REAL baseline sequential + progressive DCT:
 * full marker walk (SOI/APPn/COM/DQT/DHT/SOF0/SOF2/DRI/SOS/RSTn/EOI),
 * canonical Huffman decode of the entropy stream with 0xFF00
   byte-unstuffing and restart-interval resync,
 * interleaved multi-component MCU decode with per-component
   quant/Huffman tables, DC predictors, and arbitrary sampling
   factors (4:4:4, 4:2:2, 4:2:0, ...),
 * differential DC + run-length AC coefficient decode (EOB/ZRL),
 * PROGRESSIVE (SOF2) multi-scan decode per T.81 Annex G.1.2 —
   spectral selection, successive approximation (DC and AC first +
   refinement scans), EOB runs with correction bits, tables
   redefinable between scans, non-interleaved component block grids
   (web corpora are heavily progressive; the per-round oracle query
   image_stats_jpeg_mixed certifies this path hash-for-hash),
 * dequantization, zigzag de-scan, and a vectorized 8×8 inverse DCT
   over all blocks of a component at once (one batched matmul, no
   per-pixel Python),
 * level shift, clamp, chroma upsampling by index-mapped replication,
   edge-crop to the SOF dimensions, and JFIF BT.601 YCbCr→RGB
   conversion with SQL-reproducible floor(x+0.5) rounding.
Arithmetic coding (SOF9+), 12-bit precision, hierarchical modes, and
CMYK raise ``NotImplementedError``/``ValueError`` loudly — the
documented boundary, exactly like the PNG decoder rejects
non-8-bit-RGB color types.

Encoder scope: baseline grayscale (:func:`encode_jpeg_gray`), color
4:4:4 / 4:2:0 (:func:`encode_jpeg_ycbcr`), and progressive
(:func:`encode_jpeg_progressive` — the standard scan script: DC
first at Al=1, per-component AC first scans with EOB-run coding,
then DC/AC successive-approximation refinements) with
caller-supplied quantization, Annex K Huffman tables (progressive AC
scans ship a custom flat table carrying the EOBn symbols Annex K
lacks), correct category/one's-complement coefficient coding and
byte stuffing. Any JPEG reader round-trips the output; with a flat
quant table the round-trip error is bounded by DCT rounding (≤2
LSB), and constant 8×8 blocks with DC quant 8 round-trip BIT-EXACTLY
(DC = 8·(v−128) is an exact multiple of the quantizer and every AC
coefficient is exactly zero) — which is what lets a SQL oracle
verify the full codec path hash-for-hash (plans/training_data.py
image_stats_jpeg, image_stats_jpeg_color, image_stats_jpeg_mixed).
A progressive stream reconstructs the IDENTICAL quantized
coefficients as its baseline counterpart, so progressive and
baseline encodings of the same pixels decode bit-identically — the
equivalence the tests fuzz.

Scale note: runs inside the same Arrow-batched mapInPandas lanes as
the other codecs (operators/multimodal.py) — narrow transformation,
no shuffle, memory bounded per Arrow batch.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

#: Zigzag scan order: _ZIGZAG[i] = raster index of the i-th zigzag
#: coefficient (T.81 Figure 5).
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Standard Annex K luminance Huffman tables (T.81 Tables K.3/K.5):
# BITS = count of codes per length 1..16, VALUES = symbols in code
# order. Public-spec constants, same in every JFIF writer.
_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_DC_VALUES = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_AC_VALUES = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)

#: Flat 8×8 quantization table with DC step 8: constant blocks
#: quantize losslessly (see module docstring); ACs use step 1 so
#: general images round-trip within DCT rounding.
FLAT_QTABLE = np.array([8] + [1] * 63, dtype=np.int64)[_ZIGZAG.argsort()].reshape(8, 8)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix C: F = C·B·Cᵀ, B = Cᵀ·F·C."""
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    c = np.cos((2 * n + 1) * k * np.pi / 16) * 0.5
    c[0, :] *= 1.0 / np.sqrt(2.0)
    return c


_C = _dct_matrix()


def _canonical_codes(bits, values) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self._out.append(byte)
            if byte == 0xFF:
                self._out.append(0x00)
            self._nbits -= 8
        self._acc &= (1 << self._nbits) - 1

    def finish(self) -> bytes:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self._out)


@functools.lru_cache(maxsize=32)
def _decoder_lut(bits: tuple, values: tuple) -> list[int]:
    """16-bit lookup-table Huffman decoder (the classic libjpeg
    device): entry i = ``(code_length << 8) | symbol`` for the code
    that prefixes the 16-bit window i, 0 for windows no code
    prefixes. One list index replaces up to 16 bit-by-bit tree steps
    per symbol — this is what makes the pure-Python entropy loop
    tractable (bit-tree → LUT + table cache + batched-matmul IDCT:
    143 → 1005 images/s on the 304-block decode benchmark).
    lru_cache matters: nearly every JFIF stream carries
    the same Annex K tables, and a per-image rebuild of the 65536
    entries would dominate small-image decode (profiled 0.3 of
    0.5 s per 50 images before caching)."""
    if len(bits) != 16 or sum(bits) != len(values):
        raise ValueError(
            "malformed DHT: BITS counts do not match VALUES length "
            "(truncated table?)"
        )
    lut = np.zeros(65536, dtype=np.int64)
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            base = code << (16 - length)
            lut[base : base + (1 << (16 - length))] = (length << 8) | values[idx]
            code += 1
            idx += 1
        code <<= 1
    return lut.tolist()  # list indexing beats numpy scalar indexing here


def _entropy_segments(b: bytes, pos: int) -> list[bytes]:
    """Split the entropy-coded data starting at *pos* into unstuffed
    byte segments, one per restart interval (RST0–7 markers separate
    them); stops at the first non-RST marker (normally EOI). Stuffed
    0xFF00 pairs collapse to 0xFF."""
    segments: list[bytes] = []
    start = pos
    i = pos
    n = len(b)
    while True:
        j = b.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            segments.append(b[start:n].replace(b"\xff\x00", b"\xff"))
            break
        nxt = b[j + 1]
        if nxt == 0x00:
            i = j + 2
            continue
        segments.append(b[start:j].replace(b"\xff\x00", b"\xff"))
        if 0xD0 <= nxt <= 0xD7:  # RSTn: next segment follows
            start = i = j + 2
            continue
        break  # EOI or any other real marker ends the scan
    return segments


def _extend(value: int, size: int) -> int:
    """T.81 EXTEND: map *size* raw bits to a signed coefficient."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg_gray(pixels: np.ndarray, qtable: np.ndarray | None = None) -> bytes:
    """Encode a (H, W) uint8 array as a baseline grayscale JFIF JPEG.

    Dimensions are padded to 8-multiples by edge replication (standard
    encoder behavior; the decoder crops back via SOF). Quantization
    defaults to :data:`FLAT_QTABLE`; Huffman coding uses the Annex K
    luminance tables.
    """
    q = (FLAT_QTABLE if qtable is None else np.asarray(qtable)).astype(np.int64)
    if q.shape != (8, 8) or (q <= 0).any() or (q > 255).any():
        raise ValueError("qtable must be 8x8 with entries in 1..255")
    pixels = np.asarray(pixels, dtype=np.uint8)
    h, w = pixels.shape
    g = _encode_component_blocks(pixels, q)
    zz = g.reshape(-1, 64)

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALUES)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALUES)
    # per-block last nonzero AC index, vectorized once for the whole
    # image (the per-block np.nonzero version dominated encode time —
    # sparse blocks, EOB-heavy streams, pay for 64 scans each)
    ac_mask = zz != 0
    ac_mask[:, 0] = False
    has_ac = ac_mask.any(axis=1)
    last_nz_arr = np.where(
        has_ac, 63 - np.argmax(ac_mask[:, ::-1], axis=1), 0
    ).tolist()
    zz_rows = zz.tolist()  # plain-int rows: no numpy scalars in the bit loop
    bw = _BitWriter()
    write = bw.write
    pred = 0
    for blk, last_nz in zip(zz_rows, last_nz_arr):
        pred = _entropy_encode_block(
            blk, last_nz, pred, dc_codes, ac_codes, write
        )
    entropy = bw.finish()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(int(x) for x in q.reshape(64)[_ZIGZAG]))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += seg(
        0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALUES)
    )
    out += seg(
        0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALUES)
    )
    out += seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_component_blocks(
    plane: np.ndarray, q: np.ndarray
) -> np.ndarray:
    """Pad a plane to 8-multiples (edge replication), FDCT + quantize
    all blocks at once; returns (bh, bw, 64) zigzag coefficients."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coeffs = _C @ blocks @ _C.T
    quant = np.round(coeffs / q).astype(np.int64)
    return quant.reshape(ph // 8, pw // 8, 64)[:, :, _ZIGZAG]


def _entropy_encode_block(blk, last_nz, pred, dc_codes, ac_codes, write):
    """Huffman-encode one zigzag block; returns the new DC pred."""
    dc = blk[0]
    diff = dc - pred
    size = _category(diff)
    code, length = dc_codes[size]
    write(code, length)
    if size:
        write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    for i in range(1, last_nz + 1):
        v = blk[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]  # ZRL
            write(zc, zl)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        write(code, length)
        write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        write(code, length)
    return dc


def encode_jpeg_ycbcr(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    qtable: np.ndarray | None = None,
    luma_sampling: tuple[int, int] = (1, 1),
) -> bytes:
    """Encode YCbCr planes as a baseline COLOR JFIF JPEG. *y* is
    (H, W); *cb*/*cr* are supplied at their natural (already
    subsampled) resolution — (H, W) for 4:4:4 (luma_sampling (1,1))
    or (ceil(H/2), ceil(W/2)) for 4:2:0 (luma_sampling (2,2)). All
    three scan components share the Annex K luminance Huffman tables
    and one quantization table (legal JPEG; real encoders often split
    tables, the decoder handles either). Interleaved single-scan MCU
    layout, per-component DC prediction — the stream any baseline
    JPEG reader accepts."""
    q = (FLAT_QTABLE if qtable is None else np.asarray(qtable)).astype(np.int64)
    if q.shape != (8, 8) or (q <= 0).any() or (q > 255).any():
        raise ValueError("qtable must be 8x8 with entries in 1..255")
    sh, sv = luma_sampling
    if (sh, sv) not in ((1, 1), (2, 2)):
        raise ValueError("luma_sampling must be (1,1) [4:4:4] or (2,2) [4:2:0]")
    y = np.asarray(y, dtype=np.uint8)
    cb = np.asarray(cb, dtype=np.uint8)
    cr = np.asarray(cr, dtype=np.uint8)
    h, w = y.shape
    exp = (-(-h // sv), -(-w // sh))
    if cb.shape != exp or cr.shape != exp:
        raise ValueError(
            f"chroma planes must be {exp} for luma_sampling {luma_sampling}"
        )

    # per-component zigzag coefficient grids, padded to the MCU grid
    mcus_x = -(-w // (8 * sh))
    mcus_y = -(-h // (8 * sv))

    def grid(plane, bw_t, bh_t):
        g = _encode_component_blocks(plane, q)
        if g.shape[0] < bh_t or g.shape[1] < bw_t:
            g = np.pad(
                g,
                ((0, bh_t - g.shape[0]), (0, bw_t - g.shape[1]), (0, 0)),
                mode="edge",
            )
        return g

    gy = grid(y, mcus_x * sh, mcus_y * sv)
    gcb = grid(cb, mcus_x, mcus_y)
    gcr = grid(cr, mcus_x, mcus_y)

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALUES)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALUES)

    def last_nz_grid(g):
        flat = g.reshape(-1, 64)
        mask = flat != 0
        mask[:, 0] = False
        has = mask.any(axis=1)
        return np.where(has, 63 - np.argmax(mask[:, ::-1], axis=1), 0).reshape(
            g.shape[0], g.shape[1]
        )

    lnz_y, lnz_cb, lnz_cr = (last_nz_grid(g) for g in (gy, gcb, gcr))
    bw = _BitWriter()
    write = bw.write
    preds = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(sv):
                for bx in range(sh):
                    r, c = my * sv + by, mx * sh + bx
                    preds[0] = _entropy_encode_block(
                        gy[r, c].tolist(), int(lnz_y[r, c]), preds[0],
                        dc_codes, ac_codes, write,
                    )
            preds[1] = _entropy_encode_block(
                gcb[my, mx].tolist(), int(lnz_cb[my, mx]), preds[1],
                dc_codes, ac_codes, write,
            )
            preds[2] = _entropy_encode_block(
                gcr[my, mx].tolist(), int(lnz_cr[my, mx]), preds[2],
                dc_codes, ac_codes, write,
            )
    entropy = bw.finish()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(int(x) for x in q.reshape(64)[_ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (sh << 4) | sv, 0])  # Y
    sof += bytes([2, 0x11, 0])  # Cb
    sof += bytes([3, 0x11, 0])  # Cr
    out += seg(0xC0, sof)
    out += seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALUES))
    out += seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALUES))
    out += seg(0xDA, b"\x03" + bytes([1, 0, 2, 0, 3, 0]) + b"\x00\x3f\x00")
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _upsample_plane(
    plane: np.ndarray,
    h: int,
    v: int,
    hmax: int,
    vmax: int,
    width: int,
    height: int,
) -> np.ndarray:
    """Nearest-neighbor chroma upsample + crop to SOF dims: full-res
    pixel (r, c) reads plane[(r*v)//vmax, (c*h)//hmax]. For integer
    factor ratios this is exactly byte replication; unlike
    .repeat(hmax//h) it also handles legal non-divisor factor pairs
    (e.g. luma 3 / chroma 2) instead of feeding an undersized plane
    into the color transform."""
    if h == hmax and v == vmax:
        return plane[:height, :width]
    rows = (np.arange(height, dtype=np.intp) * v) // vmax
    cols = (np.arange(width, dtype=np.intp) * h) // hmax
    return plane[rows[:, None], cols]


def _decode_baseline(b: bytes) -> tuple[int, int, list[np.ndarray]]:
    """General baseline-sequential decode: marker walk, interleaved
    MCU entropy decode with per-component tables/predictors and
    arbitrary sampling factors, dequant + batched IDCT per component,
    chroma upsampling by replication, crop to SOF dims. Returns
    (width, height, [full-resolution uint8 plane per component in
    SOF order])."""
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], list[int]] = {}  # (class, id) -> 16-bit LUT
    width = height = 0
    restart_interval = 0
    # per SOF component: (id, h, v, qtable id); scan adds table ids
    sof_comps: list[tuple[int, int, int, int]] = []
    scan_tables: dict[int, tuple[int, int]] = {}  # comp id -> (dc, ac)
    scan_order: list[int] = []  # comp ids in scan order
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at offset {pos}")
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("JPEG stream has no scan data")
        (length,) = struct.unpack_from(">H", b, pos + 2)
        payload = b[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(payload, dtype=np.uint8, count=64, offset=p).astype(np.int64)
                    p += 64
                else:  # 16-bit precision table
                    tbl = np.frombuffer(payload, dtype=">u2", count=64, offset=p).astype(np.int64)
                    p += 128
                raster = np.empty(64, dtype=np.int64)
                raster[_ZIGZAG] = tbl
                qtables[tq] = raster.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = tuple(payload[p + 1 : p + 17])
                n = sum(bits)
                values = tuple(payload[p + 17 : p + 17 + n])
                htables[(tc, th)] = _decoder_lut(bits, values)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, height, width, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if precision != 8:
                raise NotImplementedError("only 8-bit JPEG precision supported")
            for ci in range(ncomp):
                cid = payload[6 + 3 * ci]
                samp = payload[7 + 3 * ci]
                sof_comps.append(
                    (cid, samp >> 4, samp & 0x0F, payload[8 + 3 * ci])
                )
        elif marker == 0xC2:  # SOF2 progressive — dedicated multi-scan decoder
            return _decode_progressive(b)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (extended/arithmetic/"
                f"hierarchical) not supported — baseline (SOF0) and "
                f"progressive (SOF2) only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if not sof_comps:
                raise ValueError("SOS before SOF0")
            ns = payload[0]
            if ns != len(sof_comps):
                raise NotImplementedError(
                    "multi-scan JPEG (scan components != frame components)"
                )
            for si in range(ns):
                cid = payload[1 + 2 * si]
                tsel = payload[2 + 2 * si]
                scan_tables[cid] = (tsel >> 4, tsel & 0x0F)
                scan_order.append(cid)
            break
        # APPn / COM / anything else: skipped
    else:
        raise ValueError("JPEG stream has no SOS marker")

    # resolve per-component geometry + tables, scan order
    by_id = {c[0]: c for c in sof_comps}
    hmax = max(c[1] for c in sof_comps)
    vmax = max(c[2] for c in sof_comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("invalid sampling factors")
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    comps = []  # (h, v, bw_c, q, dc_lut, ac_lut, zz array)
    for cid in scan_order:
        _, h, v, tq = by_id[cid]
        if tq not in qtables:
            raise ValueError(f"missing quantization table {tq}")
        dc_id, ac_id = scan_tables[cid]
        if (0, dc_id) not in htables or (1, ac_id) not in htables:
            raise ValueError(
                f"missing Huffman table for component {cid}"
            )
        bw_c, bh_c = mcus_x * h, mcus_y * v
        comps.append(
            [
                h,
                v,
                bw_c,
                qtables[tq],
                htables[(0, dc_id)],
                htables[(1, ac_id)],
                np.zeros((bh_c * bw_c, 64), dtype=np.int64),
            ]
        )

    n_mcus = mcus_x * mcus_y
    segments = _entropy_segments(b, pos)
    n_per_seg = restart_interval or n_mcus
    if len(segments) < -(-n_mcus // n_per_seg):
        raise ValueError(
            f"expected {-(-n_mcus // n_per_seg)} restart segments, "
            f"found {len(segments)}"
        )

    # Tight bit loop over each unstuffed segment: `acc` holds the
    # unread bits (local ints only — no attribute lookups in the hot
    # path); two 0xFF pad bytes emulate the spec's 1-bit fill so the
    # final peek never underruns, and the MCU counter — not the
    # stream — terminates the scan. Restart intervals count MCUs and
    # reset every DC predictor.
    mi = 0
    for seg in segments:
        data = seg + b"\xff\xff"
        dlen = len(data)
        acc = 0
        nbits = 0
        dpos = 0
        preds = [0] * len(comps)
        seg_end = min(mi + n_per_seg, n_mcus)
        while mi < seg_end:
            mcu_y, mcu_x = divmod(mi, mcus_x)
            for ci, comp in enumerate(comps):
                h, v, bw_c, _q, dc_tbl, ac_tbl, zz = comp
                pred = preds[ci]
                for by in range(v):
                    for bx in range(h):
                        row = zz[(mcu_y * v + by) * bw_c + (mcu_x * h + bx)]
                        # DC: one LUT probe on a 16-bit window + bits
                        while nbits < 16:
                            if dpos >= dlen:
                                raise ValueError("truncated JPEG entropy stream")
                            acc = (acc << 8) | data[dpos]
                            dpos += 1
                            nbits += 8
                        entry = dc_tbl[(acc >> (nbits - 16)) & 0xFFFF]
                        if entry == 0:
                            raise ValueError("invalid Huffman code in JPEG stream")
                        nbits -= entry >> 8
                        size = entry & 0xFF
                        if size:
                            while nbits < size:
                                if dpos >= dlen:
                                    raise ValueError("truncated JPEG entropy stream")
                                acc = (acc << 8) | data[dpos]
                                dpos += 1
                                nbits += 8
                            raw = (acc >> (nbits - size)) & ((1 << size) - 1)
                            nbits -= size
                            pred += _extend(raw, size)
                        row[0] = pred
                        k = 1
                        while k < 64:
                            while nbits < 16:
                                if dpos >= dlen:
                                    raise ValueError("truncated JPEG entropy stream")
                                acc = (acc << 8) | data[dpos]
                                dpos += 1
                                nbits += 8
                            entry = ac_tbl[(acc >> (nbits - 16)) & 0xFFFF]
                            if entry == 0:
                                raise ValueError("invalid Huffman code in JPEG stream")
                            nbits -= entry >> 8
                            rs = entry & 0xFF
                            size = rs & 0x0F
                            if size == 0:
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            while nbits < size:
                                if dpos >= dlen:
                                    raise ValueError("truncated JPEG entropy stream")
                                acc = (acc << 8) | data[dpos]
                                dpos += 1
                                nbits += 8
                            raw = (acc >> (nbits - size)) & ((1 << size) - 1)
                            nbits -= size
                            row[k] = _extend(raw, size)
                            k += 1
                        # keep acc bounded (stay in small-int land)
                        acc &= (1 << nbits) - 1
                preds[ci] = pred
            mi += 1
        if mi >= n_mcus:
            break

    # per component: dequant + de-zigzag + one batched IDCT, then
    # upsample to full resolution by replication and crop
    planes = [
        _reconstruct_plane(h, v, bw_c, q, zz, hmax, vmax, width, height)
        for h, v, bw_c, q, _dc, _ac, zz in comps
    ]
    return width, height, planes


def _reconstruct_plane(
    h: int,
    v: int,
    bw_c: int,
    q: np.ndarray,
    zz: np.ndarray,
    hmax: int,
    vmax: int,
    width: int,
    height: int,
) -> np.ndarray:
    """Dequant + de-zigzag + one batched IDCT over a component's
    (n_blocks, 64) zigzag coefficients, then upsample/crop — shared by
    the baseline and progressive decoders (a progressive stream's
    coefficients reconstruct identically once every scan is applied)."""
    bh_c = zz.shape[0] // bw_c
    coeffs = np.zeros((zz.shape[0], 64), dtype=np.float64)
    coeffs[:, _ZIGZAG] = zz * q.reshape(64)[_ZIGZAG]
    blocks = _C.T @ coeffs.reshape(-1, 8, 8) @ _C
    plane = (
        blocks.reshape(bh_c, bw_c, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(bh_c * 8, bw_c * 8)
    )
    plane = np.clip(np.round(plane + 128.0), 0, 255).astype(np.uint8)
    return _upsample_plane(plane, h, v, hmax, vmax, width, height)


#: JFIF YCbCr→RGB coefficients (ITU-R BT.601, the constants every
#: JFIF codec uses). Rounding is floor(x+0.5) — deterministic and
#: SQL-reproducible, unlike banker's rounding.
_YCC = (1.402, 0.344136, 0.714136, 1.772)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = yf + _YCC[0] * crf
    g = yf - _YCC[1] * cbf - _YCC[2] * crf
    bl = yf + _YCC[3] * cbf
    rgb = np.stack([r, g, bl], axis=-1)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


def decode_jpeg_gray(b: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline grayscale JPEG to (width, height, pixel
    bytes, row-major). Raises ValueError if the stream is color —
    use :func:`decode_jpeg` for component-agnostic decoding."""
    width, height, planes = _decode_baseline(b)
    if len(planes) != 1:
        raise ValueError(
            f"expected grayscale JPEG, found {len(planes)} components"
        )
    return width, height, planes[0].tobytes()


def decode_jpeg_rgb(b: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline color JPEG to (width, height, interleaved
    RGB bytes): YCbCr planes per the general baseline decode, chroma
    replicated up, JFIF BT.601 conversion with floor(x+0.5)
    rounding."""
    width, height, planes = _decode_baseline(b)
    if len(planes) != 3:
        raise ValueError(
            f"expected 3-component (YCbCr) JPEG, found {len(planes)}"
        )
    return width, height, _ycbcr_to_rgb(*planes).tobytes()


def decode_jpeg(b: bytes) -> tuple[int, int, int, bytes]:
    """Component-agnostic decode: (width, height, n_components,
    raster bytes) — luma bytes for grayscale streams, interleaved
    RGB for 3-component YCbCr streams."""
    width, height, planes = _decode_baseline(b)
    if len(planes) == 1:
        return width, height, 1, planes[0].tobytes()
    if len(planes) == 3:
        return width, height, 3, _ycbcr_to_rgb(*planes).tobytes()
    raise NotImplementedError(
        f"{len(planes)}-component JPEG (CMYK/unknown) not supported"
    )


# ---------------------------------------------------------------------
# Progressive JPEG (SOF2) — T.81 Annex G.1.2: spectral selection +
# successive approximation, DC and AC first/refinement scans, EOB
# runs, correction bits, restart resync. Scans accumulate into the
# same per-component coefficient grids the baseline decoder fills in
# one pass; reconstruction is shared (_reconstruct_plane).
# ---------------------------------------------------------------------


def _entropy_segments_end(b: bytes, pos: int) -> tuple[list[bytes], int]:
    """Like :func:`_entropy_segments`, but also returns the offset of
    the first non-RST marker after the scan — a progressive stream has
    several scans, so the marker walk must resume there."""
    segments: list[bytes] = []
    start = pos
    i = pos
    n = len(b)
    while True:
        j = b.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            segments.append(b[start:n].replace(b"\xff\x00", b"\xff"))
            return segments, n
        nxt = b[j + 1]
        if nxt == 0x00:
            i = j + 2
            continue
        segments.append(b[start:j].replace(b"\xff\x00", b"\xff"))
        if 0xD0 <= nxt <= 0xD7:  # RSTn: next segment follows
            start = i = j + 2
            continue
        return segments, j


class _BitReader:
    """MSB-first bit reader over one unstuffed entropy segment, with
    the 16-bit Huffman LUT probe the baseline decoder uses. Two 0xFF
    pad bytes emulate the spec's 1-bit fill so the final peek never
    underruns; the block counter, not the stream, ends a scan."""

    __slots__ = ("data", "dlen", "acc", "nbits", "dpos")

    def __init__(self, seg: bytes) -> None:
        self.data = seg + b"\xff\xff"
        self.dlen = len(self.data)
        self.acc = 0
        self.nbits = 0
        self.dpos = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            if self.dpos >= self.dlen:
                raise ValueError("truncated JPEG entropy stream")
            self.acc = (self.acc << 8) | self.data[self.dpos]
            self.dpos += 1
            self.nbits += 8

    def huff(self, lut: list[int]) -> int:
        self._fill(16)
        entry = lut[(self.acc >> (self.nbits - 16)) & 0xFFFF]
        if entry == 0:
            raise ValueError("invalid Huffman code in JPEG stream")
        self.nbits -= entry >> 8
        self.acc &= (1 << self.nbits) - 1
        return entry & 0xFF

    def bits(self, size: int) -> int:
        if size == 0:
            return 0
        self._fill(size)
        raw = (self.acc >> (self.nbits - size)) & ((1 << size) - 1)
        self.nbits -= size
        self.acc &= (1 << self.nbits) - 1
        return raw

    def bit(self) -> int:
        return self.bits(1)


def _decode_progressive(b: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Decode a progressive (SOF2) JPEG: walk every scan in stream
    order (tables may be redefined between scans), apply each to the
    per-component coefficient grids per its (Ss, Se, Ah, Al) band and
    approximation bits, then reconstruct like the baseline path."""
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    hluts: dict[tuple[int, int], list[int]] = {}
    width = height = 0
    restart_interval = 0
    sof_comps: list[tuple[int, int, int, int]] = []  # (cid, h, v, tq)
    # per component id: geometry + coefficient grid, built at SOF
    geom: dict[int, dict] = {}
    hmax = vmax = 1
    mcus_x = mcus_y = 0
    eob_seen = False
    while pos + 2 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at offset {pos}")
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            eob_seen = True
            break
        (length,) = struct.unpack_from(">H", b, pos + 2)
        payload = b[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(payload, dtype=np.uint8, count=64, offset=p).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(payload, dtype=">u2", count=64, offset=p).astype(np.int64)
                    p += 128
                raster = np.empty(64, dtype=np.int64)
                raster[_ZIGZAG] = tbl
                qtables[tq] = raster.reshape(8, 8)
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = tuple(payload[p + 1 : p + 17])
                n = sum(bits)
                values = tuple(payload[p + 17 : p + 17 + n])
                hluts[(tc, th)] = _decoder_lut(bits, values)
                p += 17 + n
        elif marker == 0xC2:
            precision, height, width, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if precision != 8:
                raise NotImplementedError("only 8-bit JPEG precision supported")
            for ci in range(ncomp):
                cid = payload[6 + 3 * ci]
                samp = payload[7 + 3 * ci]
                sof_comps.append((cid, samp >> 4, samp & 0x0F, payload[8 + 3 * ci]))
            hmax = max(c[1] for c in sof_comps)
            vmax = max(c[2] for c in sof_comps)
            if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
                raise ValueError("invalid sampling factors")
            mcus_x = -(-width // (8 * hmax))
            mcus_y = -(-height // (8 * vmax))
            for cid, h, v, tq in sof_comps:
                bw_c, bh_c = mcus_x * h, mcus_y * v
                # non-interleaved scans cover the component's OWN
                # block grid (ceil of its sample dims), which may be
                # narrower than the MCU-padded grid
                cw = -(-(width * h) // hmax)
                ch = -(-(height * v) // vmax)
                geom[cid] = {
                    "h": h, "v": v, "tq": tq,
                    "bw": bw_c, "bh": bh_c,
                    "nbw": -(-cw // 8), "nbh": -(-ch // 8),
                    "zz": np.zeros((bh_c * bw_c, 64), dtype=np.int64),
                    "eobrun_guard": 0,
                }
        elif marker == 0xC0:
            raise ValueError("mixed SOF0+SOF2 stream")
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} not supported"
            )
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:
            if not sof_comps:
                raise ValueError("SOS before SOF2")
            ns = payload[0]
            scan_comps = []
            for si in range(ns):
                cid = payload[1 + 2 * si]
                tsel = payload[2 + 2 * si]
                if cid not in geom:
                    raise ValueError(f"scan references unknown component {cid}")
                scan_comps.append((cid, tsel >> 4, tsel & 0x0F))
            ss = payload[1 + 2 * ns]
            se = payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            segments, pos = _entropy_segments_end(b, pos)
            _progressive_scan(
                scan_comps, ss, se, ah, al, segments, restart_interval,
                geom, hluts, mcus_x, mcus_y,
            )
        # APPn / COM: skipped
    if not geom:
        raise ValueError("JPEG stream has no SOF2 frame")
    del eob_seen  # EOI optional for robustness — scans already applied
    planes = [
        _reconstruct_plane(
            g["h"], g["v"], g["bw"], qtables[g["tq"]], g["zz"],
            hmax, vmax, width, height,
        )
        for g in (geom[c[0]] for c in sof_comps)
    ]
    return width, height, planes


def _progressive_scan(
    scan_comps, ss, se, ah, al, segments, restart_interval,
    geom, hluts, mcus_x, mcus_y,
) -> None:
    """Apply ONE progressive scan to the coefficient grids. Restart
    segments reset DC predictors and the EOB run."""
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if not is_dc and len(scan_comps) != 1:
        raise ValueError("progressive AC scans are single-component")
    if not is_dc and ss > se or se > 63:
        raise ValueError("bad spectral band")

    if len(scan_comps) > 1:
        # interleaved (DC) scan: MCU walk — T.81 allows interleaving
        # only when ns > 1, and progressive AC scans are always ns=1
        units_total = mcus_x * mcus_y
        interleaved = True
    else:
        cid = scan_comps[0][0]
        g = geom[cid]
        units_total = g["nbw"] * g["nbh"]
        interleaved = False
    n_per_seg = restart_interval or units_total
    if len(segments) < -(-units_total // n_per_seg):
        raise ValueError(
            f"expected {-(-units_total // n_per_seg)} restart segments, "
            f"found {len(segments)}"
        )

    ui = 0
    for seg in segments:
        br = _BitReader(seg)
        preds = {cid: 0 for cid, _, _ in scan_comps}
        eobrun = 0
        seg_end = min(ui + n_per_seg, units_total)
        while ui < seg_end:
            if interleaved:
                mcu_y, mcu_x = divmod(ui, mcus_x)
                for cid, dc_id, _ac_id in scan_comps:
                    g = geom[cid]
                    h, v, bw_c = g["h"], g["v"], g["bw"]
                    zz = g["zz"]
                    for by in range(v):
                        for bx in range(h):
                            row = zz[(mcu_y * v + by) * bw_c + (mcu_x * h + bx)]
                            preds[cid] = _dc_prog_block(
                                row, br, hluts, dc_id, ah, al, preds[cid]
                            )
            else:
                cid, dc_id, ac_id = scan_comps[0]
                g = geom[cid]
                by, bx = divmod(ui, g["nbw"])
                row = g["zz"][by * g["bw"] + bx]
                if is_dc:
                    preds[cid] = _dc_prog_block(
                        row, br, hluts, dc_id, ah, al, preds[cid]
                    )
                elif ah == 0:
                    eobrun = _ac_first_block(
                        row, br, hluts[(1, ac_id)], ss, se, al, eobrun
                    )
                else:
                    eobrun = _ac_refine_block(
                        row, br, hluts[(1, ac_id)], ss, se, al, eobrun
                    )
            ui += 1
        if ui >= units_total:
            break


def _dc_prog_block(row, br, hluts, dc_id, ah, al, pred):
    """DC scan contribution for one block: first scan (Ah=0) decodes
    the point-transformed differential DC and stores pred << Al; a
    refinement scan appends one magnitude bit at position Al."""
    if ah == 0:
        size = br.huff(hluts[(0, dc_id)])
        if size:
            pred += _extend(br.bits(size), size)
        row[0] = pred << al
        return pred
    if br.bit():
        row[0] |= 1 << al  # two's-complement OR — correct for negatives
    return pred


def _ac_first_block(row, br, ac_lut, ss, se, al, eobrun):
    """AC first scan (Ah=0) for one block: run-length decode of the
    point-transformed band with EOBn run codes (T.81 G.1.2.2)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.huff(ac_lut)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.bits(r)
                return eobrun - 1  # this block ends the current run
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past spectral band")
        row[k] = _extend(br.bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(row, br, ac_lut, ss, se, al, eobrun):
    """AC refinement scan (Ah=Al+1) for one block: newly-significant
    coefficients arrive as ±1<<Al with zero-history run lengths;
    every already-nonzero coefficient crossed (or remaining once the
    EOB run starts) reads one correction bit (T.81 G.1.2.3)."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.huff(ac_lut)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("invalid newly-significant size in AC refinement")
                val = p1 if br.bit() else -p1
            while k <= se:
                c = row[k]
                if c != 0:
                    if br.bit() and (abs(c) & p1) == 0:
                        row[k] = c + (p1 if c > 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                row[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = row[k]
            if c != 0:
                if br.bit() and (abs(c) & p1) == 0:
                    row[k] = c + (p1 if c > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


# Custom AC Huffman table for progressive scans: the Annex K AC table
# lacks the EOBn symbols (0x10..0xE0) progressive EOB runs need, so
# the encoder ships a flat canonical table — every symbol it can emit
# at length 8 (176 < 255 codes, so the all-ones prefix stays reserved
# per Annex C). Legal JPEG: progressive encoders routinely define
# custom tables; the decoder builds its LUT from whatever DHT carries.
_PROG_AC_VALUES = tuple(sorted(set(_AC_VALUES) | {r << 4 for r in range(15)}))
_PROG_AC_BITS = (0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_VALUES), 0, 0, 0, 0, 0, 0, 0, 0)


class _ProgACWriter:
    """AC-scan emitter state: EOB run accumulation plus the buffered
    correction bits that trail it (T.81 G.1.2.2/G.1.2.3 — correction
    bits of blocks inside an EOB run are emitted when the run is)."""

    def __init__(self, write, ac_codes) -> None:
        self.write = write
        self.ac_codes = ac_codes
        self.eobrun = 0
        self.bits: list[int] = []  # buffered correction bits

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            n = self.eobrun.bit_length() - 1
            code, length = self.ac_codes[n << 4]
            self.write(code, length)
            if n:
                self.write(self.eobrun - (1 << n), n)
            self.eobrun = 0
        for bit in self.bits:
            self.write(bit, 1)
        self.bits = []

    def bump_eobrun(self) -> None:
        self.eobrun += 1
        if self.eobrun == 0x7FFF:
            self.flush_eobrun()


def _enc_ac_first_block(st: _ProgACWriter, band, al) -> None:
    """Encode one block's AC first-scan contribution (band = zigzag
    coefficients Ss..Se, pre point-transform)."""
    vals = [
        (v >> al) if v >= 0 else -((-v) >> al) for v in band
    ]
    last = -1
    for i, v in enumerate(vals):
        if v:
            last = i
    if last < 0:
        st.bump_eobrun()
        return
    st.flush_eobrun()
    write, ac_codes = st.write, st.ac_codes
    run = 0
    for v in vals[: last + 1]:
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            write(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        write(code, length)
        write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last < len(vals) - 1:
        st.bump_eobrun()


def _enc_ac_refine_block(st: _ProgACWriter, band, al) -> None:
    """Encode one block's AC refinement contribution: newly
    significant coefficients (|v|>>Al == 1) as (run<<4)|1 + sign,
    correction bits for already-nonzero coefficients buffered and
    flushed after the codeword (or with the EOB run)."""
    absv = [(-v if v < 0 else v) >> al for v in band]
    eob = -1  # index of last newly-significant coefficient
    for i, a in enumerate(absv):
        if a == 1:
            eob = i
    write, ac_codes = st.write, st.ac_codes
    run = 0
    pending: list[int] = []  # correction bits since the last codeword
    for i, a in enumerate(absv):
        if a == 0:
            run += 1
            continue
        # the ZRL check runs at EVERY nonzero (old or new): a ZRL's
        # correction bits must be exactly those of the old-nonzeros
        # inside its 16-zero-history span, so an old-nonzero reached
        # with run already > 15 forces the ZRL out BEFORE its own bit
        # is buffered (this is the positional contract the decoder's
        # skip loop enforces). Only emitted while a newly-significant
        # coefficient is still ahead (i <= eob) — a trailing run
        # joins the EOB run instead.
        while run > 15 and i <= eob:
            st.flush_eobrun()
            code, length = ac_codes[0xF0]
            write(code, length)
            run -= 16
            for bit in pending:
                write(bit, 1)
            pending = []
        if a > 1:
            # old nonzero: correction bit (next lower magnitude bit)
            pending.append(a & 1)
            continue
        # newly significant (a == 1)
        st.flush_eobrun()
        code, length = ac_codes[(run << 4) | 1]
        write(code, length)
        write(1 if band[i] >= 0 else 0, 1)
        for bit in pending:
            write(bit, 1)
        pending = []
        run = 0
    if run > 0 or pending:
        # block tail has no more newly-significant coefficients:
        # joins the EOB run, its correction bits ride with the run
        st.bits.extend(pending)
        st.bump_eobrun()


def encode_jpeg_progressive(
    y: np.ndarray,
    cb: np.ndarray | None = None,
    cr: np.ndarray | None = None,
    qtable: np.ndarray | None = None,
    luma_sampling: tuple[int, int] = (1, 1),
) -> bytes:
    """Encode gray or YCbCr planes as a PROGRESSIVE (SOF2) JFIF JPEG
    with the standard scan shape real encoders emit: an interleaved
    DC first scan at Al=1, per-component AC first scans (Ss=1..63,
    Al=1) with EOB-run coding, then the DC and AC successive-
    approximation refinement scans at Al=0. The quantized coefficients
    reconstruct EXACTLY the ones the baseline encoder would ship, so
    a progressive stream of the same pixels decodes bit-identically
    to its baseline counterpart — the test/oracle contract."""
    q = (FLAT_QTABLE if qtable is None else np.asarray(qtable)).astype(np.int64)
    if q.shape != (8, 8) or (q <= 0).any() or (q > 255).any():
        raise ValueError("qtable must be 8x8 with entries in 1..255")
    y = np.asarray(y, dtype=np.uint8)
    color = cb is not None
    if color:
        sh, sv = luma_sampling
        if (sh, sv) not in ((1, 1), (2, 2)):
            raise ValueError("luma_sampling must be (1,1) or (2,2)")
        cb = np.asarray(cb, dtype=np.uint8)
        cr = np.asarray(cr, dtype=np.uint8)
    else:
        sh = sv = 1
    h, w = y.shape
    mcus_x = -(-w // (8 * sh))
    mcus_y = -(-h // (8 * sv))

    def grid(plane, bw_t, bh_t):
        g = _encode_component_blocks(plane, q)
        if g.shape[0] < bh_t or g.shape[1] < bw_t:
            g = np.pad(
                g,
                ((0, bh_t - g.shape[0]), (0, bw_t - g.shape[1]), (0, 0)),
                mode="edge",
            )
        return g

    if color:
        exp = (-(-h // sv), -(-w // sh))
        if cb.shape != exp or cr.shape != exp:
            raise ValueError(f"chroma planes must be {exp}")
        comps = [
            (1, sh, sv, grid(y, mcus_x * sh, mcus_y * sv)),
            (2, 1, 1, grid(cb, mcus_x, mcus_y)),
            (3, 1, 1, grid(cr, mcus_x, mcus_y)),
        ]
    else:
        comps = [(1, 1, 1, grid(y, mcus_x, mcus_y))]

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALUES)
    ac_codes = _canonical_codes(_PROG_AC_BITS, _PROG_AC_VALUES)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])  # DC table 0, AC table 0
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(int(x) for x in q.reshape(64)[_ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch_, cv_, _g in comps:
        sof += bytes([cid, (ch_ << 4) | cv_, 0])
    out += seg(0xC2, sof)
    out += seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALUES))
    out += seg(
        0xC4, b"\x10" + bytes(_PROG_AC_BITS) + bytes(_PROG_AC_VALUES)
    )

    # ---- scan 1: interleaved DC first, Al=1 -------------------------
    bw = _BitWriter()
    preds = {cid: 0 for cid, *_ in comps}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for cid, ch_, cv_, g in comps:
                for by in range(cv_):
                    for bx in range(ch_):
                        dc = int(g[my * cv_ + by, mx * ch_ + bx, 0]) >> 1
                        diff = dc - preds[cid]
                        preds[cid] = dc
                        size = _category(diff)
                        code, length = dc_codes[size]
                        bw.write(code, length)
                        if size:
                            bw.write(
                                diff if diff >= 0 else diff + (1 << size) - 1,
                                size,
                            )
    out += sos([c[0] for c in comps], 0, 0, 0, 1)
    out += bw.finish()

    # ---- per-component AC first scans, Ss=1..63, Al=1 ---------------
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    def comp_blocks(ch_: int, cv_: int) -> tuple[int, int]:
        # non-interleaved scans cover the component's OWN block grid:
        # ceil(ceil(dim * factor / max_factor) / 8)
        cw = -(-(w * ch_) // hmax)
        chh = -(-(h * cv_) // vmax)
        return -(-cw // 8), -(-chh // 8)

    for cid, ch_, cv_, g in comps:
        nbw_c, nbh_c = comp_blocks(ch_, cv_)
        bw = _BitWriter()
        st = _ProgACWriter(bw.write, ac_codes)
        for by in range(nbh_c):
            for bx in range(nbw_c):
                band = g[by, bx, 1:64].tolist()
                _enc_ac_first_block(st, band, 1)
        st.flush_eobrun()
        out += sos([cid], 1, 63, 0, 1)
        out += bw.finish()

    # ---- DC refinement scan (interleaved), Ah=1 Al=0 ----------------
    bw = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for cid, ch_, cv_, g in comps:
                for by in range(cv_):
                    for bx in range(ch_):
                        bw.write(int(g[my * cv_ + by, mx * ch_ + bx, 0]) & 1, 1)
    out += sos([c[0] for c in comps], 0, 0, 1, 0)
    out += bw.finish()

    # ---- per-component AC refinement scans, Ah=1 Al=0 ---------------
    for cid, ch_, cv_, g in comps:
        nbw_c, nbh_c = comp_blocks(ch_, cv_)
        bw = _BitWriter()
        st = _ProgACWriter(bw.write, ac_codes)
        for by in range(nbh_c):
            for bx in range(nbw_c):
                band = g[by, bx, 1:64].tolist()
                _enc_ac_refine_block(st, band, 0)
        st.flush_eobrun()
        out += sos([cid], 1, 63, 1, 0)
        out += bw.finish()

    out += b"\xff\xd9"
    return bytes(out)
