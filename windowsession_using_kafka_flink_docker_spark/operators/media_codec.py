"""Real, stdlib-only media codecs for the multimodal column path.

No PIL / libav / soundfile in this container — but the container *formats*
(PNG, RIFF/WAVE, ISO-BMFF MP4) are simple enough to build and parse with
``struct`` + ``zlib``, which is exactly what this module does:

- PNG: real RGB8 files (signature, IHDR, zlib IDAT, CRC-checked), plus a
  pixel-level decode (unfilter) / re-encode path that powers a genuine
  nearest-neighbor resize.
- WAV: real PCM16 RIFF files; the parser walks chunks like any reader and
  recovers sample rate / sample count / duration.
- MP4: a minimal but real ISO-BMFF box tree (ftyp, moov/mvhd, trak/tkhd,
  stbl/stsz/stsc/stco, mdat); the parser is a recursive box walker and the
  demuxer slices mdat by the stsz sample table at the stco offset — the
  same mechanism a real demuxer uses.

Everything is deterministic given (doc_id-ish) integer seeds so Spark-side
outputs are oracle-able: the *headers* carry closed-form metadata, and the
decode step must round-trip real bytes to reproduce it.

These are plain-Python helpers, deliberately Spark-free: they run inside
Arrow-batched ``mapInPandas`` workers (see ``multimodal.py``) and in fast
unit tests without a session.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# --------------------------------------------------------------------------
# deterministic content (LCG-style byte mixers — no RNG state, no platform
# dependence, closed-form per index)
# --------------------------------------------------------------------------


def _mix_bytes(n: int, seed: int) -> np.ndarray:
    """n deterministic uint8 values from an integer seed."""
    idx = np.arange(n, dtype=np.uint64)
    return ((idx * np.uint64(2654435761) + np.uint64(seed) * np.uint64(97) + np.uint64(13))
            % np.uint64(256)).astype(np.uint8)


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Encode raw RGB8 pixels (len == w*h*3) as a real PNG (filter 0 rows)."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"rgb length {len(rgb)} != {width}x{height}x3")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    raw = b"".join(
        b"\x00" + rgb[y * stride:(y + 1) * stride] for y in range(height)
    )
    return (PNG_SIGNATURE
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 6))
            + _png_chunk(b"IEND", b""))


def build_png(width: int, height: int, seed: int) -> bytes:
    """A real PNG with deterministic pixel content."""
    return encode_png(width, height, _mix_bytes(width * height * 3, seed).tobytes())


def parse_png_header(data: bytes) -> tuple[int, int]:
    """Signature + CRC-verified IHDR read. Returns (width, height)."""
    b = bytes(data)
    if b[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    (length,) = struct.unpack(">I", b[8:12])
    ctype = b[12:16]
    if ctype != b"IHDR" or length != 13:
        raise ValueError("not a PNG: first chunk is not IHDR")
    body = b[16:16 + 13]
    (crc,) = struct.unpack(">I", b[29:33])
    if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
        raise ValueError("PNG IHDR CRC mismatch")
    width, height = struct.unpack(">II", body[:8])
    return width, height


def decode_png_pixels(data: bytes) -> tuple[int, int, np.ndarray]:
    """Full decode: inflate IDAT, undo per-row filters (types 0/1/2 — all
    this codebase emits is 0, Sub/Up kept for robustness). Returns
    (width, height, uint8 array shaped (h, w, 3))."""
    b = bytes(data)
    width, height = parse_png_header(b)
    idat = bytearray()
    off = 8
    while off < len(b):
        (length,) = struct.unpack(">I", b[off:off + 4])
        ctype = b[off + 4:off + 8]
        if ctype == b"IDAT":
            idat += b[off + 8:off + 8 + length]
        off += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = width * 3
    out = np.empty((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        if ftype == 1:  # Sub
            for x in range(3, stride):
                row[x] = (int(row[x]) + int(row[x - 3])) & 0xFF
        elif ftype == 2:  # Up
            if y > 0:
                row = (row.astype(np.int16) + out[y - 1].astype(np.int16)).astype(np.uint8)
        elif ftype != 0:
            raise ValueError(f"unsupported PNG filter type {ftype}")
        out[y] = row
        pos += 1 + stride
    return width, height, out.reshape(height, width, 3)


def resize_png(data: bytes, new_width: int, new_height: int) -> bytes:
    """Genuine nearest-neighbor resample: decode pixels, index-map, re-encode."""
    w, h, px = decode_png_pixels(data)
    ys = (np.arange(new_height) * h // new_height).clip(0, h - 1)
    xs = (np.arange(new_width) * w // new_width).clip(0, w - 1)
    resized = px[ys][:, xs]
    return encode_png(new_width, new_height, resized.tobytes())


# --------------------------------------------------------------------------
# WAV (RIFF PCM16 mono)
# --------------------------------------------------------------------------


def build_wav(sample_rate: int, n_samples: int, seed: int) -> bytes:
    samples = ((_mix_bytes(n_samples * 2, seed)
                .view("<u2").astype(np.int32) - 32768)
               .astype("<i2")).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(samples)) + samples)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def parse_wav(data: bytes) -> dict:
    """Chunk-walking RIFF parser. Returns sample_rate / channels / bits /
    n_samples / duration_ms (exact integer ms — callers pick sample counts
    divisible by rate/1000 multiples)."""
    b = bytes(data)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    off, rate, channels, bits, data_len = 12, None, None, None, None
    while off + 8 <= len(b):
        ctype = b[off:off + 4]
        (length,) = struct.unpack("<I", b[off + 4:off + 8])
        if ctype == b"fmt ":
            _, channels, rate, _, _, bits = struct.unpack("<HHIIHH", b[off + 8:off + 24])
        elif ctype == b"data":
            data_len = length
        off += 8 + length + (length & 1)  # RIFF chunks are word-aligned
    if rate is None or data_len is None:
        raise ValueError("WAVE missing fmt/data chunk")
    n_samples = data_len // (channels * bits // 8)
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "n_samples": n_samples,
        "duration_ms": n_samples * 1000 // rate,
    }


# --------------------------------------------------------------------------
# MP4 (minimal real ISO-BMFF)
# --------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full_box(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


_UNITY_MATRIX = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)


def build_mp4(width: int, height: int, frame_sizes: list[int],
              duration_ms: int, seed: int, timescale: int = 1000) -> bytes:
    """A real (minimal) MP4: ftyp + moov(mvhd, trak(tkhd, mdia/minf/stbl(
    stsz per-sample table, stsc, stco))) + mdat holding the frames. The
    stco chunk offset is the absolute file offset of the first sample, as
    the spec requires — parsers that ignore our closed forms and walk the
    boxes recover exactly the planted frames."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom" + b"iso2")
    duration = duration_ms * timescale // 1000
    mvhd = _full_box(b"mvhd", 0, 0, struct.pack(
        ">IIIIIHH", 0, 0, timescale, duration, 0x00010000, 0x0100, 0)
        + b"\x00" * 8 + _UNITY_MATRIX + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _full_box(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0) + _UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16))
    stsz = _full_box(b"stsz", 0, 0, struct.pack(
        ">II", 0, len(frame_sizes)) + b"".join(struct.pack(">I", s) for s in frame_sizes))
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, len(frame_sizes), 1))

    def _moov(stco_offset: int) -> bytes:
        stco = _full_box(b"stco", 0, 0, struct.pack(">II", 1, stco_offset))
        stbl = _box(b"stbl", stsz + stsc + stco)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    moov_len = len(_moov(0))  # stco is fixed-width: length is offset-independent
    first_sample = len(ftyp) + moov_len + 8
    frames = b"".join(
        _mix_bytes(s, seed * 31 + i).tobytes() for i, s in enumerate(frame_sizes)
    )
    return ftyp + _moov(first_sample) + _box(b"mdat", frames)


def _walk_boxes(b: bytes, start: int, end: int):
    off = start
    while off + 8 <= end:
        (length,) = struct.unpack(">I", b[off:off + 4])
        if length < 8 or off + length > end:
            raise ValueError("corrupt MP4 box length")
        yield b[off + 4:off + 8], off + 8, off + length
        off += length


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def parse_mp4(data: bytes) -> dict:
    """Recursive box walk. Returns duration_ms / width / height /
    sample_sizes / chunk_offset."""
    b = bytes(data)
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an MP4: missing ftyp")
    info: dict = {}

    def walk(start: int, end: int) -> None:
        for btype, body_start, body_end in _walk_boxes(b, start, end):
            if btype in _CONTAINERS:
                walk(body_start, body_end)
            elif btype == b"mvhd":
                timescale, duration = struct.unpack(
                    ">II", b[body_start + 12:body_start + 20])
                info["duration_ms"] = duration * 1000 // timescale
            elif btype == b"tkhd":
                w169, h169 = struct.unpack(">II", b[body_end - 8:body_end])
                info["width"], info["height"] = w169 >> 16, h169 >> 16
            elif btype == b"stsz":
                uniform, count = struct.unpack(
                    ">II", b[body_start + 4:body_start + 12])
                if uniform:
                    info["sample_sizes"] = [uniform] * count
                else:
                    info["sample_sizes"] = list(struct.unpack(
                        f">{count}I", b[body_start + 12:body_start + 12 + 4 * count]))
            elif btype == b"stco":
                (n,) = struct.unpack(">I", b[body_start + 4:body_start + 8])
                info["chunk_offset"] = struct.unpack(
                    ">I", b[body_start + 8:body_start + 12])[0] if n else None

    walk(0, len(b))
    if "sample_sizes" not in info or "duration_ms" not in info:
        raise ValueError("MP4 missing mvhd/stsz")
    return info


def demux_mp4_samples(data: bytes) -> list[bytes]:
    """Slice mdat into samples via the stsz table at the stco offset —
    real demuxing, no closed-form shortcuts."""
    b = bytes(data)
    info = parse_mp4(b)
    off = info["chunk_offset"]
    out = []
    for size in info["sample_sizes"]:
        out.append(b[off:off + size])
        off += size
    return out

# --------------------------------------------------------------------------
# JPEG (baseline JFIF, grayscale) — the round-12 stretch: the most common
# multimodal format gets a real codec beside PNG/WAV/MP4. Everything below
# is stdlib+numpy: forward DCT -> quantize -> zigzag -> Huffman on encode;
# marker parse -> DHT canonical-code rebuild -> entropy decode -> dequantize
# -> IDCT -> clamp on decode. Cross-engine exactness discipline: the DCT
# coefficient is snapped to the nearest integer before quantization (the
# integer-DCT encoder idiom), and the fixture qualities {25,50,75} scale the
# Annex-K table so Q[0,0] in {32,16,8} is a multiple of 8 — which makes the
# DC reconstruction d/8 an exact integer and the whole round-trip replayable
# in closed-form integer arithmetic (see plans/llm_pipeline.py oracle).
# --------------------------------------------------------------------------

#: ITU-T T.81 Annex K.1 luminance quantization table (natural row order).
JPEG_QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)

#: ITU-T T.81 Annex K.2 chrominance quantization table (natural order).
JPEG_QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)

#: Annex K.3.1: luminance DC Huffman table (code counts per length 1..16,
#: then symbols in canonical order).
JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
JPEG_DC_VALS = list(range(12))

#: Annex K.3.2: luminance AC Huffman table.
JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: Zigzag scan: JPEG_ZIGZAG[k] = (row, col) of the k-th coefficient, in
#: the ITU-T T.81 Figure A.6 order — diagonals of constant r+c, odd
#: diagonals traversed row-ascending ((0,1),(1,0)), even diagonals
#: column-ascending ((2,0),(1,1),(0,2)). Pinned against the hardcoded
#: Figure A.6 table and a Pillow interop decode in test_media_codec.py.
def _zigzag_order() -> list:
    order = sorted(((r, c) for r in range(8) for c in range(8)),
                   key=lambda rc: (rc[0] + rc[1],
                                   rc[0] if (rc[0] + rc[1]) % 2 else rc[1]))
    return order


JPEG_ZIGZAG = _zigzag_order()

#: Vector index form of the zigzag for whole-image batched transforms
#: (r17): quant[:, _ZZ_R, _ZZ_C] zigzags every block of an image in one
#: numpy gather instead of a 64-iteration Python loop per block.
_ZZ_R = np.array([r for r, c in JPEG_ZIGZAG])
_ZZ_C = np.array([c for r, c in JPEG_ZIGZAG])

#: Orthonormal DCT-II basis: B[u, x] = c(u)/2 * cos((2x+1) u pi / 16).
_DCT_BASIS = np.array([
    [(0.5 if u else 0.5 / np.sqrt(2.0)) * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)] for u in range(8)
])


def jpeg_scaled_quant(quality: int) -> np.ndarray:
    """IJG quality scaling of the Annex-K table (floor((Q*S+50)/100),
    clamped to 1..255). quality in {25, 50, 75} puts Q[0,0] at {32,16,8}."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((JPEG_QUANT_LUMA * s + 50) // 100, 1, 255).astype(np.int64)


def jpeg_scaled_quant_chroma(quality: int) -> np.ndarray:
    """IJG quality scaling of the Annex-K.2 chroma table (same formula
    as the luma scaler)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((JPEG_QUANT_CHROMA * s + 50) // 100, 1, 255).astype(np.int64)


def _quantize_rha(coef: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Round-half-away-from-zero quantization of integer coefficients:
    sign(t) * ((2|t| + Q) // (2Q)) — pure integer, replayable in SQL."""
    t = coef.astype(np.int64)
    mag = (2 * np.abs(t) + q) // (2 * q)
    return np.sign(t) * mag


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._nbits += 1
            if self._nbits == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)
                self._acc, self._nbits = 0, 0

    def flush(self) -> None:
        while self._nbits:
            self.write(1, 1)  # pad with 1-bits per the spec


def _huff_encode_table(bits: list, vals: list) -> dict:
    """symbol -> (code, length) from canonical (BITS, HUFFVAL)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended-bits) encoding of a nonzero-or-zero DC/AC value."""
    cat = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << cat) - 1
    return cat, bits


def _encode_block(bw: "_BitWriter", block: np.ndarray, q: np.ndarray,
                  pred: int, dc_tab: dict, ac_tab: dict) -> int:
    """Forward-DCT, quantize, and entropy-code one level-shifted 8x8
    block (differential DC, run-length AC with ZRL/EOB). Returns the
    new DC predictor. Used by the 4:2:0 interleaved encoder (whose MCU
    order hops between planes); the grayscale encoder batches the
    transform half over every block at once (r17) and shares only
    :func:`_encode_zz`."""
    coef = np.rint(_DCT_BASIS @ block @ _DCT_BASIS.T).astype(np.int64)
    quant = _quantize_rha(coef, q)
    zz = [int(quant[r, c]) for r, c in JPEG_ZIGZAG]
    return _encode_zz(bw, zz, pred, dc_tab, ac_tab)


def _encode_zz(bw: "_BitWriter", zz: list, pred: int,
               dc_tab: dict, ac_tab: dict) -> int:
    """Entropy-code one zigzagged quantized block (python ints):
    differential DC, run-length AC with ZRL/EOB. Returns the new DC
    predictor — the sequential half shared by the batched grayscale
    encoder and the per-block 4:2:0 encoder."""
    diff = zz[0] - pred
    pred = zz[0]
    cat, bits = _magnitude(diff)
    code, length = dc_tab[cat]
    bw.write(code, length)
    if cat:
        bw.write(bits, cat)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            zcode, zlen = ac_tab[0xF0]
            bw.write(zcode, zlen)
            run -= 16
        cat, bits = _magnitude(zz[k])
        code, length = ac_tab[(run << 4) | cat]
        bw.write(code, length)
        bw.write(bits, cat)
        run = 0
    if last_nz < 63:
        code, length = ac_tab[0x00]  # EOB
        bw.write(code, length)
    return pred


def encode_jpeg_gray(width: int, height: int, gray: np.ndarray,
                     quality: int = 50) -> bytes:
    """Baseline JFIF encode of an (h, w) uint8 grayscale image: level shift,
    orthonormal forward DCT per 8x8 block, integer coefficient snap (rint),
    round-half-away quantization, zigzag, differential-DC + run-length-AC
    Huffman coding with the Annex-K tables, 0xFF stuffing, real markers.
    Width/height must be multiples of 8 (production encoders edge-pad;
    fixtures guarantee alignment)."""
    if width % 8 or height % 8:
        raise ValueError("width/height must be multiples of 8")
    if gray.shape != (height, width):
        raise ValueError(f"gray shape {gray.shape} != ({height}, {width})")
    q = jpeg_scaled_quant(quality)
    dc_tab = _huff_encode_table(JPEG_DC_BITS, JPEG_DC_VALS)
    ac_tab = _huff_encode_table(JPEG_AC_BITS, JPEG_AC_VALS)
    bw = _BitWriter()
    pred = 0
    px = gray.astype(np.float64) - 128.0
    # Batched transform half (r17): DCT + quantize + zigzag for EVERY
    # block in three numpy calls instead of per-block Python. Block
    # order (by-major, bx-minor) and float evaluation order
    # ((B @ block) @ B.T, rint, then integer quantization) are identical
    # to the old per-block loop — np.matmul broadcasts the same 2-D
    # kernel over the stacked blocks — so the bitstream is bit-for-bit
    # unchanged (pinned against a pre-change snapshot and the DuckDB
    # closed-form oracle). Entropy coding stays sequential by spec
    # (differential DC chains through the scan).
    blocks = (px.reshape(height // 8, 8, width // 8, 8)
              .swapaxes(1, 2).reshape(-1, 8, 8))
    coef = np.rint(np.matmul(np.matmul(_DCT_BASIS, blocks),
                             _DCT_BASIS.T)).astype(np.int64)
    zzs = _quantize_rha(coef, q)[:, _ZZ_R, _ZZ_C].tolist()
    for zz in zzs:
        pred = _encode_zz(bw, zz, pred, dc_tab, ac_tab)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, 2 + len(payload)) + payload

    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0))
    dqt = seg(0xFFDB, b"\x00" + bytes(int(q[r, c]) for r, c in JPEG_ZIGZAG))
    sof0 = seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1)
               + struct.pack(">BBB", 1, 0x11, 0))
    dht = (seg(0xFFC4, b"\x00" + bytes(JPEG_DC_BITS) + bytes(JPEG_DC_VALS))
           + seg(0xFFC4, b"\x10" + bytes(JPEG_AC_BITS) + bytes(JPEG_AC_VALS)))
    sos = seg(0xFFDA, struct.pack(">BBBBBB", 1, 1, 0x00, 0, 63, 0))
    return (b"\xFF\xD8" + app0 + dqt + sof0 + dht + sos
            + bytes(bw.out) + b"\xFF\xD9")


def build_jpeg_flat_blocks(seed: int, quality: int = 50) -> bytes:
    """The oracle-replayable JPEG fixture: a 64x64 grayscale image whose
    8x8 DCT blocks are each a constant from the closed-form byte mixer
    (block b=by*8+bx has value _mix_bytes-style (b*2654435761 + seed*97 +
    13) % 256). Block-flat content makes every AC coefficient exactly zero
    and the DC round-trip pure integer arithmetic — while the encoder and
    decoder still run the full general pipeline over real entropy-coded
    bytes."""
    vals = _mix_bytes(64, seed).reshape(8, 8)
    gray = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    return encode_jpeg_gray(64, 64, gray, quality)


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy data."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if not self._nbits:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream exhausted")
            self._acc = self.data[self.pos]
            self.pos += 1
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decode_table(bits: list, vals: list) -> dict:
    """(length, code) -> symbol, canonical-code rebuild from a DHT segment."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def parse_jpeg_segments(data: bytes) -> dict:
    """Marker walk. Returns quant table (natural order), huffman tables,
    dims, and the de-stuffed entropy-coded bytes."""
    b = bytes(data)
    if b[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG: missing SOI")
    info: dict = {"huff": {}}
    off = 2
    while off + 4 <= len(b):
        if b[off] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = (b[off] << 8) | b[off + 1]
        (length,) = struct.unpack(">H", b[off + 2:off + 4])
        if off + 2 + length > len(b):
            raise ValueError("truncated JPEG segment")
        body = b[off + 4:off + 2 + length]
        if marker == 0xFFDB:
            # A DQT segment may pack several tables back to back
            # (T.81 B.2.4.1); loop until the body is exhausted.
            p = 0
            while p < len(body):
                pq_tq = body[p]
                if pq_tq >> 4:
                    raise ValueError("only 8-bit quant tables supported")
                if p + 65 > len(body):
                    raise ValueError("truncated DQT table")
                q = np.zeros((8, 8), dtype=np.int64)
                for k, (r, c) in enumerate(JPEG_ZIGZAG):
                    q[r, c] = body[p + 1 + k]
                info.setdefault("quant_tables", {})[pq_tq & 0x0F] = q
                if pq_tq & 0x0F == 0:
                    info["quant"] = q
                p += 65
        elif marker == 0xFFC0:
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8 or ncomp not in (1, 3):
                raise ValueError(
                    "only 8-bit 1- or 3-component baseline supported")
            info["width"], info["height"] = w, h
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = struct.unpack(
                    ">BBB", body[6 + 3 * ci:9 + 3 * ci])
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            info["components"] = comps
        elif marker == 0xFFC4:
            # A DHT segment may pack several tables (T.81 B.2.4.2).
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1:p + 17])
                if len(bits) < 16 or p + 17 + sum(bits) > len(body):
                    raise ValueError("truncated DHT table")
                vals = list(body[p + 17:p + 17 + sum(bits)])
                info["huff"][(tc, th)] = _huff_decode_table(bits, vals)
                p += 17 + sum(bits)
        elif marker == 0xFFDD or 0xFFD0 <= marker <= 0xFFD7:
            # Restart intervals move RSTn markers into the entropy
            # stream; this decoder does not resync on them. Raise here
            # rather than lose marker sync and mis-decode.
            raise ValueError("JPEG restart markers (DRI/RSTn) unsupported")
        elif marker == 0xFFDA:
            # entropy data runs from after this header to EOI; de-stuff
            scan_start = off + 2 + length
            end = b.rfind(b"\xFF\xD9")
            if end < 0:
                raise ValueError("JPEG missing EOI")
            info["scan"] = b[scan_start:end].replace(b"\xFF\x00", b"\xFF")
            return info
        off += 2 + length
    raise ValueError("JPEG missing SOS")


def parse_jpeg_header(data: bytes) -> tuple[int, int, int]:
    """(width, height, q00) without entropy decode — the cheap metadata
    read (q00 is the scaled DC quantizer, the quality fingerprint)."""
    info = parse_jpeg_segments(data)
    if "width" not in info or "quant" not in info:
        raise ValueError("JPEG missing SOF0/DQT")
    return info["width"], info["height"], int(info["quant"][0, 0])


def decode_jpeg_gray(data: bytes) -> tuple[int, int, np.ndarray]:
    """Full baseline decode: marker parse, DHT canonical-code rebuild,
    bit-level Huffman entropy decode (differential DC, run-length AC with
    ZRL/EOB), dezigzag, dequantize, orthonormal IDCT, +128 level shift,
    floor(x+0.5) snap, clamp to [0, 255]. Returns (width, height, uint8
    array shaped (h, w))."""
    info = parse_jpeg_segments(data)
    if len(info.get("components", [(1, 1, 1, 0)])) != 1:
        raise ValueError("decode_jpeg_gray needs a single-component scan"
                         " (use decode_jpeg_color420 for 4:2:0 color)")
    w, h, q = info["width"], info["height"], info["quant"]
    dc_tab, ac_tab = info["huff"][(0, 0)], info["huff"][(1, 0)]
    br = _BitReader(info["scan"])
    # Sequential entropy half (differential DC chains through the scan),
    # then ONE batched dequantize + IDCT + snap over every block (r17):
    # the old loop paid a 64-iteration Python dezigzag, an 8x8 matmul
    # pair, and a clip PER BLOCK — 40% of decode time in _decode_block
    # Python overhead (cProfile). Per-slice float evaluation order is
    # unchanged ((B.T @ coef) @ B), so pixels are bit-identical (pinned
    # against a pre-change snapshot and the closed-form oracle).
    n = (h // 8) * (w // 8)
    zz_rows = []
    pred = 0
    for _ in range(n):
        zz, pred = _decode_zz(br, dc_tab, ac_tab, pred)
        zz_rows.append(zz)
    coef = np.zeros((n, 8, 8), dtype=np.float64)
    coef[:, _ZZ_R, _ZZ_C] = np.asarray(zz_rows, dtype=np.int64) * q[_ZZ_R, _ZZ_C]
    blocks = np.matmul(np.matmul(_DCT_BASIS.T, coef), _DCT_BASIS)
    px = np.clip(np.floor(blocks + 128.5), 0, 255).astype(np.uint8)
    out = (px.reshape(h // 8, w // 8, 8, 8)
           .swapaxes(1, 2).reshape(h, w))
    return w, h, out


def _decode_zz(br: "_BitReader", dc_tab: dict, ac_tab: dict,
               pred: int) -> tuple[list, int]:
    """Entropy-decode one block's zigzagged coefficients (python ints).
    Returns (zz list, new DC predictor) — the sequential half shared by
    the batched grayscale decoder and the per-block 4:2:0 decoder."""
    zz = [0] * 64
    cat = _read_symbol(br, dc_tab)
    pred += _extend(br.read_bits(cat), cat)
    zz[0] = pred
    k = 1
    while k < 64:
        sym = _read_symbol(br, ac_tab)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        k += sym >> 4
        if k > 63:
            raise ValueError("JPEG AC run overflows block")
        zz[k] = _extend(br.read_bits(sym & 0x0F), sym & 0x0F)
        k += 1
    return zz, pred


def _decode_block(br: "_BitReader", dc_tab: dict, ac_tab: dict,
                  pred: int, q: np.ndarray) -> tuple[np.ndarray, int]:
    """Entropy-decode, dequantize, and inverse-DCT one 8x8 block.
    Returns (uint8 pixel block, new DC predictor). Used by the 4:2:0
    interleaved decoder; the grayscale decoder batches the transform
    half (r17) and shares only :func:`_decode_zz`."""
    zz, pred = _decode_zz(br, dc_tab, ac_tab, pred)
    coef = np.zeros((8, 8), dtype=np.float64)
    for kk, (r, c) in enumerate(JPEG_ZIGZAG):
        coef[r, c] = zz[kk] * q[r, c]
    block = _DCT_BASIS.T @ coef @ _DCT_BASIS
    return np.clip(np.floor(block + 128.5), 0, 255).astype(np.uint8), pred


def encode_jpeg_color420(width: int, height: int, y: np.ndarray,
                         cb: np.ndarray, cr: np.ndarray,
                         quality: int = 50) -> bytes:
    """Baseline JFIF 4:2:0 color encode from pre-subsampled planes:
    Y is (h, w) uint8, Cb/Cr are (h/2, w/2) uint8 (the caller supplies
    YCbCr directly — the color transform is an input-space choice, the
    codec machinery under test here is the INTERLEAVING: per 16x16 MCU,
    four Y blocks then one Cb then one Cr, each component with its OWN
    DC predictor, luma quantized by the Annex-K.1 table and chroma by
    K.2). Width/height must be multiples of 16 so every MCU is full."""
    if width % 16 or height % 16:
        raise ValueError("width/height must be multiples of 16 for 4:2:0")
    if y.shape != (height, width):
        raise ValueError(f"y shape {y.shape} != ({height}, {width})")
    if cb.shape != (height // 2, width // 2) or cr.shape != cb.shape:
        raise ValueError("cb/cr must be the half-resolution planes")
    ql = jpeg_scaled_quant(quality)
    qc = jpeg_scaled_quant_chroma(quality)
    dc_tab = _huff_encode_table(JPEG_DC_BITS, JPEG_DC_VALS)
    ac_tab = _huff_encode_table(JPEG_AC_BITS, JPEG_AC_VALS)
    bw = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}
    yf = y.astype(np.float64) - 128.0
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    for my in range(height // 16):
        for mx in range(width // 16):
            for dy in range(2):
                for dx in range(2):
                    r0, c0 = my * 16 + dy * 8, mx * 16 + dx * 8
                    preds[1] = _encode_block(
                        bw, yf[r0:r0 + 8, c0:c0 + 8], ql,
                        preds[1], dc_tab, ac_tab)
            r0, c0 = my * 8, mx * 8
            preds[2] = _encode_block(bw, cbf[r0:r0 + 8, c0:c0 + 8], qc,
                                     preds[2], dc_tab, ac_tab)
            preds[3] = _encode_block(bw, crf[r0:r0 + 8, c0:c0 + 8], qc,
                                     preds[3], dc_tab, ac_tab)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, 2 + len(payload)) + payload

    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0))
    dqt = (seg(0xFFDB, b"\x00" + bytes(int(ql[r, c]) for r, c in JPEG_ZIGZAG))
           + seg(0xFFDB, b"\x01" + bytes(int(qc[r, c]) for r, c in JPEG_ZIGZAG)))
    sof0 = seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 3)
               + struct.pack(">BBB", 1, 0x22, 0)
               + struct.pack(">BBB", 2, 0x11, 1)
               + struct.pack(">BBB", 3, 0x11, 1))
    dht = (seg(0xFFC4, b"\x00" + bytes(JPEG_DC_BITS) + bytes(JPEG_DC_VALS))
           + seg(0xFFC4, b"\x10" + bytes(JPEG_AC_BITS) + bytes(JPEG_AC_VALS)))
    sos = seg(0xFFDA, struct.pack(">B", 3)
              + struct.pack(">BB", 1, 0x00)
              + struct.pack(">BB", 2, 0x00)
              + struct.pack(">BB", 3, 0x00)
              + struct.pack(">BBB", 0, 63, 0))
    return (b"\xFF\xD8" + app0 + dqt + sof0 + dht + sos
            + bytes(bw.out) + b"\xFF\xD9")


def decode_jpeg_color420(data: bytes) -> tuple[int, int, np.ndarray,
                                               np.ndarray, np.ndarray]:
    """Full baseline 4:2:0 decode: marker walk, per-component quant
    table lookup, interleaved-MCU entropy decode with per-component DC
    predictors, dequantize, IDCT, clamp. Returns (width, height,
    y (h,w), cb (h/2,w/2), cr (h/2,w/2))."""
    info = parse_jpeg_segments(data)
    comps = info.get("components")
    if not comps or len(comps) != 3:
        raise ValueError("decode_jpeg_color420 needs a 3-component scan")
    (yid, yh, yv, ytq), (cbid, cbh, cbv, cbtq), (crid, crh, crv, crtq) = comps
    if (yh, yv, cbh, cbv, crh, crv) != (2, 2, 1, 1, 1, 1):
        raise ValueError("only 4:2:0 sampling supported")
    w, h = info["width"], info["height"]
    if w % 16 or h % 16:
        raise ValueError("4:2:0 decode requires full MCUs")
    ql = info["quant_tables"][ytq]
    qc = info["quant_tables"][cbtq]
    dc_tab, ac_tab = info["huff"][(0, 0)], info["huff"][(1, 0)]
    br = _BitReader(info["scan"])
    y = np.zeros((h, w), dtype=np.uint8)
    cb = np.zeros((h // 2, w // 2), dtype=np.uint8)
    cr = np.zeros((h // 2, w // 2), dtype=np.uint8)
    preds = {1: 0, 2: 0, 3: 0}
    for my in range(h // 16):
        for mx in range(w // 16):
            for dy in range(2):
                for dx in range(2):
                    blk, preds[1] = _decode_block(br, dc_tab, ac_tab,
                                                  preds[1], ql)
                    r0, c0 = my * 16 + dy * 8, mx * 16 + dx * 8
                    y[r0:r0 + 8, c0:c0 + 8] = blk
            blk, preds[2] = _decode_block(br, dc_tab, ac_tab, preds[2], qc)
            cb[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = blk
            blk, preds[3] = _decode_block(br, dc_tab, ac_tab, preds[3], qc)
            cr[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = blk
    return w, h, y, cb, cr


def build_jpeg420_flat_blocks(seed: int, quality: int = 50) -> bytes:
    """The oracle-replayable 4:2:0 fixture: a 32x32 YCbCr image whose Y
    plane is 8x8-block-flat (16 blocks from the byte mixer, seed) and
    whose half-resolution Cb/Cr planes are 8x8-block-flat too (4 blocks
    each, seeds 7*seed+1 / 7*seed+2) — every AC coefficient is exactly
    zero in all three components, so the whole round-trip is the same
    closed-form DC integer arithmetic as the grayscale fixture, but the
    entropy stream now exercises REAL interleaving: 4-Y-1-Cb-1-Cr MCU
    order with three independent DC predictor chains and two quant
    tables."""
    yv = _mix_bytes(16, seed).reshape(4, 4)
    cbv = _mix_bytes(4, seed * 7 + 1).reshape(2, 2)
    crv = _mix_bytes(4, seed * 7 + 2).reshape(2, 2)
    y = np.repeat(np.repeat(yv, 8, 0), 8, 1)
    cb = np.repeat(np.repeat(cbv, 8, 0), 8, 1)
    cr = np.repeat(np.repeat(crv, 8, 0), 8, 1)
    return encode_jpeg_color420(32, 32, y, cb, cr, quality)
