#!/usr/bin/env python
"""Generate the T.81 conformance fixture embedded in
tests/test_multimodal.py::TestJpegConformance::test_spec_table_fixture_decode.

Provenance: this script deliberately imports NOTHING from the engine —
every constant is transcribed from the ITU-T T.81 spec text (Annex K.1
luminance quantization table, Annex K.3.1/K.3.2 Huffman BITS/HUFFVAL,
Figure A.6 zigzag) and the byte stream is assembled with its own
bit-packer. The engine's decoder (operators/media_codec.py:
decode_jpeg_gray) must reproduce the expected pixels bit-exactly. This
replaces the env-gated Pillow interop test as the CI-visible
conformance check (VERDICT r13 item 9): the sandbox has no libjpeg, so
the external stream is spec-transcribed rather than libjpeg-emitted —
still independent of the encoder under test, and pointedly containing
AC coefficients at asymmetric zigzag positions ((0,1) vs (1,0)), which
a transposed-zigzag decoder (the pre-r13 bug class) places at the wrong
frequency and fails.

Run: python tests/fixtures/gen_t81_conformance.py
Prints the fixture hex and the expected 16x16 pixel array.
"""

import numpy as np

# T.81 Annex K.1 — luminance quantization table, natural (row-major) order.
QUANT = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)

# T.81 Annex K.3.1 — luminance DC: BITS then HUFFVAL.
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# T.81 Annex K.3.2 — luminance AC: BITS then HUFFVAL.
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
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

# T.81 Figure A.6 — zigzag index k -> natural position r*8+c.
ZIGZAG_FLAT = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# The four 8x8 blocks of a 16x16 image, as QUANTIZED coefficients in
# ZIGZAG order (index -> value). Designed stress points:
#  block 0: AC at zigzag 1 = natural (0,1) — a transposed-zigzag decoder
#           reconstructs a vertical instead of horizontal gradient;
#  block 1: AC at zigzag 2 = natural (1,0) (the mirror probe), plus a
#           >15-zero run forcing a ZRL code, and negative values;
#  block 2: all-zero (pure EOB, DC prediction carries through);
#  block 3: dense low-frequency corner including zigzag 63 tail.
BLOCKS_ZZ = [
    {0: 3, 1: -2},
    {0: -5, 2: 4, 5: 1, 40: -1},
    {},
    {0: 10, 1: 1, 2: -1, 3: 2, 4: -3, 63: 1},
]


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing, T.81 F.1.2.3
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # 1-pad, T.81 F.1.2.3


def huff(bits, vals):
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def magnitude(v):
    cat = int(abs(v)).bit_length()
    return cat, (v if v >= 0 else v + (1 << cat) - 1)


def encode_entropy():
    dc_tab, ac_tab = huff(DC_BITS, DC_VALS), huff(AC_BITS, AC_VALS)
    bw = BitWriter()
    pred = 0
    for zzmap in BLOCKS_ZZ:
        zz = [zzmap.get(k, 0) for k in range(64)]
        cat, bits = magnitude(zz[0] - pred)
        pred = zz[0]
        code, length = dc_tab[cat]
        bw.write(code, length)
        if cat:
            bw.write(bits, cat)
        run = 0
        last = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, last + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                zc, zl = ac_tab[0xF0]
                bw.write(zc, zl)
                run -= 16
            cat, bits = magnitude(zz[k])
            code, length = ac_tab[(run << 4) | cat]
            bw.write(code, length)
            bw.write(bits, cat)
            run = 0
        if last < 63:
            ec, el = ac_tab[0x00]
            bw.write(ec, el)
    bw.flush()
    return bytes(bw.out)


def seg(marker, payload):
    import struct
    return struct.pack(">HH", marker, 2 + len(payload)) + payload


def build():
    import struct
    app0 = seg(0xFFE0,
               b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0))
    com = seg(0xFFFE, b"T.81 Annex K conformance fixture")
    dqt = seg(0xFFDB, b"\x00" + bytes(int(QUANT.flat[ZIGZAG_FLAT[k]])
                                      for k in range(64)))
    sof0 = seg(0xFFC0, struct.pack(">BHHB", 8, 16, 16, 1)
               + struct.pack(">BBB", 1, 0x11, 0))
    # ONE combined DHT segment carrying both tables — the multi-table
    # layout real encoders emit (r12 ADVICE parse fix, now CI-pinned
    # through a committed stream, not only through a repacking test).
    dht = seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
              + b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    sos = seg(0xFFDA, struct.pack(">BBBBBB", 1, 1, 0x00, 0, 63, 0))
    return (b"\xFF\xD8" + app0 + com + dqt + sof0 + dht + sos
            + encode_entropy() + b"\xFF\xD9")


def expected_pixels():
    # T.81 A.3.3 IDCT via the orthonormal basis; final rounding is
    # round-half-up + clip, the convention decode_jpeg_gray documents.
    basis = np.array([
        [(0.5 if u else 0.5 / np.sqrt(2.0))
         * np.cos((2 * x + 1) * u * np.pi / 16)
         for x in range(8)] for u in range(8)
    ])
    img = np.zeros((16, 16), dtype=np.uint8)
    order = [(0, 0), (0, 1), (1, 0), (1, 1)]
    for (by, bx), zzmap in zip(order, BLOCKS_ZZ):
        coef = np.zeros((8, 8), dtype=np.int64)
        for k, v in zzmap.items():
            r, c = divmod(ZIGZAG_FLAT[k], 8)
            coef[r, c] = v
        rec = basis.T @ (coef * QUANT).astype(np.float64) @ basis
        # guard against float values near the .5 rounding boundary
        frac = np.abs((rec + 128.5) - np.round(rec + 128.5))
        assert frac.min() > 1e-6, "reconstruction too close to a tie"
        img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = np.clip(
            np.floor(rec + 128.5), 0, 255).astype(np.uint8)
    return img


if __name__ == "__main__":
    data = build()
    img = expected_pixels()
    print("FIXTURE_HEX = (")
    h = data.hex()
    for i in range(0, len(h), 64):
        print(f'    "{h[i:i + 64]}"')
    print(")")
    print("EXPECTED = [")
    for row in img:
        print("    [" + ", ".join(str(int(v)) for v in row) + "],")
    print("]")
