#!/usr/bin/env python3
"""Regenerate oracle/jpeg_pixels_golden.parquet: expected payload md5 and
decoded-pixel statistics for x_mm_jpeg_pixels, computed by an INDEPENDENT
pure-Python implementation of the same fixed-point integer baseline JPEG
graft's JpegEncode/JpegPixelStats perform:

  width  = doc_id % 16 + 4
  height = (doc_id * 3) % 16 + 4
  raster = UTF-8 text bytes cycled to width*height (128s if empty)
  fDCT   = orthonormal DCT-II matrix scaled 2^14 (literal table), one
           floor-division descale by 2^28 with +2^27 rounding
  quant  = Annex K luminance table, (coef + q//2) // q
  entropy= Annex K DC/AC luminance Huffman, DPCM DC, RLE AC, 0xFF stuffing
  markers= SOI DQT SOF0 DHT DHT SOS ... EOI (grayscale, no JFIF segment)

Every rounding step is floor division after adding half — identical to the
JVM's Math.floorDiv — so the emitted bytes match bit-for-bit. The decoded
mean replays dequant + the transposed integer IDCT + clamp over the
cropped raster (the JVM side's Huffman DECODER is covered by the byte-
exact md5 plus its ImageIO interop spec). jpeg_md5 hashes the UPPERCASE-
HEX payload rendering (DuckDB md5 is varchar-only). Keyed by
md5(doc_id:md5(text)) so one golden serves all three SFs.

Run whenever /root/testdata regenerates:
    python3 tools/make_jpeg_golden.py
"""
import binascii
import decimal
import hashlib
import os

import duckdb
import pandas as pd

SFS = ("sf0.001", "sf0.01", "sf0.1")
OUT = os.path.join(os.path.dirname(__file__), "..", "oracle",
                   "jpeg_pixels_golden.parquet")

# orthonormal DCT-II basis scaled by 2^14 (same literals as JpegCodec.A)
A = [
    [5793, 5793, 5793, 5793, 5793, 5793, 5793, 5793],
    [8035, 6811, 4551, 1598, -1598, -4551, -6811, -8035],
    [7568, 3135, -3135, -7568, -7568, -3135, 3135, 7568],
    [6811, -1598, -8035, -4551, 4551, 8035, 1598, -6811],
    [5793, -5793, -5793, 5793, 5793, -5793, -5793, 5793],
    [4551, -8035, 1598, 6811, -6811, -1598, 8035, -4551],
    [3135, -7568, 7568, -3135, -3135, 7568, -7568, 3135],
    [1598, -4551, 6811, -8035, 8035, -6811, 4551, -1598],
]

QLUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
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
]


def build_codes(bits, vals):
    table = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return table


DC_CODES = build_codes(DC_BITS, DC_VALS)
AC_CODES = build_codes(AC_BITS, AC_VALS)


def descale(x, s):
    # floor division after adding half — identical to Java's Math.floorDiv
    return (x + (1 << (s - 1))) // (1 << s)


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush_ones(self):
        while self.n:
            self.put(1, 1)


def bit_size(v):
    return abs(v).bit_length()


def fdct_quant(block):
    """block: 64 level-shifted ints row-major -> quantized 64 ints."""
    tmp = [0] * 64
    for v in range(8):
        for x in range(8):
            tmp[v * 8 + x] = sum(A[v][y] * block[y * 8 + x] for y in range(8))
    q = [0] * 64
    for v in range(8):
        for u in range(8):
            s = sum(tmp[v * 8 + x] * A[u][x] for x in range(8))
            coef = descale(s, 28)
            qv = QLUM[v * 8 + u]
            q[v * 8 + u] = (coef + qv // 2) // qv
    return q


def idct(q):
    """quantized 64 ints -> 64 clamped pixels row-major (dequant + IDCT)."""
    F = [q[i] * QLUM[i] for i in range(64)]
    tmp = [0] * 64
    for y in range(8):
        for u in range(8):
            tmp[y * 8 + u] = sum(A[v][y] * F[v * 8 + u] for v in range(8))
    px = [0] * 64
    for y in range(8):
        for x in range(8):
            s = sum(tmp[y * 8 + u] * A[u][x] for u in range(8))
            p = descale(s, 28) + 128
            px[y * 8 + x] = max(0, min(255, p))
    return px


def encode_and_decode(text_bytes, w, h):
    """-> (jpeg bytes, decoded mean over cropped w*h raster)."""
    raster = ([text_bytes[i % len(text_bytes)] for i in range(w * h)]
              if text_bytes else [128] * (w * h))
    out = bytearray()

    def be16(v):
        out.extend((v >> 8, v & 0xFF))

    def marker(m):
        out.extend((0xFF, m))

    marker(0xD8)
    marker(0xDB)
    be16(2 + 1 + 64)
    out.append(0x00)
    out.extend(QLUM[ZIGZAG[i]] for i in range(64))
    marker(0xC0)
    be16(8 + 3)
    out.append(8)
    be16(h)
    be16(w)
    out.append(1)
    out.extend((1, 0x11, 0))
    for cls, bits, vals in ((0, DC_BITS, DC_VALS), (1, AC_BITS, AC_VALS)):
        marker(0xC4)
        be16(2 + 1 + 16 + len(vals))
        out.append(cls << 4)
        out.extend(bits)
        out.extend(vals)
    marker(0xDA)
    be16(6 + 2)
    out.extend((1, 1, 0x00, 0, 63, 0))

    bw = BitWriter()
    bw8, bh8 = (w + 7) // 8, (h + 7) // 8
    prev_dc = 0
    pixel_sum = 0
    for by in range(bh8):
        for bx in range(bw8):
            block = [0] * 64
            for y in range(8):
                sy = min(by * 8 + y, h - 1)
                for x in range(8):
                    sx = min(bx * 8 + x, w - 1)
                    block[y * 8 + x] = raster[sy * w + sx] - 128
            q = fdct_quant(block)
            diff = q[0] - prev_dc
            prev_dc = q[0]
            s = bit_size(diff)
            c, ln = DC_CODES[s]
            bw.put(c, ln)
            if s:
                bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
            run = 0
            for k in range(1, 64):
                ac = q[ZIGZAG[k]]
                if ac == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = AC_CODES[0xF0]
                    bw.put(c, ln)
                    run -= 16
                s = bit_size(ac)
                c, ln = AC_CODES[(run << 4) | s]
                bw.put(c, ln)
                bw.put(ac if ac >= 0 else ac + (1 << s) - 1, s)
                run = 0
            if run:
                c, ln = AC_CODES[0x00]
                bw.put(c, ln)
            # decode side: dequant + IDCT, accumulate the cropped pixels
            px = idct(q)
            for y in range(8):
                py = by * 8 + y
                if py >= h:
                    continue
                for x in range(8):
                    if bx * 8 + x < w:
                        pixel_sum += px[y * 8 + x]
    bw.flush_ones()
    out.extend(bw.out)
    marker(0xD9)
    return bytes(out), pixel_sum / (w * h)


def round_half_up(x, nd=0):
    return float(decimal.Decimal(repr(x)).quantize(
        decimal.Decimal(1).scaleb(-nd), rounding=decimal.ROUND_HALF_UP))


def main():
    rows = {}
    for sf in SFS:
        df = duckdb.sql(
            f"SELECT doc_id, text FROM '/root/testdata/{sf}/documents.parquet'").df()
        for doc_id, t in zip(df.doc_id, df.text):
            if t is None:
                continue
            tb = t.encode("utf-8")
            key = hashlib.md5(
                (str(doc_id) + ":" + hashlib.md5(tb).hexdigest()).encode()
            ).hexdigest()
            if key in rows:
                continue
            w = int(doc_id) % 16 + 4
            h = (int(doc_id) * 3) % 16 + 4
            jpg, mean = encode_and_decode(tb, w, h)
            rows[key] = dict(
                key=key,
                jpeg_md5=hashlib.md5(
                    binascii.hexlify(jpg).upper()).hexdigest(),
                width=w, height=h, n_pixels=w * h,
                mean_gray_micro=int(round_half_up(mean * 1e4)))
    out = pd.DataFrame(list(rows.values()))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    out.to_parquet(OUT, index=False)
    print(f"wrote {len(out)} rows -> {OUT}")


if __name__ == "__main__":
    main()
