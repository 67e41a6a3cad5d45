#!/usr/bin/env python3
"""Regenerate oracle/jpeg_progressive_golden.parquet: expected payload md5
and decoded-pixel statistics for x_mm_jpeg_progressive, computed by an
INDEPENDENT pure-Python implementation of the same fixed-point integer
PROGRESSIVE JPEG graft's JpegEncode(progressive=true)/JpegPixelStats
perform. The frame parameters, raster, fDCT, quantization and Huffman
tables are identical to make_jpeg_golden.py (same Annex K everything);
only the entropy layer differs — SOF2 with the classic six-scan
successive-approximation script:

  1. DC first    Ss=0 Se=0  Ah=0 Al=1   (DPCM of dc >> 1)
  2. AC first    Ss=1 Se=5  Ah=0 Al=2   (|ac| >> 2, sign reapplied)
  3. AC first    Ss=6 Se=63 Ah=0 Al=2
  4. AC refine   Ss=1 Se=63 Ah=2 Al=1
  5. DC refine   Ss=0 Se=0  Ah=1 Al=0   (raw low bit)
  6. AC refine   Ss=1 Se=63 Ah=1 Al=0

Refinement bit ORDER follows the T.81 G.1.2.3 decode traversal: after each
ZRL / run-length symbol the stream carries exactly the correction bits the
decoder reads while honoring that symbol, and the per-block EOB0 is
followed by the band tail's correction bits. All refinements complete, so
the decoded raster — and therefore every pixel statistic — is IDENTICAL to
the baseline golden's; only the payload bytes (and md5) differ. Keyed by
md5(doc_id:md5(text)) so one golden serves all three SFs.

Run whenever /root/testdata regenerates:
    python3 tools/make_jpeg_progressive_golden.py
"""
import binascii
import hashlib
import os

import duckdb
import pandas as pd

from make_jpeg_golden import (A, QLUM, ZIGZAG, DC_CODES, AC_CODES,
                              BitWriter, bit_size, fdct_quant, idct,
                              round_half_up)

SFS = ("sf0.001", "sf0.01", "sf0.1")
OUT = os.path.join(os.path.dirname(__file__), "..", "oracle",
                   "jpeg_progressive_golden.parquet")


def quant_blocks(text_bytes, w, h):
    """-> (list of 64-int blocks in ZIGZAG order, decoded pixel mean)."""
    raster = ([text_bytes[i % len(text_bytes)] for i in range(w * h)]
              if text_bytes else [128] * (w * h))
    bw8, bh8 = (w + 7) // 8, (h + 7) // 8
    blocks = []
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
            blocks.append([q[ZIGZAG[k]] for k in range(64)])
            px = idct(q)
            for y in range(8):
                if by * 8 + y >= h:
                    continue
                for x in range(8):
                    if bx * 8 + x < w:
                        pixel_sum += px[y * 8 + x]
    return blocks, pixel_sum / (w * h)


def encode_progressive(text_bytes, w, h):
    blocks, mean = quant_blocks(text_bytes, w, h)
    out = bytearray()

    def be16(v):
        out.extend((v >> 8, v & 0xFF))

    def marker(m):
        out.extend((0xFF, m))

    def sos(ss, se, ah, al):
        marker(0xDA)
        be16(8)
        out.extend((1, 1, 0x00, ss, se, (ah << 4) | al))

    marker(0xD8)
    marker(0xDB)
    be16(2 + 1 + 64)
    out.append(0x00)
    out.extend(QLUM[ZIGZAG[i]] for i in range(64))
    marker(0xC2)  # SOF2: progressive
    be16(8 + 3)
    out.append(8)
    be16(h)
    be16(w)
    out.append(1)
    out.extend((1, 0x11, 0))
    from make_jpeg_golden import DC_BITS, DC_VALS, AC_BITS, AC_VALS
    for cls, bits, vals in ((0, DC_BITS, DC_VALS), (1, AC_BITS, AC_VALS)):
        marker(0xC4)
        be16(2 + 1 + 16 + len(vals))
        out.append(cls << 4)
        out.extend(bits)
        out.extend(vals)

    def dc_first(al):
        sos(0, 0, 0, al)
        bw = BitWriter()
        prev = 0
        for zq in blocks:
            v = zq[0] >> al  # arithmetic shift (Python >> floors: same)
            diff = v - prev
            prev = v
            s = bit_size(diff)
            c, ln = DC_CODES[s]
            bw.put(c, ln)
            if s:
                bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        bw.flush_ones()
        out.extend(bw.out)

    def dc_refine(al):
        sos(0, 0, al + 1, al)
        bw = BitWriter()
        for zq in blocks:
            bw.put((zq[0] >> al) & 1, 1)
        bw.flush_ones()
        out.extend(bw.out)

    def ac_first(ss, se, al):
        sos(ss, se, 0, al)
        bw = BitWriter()
        for zq in blocks:
            run = 0
            for k in range(ss, se + 1):
                v = zq[k]
                mag = abs(v) >> al  # divide-toward-zero point transform
                if mag == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = AC_CODES[0xF0]
                    bw.put(c, ln)
                    run -= 16
                s = bit_size(mag)
                c, ln = AC_CODES[(run << 4) | s]
                bw.put(c, ln)
                sv = mag if v >= 0 else -mag
                bw.put(sv if sv >= 0 else sv + (1 << s) - 1, s)
                run = 0
            if run:
                c, ln = AC_CODES[0x00]
                bw.put(c, ln)
        bw.flush_ones()
        out.extend(bw.out)

    def ac_refine(ss, se, ah, al):
        sos(ss, se, ah, al)
        bw = BitWriter()
        for zq in blocks:
            def temp(k):
                return abs(zq[k]) >> al

            c_pos = ss  # decode-traversal cursor
            for kn in range(ss, se + 1):
                if temp(kn) != 1:
                    continue
                r = sum(1 for t in range(c_pos, kn) if temp(t) == 0)
                while r > 15:
                    c, ln = AC_CODES[0xF0]
                    bw.put(c, ln)
                    left = 16
                    while left:
                        t2 = temp(c_pos)
                        if t2 > 1:
                            bw.put(t2 & 1, 1)
                        else:
                            left -= 1
                        c_pos += 1
                    r -= 16
                c, ln = AC_CODES[(r << 4) | 1]
                bw.put(c, ln)
                bw.put(0 if zq[kn] < 0 else 1, 1)
                while c_pos < kn:
                    t2 = temp(c_pos)
                    if t2 > 1:
                        bw.put(t2 & 1, 1)
                    c_pos += 1
                c_pos = kn + 1
            if c_pos <= se:
                c, ln = AC_CODES[0x00]
                bw.put(c, ln)
                while c_pos <= se:
                    t2 = temp(c_pos)
                    if t2 > 1:
                        bw.put(t2 & 1, 1)
                    c_pos += 1
        bw.flush_ones()
        out.extend(bw.out)

    dc_first(1)
    ac_first(1, 5, 2)
    ac_first(6, 63, 2)
    ac_refine(1, 63, 2, 1)
    dc_refine(0)
    ac_refine(1, 63, 1, 0)
    marker(0xD9)
    return bytes(out), mean


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
            jpg, mean = encode_progressive(tb, w, h)
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
