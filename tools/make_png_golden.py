#!/usr/bin/env python3
"""Regenerate oracle/png_pixels_golden.parquet: expected payload md5 and
pixel statistics for x_mm_png_pixels, computed by an INDEPENDENT Python
implementation of the same construction graft's PngEncode performs:

  width  = doc_id % 16 + 4
  height = (doc_id * 3) % 16 + 4
  color  = [0 gray, 2 RGB, 6 RGBA][doc_id % 3]   (8-bit, non-interlaced)
  raster = UTF-8 text bytes cycled to width*height*bpp (zeros if empty)
  filter = row % 5 (None/Sub/Up/Average/Paeth per the PNG spec)
  IDAT   = one zlib stream, level 6 (the same public zlib the JVM wraps)
  CRCs   = real CRC32 over tag+data for every chunk

png_md5 hashes the UPPERCASE-HEX rendering of the payload (DuckDB's md5 is
varchar-only; Spark mirrors with md5(hex(payload))). Pixel means are exact
integer byte sums over the PRE-filter raster divided once, published in
1e-4 micro-units (decimal half-up on the shortest repr — Spark round()'s
convention). Keyed by md5(doc_id:md5(text)) so one golden file serves all
three SFs.

Run whenever /root/testdata regenerates:
    python3 tools/make_png_golden.py
"""
import binascii
import decimal
import hashlib
import os
import struct
import zlib

import duckdb
import pandas as pd

SFS = ("sf0.001", "sf0.01", "sf0.1")
OUT = os.path.join(os.path.dirname(__file__), "..", "oracle",
                   "png_pixels_golden.parquet")


def round_half_up(x, nd=0):
    return float(decimal.Decimal(repr(x)).quantize(
        decimal.Decimal(1).scaleb(-nd), rounding=decimal.ROUND_HALF_UP))


def paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def chunk(tag, data):
    return (struct.pack(">I", len(data)) + tag + data +
            struct.pack(">I", binascii.crc32(tag + data) & 0xFFFFFFFF))


def build_png(text_bytes, w, h, color_type):
    bpp = {0: 1, 2: 3, 6: 4}[color_type]
    stride = w * bpp
    if text_bytes:
        raster = bytes(text_bytes[i % len(text_bytes)]
                       for i in range(h * stride))
    else:
        raster = bytes(h * stride)
    filtered = bytearray()
    for r in range(h):
        ft = r % 5
        filtered.append(ft)
        for i in range(stride):
            raw = raster[r * stride + i]
            a = raster[r * stride + i - bpp] if i >= bpp else 0
            b = raster[(r - 1) * stride + i] if r > 0 else 0
            c = raster[(r - 1) * stride + i - bpp] if r > 0 and i >= bpp else 0
            pred = (0, a, b, (a + b) // 2, paeth(a, b, c))[ft]
            filtered.append((raw - pred) & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
           chunk(b"IDAT", zlib.compress(bytes(filtered), 6)) +
           chunk(b"IEND", b""))
    return png, raster, bpp


def main():
    rows = {}
    for sf in SFS:
        df = duckdb.sql(
            f"SELECT doc_id, text FROM '/root/testdata/{sf}/documents.parquet'").df()
        for doc_id, t in zip(df.doc_id, df.text):
            if t is None:
                continue  # packPng emits NULL payload; join drops it -> loud
            tb = t.encode("utf-8")
            key = hashlib.md5(
                (str(doc_id) + ":" + hashlib.md5(tb).hexdigest()).encode()
            ).hexdigest()
            if key in rows:
                continue
            w = int(doc_id) % 16 + 4
            h = (int(doc_id) * 3) % 16 + 4
            ct = (0, 2, 6)[int(doc_id) % 3]
            png, raster, bpp = build_png(tb, w, h, ct)
            n_pix = w * h
            if ct == 0:
                s = sum(raster)
                sums = (s, s, s)
            else:
                sums = tuple(sum(raster[ch::bpp]) for ch in range(3))
            rows[key] = dict(
                key=key,
                png_md5=hashlib.md5(
                    binascii.hexlify(png).upper()).hexdigest(),
                width=w, height=h, color_type=ct, n_pixels=n_pix,
                mean_r_micro=int(round_half_up(sums[0] / n_pix * 1e4)),
                mean_g_micro=int(round_half_up(sums[1] / n_pix * 1e4)),
                mean_b_micro=int(round_half_up(sums[2] / n_pix * 1e4)))
    out = pd.DataFrame(list(rows.values()))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    out.to_parquet(OUT, index=False)
    print(f"wrote {len(out)} rows -> {OUT}")


if __name__ == "__main__":
    main()
