#!/usr/bin/env python3
"""Regenerate oracle/adpcm_golden.parquet: expected payload md5 and decoded
per-frame statistics for x_mm_audio_adpcm, computed by an INDEPENDENT
pure-Python implementation of the same IMA ADPCM (WAV formatTag 0x11)
codec graft's AdpcmWavEncode/AdpcmFrameStats perform:

  samples   = the text's UTF-8 bytes read as int16 LE pairs (odd tail drops)
  blocks    = 256-byte blocks: 4-byte header (predictor = first sample
              verbatim as int16 LE, running step index, reserved 0) +
              252 nibble bytes (505 samples/block, low nibble first)
  adaptation= the public IMA step-size (89 entries) and index tables;
              encoder uses the decoder's reconstruction arithmetic so
              both sides stay in lockstep
  chunks    = RIFF / fmt(20 bytes: tag 0x11, mono, 8 kHz, cbSize=2,
              samplesPerBlock) / fact(true count) / data
  stats     = 256-sample frames over the DECODED stream: rms (HALF_UP to
              4 dp), sign zero-crossings, peak — the PcmFrameStats contract

wav_md5 hashes the UPPERCASE-HEX payload rendering (DuckDB md5 is
varchar-only). Keyed by md5(doc_id:md5(text)); one golden row per
(key, frame_idx) serves all three SFs.

Run whenever /root/testdata regenerates:
    python3 tools/make_adpcm_golden.py
"""
import binascii
import hashlib
import math
import os
import struct

import duckdb
import pandas as pd

from make_jpeg_golden import round_half_up

SFS = ("sf0.001", "sf0.01", "sf0.1")
OUT = os.path.join(os.path.dirname(__file__), "..", "oracle",
                   "adpcm_golden.parquet")

STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
INDEX_ADJUST = [-1, -1, -1, -1, 2, 4, 6, 8]
BLOCK_ALIGN = 256
SPB = (BLOCK_ALIGN - 4) * 2 + 1  # 505


def clamp_pred(v):
    return max(-32768, min(32767, v))


def clamp_idx(v):
    return max(0, min(88, v))


def encode_sample(sample, pred, idx):
    step = STEPS[idx]
    diff = sample - pred
    sign = 8 if diff < 0 else 0
    if diff < 0:
        diff = -diff
    delta = 0
    vpdiff = step >> 3
    if diff >= step:
        delta = 4
        diff -= step
        vpdiff += step
    if diff >= step >> 1:
        delta |= 2
        diff -= step >> 1
        vpdiff += step >> 1
    if diff >= step >> 2:
        delta |= 1
        vpdiff += step >> 2
    pred = clamp_pred(pred - vpdiff if sign else pred + vpdiff)
    return sign | delta, pred, clamp_idx(idx + INDEX_ADJUST[delta])


def decode_nibble(nib, pred, idx):
    step = STEPS[idx]
    delta = nib & 7
    vpdiff = step >> 3
    if delta & 4:
        vpdiff += step
    if delta & 2:
        vpdiff += step >> 1
    if delta & 1:
        vpdiff += step >> 2
    pred = clamp_pred(pred - vpdiff if nib & 8 else pred + vpdiff)
    return pred, clamp_idx(idx + INDEX_ADJUST[delta])


def encode_wav(text_bytes):
    n = len(text_bytes) // 2
    if n == 0:
        return None
    samples = [struct.unpack("<h", text_bytes[2 * i:2 * i + 2])[0]
               for i in range(n)]
    n_blocks = (n + SPB - 1) // SPB
    data_len = n_blocks * BLOCK_ALIGN
    out = bytearray()
    out += b"RIFF" + struct.pack("<I", 4 + 28 + 12 + 8 + data_len) + b"WAVE"
    out += b"fmt " + struct.pack("<IHHIIHHHH", 20, 0x11, 1, 8000,
                                 8000 * BLOCK_ALIGN // SPB, BLOCK_ALIGN, 4,
                                 2, SPB)
    out += b"fact" + struct.pack("<II", 4, n)
    out += b"data" + struct.pack("<I", data_len)
    pred, idx, s = 0, 0, 0
    for b in range(n_blocks):
        pred = samples[s]
        out += struct.pack("<h", pred) + bytes((idx, 0))
        s += 1
        low = -1
        for _ in range(BLOCK_ALIGN - 4):
            for _half in range(2):
                if s < n and s < (b + 1) * SPB:
                    nib, pred, idx = encode_sample(samples[s], pred, idx)
                    s += 1
                else:
                    nib = 0
                if low < 0:
                    low = nib
                else:
                    out.append(low | (nib << 4))
                    low = -1
    return bytes(out)


def decode_wav(wav):
    """-> decoded int16 samples (honoring fact)."""
    n = struct.unpack("<I", wav[48:52])[0]  # fact count (fixed layout here)
    data_off = 60  # RIFF(12) + fmt(8+20) + fact(8+4) + data hdr(8)
    samples = []
    off = data_off
    while len(samples) < n and off + BLOCK_ALIGN <= len(wav):
        pred = struct.unpack("<h", wav[off:off + 2])[0]
        idx = wav[off + 2]
        samples.append(pred)
        in_block = 1
        p = off + 4
        while p < off + BLOCK_ALIGN and len(samples) < n and in_block < SPB:
            byte = wav[p]
            for nib in (byte & 0x0F, byte >> 4):
                if len(samples) >= n or in_block >= SPB:
                    break
                pred, idx = decode_nibble(nib, pred, idx)
                samples.append(pred)
                in_block += 1
            p += 1
        off += BLOCK_ALIGN
    return samples


def frame_stats(samples, frame=256):
    rows = []
    n = len(samples)
    for f in range((n + frame - 1) // frame):
        seg = samples[f * frame:(f + 1) * frame]
        zc = sum(1 for i in range(1, len(seg))
                 if (seg[i] < 0) != (seg[i - 1] < 0))
        rms = math.sqrt(sum(float(v) * v for v in seg) / len(seg))
        rows.append((f, len(seg), round_half_up(rms, 4), zc,
                     max(abs(v) for v in seg)))
    return rows


def main():
    rows = []
    seen = set()
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
            if key in seen:
                continue
            seen.add(key)
            wav = encode_wav(tb)
            if wav is None:
                continue
            md5 = hashlib.md5(binascii.hexlify(wav).upper()).hexdigest()
            for f, cnt, rms, zc, peak in frame_stats(decode_wav(wav)):
                rows.append(dict(key=key, wav_md5=md5, frame_idx=f,
                                 n_samples=cnt, rms=rms,
                                 zero_crossings=zc, peak=peak))
    out = pd.DataFrame(rows)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    out.to_parquet(OUT, index=False)
    print(f"wrote {len(out)} rows -> {OUT}")


if __name__ == "__main__":
    main()
