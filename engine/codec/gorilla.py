"""Gorilla XOR float64 codec (SURVEY.md K1).

Bitstream per Facebook's Gorilla paper §4.1.2 (Pelkonen et al., VLDB 2015;
public algorithm):
  - first value: 64 raw bits
  - each next value XORed with the previous:
      * xor == 0            -> control bit '0'
      * fits prior window   -> '10' + meaningful bits in the prior window
      * new window          -> '11' + 5b leading-zero count (capped 31)
                                + 6b (meaningful-length - 1) + meaningful bits
Bit patterns are preserved exactly, so NaN payloads, -0.0, denormals and
±Inf round-trip bit-identically. The blob is headerless; the chunk row
carries n_points (FIXTURES.md chunk schema).
"""

from __future__ import annotations

import struct

import numpy as np

from .bits import BitReader, BitWriter

CODEC_VERSION = 1

# per-byte leading/trailing-zero lookup tables (vectorized clz/ctz)
_CLZ8 = np.array([8] + [8 - b.bit_length() for b in range(1, 256)], dtype=np.int64)
_CTZ8 = np.array([8] + [(b & -b).bit_length() - 1 for b in range(1, 256)],
                 dtype=np.int64)


def _f2b(v: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", v))[0]


def _b2f(b: int) -> float:
    return struct.unpack("<d", struct.pack("<Q", b))[0]


def encode(values) -> bytes:
    """Encode float64s. XOR/leading/trailing-zero analysis is numpy-
    vectorized over the whole chunk; Python touches each value only for the
    final bit emission (the BitWriter append)."""
    n = len(values)
    w = BitWriter()
    if n == 0:
        return b""
    bits = np.asarray(values, dtype=np.float64).view(np.uint64)
    first = int(bits[0])
    w.write(first, 64)
    if n == 1:
        return w.getvalue()

    xors = bits[1:] ^ bits[:-1]
    be = xors[:, None].astype(">u8").view(np.uint8).reshape(-1, 8)
    le = xors[:, None].astype("<u8").view(np.uint8).reshape(-1, 8)
    idx = np.arange(len(xors))
    nz_be = be != 0
    any_nz = nz_be.any(axis=1)
    f_be = np.argmax(nz_be, axis=1)
    lead_arr = np.where(any_nz, f_be * 8 + _CLZ8[be[idx, f_be]], 64)
    np.minimum(lead_arr, 31, out=lead_arr)
    nz_le = le != 0
    f_le = np.argmax(nz_le, axis=1)
    trail_arr = np.where(any_nz, f_le * 8 + _CTZ8[le[idx, f_le]], 64)

    xor_list = xors.tolist()
    lead_list = lead_arr.tolist()
    trail_list = trail_arr.tolist()

    prev_lead = -1  # forces a new window on first non-zero xor
    prev_mlen = 0
    write = w.write
    for x, lead, trail in zip(xor_list, lead_list, trail_list):
        if x == 0:
            write(0, 1)
            continue
        write(1, 1)
        mlen = 64 - lead - trail
        prev_trail = 64 - prev_lead - prev_mlen
        if prev_lead >= 0 and lead >= prev_lead and trail >= prev_trail:
            write(0, 1)  # '10': reuse prior window
            write(x >> prev_trail, prev_mlen)
        else:
            write(1, 1)  # '11': new window
            write(lead, 5)
            write(mlen - 1, 6)
            write(x >> trail, mlen)
            prev_lead, prev_mlen = lead, mlen
    return w.getvalue()


def decode(blob: bytes, n: int) -> list[float]:
    if n == 0:
        return []
    r = BitReader(blob)
    prev = r.read(64)
    out = [_b2f(prev)]
    prev_lead = -1
    prev_mlen = 0
    for _ in range(n - 1):
        if r.read(1) == 0:
            out.append(_b2f(prev))
            continue
        if r.read(1) == 0:  # prior window
            prev_trail = 64 - prev_lead - prev_mlen
            x = r.read(prev_mlen) << prev_trail
        else:
            lead = r.read(5)
            mlen = r.read(6) + 1
            trail = 64 - lead - mlen
            x = r.read(mlen) << trail
            prev_lead, prev_mlen = lead, mlen
        prev ^= x
        out.append(_b2f(prev))
    return out
