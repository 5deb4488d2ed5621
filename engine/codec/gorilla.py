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

from .bits import BitReader, BitWriter

CODEC_VERSION = 1


def _f2b(v: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", v))[0]


def _b2f(b: int) -> float:
    return struct.unpack("<d", struct.pack("<Q", b))[0]


def encode(values) -> bytes:
    w = BitWriter()
    if len(values) == 0:
        return b""
    prev = _f2b(values[0])
    w.write(prev, 64)
    prev_lead = -1  # forces a new window on first non-zero xor
    prev_mlen = 0
    for v in values[1:]:
        cur = _f2b(v)
        x = prev ^ cur
        if x == 0:
            w.write(0, 1)
        else:
            w.write(1, 1)
            lead = 64 - x.bit_length()
            if lead > 31:
                lead = 31
            trail = (x & -x).bit_length() - 1
            mlen = 64 - lead - trail
            prev_trail = 64 - prev_lead - prev_mlen
            if prev_lead >= 0 and lead >= prev_lead and trail >= prev_trail:
                w.write(0, 1)  # '10': reuse prior window
                w.write(x >> prev_trail, prev_mlen)
            else:
                w.write(1, 1)  # '11': new window
                w.write(lead, 5)
                w.write(mlen - 1, 6)
                w.write(x >> trail, mlen)
                prev_lead, prev_mlen = lead, mlen
        prev = cur
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
