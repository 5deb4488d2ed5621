"""Delta-of-delta timestamp codec (SURVEY.md K2).

Gorilla §4.1.1 adapted to microsecond-precision int64 timestamps: deltas are
microseconds, so the bucket widths are wider than the paper's
seconds-resolution 7/9/12/32 classes. Signed delta-of-deltas are zigzag
encoded, then bucketed:

    dod == 0           -> '0'
    |zz| < 2^14        -> '10'   + 14 bits
    |zz| < 2^24        -> '110'  + 24 bits
    |zz| < 2^36        -> '1110' + 36 bits
    else               -> '1111' + 64 bits

First timestamp: 64 raw bits; first delta: zigzag, 64 raw bits. Headerless;
n_points lives on the chunk row.
"""

from __future__ import annotations

from .bits import BitReader, BitWriter, M64

CODEC_VERSION = 1


def _zigzag(v: int) -> int:
    return ((v << 1) ^ (v >> 63)) & M64


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _s64(x: int) -> int:
    """Wrap to signed 64-bit. Delta/delta-of-delta arithmetic is done mod
    2^64: int64 inputs always reconstruct exactly because addition wraps
    identically on encode and decode."""
    x &= M64
    return x - (1 << 64) if x >= 1 << 63 else x


_BUCKETS = [(14, 0b10, 2), (24, 0b110, 3), (36, 0b1110, 4)]


def encode(ts) -> bytes:
    w = BitWriter()
    n = len(ts)
    if n == 0:
        return b""
    w.write(int(ts[0]) & M64, 64)
    if n == 1:
        return w.getvalue()
    prev_delta = _s64(int(ts[1]) - int(ts[0]))
    w.write(_zigzag(prev_delta), 64)
    prev = int(ts[1])
    for i in range(2, n):
        cur = int(ts[i])
        delta = _s64(cur - prev)
        dod = _s64(delta - prev_delta)
        if dod == 0:
            w.write(0, 1)
        else:
            zz = _zigzag(dod)
            for bits, tag, tagbits in _BUCKETS:
                if zz < (1 << bits):
                    w.write(tag, tagbits)
                    w.write(zz, bits)
                    break
            else:
                w.write(0b1111, 4)
                w.write(zz, 64)
        prev, prev_delta = cur, delta
    return w.getvalue()


def decode(blob: bytes, n: int) -> list[int]:
    if n == 0:
        return []
    r = BitReader(blob)
    first = r.read(64)
    if first >= 1 << 63:
        first -= 1 << 64
    out = [first]
    if n == 1:
        return out
    delta = _unzigzag(r.read(64))
    out.append(_s64(out[0] + delta))
    for _ in range(n - 2):
        if r.read(1) == 0:
            dod = 0
        else:
            for bits, _tag, tagbits in _BUCKETS:
                if r.read(1) == 0:
                    dod = _unzigzag(r.read(bits))
                    break
            else:
                dod = _unzigzag(r.read(64))
        delta = _s64(delta + dod)
        out.append(_s64(out[-1] + delta))
    return out
