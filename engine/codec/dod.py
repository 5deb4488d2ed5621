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
    """Encode int64 µs timestamps. Fully vectorized: delta/delta-of-delta/
    zigzag in numpy (int64 wrap-around == the mod-2^64 arithmetic decode
    expects), then variable-width bit emission via repeat/shift/packbits.
    Only the rare >2^36 zigzag class (wild clock jumps) falls back to the
    scalar BitWriter path."""
    import numpy as np

    n = len(ts)
    if n == 0:
        return b""
    arr = np.asarray(ts, dtype=np.int64)
    if n <= 2:
        w = BitWriter()
        w.write(int(arr[0]) & M64, 64)
        if n == 2:
            w.write(_zigzag(_s64(int(arr[1]) - int(arr[0]))), 64)
        return w.getvalue()

    with np.errstate(over="ignore"):
        deltas = arr[1:] - arr[:-1]  # wrapping int64 == _s64 semantics
        dods = deltas[1:] - deltas[:-1]
        zz = ((dods << 1) ^ (dods >> 63)).view(np.uint64)

    if (zz >= np.uint64(1 << 36)).any():
        return _encode_scalar(arr, deltas, zz)

    # field value/width per dod: '0' | '10'+14b | '110'+24b | '1110'+36b
    m0 = zz == 0
    m14 = ~m0 & (zz < np.uint64(1 << 14))
    m24 = ~m0 & ~m14 & (zz < np.uint64(1 << 24))
    m36 = ~m0 & ~m14 & ~m24
    vals = np.where(
        m0,
        np.uint64(0),
        np.where(
            m14,
            (np.uint64(0b10) << np.uint64(14)) | zz,
            np.where(
                m24,
                (np.uint64(0b110) << np.uint64(24)) | zz,
                (np.uint64(0b1110) << np.uint64(36)) | zz,
            ),
        ),
    )
    widths = np.where(m0, 1, np.where(m14, 16, np.where(m24, 27, 40))).astype(
        np.int64
    )

    # prepend the two 64-bit header fields (first ts, zigzag first delta)
    head_vals = np.array(
        [np.uint64(int(arr[0]) & M64), np.uint64(_zigzag(int(deltas[0])))],
        dtype=np.uint64,
    )
    vals = np.concatenate([head_vals, vals])
    widths = np.concatenate([np.array([64, 64], dtype=np.int64), widths])

    total = int(widths.sum())
    starts = np.cumsum(widths) - widths
    j = np.arange(total, dtype=np.int64) - np.repeat(starts, widths)
    shifts = (np.repeat(widths, widths) - 1 - j).astype(np.uint64)
    bitarr = (
        (np.repeat(vals, widths) >> shifts) & np.uint64(1)
    ).astype(np.uint8)
    return np.packbits(bitarr).tobytes()


def _encode_scalar(arr, deltas, zz) -> bytes:
    w = BitWriter()
    w.write(int(arr[0]) & M64, 64)
    w.write(_zigzag(int(deltas[0])), 64)
    write = w.write
    for z in zz.tolist():
        if z == 0:
            write(0, 1)
            continue
        for bits, tag, tagbits in _BUCKETS:
            if z < (1 << bits):
                write(tag, tagbits)
                write(z, bits)
                break
        else:
            write(0b1111, 4)
            write(z, 64)
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
