"""Bit-level IO for the chunk codecs (no Spark dependency — reused by the
Arrow UDFs in chunks.py and by hypothesis tests directly).

Two tiers: the scalar BitWriter/BitReader (reference implementation, rare
fallback paths) and numpy field-vector helpers (`pack_fields` /
`extract_fields`) that emit/parse a whole chunk's variable-width bitstream
with repeat/shift/packbits instead of per-value Python — the hot path for
both codecs."""

from __future__ import annotations

import numpy as np

M64 = (1 << 64) - 1


def pack_fields(vals, widths) -> bytes:
    """Emit a bitstream of big-endian fields: vals[i] in widths[i] bits
    (each ≤ 64). Vectorized via a (n_fields, 64) bit matrix + boolean-mask
    extraction — all temporaries are uint8, so the cost is ~64 bytes/field
    of memory traffic rather than 6×8 bytes/bit."""
    vals = np.asarray(vals, dtype=np.uint64)
    widths = np.asarray(widths, dtype=np.uint8)
    if len(widths) == 0:
        return b""
    bitmat = np.unpackbits(
        vals.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1
    )
    # keep the LOW widths[i] bits of each 64-bit row, MSB-first: these are
    # exactly the field's bits in stream order under C-order extraction
    keep = np.arange(64, dtype=np.uint8) >= (64 - widths[:, None])
    return np.packbits(bitmat[keep]).tobytes()


def extract_fields(bits: np.ndarray, starts, widths) -> np.ndarray:
    """Read big-endian fields (each ≤ 64 bits) at bit offsets `starts` with
    widths `widths` out of an unpacked 0/1 uint8 array. Vectorized inverse
    of pack_fields for an already-parsed field layout."""
    starts = np.asarray(starts, dtype=np.int64)
    widths = np.asarray(widths, dtype=np.int64)
    if len(widths) == 0:
        return np.zeros(0, dtype=np.uint64)
    segs = np.cumsum(widths) - widths
    j = np.arange(int(widths.sum()), dtype=np.int64) - np.repeat(segs, widths)
    idx = np.repeat(starts, widths) + j
    shifts = (np.repeat(widths, widths) - 1 - j).astype(np.uint64)
    contrib = bits[idx].astype(np.uint64) << shifts
    return np.add.reduceat(contrib, segs)


class BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class BitReader:
    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0

    def read(self, bits: int) -> int:
        out = 0
        pos = self.bitpos
        remaining = bits
        while remaining > 0:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, remaining)
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            remaining -= take
        self.bitpos = pos
        return out
