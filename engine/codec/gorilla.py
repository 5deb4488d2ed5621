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

import numpy as np

from .bits import extract_fields, pack_fields

CODEC_VERSION = 1

# per-byte leading/trailing-zero lookup tables (vectorized clz/ctz)
_CLZ8 = np.array([8] + [8 - b.bit_length() for b in range(1, 256)], dtype=np.int64)
_CTZ8 = np.array([8] + [(b & -b).bit_length() - 1 for b in range(1, 256)],
                 dtype=np.int64)


def encode(values) -> bytes:
    """Encode float64s. XOR/leading/trailing-zero analysis is numpy-
    vectorized over the whole chunk; the window-control loop visits only
    NON-ZERO xors (zero runs collapse to single multi-bit '0...0' fields),
    and all bit emission is one vectorized pack_fields call."""
    n = len(values)
    if n == 0:
        return b""
    bits = np.asarray(values, dtype=np.float64).view(np.uint64)
    vals = [int(bits[0])]
    widths = [64]
    if n == 1:
        return pack_fields(vals, widths)

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

    nz_pos = np.flatnonzero(xors).tolist()
    xor_nz = xors[nz_pos].tolist() if nz_pos else []
    lead_nz = lead_arr[nz_pos].tolist() if nz_pos else []
    trail_nz = trail_arr[nz_pos].tolist() if nz_pos else []

    def emit_zeros(k):
        # a run of k '0' control bits == zero fields of up to 64 bits each
        while k > 0:
            take = 64 if k > 64 else k
            vals.append(0)
            widths.append(take)
            k -= take

    prev_lead = -1  # forces a new window on first non-zero xor
    prev_mlen = 0
    prev_i = -1
    for x, lead, trail, i in zip(xor_nz, lead_nz, trail_nz, nz_pos):
        emit_zeros(i - prev_i - 1)
        prev_i = i
        mlen = 64 - lead - trail
        prev_trail = 64 - prev_lead - prev_mlen
        if prev_lead >= 0 and lead >= prev_lead and trail >= prev_trail:
            vals.append(0b10)  # control '10': reuse prior window
            widths.append(2)
            vals.append(x >> prev_trail)
            widths.append(prev_mlen)
        else:
            # control '11' + 5b lead + 6b (mlen-1), fused into one 13b field
            vals.append((((0b11 << 5) | lead) << 6) | (mlen - 1))
            widths.append(13)
            vals.append(x >> trail)
            widths.append(mlen)
            prev_lead, prev_mlen = lead, mlen
    emit_zeros(len(xors) - 1 - prev_i)
    return pack_fields(vals, widths)


#: chunks at or below this size are batch-encoded; larger ones go through
#: the per-chunk path, whose small cache-resident temporaries beat the
#: batch's global emission once per-call numpy overhead is amortized anyway
_BATCH_MAX_N = 64


def encode_many(arrays) -> list[bytes]:
    """Hybrid batch encode, bit-identical to per-chunk encode().

    Small chunks (≤ _BATCH_MAX_N points — the common month-chunked tier
    case) are encoded in ONE global numpy pass: shared XOR/lead/trail
    analysis, one global field list where each chunk ends with a low-bit
    zero pad to the next byte boundary (exactly BitWriter.getvalue()'s
    padding), one global packbits, per-chunk output by byte-slice. This
    amortizes per-call numpy setup, worth ~4x when chunks are a few points.
    Large chunks keep the per-chunk path (cache-resident temporaries beat
    a giant global emission)."""
    arrays = [np.asarray(a, dtype=np.float64) for a in arrays]
    if any(len(a) > _BATCH_MAX_N for a in arrays):
        small_idx = [i for i, a in enumerate(arrays) if len(a) <= _BATCH_MAX_N]
        out = [None] * len(arrays)
        if small_idx:
            packed = _encode_small_grouped([arrays[i] for i in small_idx])
            for i, b in zip(small_idx, packed):
                out[i] = b
        for i, a in enumerate(arrays):
            if out[i] is None:
                out[i] = encode(a)
        return out
    return _encode_small_grouped(arrays)


#: per-group cap on total points for batch encode — same first-touch
#: page-fault cliff as _GROUP_MAX_BYTES (pack_fields' bit matrix is
#: ~64 B per field; unbounded groups hit fresh-mmap fault storms)
_ENC_GROUP_MAX_PTS = 16 * 1024


def _encode_small_grouped(arrays) -> list[bytes]:
    out: list[bytes] = []
    start = 0
    acc = 0
    for i, a in enumerate(arrays):
        if acc + len(a) > _ENC_GROUP_MAX_PTS and i > start:
            out.extend(_encode_many_small(arrays[start:i]))
            start, acc = i, 0
        acc += len(a)
    out.extend(_encode_many_small(arrays[start:]))
    return out


def _encode_many_small(arrays) -> list[bytes]:
    lens = [len(a) for a in arrays]
    nonempty = [a for a in arrays if len(a)]
    if not nonempty:
        return [b"" for _ in arrays]
    allv = np.concatenate(nonempty)
    bits = allv.view(np.uint64)
    xors = np.zeros_like(bits)
    if len(bits) > 1:
        xors[1:] = bits[1:] ^ bits[:-1]
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

    # ONE vectorized nonzero/boundary pass; only nz positions and chunk-start
    # values are materialized as Python ints (full-array tolist would cost
    # more than the whole scalar path)
    nz_all = np.flatnonzero(xors)
    lows, his, starts = [], [], []
    lo = 0
    for n in lens:
        starts.append(lo)
        lows.append(lo + 1)
        his.append(lo + n)
        lo += n
    j0 = np.searchsorted(nz_all, np.asarray(lows, dtype=np.int64)).tolist()
    j1 = np.searchsorted(nz_all, np.asarray(his, dtype=np.int64)).tolist()
    nz_list = nz_all.tolist()
    xnz = xors[nz_all].tolist()
    lnz = lead_arr[nz_all].tolist()
    tnz = trail_arr[nz_all].tolist()
    firsts = bits[np.minimum(np.asarray(starts, dtype=np.int64),
                             len(bits) - 1)].tolist()

    vals: list[int] = []
    widths: list[int] = []
    chunk_byte_end = []
    total_bits = 0
    lo = 0
    for k, n in enumerate(lens):
        if n == 0:
            chunk_byte_end.append(total_bits >> 3)
            continue
        cbits = 64
        vals.append(firsts[k])
        widths.append(64)
        prev_lead = -1
        prev_mlen = 0
        prev_i = lo
        for jj in range(j0[k], j1[k]):
            i = nz_list[jj]
            gap = i - prev_i - 1
            while gap > 0:
                take = 64 if gap > 64 else gap
                vals.append(0)
                widths.append(take)
                cbits += take
                gap -= take
            prev_i = i
            x = xnz[jj]
            lead = lnz[jj]
            trail = tnz[jj]
            mlen = 64 - lead - trail
            prev_trail = 64 - prev_lead - prev_mlen
            if prev_lead >= 0 and lead >= prev_lead and trail >= prev_trail:
                vals.append(0b10)
                widths.append(2)
                vals.append(x >> prev_trail)
                widths.append(prev_mlen)
                cbits += 2 + prev_mlen
            else:
                vals.append((((0b11 << 5) | lead) << 6) | (mlen - 1))
                widths.append(13)
                vals.append(x >> trail)
                widths.append(mlen)
                cbits += 13 + mlen
                prev_lead, prev_mlen = lead, mlen
        gap = lo + n - 1 - prev_i
        while gap > 0:
            take = 64 if gap > 64 else gap
            vals.append(0)
            widths.append(take)
            cbits += take
            gap -= take
        pad = (-cbits) % 8
        if pad:
            vals.append(0)
            widths.append(pad)
            cbits += pad
        total_bits += cbits
        chunk_byte_end.append(total_bits >> 3)
        lo += n

    va = np.asarray(vals, dtype=np.uint64)
    wa = np.asarray(widths, dtype=np.uint8)
    bitmat = np.unpackbits(va.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1)
    keep = np.arange(64, dtype=np.uint8) >= (64 - wa[:, None])
    gbytes = np.packbits(bitmat[keep]).tobytes()
    out = []
    s = 0
    for k, e in enumerate(chunk_byte_end):
        out.append(b"" if lens[k] == 0 else gbytes[s:e])
        s = e
    return out


#: per-group cap on concatenated blob bytes for batch decode. The bound
#: keeps extract_fields' index temporaries (~8 B per field bit) inside the
#: allocator's reused heap arenas; unbounded groups force fresh mmap'd
#: regions whose first-touch page faults cost far more than the work
#: (measured: 20k chunks monolithic 34.6s vs grouped 0.8s vs per-chunk 1.2s)
_GROUP_MAX_BYTES = 64 * 1024


#: chunks at or below this many points decode via the pure-Python big-int
#: reader: numpy's fixed per-call cost (unpackbits/extract_fields) exceeds
#: the whole scalar cost until ~128-200 points (measured), and tier
#: month-chunks are p50=1 point
_DEC_SCALAR_MAX_N = 128


def _decode_py(blob: bytes, n: int) -> list[float]:
    """Pure-Python decode for small chunks: one big-int conversion, then
    arithmetic bit reads — no numpy temporaries. Bit-identical."""
    import struct

    total = int.from_bytes(blob, "big")
    bitlen = len(blob) * 8
    pos = 64
    v = (total >> (bitlen - 64)) & 0xFFFFFFFFFFFFFFFF
    us = [v]
    lead = mlen = trail = 0
    for _ in range(n - 1):
        pos += 1
        if not (total >> (bitlen - pos)) & 1:
            us.append(v)
            continue
        pos += 1
        if (total >> (bitlen - pos)) & 1:  # '11': new window
            pos += 11
            ctrl = (total >> (bitlen - pos)) & 0x7FF
            lead = ctrl >> 6
            mlen = (ctrl & 63) + 1
            trail = 64 - lead - mlen
        pos += mlen
        v ^= ((total >> (bitlen - pos)) & ((1 << mlen) - 1)) << trail
        us.append(v)
    return list(struct.unpack(f"<{n}d", struct.pack(f"<{n}Q", *us)))


def decode_many(blobs, ns) -> list[list[float]]:
    """Batch decode, bit-identical to per-chunk decode(). Small chunks take
    the pure-Python reader; larger ones run through the vectorized group
    path in allocation-bounded groups (see _GROUP_MAX_BYTES)."""
    blobs = list(blobs)
    ns = [int(k) for k in ns]
    out: list = [None] * len(blobs)
    big_idx: list[int] = []
    for i, (b, n) in enumerate(zip(blobs, ns)):
        if n == 0:
            out[i] = []
        elif n <= _DEC_SCALAR_MAX_N:
            out[i] = _decode_py(b, n)
        else:
            big_idx.append(i)
    if big_idx:
        start = 0
        acc = 0
        groups: list[list[int]] = []
        cur: list[int] = []
        for i in big_idx:
            if acc + len(blobs[i]) > _GROUP_MAX_BYTES and cur:
                groups.append(cur)
                cur, acc = [], 0
            cur.append(i)
            acc += len(blobs[i])
        groups.append(cur)
        for g in groups:
            for i, dec in zip(
                g, _decode_group([blobs[i] for i in g], [ns[i] for i in g])
            ):
                out[i] = dec
    return out


def _decode_group(blobs, ns) -> list[list[float]]:
    """One unpackbits/tolist over the concatenated blobs, ONE extract_fields
    call for every chunk's payload fields, and ONE global XOR prefix scan:
    each chunk's first field is its raw 64-bit value, so within a chunk
    v_i = C[i] ^ C[chunk_start-1] where C is the global cumulative XOR —
    the per-chunk segmentation reduces to a vectorized boundary
    correction. Only the control-bit parse (inherently sequential) stays
    a Python loop, sharing one plain-int bit list across chunks."""
    blob_cat = b"".join(blobs)
    total_n = sum(ns)
    if not blob_cat or total_n == 0:
        return [[] for _ in ns]
    bits = np.unpackbits(np.frombuffer(blob_cat, dtype=np.uint8))
    bl = bits.tolist()
    starts: list[int] = []
    widths: list[int] = []
    shifts: list[int] = []  # left-shift to re-align each payload (0 for raws)
    scatter: list[int] = []  # global output index each field lands on
    out_offsets: list[int] = []
    base_bit = 0
    out_base = 0
    for blob, n in zip(blobs, ns):
        out_offsets.append(out_base)
        if n:
            starts.append(base_bit)
            widths.append(64)
            shifts.append(0)
            scatter.append(out_base)
            pos = base_bit + 64
            prev_lead = -1
            prev_mlen = 0
            for i in range(n - 1):
                if bl[pos] == 0:
                    pos += 1
                    continue
                pos += 1
                if bl[pos] == 0:  # '10': prior window
                    pos += 1
                    starts.append(pos)
                    widths.append(prev_mlen)
                    shifts.append(64 - prev_lead - prev_mlen)
                    scatter.append(out_base + i + 1)
                    pos += prev_mlen
                else:  # '11': 5b lead + 6b (mlen-1) + payload
                    pos += 1
                    lead = (
                        (bl[pos] << 4) | (bl[pos + 1] << 3)
                        | (bl[pos + 2] << 2) | (bl[pos + 3] << 1) | bl[pos + 4]
                    )
                    mlen = (
                        (bl[pos + 5] << 5) | (bl[pos + 6] << 4)
                        | (bl[pos + 7] << 3) | (bl[pos + 8] << 2)
                        | (bl[pos + 9] << 1) | bl[pos + 10]
                    ) + 1
                    pos += 11
                    starts.append(pos)
                    widths.append(mlen)
                    shifts.append(64 - lead - mlen)
                    scatter.append(out_base + i + 1)
                    pos += mlen
                    prev_lead, prev_mlen = lead, mlen
        out_base += n
        base_bit += len(blob) * 8
    fields = extract_fields(bits, starts, widths)
    xors = np.zeros(total_n, dtype=np.uint64)
    xors[np.asarray(scatter, dtype=np.int64)] = fields << np.asarray(
        shifts, dtype=np.uint64
    )
    cum = np.bitwise_xor.accumulate(xors)
    offs = np.asarray(out_offsets, dtype=np.int64)
    prefix = np.zeros(len(ns), dtype=np.uint64)
    nz = offs > 0
    prefix[nz] = cum[offs[nz] - 1]
    vals = (cum ^ np.repeat(prefix, np.asarray(ns, dtype=np.int64))).view(
        np.float64
    )
    return [
        vals[o:o + n].tolist() for o, n in zip(out_offsets, ns)
    ]


def decode(blob: bytes, n: int) -> list[float]:
    """Two-phase vectorized decode: a cheap sequential control parse records
    each non-zero step's (payload offset, width, trail); then payload
    extraction (extract_fields) and the running XOR reconstruction
    (np.bitwise_xor.accumulate — v_i = v_{i-1} ^ x_i is an XOR prefix scan)
    run as whole-chunk numpy ops. Small chunks take the pure-Python
    reader (numpy per-call overhead dominates below ~_DEC_SCALAR_MAX_N)."""
    if n == 0:
        return []
    if n <= _DEC_SCALAR_MAX_N:
        return _decode_py(blob, n)
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
    bl = bits.tolist()  # plain-int access beats np scalar indexing ~5x
    pos = 64
    starts = [0]
    widths = [64]
    trails = []
    steps = []  # xor index (0-based within xors) per non-zero step
    prev_lead = -1
    prev_mlen = 0
    for i in range(n - 1):
        if bl[pos] == 0:
            pos += 1
            continue
        pos += 1
        if bl[pos] == 0:  # '10': prior window
            pos += 1
            starts.append(pos)
            widths.append(prev_mlen)
            trails.append(64 - prev_lead - prev_mlen)
            pos += prev_mlen
        else:  # '11': 5b lead + 6b (mlen-1) + payload
            pos += 1
            lead = (
                (bl[pos] << 4) | (bl[pos + 1] << 3) | (bl[pos + 2] << 2)
                | (bl[pos + 3] << 1) | bl[pos + 4]
            )
            mlen = (
                (bl[pos + 5] << 5) | (bl[pos + 6] << 4) | (bl[pos + 7] << 3)
                | (bl[pos + 8] << 2) | (bl[pos + 9] << 1) | bl[pos + 10]
            ) + 1
            pos += 11
            starts.append(pos)
            widths.append(mlen)
            trails.append(64 - lead - mlen)
            pos += mlen
            prev_lead, prev_mlen = lead, mlen
        steps.append(i)
    fields = extract_fields(bits, starts, widths)
    xors = np.zeros(n, dtype=np.uint64)
    xors[0] = fields[0]  # first raw value
    if steps:
        xors[np.asarray(steps, dtype=np.int64) + 1] = fields[1:] << np.asarray(
            trails, dtype=np.uint64
        )
    return np.bitwise_xor.accumulate(xors).view(np.float64).tolist()
