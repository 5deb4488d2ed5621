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

from .bits import BitWriter, M64

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

#: chunks at or below this many points use the pure-Python paths: numpy's
#: fixed per-call overhead (~85 µs encode / ~170 µs decode) exceeds the
#: whole scalar cost until a few hundred points (measured crossover ~256-384;
#: tier month-chunks are p50=1, p99≈124)
_SCALAR_MAX_N = 256


def _encode_py(ts) -> bytes:
    """Pure-Python encode for small chunks; bit-identical to the numpy path
    (deltas/dods wrap mod 2^64 exactly like int64 arithmetic)."""
    w = BitWriter()
    write = w.write
    t0 = int(ts[0])
    write(t0 & M64, 64)
    if len(ts) == 1:
        return w.getvalue()
    pd = _s64(int(ts[1]) - t0)
    write(_zigzag(pd), 64)
    prev = int(ts[1])
    for i in range(2, len(ts)):
        cur = int(ts[i])
        d = _s64(cur - prev)
        prev = cur
        z = _zigzag(_s64(d - pd))
        pd = d
        if z == 0:
            write(0, 1)
        elif z < 1 << 14:
            write(0b10, 2)
            write(z, 14)
        elif z < 1 << 24:
            write(0b110, 3)
            write(z, 24)
        elif z < 1 << 36:
            write(0b1110, 4)
            write(z, 36)
        else:
            write(0b1111, 4)
            write(z, 64)
    return w.getvalue()


def encode(ts) -> bytes:
    """Encode int64 µs timestamps. Small chunks take a pure-Python scalar
    path (numpy per-call overhead dominates below ~_SCALAR_MAX_N points);
    larger chunks are fully vectorized: delta/delta-of-delta/zigzag in numpy
    (int64 wrap-around == the mod-2^64 arithmetic decode expects), then
    variable-width bit emission via repeat/shift/packbits. Only the rare
    >2^36 zigzag class (wild clock jumps) falls back to the scalar
    BitWriter path."""
    import numpy as np

    n = len(ts)
    if n == 0:
        return b""
    if n <= _SCALAR_MAX_N:
        return _encode_py(ts)
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
    from .bits import pack_fields

    return pack_fields(
        np.concatenate([head_vals, vals]),
        np.concatenate([np.array([64, 64], dtype=np.int64), widths]),
    )


#: per-group cap on total points for batch encode — same first-touch
#: page-fault cliff as gorilla's grouped encoder (pack_fields' bit matrix
#: is ~64 B per field; unbounded groups hit fresh-mmap fault storms)
_ENC_GROUP_MAX_PTS = 16 * 1024


def encode_many(arrays) -> list[bytes]:
    """Batch encode across Arrow-batch chunks, bit-identical to per-chunk
    encode(). One global numpy pass builds every chunk's field list
    (header 64+64, variable-width dod fields, byte-boundary zero pad —
    exactly BitWriter.getvalue()'s padding), one global pack_fields emits
    the bitstream, per-chunk output by byte-slice. Amortizes per-call
    numpy setup the way gorilla.encode_many does — the tier month-chunks
    are mostly a handful of points, where per-chunk numpy overhead
    dominated (VERDICT r3: _dod_encode_udf was per-chunk Series.map).
    Chunks containing a >2^36 zigzag class (wild clock jumps) fall back to
    the scalar path individually."""
    import numpy as np

    arrays = [np.asarray(a, dtype=np.int64) for a in arrays]
    out: list[bytes] = []
    start = 0
    acc = 0
    for i, a in enumerate(arrays):
        if acc + len(a) > _ENC_GROUP_MAX_PTS and i > start:
            out.extend(_encode_group(arrays[start:i]))
            start, acc = i, 0
        acc += len(a)
    out.extend(_encode_group(arrays[start:]))
    return out


def _encode_group(arrays) -> list[bytes]:
    import numpy as np

    from .bits import pack_fields

    if not arrays:
        return []
    lens = [len(a) for a in arrays]
    ne = [a for a in arrays if len(a)]
    if not ne:
        return [b"" for _ in arrays]
    ln = np.array([len(a) for a in ne], dtype=np.int64)
    st = np.concatenate([[0], np.cumsum(ln)[:-1]])
    allv = np.concatenate(ne)
    with np.errstate(over="ignore"):
        d = allv[1:] - allv[:-1] if len(allv) > 1 else np.zeros(0, np.int64)
        g = d[1:] - d[:-1] if len(d) > 1 else np.zeros(0, np.int64)
    has2 = ln >= 2
    cnt = np.maximum(ln - 2, 0)
    seg = np.cumsum(cnt) - cnt
    total = int(cnt.sum())
    intra = np.arange(total, dtype=np.int64) - np.repeat(seg, cnt)
    gidx = np.repeat(st, cnt) + intra
    with np.errstate(over="ignore"):
        dods = g[gidx] if total else np.zeros(0, np.int64)
        zz = ((dods << 1) ^ (dods >> 63)).view(np.uint64)

    chunk_of = np.repeat(np.arange(len(ne), dtype=np.int64), cnt)
    huge = zz >= np.uint64(1 << 36)
    if huge.any():
        bad = np.bincount(chunk_of[huge], minlength=len(ne)) > 0
        clean = [a for a, h in zip(ne, bad) if not h]
        it = iter(_encode_group(clean) if clean else [])
        enc_ne = [encode(a) if h else next(it) for a, h in zip(ne, bad)]
        it2 = iter(enc_ne)
        return [next(it2) if n else b"" for n in lens]

    m0 = zz == 0
    m14 = ~m0 & (zz < np.uint64(1 << 14))
    m24 = ~m0 & ~m14 & (zz < np.uint64(1 << 24))
    dvals = np.where(
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
    dwid = np.where(m0, 1, np.where(m14, 16, np.where(m24, 27, 40))).astype(
        np.int64
    )

    # global field layout: [first 64] [zz(delta0) 64]? [dod fields...] [pad]
    nf = 1 + has2.astype(np.int64) + cnt + 1
    off = np.cumsum(nf) - nf
    vals = np.zeros(int(nf.sum()), dtype=np.uint64)
    wid = np.zeros(int(nf.sum()), dtype=np.int64)
    vals[off] = allv[st].view(np.uint64)
    wid[off] = 64
    if has2.any():
        d0 = d[st[has2]]
        with np.errstate(over="ignore"):
            zz0 = ((d0 << 1) ^ (d0 >> 63)).view(np.uint64)
        vals[off[has2] + 1] = zz0
        wid[off[has2] + 1] = 64
    dpos = np.repeat(off + 2, cnt) + intra
    vals[dpos] = dvals
    wid[dpos] = dwid
    dbits = np.bincount(chunk_of, weights=dwid, minlength=len(ne)).astype(
        np.int64
    )
    cbits = 64 + has2.astype(np.int64) * 64 + dbits
    pad = (-cbits) % 8
    wid[off + nf - 1] = pad
    blob = pack_fields(vals, wid)
    ends = np.cumsum((cbits + pad) // 8).tolist()
    begins = [0] + ends[:-1]
    it = iter(blob[b:e] for b, e in zip(begins, ends))
    return [next(it) if n else b"" for n in lens]


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


def _decode_py(blob: bytes, n: int) -> list[int]:
    """Pure-Python decode for small chunks: one big-int conversion, then
    arithmetic bit reads — no numpy temporaries. Bit-identical."""
    total = int.from_bytes(blob, "big")
    bitlen = len(blob) * 8
    pos = 0

    def rd(w: int) -> int:
        nonlocal pos
        pos += w
        return (total >> (bitlen - pos)) & ((1 << w) - 1)

    first = rd(64)
    if first >= 1 << 63:
        first -= 1 << 64
    out = [first]
    if n == 1:
        return out
    d = _unzigzag(rd(64))
    v = _s64(first + d)
    out.append(v)
    for _ in range(n - 2):
        if rd(1):
            if rd(1) == 0:
                z = rd(14)
            elif rd(1) == 0:
                z = rd(24)
            elif rd(1) == 0:
                z = rd(36)
            else:
                z = rd(64)
            d = _s64(d + _unzigzag(z))
        v = _s64(v + d)
        out.append(v)
    return out


def decode(blob: bytes, n: int) -> list[int]:
    """Two-phase vectorized decode: sequential tag parse (prefix codes
    '0'/'10'/'110'/'1110'/'1111', cheap int ops) records payload offsets,
    then extract_fields + unzigzag + a double cumsum (dod → delta → ts,
    int64 wrap-around == the codec's mod-2^64 arithmetic) run whole-chunk.
    Small chunks take the pure-Python path (numpy overhead dominates)."""
    import numpy as np

    from .bits import extract_fields

    if n == 0:
        return []
    if n <= _SCALAR_MAX_N:
        return _decode_py(blob, n)
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
    first = int(extract_fields(bits, [0], [64])[0])
    if first >= 1 << 63:
        first -= 1 << 64
    if n == 1:
        return [first]
    delta0 = _unzigzag(int(extract_fields(bits, [64], [64])[0]))
    if n == 2:
        return [first, _s64(first + delta0)]
    bl = bits.tolist()
    pos = 128
    starts, widths, idxs = [], [], []
    for i in range(n - 2):
        if bl[pos] == 0:
            pos += 1
            continue
        if bl[pos + 1] == 0:
            w, pos = 14, pos + 2
        elif bl[pos + 2] == 0:
            w, pos = 24, pos + 3
        elif bl[pos + 3] == 0:
            w, pos = 36, pos + 4
        else:
            w, pos = 64, pos + 4
        starts.append(pos)
        widths.append(w)
        idxs.append(i)
        pos += w
    dods = np.zeros(n - 2, dtype=np.int64)
    if idxs:
        zz = extract_fields(bits, starts, widths)
        dods[np.asarray(idxs, dtype=np.int64)] = (
            (zz >> np.uint64(1)).astype(np.int64) ^ -(zz & np.uint64(1)).astype(np.int64)
        )
    with np.errstate(over="ignore"):
        deltas = np.cumsum(
            np.concatenate([np.array([delta0], dtype=np.int64), dods])
        )
        ts = np.cumsum(
            np.concatenate([np.array([first], dtype=np.int64), deltas])
        )
    return ts.tolist()
