"""Codec unit tests (SURVEY.md §5.1): bit-exact decode(encode(x)) == x,
property-based via hypothesis (fixed seed / derandomized). Pure Python —
no Spark session needed."""

import math
import struct
import sys
from pathlib import Path

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from engine.codec import dod, gorilla  # noqa: E402

settings.register_profile("det", derandomize=True, max_examples=200, deadline=None)
settings.load_profile("det")


def bits(v: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", v))[0]


NASTY = [
    0.0, -0.0, 1.0, -1.0, math.inf, -math.inf, math.nan,
    -math.nan if False else struct.unpack("<d", struct.pack("<Q", 0x7FF8000000000001))[0],
    5e-324,  # min denormal
    2.2250738585072014e-308,  # min normal
    1.7976931348623157e308,  # max double
    struct.unpack("<d", struct.pack("<Q", 0xFFF0000000000001))[0],  # nan payload
]


def roundtrip_floats(xs):
    got = gorilla.decode(gorilla.encode(xs), len(xs))
    assert len(got) == len(xs)
    for a, b in zip(xs, got):
        assert bits(a) == bits(b), f"{a!r} -> {b!r}"


def roundtrip_ts(xs):
    got = dod.decode(dod.encode(xs), len(xs))
    assert got == list(xs)


def test_gorilla_empty_and_single():
    roundtrip_floats([])
    roundtrip_floats([3.14159])
    roundtrip_floats([math.nan])


def test_gorilla_nasty_values():
    roundtrip_floats(NASTY)
    roundtrip_floats(NASTY[::-1])
    roundtrip_floats([v for v in NASTY for _ in range(3)])  # runs of equal


def test_gorilla_constant_series():
    roundtrip_floats([42.0] * 1000)
    # constant series should be ~1 bit/point after the first value
    blob = gorilla.encode([42.0] * 1000)
    assert len(blob) <= 8 + (1000 // 8) + 2


@given(st.lists(st.floats(allow_nan=True, allow_infinity=True), max_size=300))
def test_gorilla_property(xs):
    roundtrip_floats(xs)


@given(
    st.lists(
        st.lists(st.floats(allow_nan=True, allow_infinity=True), max_size=90),
        max_size=25,
    )
)
def test_gorilla_encode_many_bit_identical(chunks):
    # the Arrow-batch encoder must emit byte-for-byte what per-chunk
    # encode() emits, across the small/large hybrid boundary (_BATCH_MAX_N)
    batched = gorilla.encode_many(chunks)
    assert batched == [gorilla.encode(c) for c in chunks]


@given(
    st.lists(
        st.lists(st.floats(allow_nan=True, allow_infinity=True), max_size=90),
        max_size=25,
    )
)
def test_gorilla_decode_many_bit_identical(chunks):
    blobs = [gorilla.encode(c) for c in chunks]
    ns = [len(c) for c in chunks]
    got = gorilla.decode_many(blobs, ns)
    assert len(got) == len(chunks)
    for c, g in zip(chunks, got):
        assert [bits(x) for x in c] == [bits(y) for y in g]


def test_gorilla_many_group_boundaries():
    # force multiple groups through both grouped paths: chunks large enough
    # that cumulative size crosses _GROUP_MAX_BYTES/_ENC_GROUP_MAX_PTS
    import random

    rng = random.Random(3)
    chunks = [
        [rng.uniform(-1e9, 1e9) for _ in range(rng.randrange(0, 64))]
        for _ in range(3000)
    ]
    blobs = gorilla.encode_many(chunks)
    assert blobs == [gorilla.encode(c) for c in chunks]
    got = gorilla.decode_many(blobs, [len(c) for c in chunks])
    for c, g in zip(chunks, got):
        assert [bits(x) for x in c] == [bits(y) for y in g]


@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True), min_size=1, max_size=60
    )
)
def test_gorilla_decode_scalar_numpy_cross_path(xs):
    # the small-chunk pure-Python reader must be bit-identical to the
    # two-phase numpy decode on the same blob
    blob = gorilla.encode(xs)
    saved = gorilla._DEC_SCALAR_MAX_N
    try:
        gorilla._DEC_SCALAR_MAX_N = -1  # force the numpy path
        np_dec = gorilla.decode(blob, len(xs))
    finally:
        gorilla._DEC_SCALAR_MAX_N = saved
    py_dec = gorilla._decode_py(blob, len(xs))
    assert [bits(a) for a in py_dec] == [bits(a) for a in np_dec]


def test_gorilla_encode_many_mixed_sizes():
    chunks = [
        [],
        [1.5],
        [0.0, -0.0, math.nan, math.inf],
        [7.25] * 200,  # > _BATCH_MAX_N -> per-chunk fallback path
        list(range(64)),  # exactly at the boundary
        [],
    ]
    chunks = [[float(x) for x in c] for c in chunks]
    assert gorilla.encode_many(chunks) == [gorilla.encode(c) for c in chunks]


@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=200
    )
)
def test_gorilla_bitpattern_property(raw):
    xs = [struct.unpack("<d", struct.pack("<q", r))[0] for r in raw]
    roundtrip_floats(xs)


@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=40,
    )
)
def test_dod_scalar_numpy_cross_path(ts):
    # the small-chunk pure-Python paths must be bit-identical to the numpy
    # paths on the same input (wrap-around int64 arithmetic included)
    saved = dod._SCALAR_MAX_N
    try:
        dod._SCALAR_MAX_N = -1  # force numpy encode/decode
        np_blob = dod.encode(ts)
        np_dec = dod.decode(np_blob, len(ts))
    finally:
        dod._SCALAR_MAX_N = saved
    assert dod._encode_py(ts) == np_blob
    assert dod._decode_py(np_blob, len(ts)) == np_dec


def test_dod_empty_single_pair():
    roundtrip_ts([])
    roundtrip_ts([1700000000_000000])
    roundtrip_ts([0, 1])
    roundtrip_ts([5, 5, 5])


def test_dod_regular_series_is_tiny():
    ts = [1700000000_000000 + i * 3_600_000_000 for i in range(1000)]
    blob = dod.encode(ts)
    # perfectly regular: 16 bytes header + ~1 bit per point
    assert len(blob) <= 16 + 1000 // 8 + 2
    roundtrip_ts(ts)


def test_dod_irregular_gaps():
    ts = [0, 5_000_000, 5_000_001, 9_000_000_000, 9_000_000_001, 10**15, 10**15 + 7]
    roundtrip_ts(ts)


@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62 - 1), max_size=200
    )
)
def test_dod_property(ts):
    roundtrip_ts(ts)


def test_dod_monotone_microsecond_property():
    # typical hourly bucket sequence with occasional multi-hour gaps
    ts, cur = [], 1_767_225_600_000_000
    for i in range(500):
        cur += 3_600_000_000 * (1 + (i * 2654435761) % 7)
        ts.append(cur)
    roundtrip_ts(ts)


@given(
    st.lists(
        st.lists(
            st.integers(min_value=-(2**62), max_value=2**62 - 1), max_size=90
        ),
        max_size=25,
    )
)
def test_dod_encode_many_bit_identical(chunks):
    # the Arrow-batch encoder must emit byte-for-byte what per-chunk
    # encode() emits — including the per-chunk >2^36 zigzag fallback and
    # empty/1/2-point headers
    from engine.codec import dod

    batched = dod.encode_many(chunks)
    assert batched == [dod.encode(c) for c in chunks]
    for c, b in zip(chunks, batched):
        assert dod.decode(b, len(c)) == [int(x) for x in c]


def test_dod_encode_many_group_boundaries():
    # force multiple groups across _ENC_GROUP_MAX_PTS, plus wild clock
    # jumps that route individual chunks to the scalar fallback
    import random

    from engine.codec import dod

    rng = random.Random(5)
    chunks = []
    cur = 1_700_000_000_000_000
    for _ in range(2000):
        n = rng.randrange(0, 64)
        ts = []
        for _ in range(n):
            cur += 3_600_000_000 + rng.choice(
                [0, 0, 0, 1, -1, rng.randrange(-(2**45), 2**45)]
            )
            ts.append(cur)
        chunks.append(ts)
    assert dod.encode_many(chunks) == [dod.encode(c) for c in chunks]
