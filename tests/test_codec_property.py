"""Hypothesis property tests for the codec — randomized analogue of the
reference's inverse-property and randomized-slicing suites
(tests.py:190-205, 246-299)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from mtslake import codec

settings.register_profile("ci", max_examples=60, deadline=None)
settings.load_profile("ci")


@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=300)
)
def test_int64_delta_roundtrip(xs):
    arr = np.array(xs, dtype=np.int64)
    assert np.array_equal(
        codec.decode_column(codec.encode_column(arr, codec.CODEC_DELTA)), arr
    )


@given(
    st.lists(st.integers(min_value=0, max_value=2**62), min_size=0, max_size=300)
)
def test_sorted_ts_dod_roundtrip(xs):
    arr = np.sort(np.array(xs, dtype=np.int64))
    assert np.array_equal(
        codec.decode_column(codec.encode_column(arr, codec.CODEC_DOD)), arr
    )


@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64), max_size=300
    )
)
def test_float64_xor_roundtrip_bit_exact(xs):
    arr = np.array(xs, dtype=np.float64)
    out = codec.decode_column(codec.encode_column(arr, codec.CODEC_XOR))
    assert np.array_equal(out.view(np.uint64), arr.view(np.uint64))


@given(st.binary(max_size=2000))
def test_raw_roundtrip(b):
    arr = np.frombuffer(b, dtype=np.uint8)
    out = codec.decode_column(codec.encode_column(arr, codec.CODEC_RAW))
    assert np.array_equal(out, arr)


@given(
    st.lists(st.integers(min_value=-100, max_value=100), min_size=1,
             max_size=100),
    st.integers(min_value=1, max_value=99),
)
def test_range_trim_equivalence(xs, pct):
    """Decoding then trimming any sub-range equals slicing the original
    (≙ randomized slice-oracle tests, tests.py:246-299)."""
    arr = np.cumsum(np.abs(np.array(xs, dtype=np.int64))) + 10**15
    payload = codec.encode_column(arr, codec.CODEC_DOD)
    dec = codec.decode_column(payload)
    t0 = int(np.percentile(arr, pct // 2))
    t1 = int(np.percentile(arr, 50 + pct // 2))
    got = dec[(dec >= t0) & (dec <= t1)]
    exp = arr[(arr >= t0) & (arr <= t1)]
    assert np.array_equal(got, exp)

