"""Codec inverse-property tests.

Mirrors the reference's operator-inverse tests (tests.py:190-205), dtype
matrix (tests.py:100-102,240-243), and signal families (tests.py:39-97)
— but demands **bit-exact** float round-trips (stronger than the
reference's atol=1e-16, mtscomp.py:59)."""

import numpy as np
import pytest

from mtslake import codec

RNG = np.random.default_rng(42)

N_SAMPLES = 6996  # ≈ reference fixture: 1234 Hz × 5.67 s (tests.py:39-44)


def _signal(name: str, n: int = N_SAMPLES) -> np.ndarray:
    t = np.arange(n) / 1234.0
    if name == "zeros":
        return np.zeros(n)
    if name == "randn":
        return RNG.normal(0.0, 0.25, n)
    if name == "white_sine":
        return np.sin(10.0 * t) + RNG.normal(0.0, 0.25, n)
    if name == "colored_sine":
        # smoothed sinusoid (reference uses Butterworth; SciPy-free here)
        x = np.sin(10.0 * t) + RNG.normal(0.0, 0.25, n)
        k = np.ones(25) / 25.0
        return np.convolve(x, k, mode="same")
    raise ValueError(name)


SIGNALS = ["zeros", "randn", "white_sine", "colored_sine"]
INT_DTYPES = ["int8", "int16", "int32", "int64", "uint8", "uint16", "uint32"]


@pytest.mark.parametrize("name", SIGNALS)
@pytest.mark.parametrize("dt", ["float32", "float64"])
def test_float_roundtrip_bit_exact(name, dt):
    arr = _signal(name).astype(dt)
    out = codec.decode_column(codec.encode_column(arr))
    assert out.dtype == arr.dtype
    # bit-exact, not just allclose
    assert np.array_equal(out.view(np.uint8), arr.view(np.uint8))


@pytest.mark.parametrize("dt", INT_DTYPES)
def test_int_roundtrip(dt):
    info = np.iinfo(dt)
    arr = RNG.integers(info.min, info.max, size=5000, endpoint=True).astype(dt)
    out = codec.decode_column(codec.encode_column(arr))
    assert out.dtype == arr.dtype
    assert np.array_equal(out, arr)


def test_dod_timestamps_regular_grid_compresses_hard():
    ts = np.arange(0, 10_000) * 900_000_000 + 1_600_000_000_000_000  # 15-min μs grid
    ts = ts.astype(np.int64)
    payload = codec.encode_column(ts, codec.CODEC_DOD)
    out = codec.decode_column(payload)
    assert np.array_equal(out, ts)
    # delta-of-delta of a regular grid is all zeros -> tiny payload
    assert len(payload) < 200


def test_dod_with_jitter_and_gaps():
    base = np.arange(0, 5000, dtype=np.int64) * 900_000_000
    jitter = RNG.integers(-1000, 1000, 5000)
    ts = np.sort(base + jitter + 1_600_000_000_000_000)
    out = codec.decode_column(codec.encode_column(ts, codec.CODEC_DOD))
    assert np.array_equal(out, ts)


def test_extreme_int64_values_wrap_safe():
    arr = np.array(
        [np.iinfo(np.int64).min, -1, 0, 1, np.iinfo(np.int64).max], dtype=np.int64
    )
    out = codec.decode_column(codec.encode_column(arr, codec.CODEC_DELTA))
    assert np.array_equal(out, arr)
    out2 = codec.decode_column(codec.encode_column(arr, codec.CODEC_DOD))
    assert np.array_equal(out2, arr)


def test_nan_inf_negzero_bit_exact():
    arr = np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 1e-300, -1e300])
    out = codec.decode_column(codec.encode_column(arr))
    assert np.array_equal(out.view(np.uint64), arr.view(np.uint64))


@pytest.mark.parametrize("n", [0, 1, 2, 3])
def test_tiny_arrays(n):
    # ≙ reference edge shapes (0,1)/(1,1) (tests.py:163-164)
    f = RNG.normal(size=n)
    assert np.array_equal(
        codec.decode_column(codec.encode_column(f)).view(np.uint64), f.view(np.uint64)
    )
    i = RNG.integers(-100, 100, n).astype(np.int64)
    assert np.array_equal(codec.decode_column(codec.encode_column(i)), i)
    assert np.array_equal(
        codec.decode_column(codec.encode_column(i, codec.CODEC_DOD)), i
    )


def test_raw_codec_roundtrip():
    arr = RNG.normal(size=100)
    out = codec.decode_column(codec.encode_column(arr, codec.CODEC_RAW))
    assert np.array_equal(out.view(np.uint64), arr.view(np.uint64))


def test_compression_beats_raw_on_smooth_signals():
    arr = _signal("colored_sine").astype(np.float64)
    sz = len(codec.encode_column(arr))
    assert sz < arr.nbytes  # must actually compress


def test_sha1_ledger_stable():
    ts = np.arange(10, dtype=np.int64)
    ch = {"v": np.arange(10.0)}
    a = codec.chunk_sha1(ts, ch)
    b = codec.chunk_sha1(ts, {"v": np.arange(10.0)})
    assert a == b and len(a) == 40


def test_tamper_detection():
    # ≙ reference tamper test (tests.py:345-379): flipping payload bytes
    # must not silently decode to the original
    arr = RNG.normal(size=1000)
    payload = bytearray(codec.encode_column(arr))
    payload[30] ^= 0xFF
    try:
        out = codec.decode_column(bytes(payload))
        assert not np.array_equal(out.view(np.uint64), arr.view(np.uint64))
    except Exception:
        pass  # zlib error is an acceptable detection


def test_entropy_false_forces_stored_form_for_large_floats():
    """Regression: entropy=False (the declared-incompressible channel
    contract) was ignored by the XOR byte-plane branch (n >= 1024),
    which still ran per-plane zlib probes. It must take the XOR
    family's stored form — and round-trip."""
    rng = np.random.default_rng(11)
    arr = rng.normal(size=5000)          # n >= 1024 -> planes branch
    enc = codec.encode_column(arr, entropy=False)
    magic, ver, cod, dt, w, n = codec._HEADER.unpack(
        enc[:codec._HEADER.size])
    assert cod & ~codec._STORED_FLAG == codec.CODEC_XOR_RAW
    assert np.array_equal(codec.decode_column(enc), arr)
