"""Pure-Python XXH64 — an engine-independent twin of Spark's
``F.xxhash64`` (which hashes a string column's UTF-8 bytes with
seed 42).

Implemented from the public xxHash specification (Yann Collet,
github.com/Cyan4973/xxHash — public-domain algorithm; no code copied).
Used only in validity constructions: recomputing SimHash signatures on
a second, independent implementation turns the last rows-only contract
query into a graded one (JVM expression pipeline vs Python
reimplementation must agree bit-for-bit).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

SPARK_SEED = 42  # Spark's fixed xxhash64 seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of ``data`` — returns the UNSIGNED 64-bit digest.

    ``xxh64_signed`` matches Spark's LongType output."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = ((_rotl(h, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = ((_rotl(h, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = SPARK_SEED) -> int:
    """Two's-complement view of the digest — equals Spark's
    ``xxhash64(col)`` LongType value for a string column's UTF-8
    bytes."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_long(l: int, seed: int = SPARK_SEED) -> int:
    """Closed-form XXH64 of one 64-bit little-endian block — equals
    ``xxh64(struct.pack('<q', l), seed)`` and Spark's single-column
    ``xxhash64(longCol)`` when ``seed=42``. Returns unsigned."""
    u = l & _M
    h = (seed + _P5 + 8) & _M
    k = (u * _P2) & _M
    k = (_rotl(k, 31) * _P1) & _M
    h ^= k
    h = ((_rotl(h, 27) * _P1) + _P4) & _M
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def spark_xxhash64_longs(*longs: int) -> int:
    """Spark's multi-column ``xxhash64(c1, c2, ...)`` over long columns:
    fields chain through the accumulator (each field's hash seeds the
    next — NOT a byte-concatenated stream). Returns the signed LongType
    value Spark produces."""
    h = SPARK_SEED
    for l in longs:
        h = xxh64_long(l, h)
    return h - (1 << 64) if h >= (1 << 63) else h
