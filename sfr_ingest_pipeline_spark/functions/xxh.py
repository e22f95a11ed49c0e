"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` (seed 42) bit-for-bit.

The table clusters files by ``pmod(xxhash64(conv_id), n_buckets)``
(transcript_table.bucket_expr). Point lookups need that bucket driver-side:
launching a 1-row Spark job just to hash one key costs ~100 ms of scheduler
latency per call. This module reimplements the XXH64 algorithm (public
specification, Yann Collet; the same algorithm Spark's
``org.apache.spark.sql.catalyst.expressions.XxHash64`` implements for string
inputs: XXH64 over the UTF-8 bytes, seed 42) and is verified against Spark in
tests/test_table.py.
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def xxhash64_bytes(data: bytes, seed: int = 42) -> int:
    """Unsigned XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h = ((_rotl(h ^ _round(0, int.from_bytes(data[i : i + 8], "little")), 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ (int.from_bytes(data[i : i + 4], "little") * _P1) & _M, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _M, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxhash64_str(s: str, seed: int = 42) -> int:
    """Signed 64-bit XXH64 of a string's UTF-8 bytes — equals Spark's
    ``F.xxhash64(col)`` for a non-null string column."""
    h = xxhash64_bytes(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def bucket_of(conv_id: str, n_buckets: int) -> int:
    """Driver-side twin of ``transcript_table.bucket_expr`` —
    ``pmod(xxhash64(conv_id), n_buckets)`` (Python's ``%`` IS pmod)."""
    return xxhash64_str(conv_id) % n_buckets
