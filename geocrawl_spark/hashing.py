"""Pure-Python XXH64 matching Spark's built-in ``xxhash64`` on strings.

Spark hashes a StringType column as XXH64 over its UTF-8 bytes with
seed 42 (org.apache.spark.sql.catalyst.expressions.XxHash64).  The
single-threaded pyref oracle (pyref.py) needs bit-identical hashes
without a JVM, so we carry this ~60-line reference implementation and
unit-test it against Spark (tests/test_hashing.py).

Used for: URL-seen shard routing (shard = h % n_shards), bloom-filter
double hashing, and deterministic synthetic-data generation.
"""

from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_MASK = 0xFFFFFFFFFFFFFFFF

SPARK_XXHASH_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _MASK
    acc = _rotl(acc, 31)
    return (acc * _P1) & _MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _MASK


def xxh64(data: bytes, seed: int = SPARK_XXHASH_SEED) -> int:
    """XXH64 of ``data`` as an unsigned 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = SPARK_XXHASH_SEED) -> int:
    """XXH64 as a signed 64-bit int — the value Spark's xxhash64 returns."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def url_hash(url: str) -> int:
    """Signed 64-bit hash of a URL — identical to ``F.xxhash64(col)``."""
    return xxh64_signed(url.encode("utf-8"))


def url_hash2(url: str) -> int:
    """Second independent hash — identical to ``F.xxhash64(concat(col, '#h2'))``."""
    return xxh64_signed((url + "#h2").encode("utf-8"))


def shard_of(h: int, n_shards: int) -> int:
    """Shard id from a signed 64-bit hash — identical to ``F.pmod(h, n)``."""
    return h % n_shards  # Python % is already the positive mod for n>0


def hashes_to_uint64(h: "np.ndarray") -> "np.ndarray":
    """Reinterpret an int64 hash array as uint64 (vectorized, no copy)."""
    return np.asarray(h, dtype=np.int64).view(np.uint64)
