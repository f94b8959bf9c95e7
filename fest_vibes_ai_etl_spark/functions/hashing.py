"""Driver-side twin of Spark's ``xxhash64`` for bounded key sets.

The lexical probe needs the ``tb = pmod(xxhash64(term), n)`` bucket of
each QUERY term before it can prune the scan. Evaluating that through the
engine (createDataFrame → select → collect) is a whole job submission —
measured ~0.27 s per probe, half the steady-state BM25 wall — for what is
arithmetic over a handful of driver-side strings. This module implements
the public XXH64 algorithm (https://github.com/Cyan4973/xxHash spec) over
UTF-8 bytes with Spark's default seed 42, so the driver computes the same
bucket the executors' writer expression did with zero jobs.

Parity with the engine is PINNED by a property test
(``tests/test_search.py::test_python_xxhash64_matches_engine``) over
ASCII, unicode, empty, and long strings — any Spark-side change to
``xxhash64`` semantics fails loudly there, never as a silent wrong-bucket
probe.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64(data: bytes | str, seed: int = 42) -> int:
    """XXH64 of ``data`` as Spark's ``xxhash64`` computes it for a string
    column (UTF-8 bytes, seed 42), returned as a SIGNED 64-bit int —
    exactly the engine's LongType value."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little") * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little") * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little") * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little") * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((k * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def pmod_bucket(value: int, n: int) -> int:
    """Spark's ``pmod(x, n)`` for a signed 64-bit x and positive n —
    Python's floored ``%`` is already non-negative for n > 0."""
    return value % n
