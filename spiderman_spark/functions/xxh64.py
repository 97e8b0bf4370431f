"""Pure-Python XXH64 — an independent reference implementation of the public
xxHash64 algorithm (Yann Collet, public-domain spec), seeded 42 to match
Spark's builtin ``xxhash64`` on string columns.

Why it exists: the engine's fast hash family (MinHash signatures, rotation
keys) uses Spark's JVM-side ``xxhash64`` for throughput, which DuckDB cannot
evaluate.  Oracle parity is restored by materializing hash *fixtures* with
THIS implementation (no Spark involved) and cross-checking the two
implementations against each other in pytest (tests/test_xxh64.py) — so the
fixture is independent of the engine under test, not an echo of it.

The driver-side simulator also uses it to mirror deterministic rotation
(``pick_rotating`` = ``element_at(options, pmod(xxhash64(key), N) + 1)``).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned 64-bit xxHash64 of ``data`` (default seed 42 = Spark's)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
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


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    """Two's-complement signed value — exactly what Spark's ``xxhash64``
    column returns."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_perm(base: int, i: int, seed: int = 42) -> int:
    """Replicates Spark's TWO-column ``xxhash64(long_col, int_literal)``
    exactly: Spark folds left-to-right with the running hash as the next
    stage's seed — hashLong(base, 42) then hashInt(i, ·) — and each typed
    stage equals the generic byte algorithm over the value's little-endian
    bytes (verified bit-for-bit vs Spark in tests/test_xxh64.py).

    This is the MinHash permutation family of the xxhash64 hash family
    (operators/dedup.minhash_value): one string hash per gram, then k of
    these cheap 8-byte rehashes — the q34 fixture oracle computes the same
    values with this function.  ``base`` accepts Spark's signed value or
    the unsigned equivalent (same 64-bit pattern)."""
    base &= _M  # signed → bit-identical unsigned
    t = xxh64(base.to_bytes(8, "little"), seed)
    return xxh64((i & 0xFFFFFFFF).to_bytes(4, "little"), t)


def xxh64_perm_signed(base: int, i: int) -> int:
    h = xxh64_perm(base, i)
    return h - (1 << 64) if h >= (1 << 63) else h


def pick_rotating(options: list, key: str):
    """Driver-side mirror of ``functions.scalars.pick_rotating``:
    ``options[pmod(xxhash64(key), len(options))]``."""
    return options[xxh64_signed(key.encode()) % len(options)]
