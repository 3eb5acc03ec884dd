"""Pure-Python implementation of Spark SQL's ``xxhash64`` expression.

Spark's XxHash64 (org.apache.spark.sql.catalyst.expressions.XXH64 — public
Apache-2.0 source; algorithm is the public XXH64 spec) hashes each child in
order, threading the running hash as the seed of the next, starting from
seed 42:

    hash = 42
    for child in children: hash = computeHash(child_value, child_type, hash)

Per-type primitives used here (matching the XXH64 spec as specialised for
4- and 8-byte inputs, and UTF-8 bytes for strings).

Used ONLY by the oracle side (independent expected-parquet generation) —
the engine uses the JVM expression. Parity with the JVM is asserted in
tests/test_oracle_independence.py.
"""

from __future__ import annotations

M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

DEFAULT_SEED = 42


def _rotl(v: int, n: int) -> int:
    return ((v << n) | (v >> (64 - n))) & M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int) -> int:
    """8-byte primitive (LongType; also DoubleType via raw bits)."""
    value &= M
    h = (seed + P5 + 8) & M
    h ^= (_rotl((value * P2) & M, 31) * P1) & M
    h = ((_rotl(h, 27) * P1) + P4) & M
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """4-byte primitive (IntegerType; Spark hashes int literals this way)."""
    h = (seed + P5 + 4) & M
    h ^= ((value & 0xFFFFFFFF) * P1) & M
    h = ((_rotl(h, 23) * P2) + P3) & M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """XXH64 over a byte buffer (StringType → UTF-8 bytes)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i <= n - 32:
            k1 = int.from_bytes(data[i : i + 8], "little")
            v1 = (_rotl((v1 + k1 * P2) & M, 31) * P1) & M
            k2 = int.from_bytes(data[i + 8 : i + 16], "little")
            v2 = (_rotl((v2 + k2 * P2) & M, 31) * P1) & M
            k3 = int.from_bytes(data[i + 16 : i + 24], "little")
            v3 = (_rotl((v3 + k3 * P2) & M, 31) * P1) & M
            k4 = int.from_bytes(data[i + 24 : i + 32], "little")
            v4 = (_rotl((v4 + k4 * P2) & M, 31) * P1) & M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & M, 31) * P1) & M
            h = ((h * P1) + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i <= n - 8:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((k * P2) & M, 31) * P1) & M
        h = ((_rotl(h, 27) * P1) + P4) & M
        i += 8
    if i <= n - 4:
        k = int.from_bytes(data[i : i + 4], "little")
        h ^= (k * P1) & M
        h = ((_rotl(h, 23) * P2) + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        i += 1
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64(*values, seed: int = DEFAULT_SEED) -> int:
    """Spark-equivalent ``xxhash64(v1, v2, ...)`` → signed int64.

    Each value is ``(kind, v)`` with kind in {"long", "int", "str"} or a bare
    python value (str → "str", int → "long" — pass ("int", v) explicitly for
    IntegerType children such as Spark integer literals).
    """
    h = seed
    for val in values:
        if isinstance(val, tuple):
            kind, v = val
        elif isinstance(val, str):
            kind, v = "str", val
        elif isinstance(val, int):
            kind, v = "long", val
        else:
            raise TypeError(f"unsupported value {val!r}")
        if kind == "str":
            h = hash_bytes(v.encode("utf-8"), h)
        elif kind == "long":
            h = hash_long(v, h)
        elif kind == "int":
            h = hash_int(v, h)
        else:
            raise TypeError(kind)
    return _signed(h)
