"""Pure-Python replica of Spark's `xxhash64(...)` expression —
verification-side only (scripts/build_oracles.py + tests), never on the
execution path.

Spark's XxHash64 chains its arguments: hash starts at the seed (42),
and each argument re-hashes with the previous hash as seed; integers
use the 4-byte fast path, longs the 8-byte fast path, strings their
UTF-8 bytes (org.apache.spark.sql.catalyst.expressions.XXH64).
Equality with Spark is asserted empirically in
tests/test_spark_xxhash64.py over random strings/ints/longs.
"""

from __future__ import annotations

from typing import Sequence, Union

_M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
  return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
  h ^= h >> 33
  h = (h * P2) & _M
  h ^= h >> 29
  h = (h * P3) & _M
  h ^= h >> 32
  return h


def xxh64_long(value: int, seed: int) -> int:
  value &= _M
  h = (seed + P5 + 8) & _M
  h ^= (_rotl((value * P2) & _M, 31) * P1) & _M
  h = ((_rotl(h, 27) * P1) + P4) & _M
  return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
  h = (seed + P5 + 4) & _M
  h ^= ((value & 0xFFFFFFFF) * P1) & _M
  h = ((_rotl(h, 23) * P2) + P3) & _M
  return _fmix(h)


def xxh64_bytes(data: bytes, seed: int) -> int:
  n = len(data)
  i = 0
  if n >= 32:
    v1 = (seed + P1 + P2) & _M
    v2 = (seed + P2) & _M
    v3 = seed & _M
    v4 = (seed - P1) & _M
    while i + 32 <= n:
      v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], 'little') * P2)
                  & _M, 31) * P1) & _M
      v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], 'little')
                   * P2) & _M, 31) * P1) & _M
      v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], 'little')
                   * P2) & _M, 31) * P1) & _M
      v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], 'little')
                   * P2) & _M, 31) * P1) & _M
      i += 32
    h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
         + _rotl(v4, 18)) & _M
    for v in (v1, v2, v3, v4):
      h ^= (_rotl((v * P2) & _M, 31) * P1) & _M
      h = ((h * P1) + P4) & _M
  else:
    h = (seed + P5) & _M
  h = (h + n) & _M
  while i + 8 <= n:
    k = int.from_bytes(data[i:i + 8], 'little')
    h ^= (_rotl((k * P2) & _M, 31) * P1) & _M
    h = ((_rotl(h, 27) * P1) + P4) & _M
    i += 8
  if i + 4 <= n:
    k = int.from_bytes(data[i:i + 4], 'little')
    h ^= (k * P1) & _M
    h = ((_rotl(h, 23) * P2) + P3) & _M
    i += 4
  while i < n:
    h ^= (data[i] * P5) & _M
    h = (_rotl(h, 11) * P1) & _M
    i += 1
  return _fmix(h)


def _to_signed(h: int) -> int:
  return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64(*args: Union[str, int, tuple],
                   seed: int = 42) -> int:
  """Replicates F.xxhash64(*cols): chain-hash each argument with the
  running hash as seed.  Pass python ints as ('int', v) or ('long', v)
  to pick the width (Spark typing); bare ints are treated as 'int'
  (the type of small literals), strs hash their UTF-8 bytes."""
  h = seed & _M
  for a in args:
    if isinstance(a, tuple):
      kind, v = a
    elif isinstance(a, str):
      kind, v = 'str', a
    else:
      kind, v = 'int', a
    if kind == 'str':
      h = xxh64_bytes(v.encode('utf-8'), h)
    elif kind == 'long':
      h = xxh64_long(v, h)
    else:
      h = xxh64_int(v, h)
  return _to_signed(h)
