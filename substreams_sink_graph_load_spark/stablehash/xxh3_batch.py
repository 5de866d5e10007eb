"""numpy-vectorized XXH3-128 kernels for the two fixed-length write classes
that dominate the POI fold: 32-byte map-entry states and 1-byte variant
markers.

Every POI write hashes at a DISTINCT seed (the event address), so the
per-call memoization that rescues the map-entry inner states cannot help
here — but the lengths are fixed, so the scalar control flow disappears
and whole write-columns batch through uint64 array arithmetic.  For n=32
the scalar path is exactly one ``_mix32b`` + ``_final_merge``
(xxh3.py:222-233 with every ``n > 32`` branch dead); for n=1 the
``_len_1to3`` combined words are compile-time constants of the byte value.

Differentially tested against the scalar implementation: directly over
random words/seeds (tests/test_stablehash.py:
test_batch_kernels_match_scalar_xxh3) and end-to-end through the batched
POI fold (tests/test_poi_spark.py) — the scalar path stays the semantic
reference.

All arithmetic is ``np.uint64`` with C wrap-around; 128-bit products are
assembled from 32-bit limbs (numpy has no 128-bit integers).
"""

from __future__ import annotations

import numpy as np

from .xxh3 import K_SECRET

_U = np.uint64
_M32 = _U(0xFFFFFFFF)
_P64_1 = _U(0x9E3779B185EBCA87)
_P64_2 = _U(0xC2B2AE3D27D4EB4F)
_P64_3 = _U(0x165667B19E3779F9)
_P64_4 = _U(0x85EBCA77C2B2AE63)
_AVA3 = _U(0x165667919E3779F9)
# pre-wrapped constants (numpy SCALAR ops warn on overflow; arrays wrap)
_N32_P64_1 = _U((32 * 0x9E3779B185EBCA87) & 0xFFFFFFFFFFFFFFFF)

# secret words S0..S3 = r64(K_SECRET, 0/8/16/24); r32 pairs for len-1
_S64 = np.frombuffer(K_SECRET[:32], dtype="<u8").copy()
_S32 = np.frombuffer(K_SECRET[:16], dtype="<u4").astype(np.uint64)


def _mul128_fold64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """low64(a*b) ^ high64(a*b), elementwise, via 32-bit limbs."""
    ah, al = a >> _U(32), a & _M32
    bh, bl = b >> _U(32), b & _M32
    albl = al * bl
    mid1 = ah * bl
    mid2 = al * bh
    carry = ((albl >> _U(32)) + (mid1 & _M32) + (mid2 & _M32)) >> _U(32)
    high = ah * bh + (mid1 >> _U(32)) + (mid2 >> _U(32)) + carry
    low = a * b  # uint64 wrap == low 64 bits
    return low ^ high


def _xxh3_avalanche(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U(37))
    h = h * _AVA3
    return h ^ (h >> _U(32))


def _xxh64_avalanche(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U(33))
    h = h * _P64_2
    h = h ^ (h >> _U(29))
    h = h * _P64_3
    return h ^ (h >> _U(32))


def hash32_seeded(words: np.ndarray, seeds: np.ndarray):
    """XXH3-128 of 32-byte inputs given as (n, 4) little-endian uint64
    words, one seed per row.  Returns (lo, hi) uint64 arrays — bit-equal
    to ``xxh3_128_seed(data, seed)`` for ``len(data) == 32``."""
    w0, w1, w2, w3 = (words[:, i] for i in range(4))
    s0 = _U(_S64[0])
    s1 = _U(_S64[1])
    s2 = _U(_S64[2])
    s3 = _U(_S64[3])
    m1 = _mul128_fold64(w0 ^ (s0 + seeds), w1 ^ (s1 - seeds))
    m2 = _mul128_fold64(w2 ^ (s2 + seeds), w3 ^ (s3 - seeds))
    acc_lo = (_N32_P64_1 + m1) ^ (w2 + w3)
    acc_hi = m2 ^ (w0 + w1)
    h_lo = acc_lo + acc_hi
    h_hi = (
        acc_lo * _P64_1
        + acc_hi * _P64_4
        + (_U(32) - seeds) * _P64_2
    )
    return _xxh3_avalanche(h_lo), _U(0) - _xxh3_avalanche(h_hi)


def hash1_seeded(byte_val: int, seeds: np.ndarray):
    """XXH3-128 of the single byte ``byte_val`` across a seed vector —
    bit-equal to ``xxh3_128_seed(bytes([byte_val]), seed)``."""
    c = byte_val & 0xFF
    combined_l = _U(((c << 16) | (c << 24) | c | (1 << 8)) & 0xFFFFFFFF)
    # rotl32(swap32(combined_l), 13) — both operands constant
    swapped = int.from_bytes(int(combined_l).to_bytes(4, "little"), "big")
    combined_h = _U(((swapped << 13) | (swapped >> 19)) & 0xFFFFFFFF)
    bitflip_l = (_U(_S32[0] ^ _S32[1])) + seeds
    bitflip_h = (_U(_S32[2] ^ _S32[3])) - seeds
    lo = _xxh64_avalanche(combined_l ^ bitflip_l)
    hi = _xxh64_avalanche(combined_h ^ bitflip_h)
    return lo, hi
