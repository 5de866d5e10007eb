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


# --- variable-length short-string kernels (lengths 1..16) -------------------
#
# The POI fold's remaining scalar hash calls are the entity/id STRING
# writes — two per event, ~15 us each through the pure-Python scalar path.
# Entity names and ids are short (4-16 bytes in every observed schema), so
# the same batching that rescued the fixed-length writes applies: extract
# each string's XXH3 input words once (cheap int.from_bytes), group rows
# by length class, and run each class's arithmetic as uint64 column math.
# Same differential contract as above: bit-equal to xxh3.xxh3_128_seed,
# pinned by test_stablehash's randomized sweep over all lengths 0..40.

_S64_16 = _U(np.frombuffer(K_SECRET[16:24], dtype="<u8")[0])
_S64_24 = _U(np.frombuffer(K_SECRET[24:32], dtype="<u8")[0])
_S64_32 = _U(np.frombuffer(K_SECRET[32:40], dtype="<u8")[0])
_S64_40 = _U(np.frombuffer(K_SECRET[40:48], dtype="<u8")[0])
_S64_48 = _U(np.frombuffer(K_SECRET[48:56], dtype="<u8")[0])
_S64_56 = _U(np.frombuffer(K_SECRET[56:64], dtype="<u8")[0])
_P64_12 = _U(0x9FB21C651E98DF25)
_P32_2M1 = _U(0x85EBCA77 - 1)


def _mul128(a: np.ndarray, b: np.ndarray):
    """(low64, high64) of the elementwise 128-bit product."""
    ah, al = a >> _U(32), a & _M32
    bh, bl = b >> _U(32), b & _M32
    albl = al * bl
    mid1 = ah * bl
    mid2 = al * bh
    carry = ((albl >> _U(32)) + (mid1 & _M32) + (mid2 & _M32)) >> _U(32)
    high = ah * bh + (mid1 >> _U(32)) + (mid2 >> _U(32)) + carry
    return a * b, high


def _swap32_arr(x: np.ndarray) -> np.ndarray:
    x = x & _M32
    return (
        ((x & _U(0xFF)) << _U(24))
        | ((x & _U(0xFF00)) << _U(8))
        | ((x >> _U(8)) & _U(0xFF00))
        | (x >> _U(24))
    )


def hash1to3_seeded(c1, c2, c3, n, seeds):
    """XXH3-128 for 1-3 byte inputs: c1=d[0], c2=d[n>>1], c3=d[n-1]."""
    combined_l = ((c1 << _U(16)) | (c2 << _U(24)) | c3 | (n << _U(8))) & _M32
    combined_h = _swap32_arr(combined_l)
    combined_h = ((combined_h << _U(13)) | (combined_h >> _U(19))) & _M32
    bitflip_l = _U(_S32[0] ^ _S32[1]) + seeds
    bitflip_h = _U(_S32[2] ^ _S32[3]) - seeds
    return (
        _xxh64_avalanche(combined_l ^ bitflip_l),
        _xxh64_avalanche(combined_h ^ bitflip_h),
    )


def hash4to8_seeded(in_lo, in_hi, n, seeds):
    """XXH3-128 for 4-8 byte inputs: in_lo=r32(d,0), in_hi=r32(d,n-4)."""
    seeds = seeds ^ (_swap32_arr(seeds & _M32) << _U(32))
    input_64 = in_lo + (in_hi << _U(32))
    bitflip = (_S64_16 ^ _S64_24) + seeds
    keyed = input_64 ^ bitflip
    m_lo, m_hi = _mul128(keyed, _P64_1 + (n << _U(2)))
    m_hi = m_hi + (m_lo << _U(1))
    m_lo = m_lo ^ (m_hi >> _U(3))
    m_lo = m_lo ^ (m_lo >> _U(35))
    m_lo = m_lo * _P64_12
    m_lo = m_lo ^ (m_lo >> _U(28))
    return m_lo, _xxh3_avalanche(m_hi)


def hash9to16_seeded(in_lo, in_hi, n, seeds):
    """XXH3-128 for 9-16 byte inputs: in_lo=r64(d,0), in_hi=r64(d,n-8)."""
    bitflip_l = (_S64_32 ^ _S64_40) - seeds
    bitflip_h = (_S64_48 ^ _S64_56) + seeds
    m_lo, m_hi = _mul128(in_lo ^ in_hi ^ bitflip_l, _P64_1)
    m_lo = m_lo + ((n - _U(1)) << _U(54))
    in_hi = in_hi ^ bitflip_h
    m_hi = m_hi + in_hi + (in_hi & _M32) * _P32_2M1
    m_lo = m_lo ^ m_hi.byteswap()
    h_lo, h_hi = _mul128(m_lo, _P64_2)
    h_hi = h_hi + m_hi * _P64_2
    return _xxh3_avalanche(h_lo), _xxh3_avalanche(h_hi)


def hash_bytes_seeded(items: list, seeds: np.ndarray):
    """XXH3-128 of variable-length byte strings, one seed per item.

    Lengths 1-16 batch through the class kernels above; empty and >16-byte
    items (rare in POI streams — long ids) fall back to the scalar
    reference one-by-one.  Returns (lo, hi) uint64 arrays, bit-equal to
    ``xxh3.xxh3_128_seed(item, seed)`` per row.
    """
    from .xxh3 import xxh3_128_seed

    n_items = len(items)
    lo = np.empty(n_items, dtype=np.uint64)
    hi = np.empty(n_items, dtype=np.uint64)
    idx13, idx48, idx916, idx_rest = [], [], [], []
    for i, d in enumerate(items):
        ln = len(d)
        if 4 <= ln <= 8:
            idx48.append(i)
        elif 9 <= ln <= 16:
            idx916.append(i)
        elif 1 <= ln <= 3:
            idx13.append(i)
        else:
            idx_rest.append(i)
    if idx48:
        sel = np.array(idx48)
        in_lo = np.array(
            [int.from_bytes(items[i][:4], "little") for i in idx48],
            dtype=np.uint64,
        )
        in_hi = np.array(
            [int.from_bytes(items[i][-4:], "little") for i in idx48],
            dtype=np.uint64,
        )
        n = np.array([len(items[i]) for i in idx48], dtype=np.uint64)
        l, h = hash4to8_seeded(in_lo, in_hi, n, seeds[sel])
        lo[sel], hi[sel] = l, h
    if idx916:
        sel = np.array(idx916)
        in_lo = np.array(
            [int.from_bytes(items[i][:8], "little") for i in idx916],
            dtype=np.uint64,
        )
        in_hi = np.array(
            [int.from_bytes(items[i][-8:], "little") for i in idx916],
            dtype=np.uint64,
        )
        n = np.array([len(items[i]) for i in idx916], dtype=np.uint64)
        l, h = hash9to16_seeded(in_lo, in_hi, n, seeds[sel])
        lo[sel], hi[sel] = l, h
    if idx13:
        sel = np.array(idx13)
        c1 = np.array([items[i][0] for i in idx13], dtype=np.uint64)
        c2 = np.array(
            [items[i][len(items[i]) >> 1] for i in idx13], dtype=np.uint64
        )
        c3 = np.array([items[i][-1] for i in idx13], dtype=np.uint64)
        n = np.array([len(items[i]) for i in idx13], dtype=np.uint64)
        l, h = hash1to3_seeded(c1, c2, c3, n, seeds[sel])
        lo[sel], hi[sel] = l, h
    for i in idx_rest:
        l, h = xxh3_128_seed(items[i], int(seeds[i]))
        lo[i], hi[i] = l, h
    return lo, hi
