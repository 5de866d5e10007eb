"""Stable-hash leaf encodings (behavioral port of ref stablehash/impls.go).

Each value type knows how to fold itself into a FastHasher at a field
address.  Key encodings:

- strings/bytes: raw bytes written at the address, empty writes skipped
- bools: single 0x0/0x1 byte
- ints: optional sign marker at child(0) (empty write), then little-endian
  magnitude with trailing zeros trimmed; nothing written for zero
- lists: element i at child(i), then the length as U64 at the address
- maps: each entry hashed into an independent hasher at the *unordered*
  address pair, then the 32-byte state written — order-insensitive thanks to
  the commutative mixer
- Optional Some(x): x at child(0) + empty marker write; None: nothing
- BigDecimal: scale as I64 at child(1), then the bigint at the address
"""

from __future__ import annotations

from .core import ADDRESS_ROOT, FastHasher, addr_child, addr_unordered


class Hashable:
    def stable_hash(self, addr: int, hasher: FastHasher) -> None:
        raise NotImplementedError


def _trim_zeros(b: bytes) -> bytes:
    end = len(b)
    while end and b[end - 1] == 0:
        end -= 1
    return b[:end]


def _stable_hash_int(negative: bool, le_bytes: bytes, addr: int, hasher: FastHasher) -> None:
    if negative:
        hasher.write(addr_child(addr, 0), b"")
    canonical = _trim_zeros(le_bytes)
    if canonical:
        hasher.write(addr, canonical)


class Bytes(Hashable):
    def __init__(self, v: bytes):
        self.v = v

    def stable_hash(self, addr, hasher):
        if self.v:
            hasher.write(addr, self.v)


class String(Bytes):
    def __init__(self, v: str):
        super().__init__(v.encode("utf-8"))


class Bool(Hashable):
    def __init__(self, v: bool):
        self.v = v

    def stable_hash(self, addr, hasher):
        hasher.write(addr, b"\x01" if self.v else b"\x00")


class _FixedInt(Hashable):
    WIDTH = 1
    SIGNED = False

    def __init__(self, v: int):
        self.v = v

    def stable_hash(self, addr, hasher):
        v = self.v
        neg = self.SIGNED and v < 0
        _stable_hash_int(neg, abs(v).to_bytes(self.WIDTH, "little"), addr, hasher)


class U8(_FixedInt):
    WIDTH = 1


class U16(_FixedInt):
    WIDTH = 2


class U32(_FixedInt):
    WIDTH = 4


class U64(_FixedInt):
    WIDTH = 8


class I8(_FixedInt):
    WIDTH = 1
    SIGNED = True


class I16(_FixedInt):
    WIDTH = 2
    SIGNED = True


class I32(_FixedInt):
    WIDTH = 4
    SIGNED = True


class I64(_FixedInt):
    WIDTH = 8
    SIGNED = True


class BigIntVal(Hashable):
    """Arbitrary-precision int: sign child + trimmed little-endian magnitude
    (ref impls.go:167-209)."""

    def __init__(self, v: int):
        self.v = v

    def stable_hash(self, addr, hasher):
        v = self.v
        mag = abs(v)
        le = mag.to_bytes((mag.bit_length() + 7) // 8, "little") if mag else b""
        _stable_hash_int(v < 0, le, addr, hasher)


class OptionalVal(Hashable):
    def __init__(self, inner: Hashable | None):
        self.inner = inner

    def stable_hash(self, addr, hasher):
        if self.inner is not None:
            self.inner.stable_hash(addr_child(addr, 0), hasher)
            hasher.write(addr, b"")


class ListVal(Hashable):
    def __init__(self, items):
        self.items = list(items)

    def stable_hash(self, addr, hasher):
        for i, item in enumerate(self.items):
            item.stable_hash(addr_child(addr, i), hasher)
        U64(len(self.items)).stable_hash(addr, hasher)


class MapVal(Hashable):
    """dict of hashable key -> Hashable value; iteration order irrelevant."""

    def __init__(self, entries: dict):
        self.entries = entries

    def stable_hash(self, addr, hasher):
        for k, v in self.entries.items():
            inner = hasher.new()
            a, b = addr_unordered(addr)
            to_hashable(k).stable_hash(addr_child(a, 0), inner)
            to_hashable(v).stable_hash(addr_child(a, 1), inner)
            hasher.write(b, inner.to_bytes())


class BigDecimalVal(Hashable):
    """Normalized BigDecimal: I64(scale) at child(1) then BigInt at the
    parent slot (ref impls.go:262-276)."""

    def __init__(self, bd):
        self.bd = bd  # big_decimal.BigDecimal

    def stable_hash(self, addr, hasher):
        I64(self.bd.scale).stable_hash(addr_child(addr, 1), hasher)
        BigIntVal(self.bd.int_val).stable_hash(addr, hasher)


def to_hashable(v) -> Hashable:
    if isinstance(v, Hashable):
        return v
    if isinstance(v, bool):
        return Bool(v)
    if isinstance(v, int):
        # reflect-style default: unsigned 32/64 as in MapUnsafe usage
        return U32(v) if 0 <= v < (1 << 32) else U64(v)
    if isinstance(v, str):
        return String(v)
    if isinstance(v, bytes):
        return Bytes(v)
    raise TypeError(f"don't know how to hash value of type {type(v)!r}")


def fast_hash(value: Hashable) -> int:
    """FastHash: hash at the root address, return the u128 digest
    (ref stablehash/lib.go:5-10)."""
    hasher = FastHasher()
    value.stable_hash(ADDRESS_ROOT, hasher)
    return hasher.finish()
