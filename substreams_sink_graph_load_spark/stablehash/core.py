"""Stable-hash core: field addresses, the commutative 192-bit mixer, and the
FastHasher state machine.

Behavioral port of the reference's stablehash package (ref stablehash/
address.go, fld.go, u192.go, fast_hasher.go), which itself ports graph-node's
Rust implementation.  Python ints replace the limb arithmetic — every op is
masked to the right width, so results are bit-identical.

Algebra: the mixer fold ``u(x,y) = P + Q*(x+y) + R*x*y (mod 2^192)`` is
commutative and associative (proven by the reference's fld_test.go), which is
exactly what lets the per-block digest distribute over Spark partitions as a
monoid and recombine in any order.
"""

from __future__ import annotations

from .xxh3 import xxh3_128_seed

M63 = (1 << 63) - 1
M64 = (1 << 64) - 1
M128 = (1 << 128) - 1
M192 = (1 << 192) - 1

# FldMix constants (ref stablehash/fld.go:13-22), limbs little-endian.
_P = 2305843009213693959 + (2305843009213693950 << 64)
_Q = 18446744073709551609
_R = 8
_I = 16140901064495857665 + (M64 << 64) + (M64 << 128)

ADDRESS_ROOT = 17
_CHILD_MUL = 486_187_739


def addr_child(addr: int, number: int) -> int:
    """child(n) = addr * 486187739 + n (mod 2^128) (ref address.go:35-54)."""
    return (addr * _CHILD_MUL + number) & M128


def addr_children(addr: int, numbers) -> int:
    for n in numbers:
        addr = (addr * _CHILD_MUL + n) & M128
    return addr


def addr_unordered(addr: int) -> tuple[int, int]:
    """unordered() = (root, addr) — the per-entry independent-hasher address
    pair used for map hashing."""
    return ADDRESS_ROOT, addr


def fldmix_combine(x: int, y: int) -> int:
    """u(x,y) = P + Q*(x+y) + R*x*y, everything mod 2^192."""
    return (_P + _Q * (x + y) + _R * x * y) & M192


class FastHasher:
    """32-byte-state hasher: 24-byte commutative mixer + 8-byte write count
    (ref stablehash/fast_hasher.go)."""

    __slots__ = ("mixer", "count")

    def __init__(self, mixer: int = _I, count: int = 0):
        self.mixer = mixer
        self.count = count

    @classmethod
    def from_bytes(cls, raw: bytes) -> "FastHasher":
        if len(raw) != 32:
            raise ValueError(f"accepting exactly 32 bytes, got {len(raw)}")
        return cls(
            mixer=int.from_bytes(raw[0:24], "little"),
            count=int.from_bytes(raw[24:32], "little"),
        )

    def to_bytes(self) -> bytes:
        return self.mixer.to_bytes(24, "little") + (self.count & M64).to_bytes(8, "little")

    def new(self) -> "FastHasher":
        return FastHasher()

    def write(self, addr: int, data: bytes | None) -> None:
        """hash = xxh3_128(data, seed=low64(addr)); mix(hash, high64(addr))."""
        lo, hi = xxh3_128_seed(data or b"", addr & M64)
        value = (addr >> 64) & M63
        value |= lo << 64
        value |= hi << 128
        self.mixer = fldmix_combine(self.mixer, value)
        self.count = (self.count + 1) & M64

    def mixin(self, other: "FastHasher") -> None:
        self.mixer = fldmix_combine(self.mixer, other.mixer)
        self.count = (self.count + other.count) & M64

    def finish(self) -> int:
        """u128 = xxh3_128(mixer bytes, seed=count)."""
        lo, hi = xxh3_128_seed(self.mixer.to_bytes(24, "little"), self.count)
        return (hi << 64) | lo
