"""Portable content hashing for dedup: engine-agnostic, oracle-checkable.

The reference has no dedup surface; these are the LLM-pipeline extension ops
(SURVEY §2.12).  Design constraint: every hash must be computable bit-for-bit
by *any* ANSI-SQL engine so the DuckDB oracle can verify it — hence md5 (the
one hash both engines share), never Spark's xxhash64/murmur (JVM-seeded) or
DuckDB's hash() (engine-private).

``h60`` = first 15 hex digits of md5 as a 60-bit non-negative int64.  MinHash
permutations are universal hashes ``(a*x + b) mod P`` over ``P = 2^31-1``
(Mersenne); operands stay < 2^62 so int64 arithmetic never wraps in either
engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PRIME31 = (1 << 31) - 1  # 2147483647, Mersenne prime


def perm_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs via Lehmer LCG (a != 0).  Pure ints so the
    identical constants can be pasted into oracle SQL strings."""
    x = seed
    out = []
    for _ in range(num_perm):
        x = (x * 48271) % PRIME31
        a = x or 1
        x = (x * 48271) % PRIME31
        out.append((a, x))
    return out


def h60(col: Column) -> Column:
    """60-bit portable string hash: int(md5(s)[:15], 16).

    DuckDB oracle spelling: ``cast(('0x' || substr(md5(s),1,15)) as bigint)``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_signature(
    shingles: Column, num_perm: int = 16, seed: int = 42
) -> Column:
    """MinHash signature (array<long>, length ``num_perm``) of an
    array<string> shingle set.

    The per-shingle base hash is computed once and reused by all
    permutations (num_perm modular ops per shingle, all codegen'd JVM
    arithmetic — the md5 is the only non-trivial cost).
    """
    base = F.transform(shingles, lambda s: h60(s) % PRIME31)
    mins = [
        F.array_min(
            F.transform(base, lambda x: (F.lit(a) * x + F.lit(b)) % PRIME31)
        )
        for a, b in perm_params(num_perm, seed)
    ]
    return F.array(*mins)
