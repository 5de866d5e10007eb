"""Golden vectors ported from the reference's stablehash tests — these are
portable cross-language oracles (originally from graph-node's Rust suite,
ref stablehash/fast_hasher_test.go:9-11).

Covers: leaf int encodings (impls_test.go:10-28), structural hashing
(fast_hasher_test.go), mixer algebra (fld_test.go), U192 arithmetic
(u192_test.go), and the end-to-end POI digest (poi/poi_test.go:12-29).
"""

import pytest

from substreams_sink_graph_load_spark.stablehash import (
    Bool,
    FastHasher,
    I8,
    I16,
    String,
    U8,
    U16,
    U32,
    ListVal,
    MapVal,
    OptionalVal,
    fast_hash,
    fldmix_combine,
    addr_child,
)
from substreams_sink_graph_load_spark.stablehash.core import ADDRESS_ROOT, M192
from substreams_sink_graph_load_spark.stablehash.values import Hashable
from substreams_sink_graph_load_spark.stablehash.poi import ProofOfIndexing


# --- leaf encodings (impls_test.go:10-28) ----------------------------------

@pytest.mark.parametrize(
    "value,expected",
    [
        (I8(-4), "234333316714235907961649213803594184029"),
        (I8(8), "263946226580928315975306067326554590217"),
        (I16(-256), "2575436948546927940500443723565624388"),
        (I16(256), "201589876719799452230445857493583317400"),
        (U8(8), "263946226580928315975306067326554590217"),
        (U8(255), "182395296116387546137591220945749437249"),
    ],
)
def test_single_value_goldens(value, expected):
    assert str(fast_hash(value)) == expected


# --- structural equivalences (fast_hasher_test.go) -------------------------

class _DoubleChild(Hashable):
    def stable_hash(self, addr, hasher):
        hasher.write(addr_child(addr, 1), b"")
        hasher.write(addr_child(addr, 1), b"")


class _One(Hashable):
    def __init__(self, one):
        self.one = one

    def stable_hash(self, addr, hasher):
        self.one.stable_hash(addr_child(addr, 0), hasher)


class _Two(Hashable):
    def __init__(self, one, two):
        self.one, self.two = one, two

    def stable_hash(self, addr, hasher):
        self.one.stable_hash(addr_child(addr, 0), hasher)
        self.two.stable_hash(addr_child(addr, 1), hasher)


def test_double_child():
    assert str(fast_hash(_DoubleChild())) == "261232071512772414229682083989926651266"


def test_add_optional_field_equivalence():
    one = _One(U32(5))
    two = _Two(U32(5), OptionalVal(None))
    assert str(fast_hash(one)) == "102568403942768160221811810082933398928"
    assert str(fast_hash(two)) == "102568403942768160221811810082933398928"
    tup = _Two(one, two)
    assert str(fast_hash(tup)) == "210303380251691017811466509002544125279"


def test_add_default_field_equivalence():
    one = _One(String("one"))
    two = _Two(String("one"), String(""))
    assert str(fast_hash(one)) == "237994494046445339248193596542695086083"
    assert str(fast_hash(two)) == "237994494046445339248193596542695086083"
    tup = _Two(one, two)
    assert str(fast_hash(tup)) == "337538645577122176555714212704832450090"


@pytest.mark.parametrize(
    "items,expected",
    [
        ([], "320514965852340112707580934281173047643"),
        ([U8(0)], "135263302447443856369810803691068577694"),
        ([U8(1)], "181745098936733907021518655505145702128"),
        ([U8(0), U8(1), U8(3)], "227549997251239301319289036454140551565"),
        ([U8(3), U8(0), U8(1)], "318064286550914597684751961019563608459"),
    ],
)
def test_list_goldens(items, expected):
    assert str(fast_hash(ListVal(items))) == expected


def test_map_order_insensitive():
    first = MapVal({1: "one", 2: "two", 3: "three"})
    second = MapVal({3: "three", 1: "one", 2: "two"})
    assert str(fast_hash(first)) == "60093794751952876589018848897648863192"
    assert str(fast_hash(second)) == "60093794751952876589018848897648863192"


def test_map_differences_detected():
    base = str(fast_hash(MapVal({1: "one", 2: "two", 3: "three"})))
    assert str(fast_hash(MapVal({1: "one", 2: "two", 3: "three", 0: ""}))) != base
    assert str(fast_hash(MapVal({9: "one", 2: "two", 3: "three"}))) != base
    assert str(fast_hash(MapVal({1: "X", 2: "two", 3: "three"}))) != base
    assert str(fast_hash(MapVal({1: "two", 2: "one"}))) != str(
        fast_hash(MapVal({1: "one", 2: "two"}))
    )


# --- mixer algebra (fld_test.go) -------------------------------------------

def test_fldmix_commutative_associative():
    import random

    rng = random.Random(42)
    for _ in range(50):
        x, y, z = (rng.getrandbits(192) for _ in range(3))
        assert fldmix_combine(x, y) == fldmix_combine(y, x)
        assert fldmix_combine(fldmix_combine(x, y), z) == fldmix_combine(
            x, fldmix_combine(y, z)
        )


def test_u192_wrapping():
    assert fldmix_combine(0, 0) != 0  # P offset present
    assert (M192 + 1) & M192 == 0


# --- hasher state roundtrip -------------------------------------------------

def test_fast_hasher_bytes_roundtrip():
    h = FastHasher()
    h.write(ADDRESS_ROOT, b"hello")
    raw = h.to_bytes()
    assert len(raw) == 32
    h2 = FastHasher.from_bytes(raw)
    assert h2.mixer == h.mixer and h2.count == h.count


def test_mixin_is_state_add():
    a = FastHasher()
    a.write(ADDRESS_ROOT, b"x")
    b = FastHasher()
    b.write(addr_child(ADDRESS_ROOT, 4), b"y")
    ab = FastHasher.from_bytes(a.to_bytes())
    ab.mixin(b)
    ba = FastHasher.from_bytes(b.to_bytes())
    ba.mixin(a)
    assert ab.to_bytes() == ba.to_bytes()


# --- POI end-to-end golden (poi/poi_test.go:12-29) --------------------------

def test_poi_block_digest_golden():
    poi = ProofOfIndexing(1)
    poi.set_entity(
        "BlockMeta",
        "day:first:20150730",
        [
            {"name": "at", "new_value": {"Typed": {"String_": "2015-07-30 00:00:00"}}},
            {"name": "number", "new_value": {"Typed": {"Bigint": "1"}}},
            {"name": "hash", "new_value": {"Typed": {"Bytes": "iOltRTe+pNnAXRJUmQezJWHTvzH0Wq5zTNwRnxNAbLY="}}},
            {"name": "parent_hash", "new_value": {"Typed": {"Bytes": "1OVnQPh2rvjAELhqQNX1Z0WhGNCQajTmmuyMDbHLj6M="}}},
            {"name": "timestamp", "new_value": {"Typed": {"String_": "2015-07-30T15:26:28Z"}}},
        ],
    )
    assert (
        poi.current_hex()
        == "993dd21dad9750a531331324bb07e2bcd9501521e1b1c7110800000000000000"
    )


def test_batch_kernels_match_scalar_xxh3():
    """Direct randomized equivalence of the numpy XXH3-128 kernels vs the
    scalar reference: hash32_seeded over random 32-byte words and
    hash1_seeded over every byte value, each at random 63-bit seeds."""
    import random

    import numpy as np

    from substreams_sink_graph_load_spark.stablehash.xxh3 import (
        xxh3_128_seed,
    )
    from substreams_sink_graph_load_spark.stablehash.xxh3_batch import (
        hash1_seeded,
        hash32_seeded,
    )

    rng = random.Random(31)
    n = 256
    payloads = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(n)]
    seeds = [rng.randrange(1 << 63) for _ in range(n)]
    words = np.frombuffer(b"".join(payloads), dtype="<u8").reshape(-1, 4)
    lo, hi = hash32_seeded(words, np.array(seeds, dtype=np.uint64))
    for i in range(n):
        want_lo, want_hi = xxh3_128_seed(payloads[i], seeds[i])
        assert (int(lo[i]), int(hi[i])) == (want_lo, want_hi), i

    byte_seeds = np.array(
        [rng.randrange(1 << 63) for _ in range(256)], dtype=np.uint64
    )
    for bv in range(256):
        lo1, hi1 = hash1_seeded(bv, byte_seeds)
        for j in (0, 17, 255):
            want_lo, want_hi = xxh3_128_seed(bytes([bv]), int(byte_seeds[j]))
            assert (int(lo1[j]), int(hi1[j])) == (want_lo, want_hi), (bv, j)


def test_batch_short_string_kernels_match_scalar():
    """hash_bytes_seeded must be bit-equal to the scalar xxh3_128_seed
    across every length class it dispatches (1-3, 4-8, 9-16 batched;
    0 and >16 scalar fallback), at random 63-bit seeds."""
    import random

    import numpy as np

    from substreams_sink_graph_load_spark.stablehash.xxh3 import (
        xxh3_128_seed,
    )
    from substreams_sink_graph_load_spark.stablehash.xxh3_batch import (
        hash_bytes_seeded,
    )

    rng = random.Random(0xC0FFEE)
    lengths = [0, 1, 2, 3, 4, 5, 7, 8, 9, 11, 15, 16, 17, 24, 40]
    items = [
        bytes(rng.randrange(256) for _ in range(rng.choice(lengths)))
        for _ in range(2000)
    ]
    seeds = np.array([rng.getrandbits(63) for _ in items], dtype=np.uint64)
    lo, hi = hash_bytes_seeded(items, seeds)
    for i, (d, s) in enumerate(zip(items, seeds)):
        assert xxh3_128_seed(d, int(s)) == (int(lo[i]), int(hi[i])), (
            i,
            len(d),
        )
