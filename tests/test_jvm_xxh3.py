"""JVM XXH3-128 UDF vs the golden-anchored Python port, bit-for-bit.

The Python port (stablehash/xxh3.py) is the trust anchor: it reproduces
the reference's golden POI digests (test_poi/test_poi_spark) and the
xxHash spec vectors.  This differential run therefore transfers that
anchor to the JVM implementation across EVERY length-class branch of
the dispatch tree (0 / 1-3 / 4-8 / 9-16 / 17-128 / 129-240 / long-path
stripes, block boundaries included) and random 64-bit seeds, including
the custom-secret derivation only seeded long inputs exercise.
"""

from __future__ import annotations

import random
import shutil

import pytest

from substreams_sink_graph_load_spark.stablehash.xxh3 import xxh3_128_seed_int

jdk_present = shutil.which("javac") and shutil.which("jar")

LENGTHS = [
    0, 1, 2, 3, 4, 5, 7, 8, 9, 12, 15, 16,          # short classes
    17, 31, 32, 33, 64, 96, 97, 100, 128,           # 17-128 branches
    129, 160, 240,                                  # midsize
    241, 300, 1023, 1024, 1025, 2048, 5000,         # long path + block edges
]


@pytest.mark.skipif(not jdk_present, reason="no JDK (javac/jar) available")
def test_jvm_matches_python_every_length_class(spark):
    from substreams_sink_graph_load_spark.functions.jvm_xxh3 import (
        ensure_jvm_xxh3,
    )

    assert ensure_jvm_xxh3(spark) is True
    assert ensure_jvm_xxh3(spark) is True  # idempotent re-registration

    rng = random.Random(13)
    rows = []
    for n in LENGTHS:
        for _ in range(6):
            data = bytes(rng.randrange(256) for _ in range(n))
            u = rng.getrandbits(64)
            signed = u - (1 << 64) if u >= (1 << 63) else u
            rows.append((data, signed, u))
        rows.append((bytes(n), 0, 0))  # zero bytes, zero seed (K_SECRET path)

    df = spark.createDataFrame(
        [(d, s) for d, s, _ in rows], "data binary, seed long"
    )
    got = df.selectExpr("data", "seed", "xxh3_128_seed(data, seed) AS h").collect()
    by_key = {(bytes(r["data"]), r["seed"]): bytes(r["h"]) for r in got}
    for d, s, u in rows:
        jvm = int.from_bytes(by_key[(d, s)], "big")
        assert jvm == xxh3_128_seed_int(d, u), (len(d), u)


@pytest.mark.skipif(not jdk_present, reason="no JDK (javac/jar) available")
def test_jvm_null_safety(spark):
    from substreams_sink_graph_load_spark.functions.jvm_xxh3 import (
        ensure_jvm_xxh3,
    )

    assert ensure_jvm_xxh3(spark)
    r = spark.sql(
        "SELECT xxh3_128_seed(cast(NULL AS BINARY), 5L) AS h"
    ).collect()[0]
    assert r["h"] is None
