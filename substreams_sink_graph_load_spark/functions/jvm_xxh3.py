"""Register the JVM-side XXH3-128 UDF (the production hash path).

``stablehash/xxh3.py`` is the always-available pure-Python port; its
docstring has promised "at production scale you would register a
JVM-side implementation" since round 1 — this module IS that
implementation, shipped as source (``java/XXH3_128Udf.java``) and
compiled on demand: a one-time ``javac`` + ``jar`` against the running
Spark's own jars, ``ADD JAR`` into the session (which ships it to
executors), then ``spark.udf.registerJavaFunction``.  After that,

    SELECT xxh3_128_seed(data_col, seed_col)

evaluates entirely JVM-side — no Python worker round-trip — returning
the canonical 16-byte big-endian digest.  On a real cluster the same
jar rides ``--jars``; here it is built into a cache dir at first use.

Gated on a JDK: ``ensure_jvm_xxh3`` returns False (and the engine keeps
the numpy-batched Python kernels) when ``javac`` is absent — the same
graceful posture as the optional C ``xxhash`` accelerator, and like it,
the differential test (tests/test_jvm_xxh3.py) pins the JVM output
bit-for-bit against the golden-anchored Python port over every length
class before anyone trusts it.
"""

from __future__ import annotations

import os

from .jvm_build import build_udf_jar, ensure_java_udf, spark_jars_classpath

_CLASS_NAME = "sparkgraft.XXH3_128Udf"
_FUNC_NAME = "xxh3_128_seed"
_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "java",
                    "XXH3_128Udf.java")


def _spark_jars_classpath() -> str | None:
    """The running Spark's jar directory (kept as an alias for callers/
    tests; the shared implementation lives in jvm_build)."""
    return spark_jars_classpath()


def build_jar(cache_dir: str | None = None) -> str | None:
    """Compile the UDF source into a jar (cached); None when no JDK or
    no Spark jars to compile against."""
    return build_udf_jar(_SRC, "xxh3-udf.jar", cache_dir)


def ensure_jvm_xxh3(spark, cache_dir: str | None = None) -> bool:
    """Build (once), ADD JAR, and register ``xxh3_128_seed``; True when
    the JVM function is available in this session."""
    from pyspark.sql.types import BinaryType

    return ensure_java_udf(
        spark, _FUNC_NAME, _CLASS_NAME, BinaryType(), _SRC, "xxh3-udf.jar",
        cache_dir,
    )
