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
import shutil
import subprocess
import tempfile

_CLASS_NAME = "sparkgraft.XXH3_128Udf"
_FUNC_NAME = "xxh3_128_seed"
_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "java",
                    "XXH3_128Udf.java")


def _spark_jars_classpath() -> str | None:
    """The running Spark's jar directory (for the UDF2 interface)."""
    try:
        import pyspark

        jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        if os.path.isdir(jars):
            return os.path.join(jars, "*")
    except ImportError:  # pragma: no cover - pyspark is a hard dep
        pass
    spark_home = os.environ.get("SPARK_HOME")
    if spark_home and os.path.isdir(os.path.join(spark_home, "jars")):
        return os.path.join(spark_home, "jars", "*")
    return None


def build_jar(cache_dir: str | None = None) -> str | None:
    """Compile the UDF source into a jar (cached); None when no JDK or
    no Spark jars to compile against."""
    javac, jar = shutil.which("javac"), shutil.which("jar")
    cp = _spark_jars_classpath()
    if javac is None or jar is None or cp is None:
        return None
    cache_dir = cache_dir or os.path.join(
        tempfile.gettempdir(), "spark_graft_jvm_xxh3"
    )
    jar_path = os.path.join(cache_dir, "xxh3-udf.jar")
    if os.path.exists(jar_path) and os.path.getmtime(jar_path) >= os.path.getmtime(_SRC):
        return jar_path
    # build in a pid-scoped dir and publish with an atomic rename, so
    # concurrent sessions racing the first build never see a torn jar
    classes = os.path.join(cache_dir, f"classes.{os.getpid()}")
    os.makedirs(classes, exist_ok=True)
    subprocess.run(
        [javac, "-cp", cp, "-d", classes, _SRC],
        check=True, capture_output=True,
    )
    tmp_jar = f"{jar_path}.tmp.{os.getpid()}"
    subprocess.run(
        [jar, "cf", tmp_jar, "-C", classes, "."],
        check=True, capture_output=True,
    )
    os.replace(tmp_jar, jar_path)
    shutil.rmtree(classes, ignore_errors=True)
    return jar_path


def ensure_jvm_xxh3(spark, cache_dir: str | None = None) -> bool:
    """Build (once), ADD JAR, and register ``xxh3_128_seed``; True when
    the JVM function is available in this session."""
    if spark.catalog.functionExists(_FUNC_NAME):
        return True  # already registered in this session
    jar_path = build_jar(cache_dir)
    if jar_path is None:
        return False
    from pyspark.sql.types import BinaryType

    spark.sql(f"ADD JAR '{jar_path}'")
    spark.udf.registerJavaFunction(_FUNC_NAME, _CLASS_NAME, BinaryType())
    return True
