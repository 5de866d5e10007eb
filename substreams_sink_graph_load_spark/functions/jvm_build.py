"""Runtime javac → jar → ADD JAR plumbing for the session-built Java UDFs.

Shared by the XXH3-128 hash UDF (functions/jvm_xxh3.py) and the
EntityChanges wire-decoder UDF (sources/protobuf.py): each ships a
single-file Java source, compiled once against the running Spark's own
jars and published with an atomic rename so concurrent sessions racing
the first build never observe a torn jar.  On a real cluster the same
jars ride ``--jars``; here they cache under the system tempdir.

Gated on a JDK (``javac``/``jar`` on PATH): builders return None and
callers keep their pure-Python fallbacks — the same graceful posture as
the optional C xxhash accelerator.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile


def spark_jars_classpath() -> str | None:
    """The running Spark's jar directory (for the UDF interfaces)."""
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


def build_udf_jar(
    src: str, jar_name: str, cache_dir: str | None = None
) -> str | None:
    """Compile ``src`` into ``<cache>/<jar_name>`` (mtime-cached); None
    when no JDK or no Spark jars to compile against."""
    javac, jar = shutil.which("javac"), shutil.which("jar")
    cp = spark_jars_classpath()
    if javac is None or jar is None or cp is None:
        return None
    cache_dir = cache_dir or os.path.join(
        tempfile.gettempdir(), "spark_graft_jvm_udfs"
    )
    jar_path = os.path.join(cache_dir, jar_name)
    if os.path.exists(jar_path) and os.path.getmtime(jar_path) >= os.path.getmtime(src):
        return jar_path
    # build in a per-artifact private dir and publish with an atomic
    # rename, so concurrent builds — other sessions racing the first
    # build, or two different UDFs building on threads in one process —
    # never see a torn jar or package each other's class files
    os.makedirs(cache_dir, exist_ok=True)
    classes = tempfile.mkdtemp(prefix=f"classes.{jar_name}.", dir=cache_dir)
    subprocess.run(
        [javac, "-cp", cp, "-d", classes, src],
        check=True, capture_output=True,
    )
    tmp_jar = f"{jar_path}.tmp.{os.path.basename(classes)}"
    subprocess.run(
        [jar, "cf", tmp_jar, "-C", classes, "."],
        check=True, capture_output=True,
    )
    os.replace(tmp_jar, jar_path)
    shutil.rmtree(classes, ignore_errors=True)
    return jar_path


def ensure_java_udf(
    spark,
    func_name: str,
    class_name: str,
    return_type,
    src: str,
    jar_name: str,
    cache_dir: str | None = None,
) -> bool:
    """Build (once), ADD JAR, and register; True when the JVM function is
    callable in this session."""
    if spark.catalog.functionExists(func_name):
        return True  # already registered in this session
    jar_path = build_udf_jar(src, jar_name, cache_dir)
    if jar_path is None:
        return False
    spark.sql(f"ADD JAR '{jar_path}'")
    spark.udf.registerJavaFunction(func_name, class_name, return_type)
    return True
