"""Offline ``google.protobuf`` stand-in, backed by :mod:`.minipb`.

This sandbox ships pyspark 4 WITHOUT the protobuf runtime, which is the
single import standing between us and a running
``transformWithStateInPandas`` query (the Python worker's state clients
import ``pyspark.sql.streaming.proto.StateMessage_pb2``, which needs
``google.protobuf``).  :func:`activate` makes the clean-room mini-runtime
under ``protoshim/google/protobuf`` importable — in this process AND in
Spark's Python workers (via PYTHONPATH, which local-mode workers inherit
from the driver environment; a real cluster ships the same directory
with ``--py-files`` / ``spark.executorEnv.PYTHONPATH``).

The real runtime always wins: if ``google.protobuf`` already imports,
activate() is a no-op returning True and the shim path is never added.
"""

from __future__ import annotations

import os
import sys


def shim_dir() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def activate() -> bool:
    """Make ``google.protobuf`` importable here and in Spark workers.

    Returns True when the import works afterwards (real runtime or shim).
    Must run BEFORE the SparkSession launches its JVM for the worker-side
    PYTHONPATH inheritance to take effect.
    """
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    d = shim_dir()
    if d not in sys.path:
        sys.path.insert(0, d)
    pp = os.environ.get("PYTHONPATH", "")
    if d not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{d}{os.pathsep}{pp}" if pp else d
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False
