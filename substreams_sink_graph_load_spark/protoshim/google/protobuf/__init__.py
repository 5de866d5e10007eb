"""Minimal ``google.protobuf`` package backed by the clean-room
mini-runtime in ``substreams_sink_graph_load_spark/protoshim/minipb.py``.

Only present on sys.path when protoshim.activate() found no real
protobuf runtime.  Exposes the handful of modules pyspark's generated
``StateMessage_pb2`` imports (descriptor, descriptor_pool,
runtime_version, symbol_database, internal.builder).
"""

from __future__ import annotations

import os
import sys


def _load_minipb():
    try:
        from substreams_sink_graph_load_spark.protoshim import minipb as m

        return m
    except ImportError:
        # Worker process without the repo root on its path: derive it
        # from this file's location (five levels up).
        here = os.path.abspath(__file__)
        root = here
        for _ in range(5):
            root = os.path.dirname(root)
        if root not in sys.path:
            sys.path.insert(0, root)
        from substreams_sink_graph_load_spark.protoshim import minipb as m

        return m


minipb = _load_minipb()

# Version string of the wire-format spec generation we implement; the
# generated module's runtime_version check is a no-op in this shim.
__version__ = "6.33.0"
