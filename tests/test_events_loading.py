"""_events vintage handling: the legacy nanosAsLong flag must be scoped.

The helper reads events.parquet across two generator vintages —
TIMESTAMP(NANOS) (loads only via spark.sql.legacy.parquet.nanosAsLong)
and native timestamp[us].  The flag is captured by Spark at analysis
time, so _events sets it for the read and restores the prior value
before returning; collecting the returned (lazy) DataFrame after the
restore must still work, and the session conf must be left exactly as
found in both vintage cases and in either read order.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from substreams_sink_graph_load_spark.plans.queries import _events

FLAG = "spark.sql.legacy.parquet.nanosAsLong"

US = 1_000_000


def _write_events(dirpath: str, unit: str) -> None:
    os.makedirs(dirpath, exist_ok=True)
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "user_id": pa.array([10, 11, 10], type=pa.int64()),
            "event_type": ["a", "b", "a"],
            "ts": pa.array(
                [7 * US * (1000 if unit == "ns" else 1) * i for i in (1, 2, 3)],
                type=pa.timestamp(unit),
            ),
            "value": [1.0, 2.0, 3.0],
        }
    )
    pq.write_table(t, os.path.join(dirpath, "events.parquet"))


@pytest.fixture(scope="module")
def vintage_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("events_vintages")
    nanos = str(base / "nanos")
    native = str(base / "native")
    _write_events(nanos, "ns")
    _write_events(native, "us")
    return nanos, native


@pytest.mark.parametrize("order", ["nanos_first", "native_first"])
def test_events_nanos_flag_scoped(spark, vintage_dirs, order):
    nanos, native = vintage_dirs
    dirs = (nanos, native) if order == "nanos_first" else (native, nanos)

    prior = spark.conf.get(FLAG, None)
    frames = [_events(spark, d) for d in dirs]
    # the helper must leave the session conf exactly as it found it
    assert spark.conf.get(FLAG, None) == prior

    # both vintages normalize to the same microsecond wall values, and
    # the lazy plans still execute AFTER the flag was restored
    for df in frames:
        assert dict(df.dtypes)["ts"] == "timestamp"
        micros = sorted(
            r[0]
            for r in df.selectExpr("unix_micros(ts)").collect()
        )
        assert micros == [7 * US, 14 * US, 21 * US]


def test_events_flag_not_leaked_when_preset(spark, vintage_dirs):
    """A caller that explicitly set the flag keeps their value."""
    nanos, _ = vintage_dirs
    spark.conf.set(FLAG, "false")
    try:
        df = _events(spark, nanos)
        assert spark.conf.get(FLAG) == "false"
        assert df.count() == 3
    finally:
        spark.conf.unset(FLAG)
