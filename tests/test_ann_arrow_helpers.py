"""Focused tests for the r12 zero-copy Arrow boundary helpers.

``vec_block``/``list_array`` replaced the row-wise pandas conversion in
every mapInArrow numeric operator (guide §4.2); they must be exact
inverses on rectangular input and fail loudly on ragged input, or a
silently reshaped batch would corrupt every downstream dot product.
``narrower_than_cores`` replaced the ``df.rdd`` partition probe; its
planner-stats predicate must agree with the scan-split arithmetic it
stands in for.
"""

import numpy as np
import pyarrow as pa
import pytest

from substreams_sink_graph_load_spark.operators.ann import (
    fan_out_narrow,
    list_array,
    narrower_than_cores,
    vec_block,
)


def test_vec_block_shape_and_values():
    rows = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]
    col = pa.array(rows, type=pa.list_(pa.float64()))
    block = vec_block(col)
    assert block.shape == (2, 3)
    np.testing.assert_array_equal(block, np.array(rows))


def test_vec_block_empty_column():
    col = pa.array([], type=pa.list_(pa.float64()))
    assert vec_block(col).shape[0] == 0


def test_vec_block_ragged_raises():
    col = pa.array([[1.0, 2.0], [3.0]], type=pa.list_(pa.float64()))
    with pytest.raises(ValueError):
        vec_block(col)


def test_vec_block_sliced_offset_column():
    # ChunkedArray slices arrive with a non-zero offset; flatten() must
    # still yield only the slice's values, not the parent buffer's.
    col = pa.array(
        [[9.0, 9.0], [1.0, 2.0], [3.0, 4.0]], type=pa.list_(pa.float64())
    ).slice(1)
    np.testing.assert_array_equal(vec_block(col), [[1.0, 2.0], [3.0, 4.0]])


@pytest.mark.parametrize("dtype,pa_type", [("float64", None), ("int64", pa.int64())])
def test_list_array_roundtrip(dtype, pa_type):
    mat = np.arange(12, dtype=dtype).reshape(3, 4)
    col = list_array(mat, value_type=pa_type)
    assert col.to_pylist() == mat.tolist()
    np.testing.assert_array_equal(vec_block(col), mat)


def test_list_array_zero_rows():
    col = list_array(np.zeros((0, 5)))
    assert len(col) == 0


def test_list_array_noncontiguous_input():
    mat = np.arange(24, dtype="float64").reshape(4, 6)[:, ::2]
    col = list_array(mat)
    assert col.to_pylist() == mat.tolist()


def test_narrower_than_cores_matches_rdd_probe(spark, sf_dir):
    # The planner-stats predicate must agree with the .rdd probe it
    # replaced on the real scans the operators feed it (single-row-group
    # parquet: both say "narrow"), and a post-repartition frame must
    # report wide.
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cores = spark.sparkContext.defaultParallelism
    assert narrower_than_cores(emb) == (emb.rdd.getNumPartitions() < cores)
    wide = fan_out_narrow(emb)
    assert wide.rdd.getNumPartitions() >= min(cores, max(emb.count(), 1))


def test_fan_out_min_bytes_gate(spark, sf_dir):
    # Below the gate the frame must pass through with NO added exchange.
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    gated = fan_out_narrow(emb, min_bytes=1 << 40)
    assert gated is emb


def test_fan_out_single_plan_read(spark, sf_dir, monkeypatch):
    # r12 verdict item 4: the gated fan-out planned the frame TWICE (the
    # min_bytes gate read optimizedPlan().stats(), then
    # narrower_than_cores re-read the same estimate) — ~50 ms of driver
    # time each inside the timed region.  Pin: exactly ONE
    # plan_size_estimate call per fan_out_narrow call, gated or not.
    from substreams_sink_graph_load_spark.operators import ann

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    calls = []
    real = ann.plan_size_estimate
    monkeypatch.setattr(
        ann, "plan_size_estimate", lambda df: calls.append(1) or real(df)
    )
    ann.fan_out_narrow(emb, min_bytes=2_000_000)
    assert len(calls) == 1
    calls.clear()
    ann.fan_out_narrow(emb)
    assert len(calls) == 1
