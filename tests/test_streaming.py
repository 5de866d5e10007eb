"""Streaming pipeline equivalence: run_stream (microbatched, stateful) must
produce byte-identical bundled CSV to the batch tocsv path.

The file stream delivers bundles in modification-time order; fixtures get
explicit increasing mtimes (the reference's source contract is strictly
block-ordered input, SURVEY §2.10 T1).
"""

import os
import time

import pytest

from test_pipeline_e2e import ACCOUNT_EVENTS, TRANSFER_EVENTS, SDL, read_csv
import json

from substreams_sink_graph_load_spark.streaming import run_stream
from substreams_sink_graph_load_spark.tocsv import tocsv


@pytest.fixture()
def fixture_dirs(tmp_path):
    src = tmp_path / "jsonl"
    schema_file = tmp_path / "schema.graphql"
    schema_file.write_text(SDL)
    now = time.time()
    for entity, files in (("account", ACCOUNT_EVENTS), ("transfer", TRANSFER_EVENTS)):
        d = src / entity
        d.mkdir(parents=True)
        for i, (fname, events) in enumerate(sorted(files.items())):
            p = d / fname
            with open(p, "w") as fh:
                for e in events:
                    fh.write(json.dumps(e) + "\n")
            os.utime(p, (now + i, now + i))  # force block-ordered delivery
    return str(src), str(tmp_path)


def _engines():
    """Both state engines when TWS can run here, else replay only."""
    from substreams_sink_graph_load_spark.streaming.stateful import (
        tws_available,
    )

    return ["replay", "tws"] if tws_available() else ["replay"]


def _run_both(spark, src, base, entity, schema_file, stop_block,
              stateful="auto"):
    batch_dest = os.path.join(base, "batch_csv")
    stream_dest = os.path.join(base, "stream_csv")
    tocsv(spark, src, batch_dest, entity, schema_file, stop_block=stop_block, bundle_size=1000)
    files = run_stream(
        spark, src, stream_dest, entity, schema_file,
        stop_block=stop_block, bundle_size=1000, stateful=stateful,
    )
    return batch_dest, stream_dest, files


@pytest.mark.parametrize("engine", _engines())
def test_stream_equals_batch_mutable(spark, fixture_dirs, engine):
    src, base = fixture_dirs
    schema_file = os.path.join(base, "schema.graphql")
    batch_dest, stream_dest, files = _run_both(
        spark, src, base, "account", schema_file, 3000, stateful=engine
    )
    names = [os.path.basename(f) for f in files]
    assert names == [
        "0000000000-0000000999.csv",
        "0000001000-0000001999.csv",
        "0000002000-0000002999.csv",
    ]
    for n in names:
        assert read_csv(stream_dest, "account", n) == read_csv(batch_dest, "account", n)
    # cross-batch state: version closed by a DELETE two bundles later
    assert 'a1,"[500,2100)"' in read_csv(stream_dest, "account", names[2])
    with open(os.path.join(stream_dest, "last_block.txt")) as fh:
        assert fh.read() == "2200:\n"


def test_stream_equals_batch_immutable(spark, fixture_dirs):
    src, base = fixture_dirs
    schema_file = os.path.join(base, "schema.graphql")
    batch_dest, stream_dest, files = _run_both(
        spark, src, base, "transfer", schema_file, 3000
    )
    for f in files:
        n = os.path.basename(f)
        assert read_csv(stream_dest, "transfer", n) == read_csv(batch_dest, "transfer", n)


@pytest.mark.parametrize("engine", _engines())
def test_stream_stop_block(spark, fixture_dirs, engine):
    src, base = fixture_dirs
    schema_file = os.path.join(base, "schema.graphql")
    _, stream_dest, files = _run_both(
        spark, src, base, "account", schema_file, 2500, stateful=engine
    )
    assert os.path.basename(files[-1]) == "0000002000-0000002499.csv"
    assert 'a2,"[2200,)"' in read_csv(stream_dest, "account", "0000002000-0000002499.csv")


@pytest.mark.parametrize("engine", _engines())
def test_stream_resume_across_runs(spark, fixture_dirs, engine):
    """T5 resume: stop after the first bundle, restart with the same
    workdir/checkpoint, deliver the rest — output must equal the batch
    pipeline over the full log (state + file cursor both survive; on the
    TWS engine the state lives in the RocksDB store under the checkpoint
    and the open versions are read back through the statestore reader)."""
    import shutil

    src, base = fixture_dirs
    schema_file = os.path.join(base, "schema.graphql")
    # phase 1: only the first bundle exists
    partial_src = os.path.join(base, "partial_src")
    d = os.path.join(partial_src, "account")
    os.makedirs(d)
    names = sorted(os.listdir(os.path.join(src, "account")))
    shutil.copy(os.path.join(src, "account", names[0]), os.path.join(d, names[0]))
    stream_dest = os.path.join(base, "resume_csv")
    workdir = os.path.join(base, "resume_work")
    run_stream(spark, partial_src, stream_dest, "account", schema_file,
               stop_block=3000, bundle_size=1000, workdir=workdir,
               stateful=engine)
    # phase 2: the remaining bundles arrive; same checkpoint + state
    for n in names[1:]:
        shutil.copy(os.path.join(src, "account", n), os.path.join(d, n))
        t = time.time() + 10
        os.utime(os.path.join(d, n), (t, t))
    run_stream(spark, partial_src, stream_dest, "account", schema_file,
               stop_block=3000, bundle_size=1000, workdir=workdir,
               stateful=engine)
    batch_dest = os.path.join(base, "resume_batch")
    tocsv(spark, src, batch_dest, "account", schema_file,
          stop_block=3000, bundle_size=1000)
    for n in ["0000000000-0000000999.csv", "0000001000-0000001999.csv",
              "0000002000-0000002999.csv"]:
        assert read_csv(stream_dest, "account", n) == read_csv(batch_dest, "account", n)


def test_parse_change_lines_stream_order_key_recovers_line_order(spark, tmp_path):
    """The window-free (block_num, seq, sub_seq) key of
    parse_change_lines_stream must order same-block events exactly like
    parse_change_lines' dense per-file line number — including when one
    file is read as SEVERAL scan splits (seq = split byte offset,
    sub_seq = in-partition row index), the case the TWS ordering
    contract at 100 TB depends on."""
    import json as _json

    from pyspark.sql import functions as F

    from substreams_sink_graph_load_spark.sources.jsonl import (
        parse_change_lines,
        parse_change_lines_stream,
    )

    p = tmp_path / "0000000000-0000000999.jsonl"
    n = 400
    with open(p, "w") as fh:
        for i in range(n):
            fh.write(_json.dumps({
                "entity_change": {"entity": "acc", "id": f"e{i}",
                                  "operation": 2, "fields": []},
                # many events share a block: line order is the tiebreaker
                "block_num": i // 25,
            }) + "\n")

    prior = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # force the single file into many splits
        spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
        raw = (
            spark.read.format("text").load(str(p))
            .select(
                "value",
                F.col("_metadata.file_path").alias("_file"),
                F.col("_metadata.file_block_start").alias("_bstart"),
            )
        )
        want = [
            r["id"]
            for r in parse_change_lines(raw)
            .orderBy("block_num", "_line_no")
            .collect()
        ]
        got = [
            r["id"]
            for r in parse_change_lines_stream(raw)
            .orderBy("block_num", "seq", "sub_seq")
            .collect()
        ]
        n_splits = raw.rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prior)
    assert n_splits > 3  # the multi-split shape actually materialized
    assert got == want == [f"e{i}" for i in range(n)]
