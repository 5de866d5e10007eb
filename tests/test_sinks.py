"""Postgres sink + DDL lifecycle: COPY assembly, FORCE_NOT_NULL derivation,
file pruning, header validation, index/handoff SQL — plus a DuckDB load of
the real pipeline CSVs standing in for the COPY server side."""

import os

import duckdb
import pytest

from substreams_sink_graph_load_spark.schema.entities import parse_schema
from substreams_sink_graph_load_spark.sinks import (
    build_copy_sql,
    create_index_sql,
    create_table_ddl,
    deployment_schema_sql,
    drop_index_sql,
    extract_index_sql,
    force_not_null_columns,
    handoff_sql,
    list_entities,
    list_candidate_files,
    validate_csv_header,
)

SDL = """
type Account @entity {
  id: ID!
  name: String!
  balance: BigInt!
  note: String
  tags: [String!]
}
type Transfer @entity(immutable: true) {
  id: ID!
  value: BigInt!
}
"""

DESCS = parse_schema(SDL)


def test_force_not_null():
    assert force_not_null_columns(DESCS["account"]) == [
        "id", "block_range", "balance", "name", "tags",
    ]
    assert force_not_null_columns(DESCS["transfer"]) == ["id", "block$", "value"]


def test_copy_sql():
    sql = build_copy_sql(
        "sgd1", "account", ["id", "block_range", "name"], ["id", "block_range"]
    )
    assert sql == (
        'COPY "sgd1"."account" ("id", "block_range", "name") FROM STDIN '
        'WITH (FORMAT CSV, HEADER, FORCE_NOT_NULL ("id", "block_range"))'
    )


def test_candidate_file_pruning(tmp_path):
    for s, e in [(0, 999), (1000, 1999), (2000, 2999), (3000, 3999)]:
        (tmp_path / f"{s:010d}-{e:010d}.csv").write_text("id,block_range\n")
    (tmp_path / "junk.txt").write_text("x")
    got = [os.path.basename(p) for p in list_candidate_files(str(tmp_path), 1500, 3000)]
    assert got == ["0000001000-0000001999.csv", "0000002000-0000002999.csv"]


def test_header_validation(tmp_path):
    good = tmp_path / "ok.csv"
    good.write_text("id,block_range,balance,name,note,tags\n")
    cols = validate_csv_header(str(good), DESCS["account"])
    assert cols[0:2] == ["id", "block_range"]
    bad = tmp_path / "bad.csv"
    bad.write_text("block_range,id\n")
    with pytest.raises(ValueError, match="must be 'id'"):
        validate_csv_header(str(bad), DESCS["account"])
    wrong = tmp_path / "wrong.csv"
    wrong.write_text("id,block$\n")
    with pytest.raises(ValueError, match="block_range"):
        validate_csv_header(str(wrong), DESCS["account"])


def test_create_table_ddl():
    ddl = create_table_ddl(DESCS["account"], "sgd7")
    assert '"id" text NOT NULL' in ddl
    assert '"block_range" int4range NOT NULL' in ddl
    assert '"balance" numeric NOT NULL' in ddl
    assert '"note" text' in ddl and '"note" text NOT NULL' not in ddl
    assert '"tags" text[] NOT NULL' in ddl
    immut = create_table_ddl(DESCS["transfer"], "sgd7")
    assert '"block$" int8 NOT NULL' in immut


def test_index_lifecycle_sql():
    assert "pg_indexes" in extract_index_sql("sgd1")
    drops = drop_index_sql(
        "sgd1",
        {
            "account": ["account_pkey", "account_block_range_excl", "attr_0_name"],
            "other_tbl": ["other_idx"],
        },
        schema_tables={"account"},
    )
    assert drops == ['DROP INDEX IF EXISTS "sgd1"."attr_0_name"']
    lanes = create_index_sql([f"CREATE INDEX i{n}" for n in range(25)], 10)
    assert len(lanes) == 10
    assert sum(len(l) for l in lanes) == 25


def test_handoff_and_lookup_sql():
    sql = handoff_sql("QmHash", 123, "0xABCDEF")
    assert "latest_ethereum_block_hash='abcdef'" in sql
    assert "latest_ethereum_block_number=123" in sql
    assert "entity_count=1000000" in sql
    assert "firehose_cursor=''" in sql
    assert "deployment='QmHash'" in sql
    assert "deployment_schemas" in deployment_schema_sql("QmHash")


def test_list_entities(tmp_path):
    f = tmp_path / "schema.graphql"
    f.write_text(SDL)
    assert list_entities(str(f)) == ["account", "transfer"]


def test_duckdb_loads_pipeline_csv(spark, tmp_path):
    """The generated CSVs load as valid CSV into a SQL engine with the COPY
    options' semantics (header row, NULL literal handling) — a stand-in for
    the Postgres server side."""
    import test_pipeline_e2e as e2e
    import json

    src = tmp_path / "jsonl"
    schema_file = tmp_path / "schema.graphql"
    schema_file.write_text(e2e.SDL)
    d = src / "account"
    d.mkdir(parents=True)
    for fname, events in e2e.ACCOUNT_EVENTS.items():
        with open(d / fname, "w") as fh:
            for e in events:
                fh.write(json.dumps(e) + "\n")
    from substreams_sink_graph_load_spark.tocsv import tocsv

    files = tocsv(
        spark, str(src), str(tmp_path / "csv"), "account", str(schema_file),
        stop_block=3000, bundle_size=1000,
    )
    con = duckdb.connect()
    total = 0
    for f in files:
        rows = con.execute(
            "select count(*), count(id), count(block_range) from "
            f"read_csv('{f}', header=true, all_varchar=true, nullstr='NULL')"
        ).fetchone()
        total += rows[0]
        assert rows[1] == rows[0] and rows[2] == rows[0]  # NOT NULL columns
    assert total == 3  # two a1 versions + one open a2 row
