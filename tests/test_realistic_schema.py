"""Realistic subgraph schema (uniswap-v3-shaped — the reference's own demo
workload, devel/uniswap-v3/start.sh): @derivedFrom virtuals, immutable
event entities, BigDecimal-heavy fields, entity references — through
parse -> DDL -> typed extraction -> versioned CSV."""

import json
import os

import pytest

from substreams_sink_graph_load_spark.schema.entities import parse_schema
from substreams_sink_graph_load_spark.sinks.ddl import create_table_ddl
from substreams_sink_graph_load_spark.tocsv import tocsv

SDL = """
type Factory @entity {
  id: ID!
  poolCount: BigInt!
  totalVolumeUSD: BigDecimal!
  owner: ID!
}

type Pool @entity {
  id: ID!
  token0: Token!
  token1: Token!
  feeTier: BigInt!
  liquidity: BigInt!
  sqrtPrice: BigInt!
  token0Price: BigDecimal!
  token1Price: BigDecimal!
  tick: BigInt
  volumeUSD: BigDecimal!
  txCount: BigInt!
  swaps: [Swap!]! @derivedFrom(field: "pool")
}

type Token @entity {
  id: ID!
  symbol: String!
  name: String!
  decimals: BigInt!
  whitelistPools: [Pool!]!
}

type Swap @entity(immutable: true) {
  id: ID!
  pool: Pool!
  sender: Bytes!
  amount0: BigDecimal!
  amount1: BigDecimal!
  sqrtPriceX96: BigInt!
  logIndex: BigInt
}
"""


def test_parse_realistic_schema():
    descs = parse_schema(SDL)
    assert set(descs) == {"factory", "pool", "token", "swap"}
    pool = descs["pool"]
    assert not pool.immutable
    assert descs["swap"].immutable
    # @derivedFrom fields vanish; references collapse to id strings
    assert "swaps" not in pool.fields
    assert pool.fields["token_0"].type.value == "ID"
    # camelCase -> snake_case incl. digit rule (token0Price -> token_0_price)
    assert "token_0_price" in pool.fields
    assert "sqrt_price_x96" in descs["swap"].fields  # upper-before-number: no split


def test_realistic_ddl():
    descs = parse_schema(SDL)
    pool_ddl = create_table_ddl(descs["pool"], "sgd42")
    assert '"block_range" int4range NOT NULL' in pool_ddl
    assert '"token_0_price" numeric NOT NULL' in pool_ddl
    assert '"tick" numeric' in pool_ddl and '"tick" numeric NOT NULL' not in pool_ddl
    swap_ddl = create_table_ddl(descs["swap"], "sgd42")
    assert '"block$" int8 NOT NULL' in swap_ddl
    assert '"sender" bytea NOT NULL' in swap_ddl


def test_realistic_pipeline(spark, tmp_path):
    """Pool updates (the per-swap price/volume churn) through the versioned
    pipeline; Swap events through the immutable layout."""
    import base64

    schema_file = tmp_path / "schema.graphql"
    schema_file.write_text(SDL)

    def ev(block, entity, id_, op, fields):
        return {"entity_change": {"entity": entity, "id": id_, "operation": op,
                "fields": [{"name": n, "new_value": {"Typed": tv}} for n, tv in fields]},
                "block_num": block}

    pool_dir = tmp_path / "jsonl" / "pool"
    pool_dir.mkdir(parents=True)
    with open(pool_dir / "0000000000-0000000999.jsonl", "w") as fh:
        fh.write(json.dumps(ev(12, "Pool", "0xabc", 1, [
            ("token0", {"String_": "0xt0"}), ("token1", {"String_": "0xt1"}),
            ("feeTier", {"Bigint": "3000"}), ("liquidity", {"Bigint": "0"}),
            ("sqrtPrice", {"Bigint": "79228162514264337593543950336"}),
            ("token0Price", {"Bigdecimal": "1.0001"}),
            ("token1Price", {"Bigdecimal": "0.9999"}),
            ("volumeUSD", {"Bigdecimal": "0"}), ("txCount", {"Bigint": "0"}),
        ])) + "\n")
        fh.write(json.dumps(ev(15, "Pool", "0xabc", 2, [
            ("liquidity", {"Bigint": "500000"}),
            ("token0Price", {"Bigdecimal": "1.5"}),
            ("volumeUSD", {"Bigdecimal": "12345.678901234567890123"}),
            ("txCount", {"Bigint": "1"}),
        ])) + "\n")
    files = tocsv(spark, str(tmp_path / "jsonl"), str(tmp_path / "csv"), "pool",
                  str(schema_file), stop_block=1000, bundle_size=1000)
    body = open(files[0]).read().splitlines()
    assert body[0] == (
        "id,block_range,fee_tier,liquidity,sqrt_price,tick,token_0,"
        "token_0_price,token_1,token_1_price,tx_count,volume_usd"
    )
    # closed version keeps creation values; BigInt passthrough keeps the
    # full uint160 sqrtPrice; BigDecimal strings pass through unparsed
    assert body[1] == (
        '0xabc,"[12,15)",3000,0,79228162514264337593543950336,NULL,0xt0,'
        "1.0001,0xt1,0.9999,0,0"
    )
    assert body[2] == (
        '0xabc,"[15,)",3000,500000,79228162514264337593543950336,NULL,0xt0,'
        "1.5,0xt1,0.9999,1,12345.678901234567890123"
    )

    swap_dir = tmp_path / "jsonl" / "swap"
    swap_dir.mkdir(parents=True)
    sender = base64.b64encode(bytes.fromhex("deadbeef00")).decode()
    with open(swap_dir / "0000000000-0000000999.jsonl", "w") as fh:
        fh.write(json.dumps(ev(15, "Swap", "0xabc#1", 1, [
            ("pool", {"String_": "0xabc"}), ("sender", {"Bytes": sender}),
            ("amount0", {"Bigdecimal": "-5.5"}), ("amount1", {"Bigdecimal": "5.49"}),
            ("sqrtPriceX96", {"Bigint": "1"}),
        ])) + "\n")
    files = tocsv(spark, str(tmp_path / "jsonl"), str(tmp_path / "csv"), "swap",
                  str(schema_file), stop_block=1000, bundle_size=1000)
    body = open(files[0]).read().splitlines()
    assert body[1].startswith('0xabc#1,15,-5.5,5.49,NULL,0xabc,\\xdeadbeef00,')
