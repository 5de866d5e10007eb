"""GraphQL schema parsing parity (ref schema/entities.go:60-225)."""

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
)

from substreams_sink_graph_load_spark.schema import FieldType, parse_schema

SDL = """
type Account @entity {
  id: ID!
  name: String!
  balance: BigInt!
  rate: BigDecimal
  active: Boolean!
  txCount: Int!
  payload: Bytes
  tags: [String!]
  amounts: [BigInt!]
  owner: Owner
  things: [Thing!]! @derivedFrom(field: "account")
}

type Transfer @entity(immutable: true) {
  id: ID!
  fromAccount: String!
  toAccount: String!
  value: BigInt!
  data: Bytes!
}

type Owner {
  id: ID!
}
"""


def test_entities_detected():
    ents = parse_schema(SDL)
    # Owner has no @entity -> not a table
    assert set(ents) == {"account", "transfer"}
    assert not ents["account"].immutable
    assert ents["transfer"].immutable


def test_field_mapping():
    acc = parse_schema(SDL)["account"]
    f = acc.fields
    assert f["id"].type == FieldType.ID and not f["id"].nullable
    assert f["name"].type == FieldType.STRING and not f["name"].nullable
    assert f["balance"].type == FieldType.BIGINT
    assert f["rate"].type == FieldType.BIGDECIMAL and f["rate"].nullable
    assert f["active"].type == FieldType.BOOLEAN
    assert f["tx_count"].type == FieldType.INT  # camelCase normalized
    assert f["payload"].type == FieldType.BYTES
    assert f["tags"].array and not f["tags"].nullable  # element nullability
    assert f["amounts"].array and f["amounts"].type == FieldType.BIGINT
    # entity reference -> stored as id string
    assert f["owner"].type == FieldType.ID
    # @derivedFrom skipped entirely
    assert "things" not in f


def test_csv_columns_order():
    ents = parse_schema(SDL)
    # id, block_range, then alphabetical (ref writer.go:142-156)
    assert ents["account"].csv_columns() == [
        "id", "block_range",
        "active", "amounts", "balance", "name", "owner", "payload", "rate", "tags", "tx_count",
    ]
    assert ents["transfer"].csv_columns() == [
        "id", "block$", "data", "from_account", "to_account", "value",
    ]


def test_spark_schema():
    ents = parse_schema(SDL)
    acc = ents["account"].spark_schema()
    by_name = {f.name: f for f in acc.fields}
    assert isinstance(by_name["block_range_start"].dataType, LongType)
    assert by_name["block_range_end"].nullable
    assert isinstance(by_name["tx_count"].dataType, IntegerType)
    assert isinstance(by_name["payload"].dataType, BinaryType)
    assert isinstance(by_name["active"].dataType, BooleanType)
    assert isinstance(by_name["tags"].dataType, ArrayType)
    assert isinstance(by_name["balance"].dataType, StringType)  # BigInt exact carrier

    tr = ents["transfer"].spark_schema()
    tr_names = [f.name for f in tr.fields]
    assert tr_names[:2] == ["id", "block$"]


def test_immutable_any_arg_quirk():
    """Replicated reference quirk: ANY `immutable` argument sets immutable,
    even `@entity(immutable: false)` (entities.go parseEntity
    `case "immutable": immutable = true`)."""
    sdl = """
    type A @entity(immutable: false) { id: ID! }
    type B @entity { id: ID! }
    """
    ents = parse_schema(sdl)
    assert ents["a"].immutable
    assert not ents["b"].immutable
