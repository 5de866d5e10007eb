"""GraphQL entity schema -> engine schema descriptors.

Parity with the reference's schema parser (ref schema/entities.go:60-225):

- objects annotated ``@entity`` become tables (entities.go:144-146)
- ``@entity(immutable: true)`` selects the ``block$`` layout (entities.go:148-157)
- fields annotated ``@derivedFrom`` are virtual and skipped (entities.go:197-200)
- scalar mapping per entities.go:51-58, any other named type is a reference
  stored as the referenced id string (entities.go:224-225)
- ``!`` sets non-nullable; for list types nullability comes from the
  *element* type (entities.go:189-195)
- names are normalized camelCase -> snake_case (entities.go:161-166)

Spark mapping produces an explicit ``StructType`` — schema is declared, never
inferred.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from enum import Enum

from graphql import parse
from graphql.language import ast as gql_ast

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .normalize import normalize_field


class FieldType(str, Enum):
    ID = "ID"
    STRING = "String"
    INT = "Int"
    FLOAT = "Float"
    BOOLEAN = "Boolean"
    BIGINT = "BigInt"
    BIGDECIMAL = "BigDecimal"
    BYTES = "Bytes"


_SCALARS = {t.value: t for t in FieldType}

# JSONL discriminant key inside new_value.Typed{...} per field type
# (ref csvprocessor/entity.go:10-16, 66-85).
TYPED_KEY = {
    FieldType.ID: "String_",
    FieldType.STRING: "String_",
    FieldType.INT: "Int32",
    FieldType.FLOAT: "Float",
    FieldType.BOOLEAN: "Boolean",
    FieldType.BIGINT: "Bigint",
    FieldType.BIGDECIMAL: "Bigdecimal",
    FieldType.BYTES: "Bytes",
}

# Spark carrier types.  BigInt/BigDecimal ride as strings for exactness (the
# reference never parses them to machine ints on the CSV path either,
# writer.go:252-273); Bytes rides as binary.
_SPARK_TYPE: dict[FieldType, DataType] = {
    FieldType.ID: StringType(),
    FieldType.STRING: StringType(),
    FieldType.INT: IntegerType(),
    FieldType.FLOAT: DoubleType(),
    FieldType.BOOLEAN: BooleanType(),
    FieldType.BIGINT: StringType(),
    FieldType.BIGDECIMAL: StringType(),
    FieldType.BYTES: BinaryType(),
}

# CSV default rendered for an absent non-nullable value (writer.go:228-311).
NOTNULL_DEFAULT = {
    FieldType.ID: "",
    FieldType.STRING: "",
    FieldType.INT: "0",
    FieldType.BOOLEAN: "false",
    FieldType.BIGINT: "0",
    FieldType.BIGDECIMAL: "0",
    FieldType.BYTES: "",
}


@dataclass
class Field:
    name: str  # normalized snake_case
    type: FieldType
    nullable: bool = True
    array: bool = False
    # the GraphQL spelling, exactly as change-stream events carry it —
    # required to match names the snake_case round-trip can't reconstruct
    # (volumeUSD -> volume_usd -> volumeUsd != volumeUSD)
    original: str | None = None

    def spark_type(self) -> DataType:
        base = _SPARK_TYPE[self.type]
        if self.array:
            return ArrayType(base, containsNull=self.nullable)
        return base

    @property
    def typed_key(self) -> str:
        return TYPED_KEY[self.type]


@dataclass
class EntityDesc:
    name: str  # normalized snake_case
    fields: dict[str, Field] = dc_field(default_factory=dict)
    immutable: bool = False

    def ordered_fields(self) -> list[Field]:
        """Alphabetical field order (ref schema/entities.go:36-46)."""
        return [self.fields[k] for k in sorted(self.fields)]

    def csv_columns(self) -> list[str]:
        """CSV column order: id, block_range|block$, rest alphabetical
        (ref csvprocessor/writer.go:142-156)."""
        cols = ["id", "block$" if self.immutable else "block_range"]
        cols.extend(f.name for f in self.ordered_fields() if f.name != "id")
        return cols

    def spark_schema(self, include_meta: bool = True) -> StructType:
        """Typed StructType for the *versioned* table of this entity.

        ``include_meta`` adds the temporal columns: ``block$`` for immutable
        entities, ``(block_range_start, block_range_end)`` for mutable ones
        (NULL end == open range).
        """
        fields: list[StructField] = [StructField("id", StringType(), False)]
        if include_meta:
            if self.immutable:
                fields.append(StructField("block$", LongType(), False))
            else:
                fields.append(StructField("block_range_start", LongType(), False))
                fields.append(StructField("block_range_end", LongType(), True))
        for f in self.ordered_fields():
            if f.name == "id":
                continue
            fields.append(StructField(f.name, f.spark_type(), f.nullable))
        return StructType(fields)


def parse_schema(schema_text: str) -> dict[str, EntityDesc]:
    """Parse GraphQL SDL text into entity descriptors keyed by snake_case name."""
    doc = parse(schema_text)
    out: dict[str, EntityDesc] = {}
    for defn in doc.definitions:
        if not isinstance(defn, gql_ast.ObjectTypeDefinitionNode):
            continue
        entity_directive = _find_directive(defn.directives, "entity")
        if entity_directive is None:
            continue
        desc = EntityDesc(
            name=normalize_field(defn.name.value),
            # replicated quirk: the reference sets immutable for ANY
            # `immutable` argument regardless of its value — even
            # `@entity(immutable: false)` (entities.go parseEntity,
            # `case "immutable": immutable = true`)
            immutable=_arg_present(entity_directive, "immutable"),
        )
        for fld in defn.fields or ():
            if _find_directive(fld.directives, "derivedFrom") is not None:
                continue  # virtual reverse-lookup, never materialized
            original = fld.name.value
            name = normalize_field(original)
            ftype, nullable, is_array = _resolve_type(fld.type)
            desc.fields[name] = Field(
                name=name, type=ftype, nullable=nullable, array=is_array,
                original=original,
            )
        out[desc.name] = desc
    return out


def parse_schema_file(path: str) -> dict[str, EntityDesc]:
    with open(path, "r", encoding="utf-8") as fh:
        return parse_schema(fh.read())


def _find_directive(directives, name: str):
    for d in directives or ():
        if d.name.value == name:
            return d
    return None


def _arg_present(directive, name: str) -> bool:
    return any(arg.name.value == name for arg in directive.arguments or ())


def _resolve_type(node) -> tuple[FieldType, bool, bool]:
    """Unwrap NonNull/List wrappers; return (scalar type, nullable, is_array).

    For arrays, nullability is taken from the element type, matching the
    reference (entities.go:189-195).
    """
    nullable = True
    if isinstance(node, gql_ast.NonNullTypeNode):
        node = node.type
        nullable = False
    if isinstance(node, gql_ast.ListTypeNode):
        inner = node.type
        elem_nullable = True
        if isinstance(inner, gql_ast.NonNullTypeNode):
            inner = inner.type
            elem_nullable = False
        name = inner.name.value
        return _scalar_or_ref(name), elem_nullable, True
    return _scalar_or_ref(node.name.value), nullable, False


def _scalar_or_ref(name: str) -> FieldType:
    # Unknown named types are entity references stored as id strings
    # (ref schema/entities.go:224-225).
    return _SCALARS.get(name, FieldType.ID)
