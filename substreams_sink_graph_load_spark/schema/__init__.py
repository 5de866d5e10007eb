from .normalize import normalize_field
from .entities import (
    EntityDesc,
    Field,
    FieldType,
    parse_schema,
    parse_schema_file,
)

__all__ = [
    "normalize_field",
    "EntityDesc",
    "Field",
    "FieldType",
    "parse_schema",
    "parse_schema_file",
]
