"""Hand-serialized FileDescriptorSet for the EntityChanges proto.

Spark's JVM-side ``from_protobuf`` wants a compiled descriptor
(``protoc --descriptor_set_out``), but neither protoc nor the
google.protobuf runtime exists in this environment.  A descriptor set is
itself just a protobuf message (``google.protobuf.FileDescriptorSet``,
public descriptor.proto), so this module serializes one directly with
the same wire-format encoder the codec in :mod:`.protobuf` already uses
— the field-number tables below transcribe the public descriptor.proto
message layout, nothing else.

The described schema is ``sf.substreams.sink.entity.v1`` exactly as the
reference consumes it (ref sinker/sinker.go:209-215, module
substreams-sink-entity-changes v1.3.2; field numbers restated in
sources/protobuf.py's module docstring).  tests/test_protobuf.py walks
these bytes with the module's own wire decoder to pin the structure;
the end-to-end ``from_protobuf`` route is exercised wherever the
spark-protobuf jar is on the classpath (not in this sandbox).
"""

from __future__ import annotations

from .protobuf import _LEN, _VARINT, _enc_len, _enc_tag, _enc_varint

PACKAGE = "sf.substreams.sink.entity.v1"
MESSAGE_FULL_NAME = f"{PACKAGE}.EntityChanges"

# FieldDescriptorProto.type values (public descriptor.proto)
_T_INT32, _T_UINT64, _T_BOOL, _T_STRING, _T_BYTES = 5, 4, 8, 9, 12
_T_MESSAGE, _T_ENUM = 11, 14
# FieldDescriptorProto.label values
_L_OPTIONAL, _L_REPEATED = 1, 3


def _field(
    name: str,
    number: int,
    ftype: int,
    *,
    label: int = _L_OPTIONAL,
    type_name: str | None = None,
    oneof_index: int | None = None,
) -> bytes:
    """FieldDescriptorProto: name=1, number=3, label=4, type=5,
    type_name=6 (fully qualified, leading dot), oneof_index=9."""
    out = _enc_len(1, name.encode())
    out += _enc_tag(3, _VARINT) + _enc_varint(number)
    out += _enc_tag(4, _VARINT) + _enc_varint(label)
    out += _enc_tag(5, _VARINT) + _enc_varint(ftype)
    if type_name is not None:
        out += _enc_len(6, f".{type_name}".encode())
    if oneof_index is not None:
        out += _enc_tag(9, _VARINT) + _enc_varint(oneof_index)
    return out


def _enum(name: str, values: list[tuple[str, int]]) -> bytes:
    """EnumDescriptorProto: name=1, value=2 (EnumValueDescriptorProto:
    name=1, number=2)."""
    out = _enc_len(1, name.encode())
    for vname, vnum in values:
        out += _enc_len(
            2, _enc_len(1, vname.encode()) + _enc_tag(2, _VARINT) + _enc_varint(vnum)
        )
    return out


def _message(
    name: str,
    fields: list[bytes],
    *,
    enums: list[bytes] = (),
    oneofs: list[str] = (),
) -> bytes:
    """DescriptorProto: name=1, field=2, enum_type=4, oneof_decl=8
    (OneofDescriptorProto: name=1)."""
    out = _enc_len(1, name.encode())
    for f in fields:
        out += _enc_len(2, f)
    for e in enums:
        out += _enc_len(4, e)
    for o in oneofs:
        out += _enc_len(8, _enc_len(1, o.encode()))
    return out


def _entity_changes_file() -> bytes:
    """FileDescriptorProto: name=1, package=2, message_type=4, syntax=12."""
    v = f"{PACKAGE}.Value"
    msgs = [
        _message(
            "EntityChanges",
            [
                _field(
                    "entity_changes",
                    5,
                    _T_MESSAGE,
                    label=_L_REPEATED,
                    type_name=f"{PACKAGE}.EntityChange",
                )
            ],
        ),
        _message(
            "EntityChange",
            [
                _field("entity", 1, _T_STRING),
                _field("id", 2, _T_STRING),
                _field("ordinal", 3, _T_UINT64),
                _field(
                    "operation",
                    4,
                    _T_ENUM,
                    type_name=f"{PACKAGE}.EntityChange.Operation",
                ),
                _field(
                    "fields", 5, _T_MESSAGE, label=_L_REPEATED,
                    type_name=f"{PACKAGE}.Field",
                ),
            ],
            enums=[
                _enum(
                    "Operation",
                    [
                        ("OPERATION_UNSPECIFIED", 0),
                        ("OPERATION_CREATE", 1),
                        ("OPERATION_UPDATE", 2),
                        ("OPERATION_DELETE", 3),
                        ("OPERATION_FINAL", 4),
                    ],
                )
            ],
        ),
        _message(
            "Field",
            [
                _field("name", 1, _T_STRING),
                _field("new_value", 3, _T_MESSAGE, type_name=v),
                _field("old_value", 5, _T_MESSAGE, type_name=v),
            ],
        ),
        _message(
            "Value",
            [
                _field("int32", 1, _T_INT32, oneof_index=0),
                _field("bigdecimal", 2, _T_STRING, oneof_index=0),
                _field("bigint", 3, _T_STRING, oneof_index=0),
                _field("string", 4, _T_STRING, oneof_index=0),
                _field("bytes", 5, _T_BYTES, oneof_index=0),
                _field("bool", 6, _T_BOOL, oneof_index=0),
                _field(
                    "array", 10, _T_MESSAGE, type_name=f"{PACKAGE}.Array",
                    oneof_index=0,
                ),
            ],
            oneofs=["typed"],
        ),
        _message(
            "Array",
            [_field("value", 1, _T_MESSAGE, label=_L_REPEATED, type_name=v)],
        ),
    ]
    out = _enc_len(1, b"sf/substreams/sink/entity/v1/entity.proto")
    out += _enc_len(2, PACKAGE.encode())
    for m in msgs:
        out += _enc_len(4, m)
    out += _enc_len(12, b"proto3")
    return out


def entity_changes_descriptor_set() -> bytes:
    """Serialized FileDescriptorSet (file=1 repeated) for
    ``sf.substreams.sink.entity.v1`` — pass as ``binaryDescriptorSet``
    to ``pyspark.sql.protobuf.functions.from_protobuf``."""
    return _enc_len(1, _entity_changes_file())


def write_descriptor_set(path: str) -> str:
    """Write the descriptor set to ``path`` (the ``descFilePath`` form)."""
    with open(path, "wb") as fh:
        fh.write(entity_changes_descriptor_set())
    return path
