"""Clean-room pure-Python Protocol Buffers mini-runtime.

Implements exactly enough of the protobuf wire format and generated-code
API to back pyspark's ``sql/streaming/proto/StateMessage_pb2.py`` in an
environment without the ``google.protobuf`` package — which is the only
thing standing between this sandbox and a *running*
``transformWithStateInPandas`` query (the Python worker speaks
length-prefixed StateMessage protos to the JVM state server over a local
socket).  The JVM side parses our bytes with the real Java protobuf
runtime, so the TWS integration tests double as a cross-implementation
differential for this codec.

Everything here derives from the PUBLIC protobuf documentation:
  - wire format: https://protobuf.dev/programming-guides/encoding/
  - descriptor.proto field numbers: https://protobuf.dev/reference/ (the
    schema-of-schemas shipped with every protobuf release)
  - proto3 field-presence rules:
    https://protobuf.dev/programming-guides/field_presence/

Supported surface (what StateMessage.proto + pyspark's four state-client
modules actually use, plus the obvious generalizations):
  - scalar types: all numeric kinds, bool, enum, string, bytes
  - singular / repeated fields (packed + unpacked parse; packed emit for
    repeated numerics, per-element for strings/bytes/messages)
  - nested message fields with proto3 presence (explicit-set tracking,
    mutation-through-child marks the parent chain, like the real
    runtime's parent-notification mechanism)
  - oneofs (last-set wins, siblings cleared) and proto3 ``optional``
    (synthetic-oneof presence)
  - kwargs constructors, attribute get/set, SerializeToString,
    ParseFromString / MergeFromString (unknown fields skipped),
    HasField / WhichOneof / CopyFrom / Clear

NOT implemented (absent from StateMessage.proto): maps, groups,
extensions, Any, JSON mapping, text format, unknown-field retention,
services.  A descriptor using those fails loudly at build time.
"""

from __future__ import annotations

import struct
from typing import Any, Callable

# --------------------------------------------------------------------------
# FieldDescriptorProto.Type values (public descriptor.proto numbering)
# --------------------------------------------------------------------------
TYPE_DOUBLE = 1
TYPE_FLOAT = 2
TYPE_INT64 = 3
TYPE_UINT64 = 4
TYPE_INT32 = 5
TYPE_FIXED64 = 6
TYPE_FIXED32 = 7
TYPE_BOOL = 8
TYPE_STRING = 9
TYPE_GROUP = 10
TYPE_MESSAGE = 11
TYPE_BYTES = 12
TYPE_UINT32 = 13
TYPE_ENUM = 14
TYPE_SFIXED32 = 15
TYPE_SFIXED64 = 16
TYPE_SINT32 = 17
TYPE_SINT64 = 18

LABEL_OPTIONAL = 1
LABEL_REQUIRED = 2
LABEL_REPEATED = 3

_VARINT_TYPES = {
    TYPE_INT64, TYPE_UINT64, TYPE_INT32, TYPE_UINT32,
    TYPE_BOOL, TYPE_ENUM, TYPE_SINT32, TYPE_SINT64,
}
_FIXED64_TYPES = {TYPE_DOUBLE, TYPE_FIXED64, TYPE_SFIXED64}
_FIXED32_TYPES = {TYPE_FLOAT, TYPE_FIXED32, TYPE_SFIXED32}
_NUMERIC_TYPES = _VARINT_TYPES | _FIXED64_TYPES | _FIXED32_TYPES

# wire types
_WT_VARINT = 0
_WT_FIXED64 = 1
_WT_LEN = 2
_WT_FIXED32 = 5

_U64 = (1 << 64) - 1
_U32 = (1 << 32) - 1


# --------------------------------------------------------------------------
# Varint + raw record stream
# --------------------------------------------------------------------------

def write_varint(out: bytearray, v: int) -> None:
    """Append the base-128 varint of a NON-NEGATIVE v."""
    if v < 0:
        raise ValueError("write_varint needs a non-negative value")
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint longer than 10 bytes")


def parse_raw(buf: bytes):
    """Yield (field_number, wire_type, raw) records.

    raw is an int for varint/fixed records (unsigned) and bytes for
    length-delimited ones.  Unknown wire types raise — a corrupt stream
    must not be silently half-parsed.
    """
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = read_varint(buf, pos)
        num, wt = tag >> 3, tag & 0x7
        if num == 0:
            raise ValueError("field number 0 is invalid")
        if wt == _WT_VARINT:
            raw, pos = read_varint(buf, pos)
        elif wt == _WT_LEN:
            ln, pos = read_varint(buf, pos)
            if pos + ln > n:
                raise ValueError("truncated length-delimited field")
            raw = buf[pos:pos + ln]
            pos += ln
        elif wt == _WT_FIXED64:
            if pos + 8 > n:
                raise ValueError("truncated fixed64")
            raw = int.from_bytes(buf[pos:pos + 8], "little")
            pos += 8
        elif wt == _WT_FIXED32:
            if pos + 4 > n:
                raise ValueError("truncated fixed32")
            raw = int.from_bytes(buf[pos:pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield num, wt, raw


# --------------------------------------------------------------------------
# Scalar encode/decode per field type
# --------------------------------------------------------------------------

def _zigzag(v: int, bits: int) -> int:
    return ((v << 1) ^ (v >> (bits - 1))) & ((1 << bits) - 1)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _encode_scalar(out: bytearray, ftype: int, v: Any) -> None:
    """Append the VALUE encoding (no tag) of a scalar."""
    if ftype in (TYPE_INT32, TYPE_INT64):
        write_varint(out, int(v) & _U64)
    elif ftype in (TYPE_UINT32, TYPE_UINT64):
        write_varint(out, int(v))
    elif ftype == TYPE_SINT32:
        write_varint(out, _zigzag(int(v), 32))
    elif ftype == TYPE_SINT64:
        write_varint(out, _zigzag(int(v), 64))
    elif ftype == TYPE_BOOL:
        write_varint(out, 1 if v else 0)
    elif ftype == TYPE_ENUM:
        write_varint(out, int(v) & _U64)
    elif ftype == TYPE_DOUBLE:
        out += struct.pack("<d", v)
    elif ftype == TYPE_FLOAT:
        out += struct.pack("<f", v)
    elif ftype == TYPE_FIXED64:
        out += struct.pack("<Q", v)
    elif ftype == TYPE_SFIXED64:
        out += struct.pack("<q", v)
    elif ftype == TYPE_FIXED32:
        out += struct.pack("<I", v)
    elif ftype == TYPE_SFIXED32:
        out += struct.pack("<i", v)
    else:  # pragma: no cover - guarded by descriptor validation
        raise ValueError(f"not a scalar type: {ftype}")


def _decode_scalar(ftype: int, wt: int, raw: Any) -> Any:
    if ftype in (TYPE_INT32, TYPE_ENUM):
        # sign-extended on the wire: take the low 32 bits as signed
        v = raw & _U32
        return v - (1 << 32) if v >= (1 << 31) else v
    if ftype == TYPE_INT64:
        v = raw & _U64
        return v - (1 << 64) if v >= (1 << 63) else v
    if ftype in (TYPE_UINT32, TYPE_UINT64):
        return raw
    if ftype == TYPE_SINT32 or ftype == TYPE_SINT64:
        return _unzigzag(raw)
    if ftype == TYPE_BOOL:
        return bool(raw)
    if ftype == TYPE_DOUBLE:
        return struct.unpack("<d", raw.to_bytes(8, "little"))[0]
    if ftype == TYPE_FLOAT:
        return struct.unpack("<f", raw.to_bytes(4, "little"))[0]
    if ftype == TYPE_FIXED64:
        return raw
    if ftype == TYPE_SFIXED64:
        return raw - (1 << 64) if raw >= (1 << 63) else raw
    if ftype == TYPE_FIXED32:
        return raw
    if ftype == TYPE_SFIXED32:
        return raw - (1 << 32) if raw >= (1 << 31) else raw
    raise ValueError(f"not a numeric type: {ftype}")


def _scalar_wiretype(ftype: int) -> int:
    if ftype in _VARINT_TYPES:
        return _WT_VARINT
    if ftype in _FIXED64_TYPES:
        return _WT_FIXED64
    if ftype in _FIXED32_TYPES:
        return _WT_FIXED32
    return _WT_LEN


def _default_for(ftype: int) -> Any:
    if ftype == TYPE_STRING:
        return ""
    if ftype == TYPE_BYTES:
        return b""
    if ftype == TYPE_BOOL:
        return False
    if ftype in (TYPE_DOUBLE, TYPE_FLOAT):
        return 0.0
    return 0


# --------------------------------------------------------------------------
# Descriptor model
# --------------------------------------------------------------------------

class FieldDesc:
    def __init__(self, name, number, ftype, repeated, type_name,
                 oneof_index, proto3_optional):
        self.name = name
        self.number = number
        self.type = ftype
        self.repeated = repeated
        self.type_name = type_name          # ".pkg.Message" for message/enum
        self.oneof_index = oneof_index      # int | None
        self.proto3_optional = proto3_optional
        self.message_cls = None             # resolved for TYPE_MESSAGE

    @property
    def has_presence(self) -> bool:
        """Explicit-presence field: emitted iff set, even at default."""
        return (self.oneof_index is not None
                or self.proto3_optional
                or self.type == TYPE_MESSAGE)


class MessageDesc:
    # no __slots__: generated modules assign ._serialized_start etc.
    def __init__(self, name, full_name, fields, oneof_names, nested, enums):
        self.name = name
        self.full_name = full_name
        self.fields = sorted(fields, key=lambda f: f.number)
        self.fields_by_name = {f.name: f for f in fields}
        self.fields_by_number = {f.number: f for f in fields}
        self.oneof_names = oneof_names
        self.nested = nested                # list[MessageDesc]
        self.enums = enums                  # list[EnumDesc]
        self._cls = None                    # the generated Message subclass


class EnumDesc:
    def __init__(self, name, full_name, values):
        self.name = name
        self.full_name = full_name
        self.values = values                # list[(name, number)]
        self.by_name = dict(values)
        self.by_number = {n: k for k, n in values}


class FileDesc:
    def __init__(self, name, package, message_types, enum_types):
        self.name = name
        self.package = package
        self.message_types = message_types  # top-level
        self.enum_types = enum_types        # top-level

    def walk_messages(self):
        stack = list(self.message_types)
        while stack:
            m = stack.pop(0)
            yield m
            stack = m.nested + stack


class EnumTypeWrapper:
    """The generated-module wrapper for an enum: name<->value lookups plus
    the value names as attributes."""

    def __init__(self, edesc: EnumDesc):
        self.DESCRIPTOR = edesc
        for k, n in edesc.values:
            setattr(self, k, n)

    def Value(self, name: str) -> int:
        return self.DESCRIPTOR.by_name[name]

    def Name(self, number: int) -> str:
        return self.DESCRIPTOR.by_number[number]

    def keys(self):
        return [k for k, _ in self.DESCRIPTOR.values]

    def values(self):
        return [n for _, n in self.DESCRIPTOR.values]

    def items(self):
        return list(self.DESCRIPTOR.values)


# --------------------------------------------------------------------------
# FileDescriptorProto bootstrap parser
# --------------------------------------------------------------------------
# Parses the serialized FileDescriptorProto blob embedded in generated
# modules, using the raw record stream and descriptor.proto's published
# field numbers directly (no chicken-and-egg on the runtime itself).

def _parse_field(buf: bytes) -> FieldDesc:
    name = ""
    number = 0
    label = LABEL_OPTIONAL
    ftype = 0
    type_name = None
    oneof_index = None
    proto3_optional = False
    for num, wt, raw in parse_raw(buf):
        if num == 1:
            name = raw.decode("utf-8")
        elif num == 3:
            number = raw
        elif num == 4:
            label = raw
        elif num == 5:
            ftype = raw
        elif num == 6:
            type_name = raw.decode("utf-8")
        elif num == 9:
            oneof_index = raw
        elif num == 17:
            proto3_optional = bool(raw)
        # 7 default_value / 10 json_name / 8 options: irrelevant here
    if ftype == TYPE_GROUP:
        raise ValueError("proto2 groups are not supported")
    return FieldDesc(name, number, ftype, label == LABEL_REPEATED,
                     type_name, oneof_index, proto3_optional)


def _parse_enum(buf: bytes, prefix: str) -> EnumDesc:
    name = ""
    values = []
    for num, wt, raw in parse_raw(buf):
        if num == 1:
            name = raw.decode("utf-8")
        elif num == 2:  # EnumValueDescriptorProto
            vname, vnum = "", 0
            for n2, _, r2 in parse_raw(raw):
                if n2 == 1:
                    vname = r2.decode("utf-8")
                elif n2 == 2:
                    vnum = r2
            values.append((vname, vnum))
    return EnumDesc(name, f"{prefix}.{name}", values)


def _parse_message(buf: bytes, prefix: str) -> MessageDesc:
    name = ""
    fields = []
    nested = []
    enums = []
    oneof_names = []
    raw_nested = []
    raw_enums = []
    for num, wt, raw in parse_raw(buf):
        if num == 1:
            name = raw.decode("utf-8")
        elif num == 2:
            fields.append(_parse_field(raw))
        elif num == 3:
            raw_nested.append(raw)
        elif num == 4:
            raw_enums.append(raw)
        elif num == 8:  # OneofDescriptorProto
            oname = ""
            for n2, _, r2 in parse_raw(raw):
                if n2 == 1:
                    oname = r2.decode("utf-8")
            oneof_names.append(oname)
        # 5 extension_range / 7 options etc.: skipped
    full = f"{prefix}.{name}"
    nested = [_parse_message(b, full) for b in raw_nested]
    enums = [_parse_enum(b, full) for b in raw_enums]
    return MessageDesc(name, full, fields, oneof_names, nested, enums)


def parse_file_descriptor(data: bytes) -> FileDesc:
    name = ""
    package = ""
    raw_msgs = []
    raw_enums = []
    for num, wt, raw in parse_raw(data):
        if num == 1:
            name = raw.decode("utf-8")
        elif num == 2:
            package = raw.decode("utf-8")
        elif num == 4:
            raw_msgs.append(raw)
        elif num == 5:
            raw_enums.append(raw)
        # 3 dependency / 8 options / 12 syntax: not needed
    prefix = f".{package}" if package else ""
    msgs = [_parse_message(b, prefix) for b in raw_msgs]
    enums = [_parse_enum(b, prefix) for b in raw_enums]
    return FileDesc(name, package, msgs, enums)


# --------------------------------------------------------------------------
# Message runtime
# --------------------------------------------------------------------------

class _Repeated(list):
    """List that notifies the owning message on growth, so a repeated
    field populated inside a nested message marks the whole parent chain
    present (the real runtime's listener mechanism)."""

    __slots__ = ("_owner",)

    def __init__(self, owner, items=()):
        super().__init__(items)
        self._owner = owner

    def append(self, item):
        super().append(item)
        self._owner._modified()

    def extend(self, items):
        super().extend(items)
        self._owner._modified()

    def add(self, **kwargs):
        # repeated-message convenience from the real API
        raise NotImplementedError("use append(instance)")


class Message:
    """Base for generated message classes (subclasses set DESCRIPTOR)."""

    DESCRIPTOR: MessageDesc = None  # type: ignore[assignment]

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_present", set())
        object.__setattr__(self, "_parent_cb", None)
        fbn = self.DESCRIPTOR.fields_by_name
        for k, v in kwargs.items():
            f = fbn.get(k)
            if f is None:
                raise ValueError(
                    f"{self.DESCRIPTOR.full_name} has no field {k!r}")
            if v is None:
                continue  # None means leave unset, like the real runtime
            if f.repeated:
                items = list(v)
                if f.type == TYPE_MESSAGE:
                    for it in items:
                        if not isinstance(it, Message):
                            raise TypeError(
                                f"{k} expects message instances")
                self._values[k] = _Repeated(self, items)
                if items:
                    self._modified()
            elif f.type == TYPE_MESSAGE:
                if not isinstance(v, Message):
                    raise TypeError(f"{k} expects a message instance")
                # NOTE: stored by reference (the real runtime copies);
                # every caller here builds messages bottom-up and never
                # mutates afterwards, and the unit tests pin that use.
                self._values[k] = v
                self._set_present(f)
                self._modified()
            else:
                self._set_scalar(f, v)

    # -- presence / mutation plumbing ------------------------------------

    def _modified(self):
        cb = self._parent_cb
        if cb is not None:
            object.__setattr__(self, "_parent_cb", None)
            cb()

    def _set_present(self, f: FieldDesc):
        if f.oneof_index is not None:
            for other in self.DESCRIPTOR.fields:
                if (other.oneof_index == f.oneof_index
                        and other.name != f.name):
                    self._present.discard(other.name)
                    self._values.pop(other.name, None)
        self._present.add(f.name)

    def _set_scalar(self, f: FieldDesc, v):
        if f.type == TYPE_STRING and not isinstance(v, str):
            raise TypeError(f"{f.name} expects str")
        if f.type == TYPE_BYTES and not isinstance(v, (bytes, bytearray)):
            raise TypeError(f"{f.name} expects bytes")
        if f.type in _NUMERIC_TYPES and isinstance(v, str):
            raise TypeError(f"{f.name} expects a number")
        self._values[f.name] = bytes(v) if isinstance(v, bytearray) else v
        if f.has_presence:
            self._set_present(f)
        self._modified()

    def _vivify(self, f: FieldDesc) -> "Message":
        child = self._values.get(f.name)
        if child is None:
            child = f.message_cls()
            self._values[f.name] = child

            def on_child_modified(self=self, f=f):
                self._set_present(f)
                self._modified()

            object.__setattr__(child, "_parent_cb", on_child_modified)
        return child

    # -- attribute protocol ----------------------------------------------

    def __getattr__(self, name):
        f = self.DESCRIPTOR.fields_by_name.get(name)
        if f is None:
            raise AttributeError(
                f"{self.DESCRIPTOR.full_name} has no field {name!r}")
        if f.repeated:
            cont = self._values.get(name)
            if cont is None:
                cont = _Repeated(self)
                self._values[name] = cont
            return cont
        if f.type == TYPE_MESSAGE:
            return self._vivify(f)
        return self._values.get(name, _default_for(f.type))

    def __setattr__(self, name, value):
        if name.startswith("_"):
            object.__setattr__(self, name, value)
            return
        f = self.DESCRIPTOR.fields_by_name.get(name)
        if f is None:
            raise AttributeError(
                f"{self.DESCRIPTOR.full_name} has no field {name!r}")
        if f.repeated or f.type == TYPE_MESSAGE:
            raise AttributeError(
                f"cannot assign to {'repeated' if f.repeated else 'message'}"
                f" field {name!r}; mutate it in place")
        self._set_scalar(f, value)

    # -- public message API ----------------------------------------------

    def SerializeToString(self, deterministic: bool = True) -> bytes:
        out = bytearray()
        for f in self.DESCRIPTOR.fields:  # already number-sorted
            name = f.name
            if f.repeated:
                items = self._values.get(name)
                if not items:
                    continue
                if f.type == TYPE_MESSAGE:
                    for it in items:
                        body = it.SerializeToString()
                        write_varint(out, (f.number << 3) | _WT_LEN)
                        write_varint(out, len(body))
                        out += body
                elif f.type in (TYPE_STRING, TYPE_BYTES):
                    for it in items:
                        b = it.encode("utf-8") if f.type == TYPE_STRING else it
                        write_varint(out, (f.number << 3) | _WT_LEN)
                        write_varint(out, len(b))
                        out += b
                else:  # packed numerics (the proto3 default)
                    body = bytearray()
                    for it in items:
                        _encode_scalar(body, f.type, it)
                    write_varint(out, (f.number << 3) | _WT_LEN)
                    write_varint(out, len(body))
                    out += body
            elif f.type == TYPE_MESSAGE:
                if name not in self._present:
                    continue
                body = self._values[name].SerializeToString()
                write_varint(out, (f.number << 3) | _WT_LEN)
                write_varint(out, len(body))
                out += body
            else:
                v = self._values.get(name, _default_for(f.type))
                if f.has_presence:
                    if name not in self._present:
                        continue
                elif v == _default_for(f.type):
                    continue  # proto3: implicit-presence default elided
                if f.type == TYPE_STRING:
                    b = v.encode("utf-8")
                    write_varint(out, (f.number << 3) | _WT_LEN)
                    write_varint(out, len(b))
                    out += b
                elif f.type == TYPE_BYTES:
                    write_varint(out, (f.number << 3) | _WT_LEN)
                    write_varint(out, len(v))
                    out += v
                else:
                    write_varint(out,
                                 (f.number << 3) | _scalar_wiretype(f.type))
                    _encode_scalar(out, f.type, v)
        return bytes(out)

    def MergeFromString(self, data: bytes) -> int:
        fbn = self.DESCRIPTOR.fields_by_number
        for num, wt, raw in parse_raw(data):
            f = fbn.get(num)
            if f is None:
                continue  # unknown field: skipped (not retained)
            if f.repeated:
                cont = getattr(self, f.name)
                if f.type == TYPE_MESSAGE:
                    child = f.message_cls()
                    child.MergeFromString(raw)
                    cont.append(child)
                elif f.type == TYPE_STRING:
                    cont.append(raw.decode("utf-8"))
                elif f.type == TYPE_BYTES:
                    cont.append(raw)
                elif wt == _WT_LEN:  # packed numerics
                    pos = 0
                    swt = _scalar_wiretype(f.type)
                    while pos < len(raw):
                        if swt == _WT_VARINT:
                            item, pos = read_varint(raw, pos)
                        elif swt == _WT_FIXED64:
                            item = int.from_bytes(raw[pos:pos + 8], "little")
                            pos += 8
                        else:
                            item = int.from_bytes(raw[pos:pos + 4], "little")
                            pos += 4
                        cont.append(_decode_scalar(f.type, swt, item))
                else:
                    cont.append(_decode_scalar(f.type, wt, raw))
            elif f.type == TYPE_MESSAGE:
                child = self._vivify(f)
                child.MergeFromString(raw)
                self._set_present(f)
                self._modified()
            elif f.type == TYPE_STRING:
                self._set_scalar(f, raw.decode("utf-8"))
            elif f.type == TYPE_BYTES:
                self._set_scalar(f, raw)
            else:
                self._set_scalar(f, _decode_scalar(f.type, wt, raw))
        return len(data)

    def ParseFromString(self, data: bytes) -> int:
        self.Clear()
        return self.MergeFromString(data)

    def Clear(self):
        self._values.clear()
        self._present.clear()

    def CopyFrom(self, other: "Message"):
        if other.DESCRIPTOR is not self.DESCRIPTOR:
            raise TypeError("CopyFrom between different message types")
        self.ParseFromString(other.SerializeToString())

    def HasField(self, name: str) -> bool:
        f = self.DESCRIPTOR.fields_by_name.get(name)
        if f is None or f.repeated or not f.has_presence:
            raise ValueError(
                f"field {name!r} does not track presence")
        return name in self._present

    def WhichOneof(self, oneof_name: str) -> str | None:
        try:
            idx = self.DESCRIPTOR.oneof_names.index(oneof_name)
        except ValueError:
            raise ValueError(f"no oneof named {oneof_name!r}") from None
        for f in self.DESCRIPTOR.fields:
            if f.oneof_index == idx and f.name in self._present:
                return f.name
        return None

    def ByteSize(self) -> int:
        return len(self.SerializeToString())

    def __eq__(self, other):
        return (isinstance(other, Message)
                and other.DESCRIPTOR is self.DESCRIPTOR
                and other.SerializeToString() == self.SerializeToString())

    def __ne__(self, other):
        return not self.__eq__(other)

    def __repr__(self):
        parts = []
        for f in self.DESCRIPTOR.fields:
            if f.repeated:
                v = self._values.get(f.name)
                if v:
                    parts.append(f"{f.name}={list(v)!r}")
            elif f.has_presence:
                if f.name in self._present:
                    parts.append(f"{f.name}={self._values.get(f.name)!r}")
            else:
                v = self._values.get(f.name, _default_for(f.type))
                if v != _default_for(f.type):
                    parts.append(f"{f.name}={v!r}")
        return f"{self.DESCRIPTOR.name}({', '.join(parts)})"


# --------------------------------------------------------------------------
# Class factory + file registry
# --------------------------------------------------------------------------

def _build_classes(fd: FileDesc) -> None:
    by_full = {}
    for md in fd.walk_messages():
        by_full[md.full_name] = md
    for md in by_full.values():
        if md._cls is None:
            md._cls = type(md.name, (Message,), {"DESCRIPTOR": md})
    for md in by_full.values():
        for f in md.fields:
            if f.type == TYPE_MESSAGE:
                target = by_full.get(f.type_name)
                if target is None:
                    raise ValueError(
                        f"unresolved message type {f.type_name!r} "
                        f"(cross-file imports are not supported)")
                f.message_cls = target._cls
            elif f.type == TYPE_ENUM and f.type_name is None:
                raise ValueError("enum field without type_name")


_pool_cache: dict[bytes, FileDesc] = {}


def build_file(serialized: bytes) -> FileDesc:
    fd = _pool_cache.get(serialized)
    if fd is None:
        fd = parse_file_descriptor(serialized)
        _build_classes(fd)
        _pool_cache[serialized] = fd
    return fd
