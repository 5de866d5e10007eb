"""Descriptor module facade: generated code only reads
``_USE_C_DESCRIPTORS`` (False => it assigns the _serialized_start/_end
bookkeeping attributes, which our plain descriptor objects accept)."""

from google.protobuf import minipb

_USE_C_DESCRIPTORS = False

FieldDescriptor = minipb.FieldDesc
Descriptor = minipb.MessageDesc
EnumDescriptor = minipb.EnumDesc
FileDescriptor = minipb.FileDesc
