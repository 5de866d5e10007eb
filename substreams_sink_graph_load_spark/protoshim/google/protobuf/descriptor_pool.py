"""Descriptor pool facade: AddSerializedFile parses the embedded
FileDescriptorProto blob and builds the message classes eagerly."""

from google.protobuf import minipb


class DescriptorPool:
    def AddSerializedFile(self, serialized_file_desc_proto: bytes):
        return minipb.build_file(serialized_file_desc_proto)


_default = DescriptorPool()


def Default() -> DescriptorPool:
    return _default
