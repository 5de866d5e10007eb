"""Symbol database facade: generated modules grab the default instance
but (in the builder code path) never use it for lookups we need."""


class SymbolDatabase:
    def RegisterMessage(self, message):
        return message

    def RegisterFileDescriptor(self, fd):
        return fd


_default = SymbolDatabase()


def Default() -> SymbolDatabase:
    return _default
