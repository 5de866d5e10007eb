"""Runtime-version facade: the shim implements the stable proto3 wire
format, so the generated module's gencode-vs-runtime version check is a
no-op (it exists to catch gencode newer than the runtime — our runtime
is defined BY the wire spec, not a generation lockstep)."""


class Domain:
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


class VersionError(Exception):
    pass


def ValidateProtobufRuntimeVersion(domain, major, minor, patch, suffix,
                                   location) -> None:
    return None
