"""Builder facade: populates the generated module's globals the way the
real ``google.protobuf.internal.builder`` does — ``_UPPERCASE``
descriptor handles first, then the message classes, enum wrappers, and
top-level enum value constants."""

from google.protobuf import minipb


def _walk_with_path(fd):
    stack = [(m, m.name) for m in fd.message_types]
    while stack:
        md, path = stack.pop(0)
        yield md, path
        stack = [(n, f"{path}_{n.name}") for n in md.nested] + stack


def BuildMessageAndEnumDescriptors(file_desc, module_globals) -> None:
    for md, path in _walk_with_path(file_desc):
        module_globals[f"_{path.upper()}"] = md
        for ed in md.enums:
            module_globals[f"_{path.upper()}_{ed.name.upper()}"] = ed
    for ed in file_desc.enum_types:
        module_globals[f"_{ed.name.upper()}"] = ed


def BuildTopDescriptorsAndMessages(file_desc, module_name,
                                   module_globals) -> None:
    for md, path in _walk_with_path(file_desc):
        cls = md._cls
        cls.__module__ = module_name
        if "_" not in path:  # top-level message
            module_globals[md.name] = cls
    for ed in file_desc.enum_types:
        module_globals[ed.name] = minipb.EnumTypeWrapper(ed)
        for vname, vnum in ed.values:
            module_globals[vname] = vnum
