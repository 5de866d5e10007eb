"""camelCase -> snake_case normalization for entity and field names.

Behavioral parity with the reference's custom caser (ref
schema/normalize.go:9-82, built on ettle/strcase with a custom split
function).  Re-implemented from the observable splitting rules:

- lower-case run stays together (``blockMeta`` -> split before ``M``)
- acronym runs stay together until the last capital before a lower-case
  letter (``ABCDef`` -> ``abc_def``)
- a digit run splits from a preceding non-digit unless the preceding char is
  upper-case (``Pool2Token`` -> ``pool_2_token``, but ``A2`` stays ``a2``)
- a digit run splits from a following lower-case letter
- whitespace and ``* . ,`` are word delimiters (dropped), except ``.``/``,``
  sandwiched between digits (number formatting preserved)

This runs at *schema time* only (names, never data), so plain Python is fine.
"""

from __future__ import annotations

_DELIMS = {"*", ".", ","}


def _is_num(c: str) -> bool:
    return c.isdigit() or (c != "" and c.isnumeric())


def _is_upper(c: str) -> bool:
    return c != "" and c.isupper()


def _is_lower(c: str) -> bool:
    return c != "" and c.islower()


def normalize_field(name: str) -> str:
    """Return the snake_case form of ``name`` per reference rules."""
    if not name:
        return name

    words: list[list[str]] = [[]]
    n = len(name)
    for i, curr in enumerate(name):
        prev = name[i - 1] if i > 0 else ""
        nxt = name[i + 1] if i + 1 < n else ""

        action = _split_action(prev, curr, nxt)
        if action == "skip":
            # delimiter: close the current word, drop the char
            if words[-1]:
                words.append([])
            continue
        if action == "split" and words[-1]:
            words.append([])
        words[-1].append(curr.lower())

    return "_".join("".join(w) for w in words if w)


def _split_action(prev: str, curr: str, nxt: str) -> str:
    # fast path: plain lower-case letter continuing a word
    if _is_lower(curr) and not _is_num(prev):
        return "noop"
    # interior of an acronym run
    if _is_upper(prev) and _is_upper(curr) and _is_upper(nxt):
        return "noop"
    # number formatting like 1.5 / 1,5 preserved
    if curr in (".", ",") and _is_num(prev) and _is_num(nxt):
        return "noop"
    if curr.isspace():
        return "skip"
    if curr in _DELIMS:
        return "skip"
    # split before a digit run
    if _is_num(curr) and not _is_num(prev):
        if prev in (".", ","):
            return "noop"
        if _is_upper(prev):
            return "noop"
        return "split"
    # split after a digit run when a lower-case letter follows
    if _is_num(prev) and not _is_num(curr) and not _is_upper(curr):
        return "split"
    # lower->Upper boundary
    squeezed = _is_num(prev) and _is_num(nxt)
    if not _is_upper(prev) and _is_upper(curr) and not squeezed:
        return "split"
    # acronym end: ABCDef -> ABC | Def
    if _is_upper(prev) and _is_upper(curr) and _is_lower(nxt):
        return "split"
    return "noop"
